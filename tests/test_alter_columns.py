"""Metadata-only column RENAME / DROP (≙ Delta column mapping; Kettle
expresses renames per-pipeline via Select Values,
engine/src/main/java/org/pentaho/di/trans/steps/selectvalues — here
they are TABLE metadata so committed files never rewrite).

Contract under test: alter is O(1) (no data files touched), every read
surface presents logical names over any mix of file generations, later
commits merge correctly across the rename boundary, rewrites
(compaction / clustering) physicalize naturally, and engine columns
are protected."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from kettleray.io import sink


def _mk(rows):
    cols = {k: [r[k] for r in rows]
            for k in ("repo", "path", "commit", "lang", "content", "op",
                      "commit_seq")}
    return pa.table({**cols,
                     "commit_seq": pa.array(cols["commit_seq"],
                                            type=pa.int64())})


def _r(repo, path, seq, op="insert", content=None, lang="py"):
    return {"repo": repo, "path": path, "commit": f"c{seq}",
            "lang": lang,
            "content": content if content is not None else f"body-{seq}",
            "op": op, "commit_seq": seq}


def _inodes(vdir):
    return {os.path.relpath(f, vdir): os.stat(f).st_ino
            for f in sink._parquet_files(vdir)}


def test_rename_is_metadata_only_and_reads_logical(tmp_path):
    root = str(tmp_path / "state")
    rows = [_r(f"r{i % 4}", f"f{i}.py", i, lang=("py" if i % 2 else "rs"))
            for i in range(1, 41)]
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=8, num_partitions=4)
    before = _inodes(os.path.join(root, "v0001"))

    cm = sink.alter_table_columns(root, rename={"lang": "language"})
    assert cm == {"renames": [["lang", "language"]], "dropped": []}
    # zero data files created, moved or rewritten
    assert _inodes(os.path.join(root, "v0001")) == before

    st = sink.read_state(root).take_all()
    assert len(st) == 40
    assert all("language" in r and "lang" not in r for r in st)
    assert {r["language"] for r in st} == {"py", "rs"}

    # state_schema logicalizes too
    names = sink.state_schema(root).names
    assert "language" in names and "lang" not in names

    # point lookup + cached reader
    one = sink.lookup_state(root, "r1", "f1.py")
    assert one.num_rows == 1 and one["language"][0].as_py() == "py"
    rd = sink.StateReader(root)
    assert rd.lookup("r1", "f1.py")["language"][0].as_py() == "py"
    miss = rd.lookup("r1", "nope.py")
    assert miss.num_rows == 0 and "language" in miss.column_names


def test_commits_merge_across_the_rename_boundary(tmp_path):
    """Old buckets carry physical 'lang', fresh events logical
    'language' — the merge must land on ONE column, both layouts."""
    for mode in ("cow", "mor"):
        root = str(tmp_path / f"state_{mode}")
        apply = (sink.apply_incremental_bucketed if mode == "cow"
                 else sink.apply_incremental_mor)
        rows = [_r(f"r{i % 4}", f"f{i}.py", i) for i in range(1, 31)]
        apply(root, ray.data.from_arrow(_mk(rows)),
              num_buckets=8, num_partitions=4)
        sink.alter_table_columns(root, rename={"lang": "language"})

        fresh = _mk([_r("r1", "f1.py", 100, content="NEW", lang="go"),
                     _r("r2", "f2.py", 101, op="delete"),
                     _r("r8", "added.py", 102, lang="zh")])
        fresh = fresh.rename_columns(
            [c if c != "lang" else "language" for c in fresh.column_names])
        apply(root, ray.data.from_arrow(fresh),
              num_buckets=8, num_partitions=4)

        st = {(r["repo"], r["path"]): r
              for r in sink.read_state(root).take_all()}
        assert ("r2", "f2.py") not in st
        assert st[("r1", "f1.py")]["language"] == "go"
        assert st[("r1", "f1.py")]["content"] == "NEW"
        assert st[("r8", "added.py")]["language"] == "zh"
        assert st[("r3", "f3.py")]["language"] == "py"
        assert all("lang" not in r for r in st.values()), mode

        # changefeed across the boundary is logical as well
        ch = {(r["repo"], r["path"]): r["change_type"]
              for r in sink.read_changes(root, 1, 2).take_all()}
        assert ch == {("r1", "f1.py"): "changed",
                      ("r2", "f2.py"): "deleted",
                      ("r8", "added.py"): "new"}, mode


def test_drop_and_rename_chain_and_scan_pruning(tmp_path):
    root = str(tmp_path / "state")
    rows = [_r(f"r{i % 4}", f"f{i}.py", i,
               lang=("py" if i <= 20 else "rs")) for i in range(1, 41)]
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=4, num_partitions=4)
    sink.alter_table_columns(root, rename={"lang": "language"})

    # residual-exact filter on the renamed column (stats live under the
    # OLD physical name — alias-aware pruning must stay sound)
    got = sink.scan_state(root, [("language", "==", "rs")]).take_all()
    assert len(got) == 20 and all(r["language"] == "rs" for r in got)

    # cluster by the LOGICAL name, then scan with pruning: rewritten
    # files physicalize the rename and record stats under 'language'
    sink.cluster_state(root, ("language",), rows_per_file=5)
    rep = {}
    got2 = sink.scan_state(root, [("language", "==", "rs")],
                           report=rep).take_all()
    assert {(r["repo"], r["path"]) for r in got2} == \
        {(r["repo"], r["path"]) for r in got}
    assert rep["files_pruned"] > 0

    # chain: drop the renamed column (resolves through the rename list)
    sink.alter_table_columns(root, drop=["language"])
    st = sink.read_state(root).take_all()
    assert len(st) == 40 and all("language" not in r and "lang" not in r
                                 for r in st)

    # compaction of a mapped table physicalizes: rewritten fragments
    # carry neither name
    for i in range(5):
        sink.apply_incremental_bucketed(
            root, ray.data.from_arrow(_mk(
                [_r("r1", "f1.py", 200 + i, content=f"v{i}")])
                .rename_columns(["repo", "path", "commit", "language",
                                 "content", "op", "commit_seq"])),
            num_buckets=4, num_partitions=2)
    sink.compact_state(root, max_files_per_bucket=2)
    st2 = {(r["repo"], r["path"]): r["content"]
           for r in sink.read_state(root).take_all()}
    assert st2[("r1", "f1.py")] == "v4" and len(st2) == 40


def test_alter_guards(tmp_path):
    root = str(tmp_path / "state")
    rows = [_r("r0", f"f{i}.py", i) for i in range(1, 6)]
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=2, num_partitions=2)
    for bad in ("repo", "path", "commit", "op", "commit_seq",
                "content", "content_sha256"):
        with pytest.raises(ValueError, match="protected|engine"):
            sink.alter_table_columns(root, rename={bad: "x"})
        with pytest.raises(ValueError):
            sink.alter_table_columns(root, drop=[bad])
    with pytest.raises(ValueError, match="not a live"):
        sink.alter_table_columns(root, rename={"nope": "x"})
    with pytest.raises(ValueError, match="protected"):
        sink.alter_table_columns(root, rename={"lang": "content"})
    with pytest.raises(ValueError, match="collides"):
        sink.alter_table_columns(root, rename={"lang": "lang"})
    sink.alter_table_columns(root, rename={"lang": "language"})
    # reusing a retired physical name stays refused forever
    rows2 = [_r("r0", "g.py", 50)]
    with pytest.raises(ValueError, match="collides|not a live"):
        sink.alter_table_columns(root, rename={"language": "lang"})
    del rows2


def test_lookup_many_and_key_history_logical(tmp_path):
    root = str(tmp_path / "state")
    rows = [_r(f"r{i % 3}", f"f{i}.py", i) for i in range(1, 31)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(rows)),
                               num_buckets=8, num_partitions=4)
    sink.alter_table_columns(root, rename={"lang": "language"})
    fresh = _mk([_r("r1", "f1.py", 100, content="X", lang="go")])
    fresh = fresh.rename_columns(
        [c if c != "lang" else "language" for c in fresh.column_names])
    sink.apply_incremental_mor(root, ray.data.from_arrow(fresh),
                               num_buckets=8, num_partitions=4)

    keys = ray.data.from_arrow(pa.table(
        {"repo": ["r1", "r2"], "path": ["f1.py", "f2.py"]}))
    got = {(r["repo"], r["path"]): r
           for r in sink.lookup_many(root, keys).take_all()}
    assert got[("r1", "f1.py")]["language"] == "go"
    assert got[("r2", "f2.py")]["language"] == "py"
    assert all("lang" not in r for r in got.values())

    h = sink.key_history(root, "r1", "f1.py")
    assert [r["change_type"] for r in h.to_pylist()] == ["new", "changed"]
    assert h.to_pylist()[1]["language"] == "go"
