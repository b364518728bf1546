"""Set-based DML (DELETE / UPDATE / MERGE) over the lake state.

Contract: every DML op is one CDC commit — matched rows become change
events at watermark+1 through the MOR sink, so read_state, time travel,
and the changefeed all reflect it; nothing rewrites the table.
"""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink
from kettleray.ops import dml

CFG = EventGenConfig(n_events=4000, n_repos=12, n_paths_per_repo=40,
                     p_delete=0.08, seed=99)


def _build(root, *, num_buckets=8):
    events = generate_events_local(CFG)
    sink.apply_incremental_mor(root, ray.data.from_arrow(events),
                               num_buckets=num_buckets, num_partitions=4)
    return events


def _state_dict(root, version=None):
    out = {}
    for r in sink.read_state(root, version).take_all():
        out[(r["repo"], r["path"])] = (r["lang"], r["content"],
                                       r["content_sha256"],
                                       r["last_commit_seq"])
    return out


def test_delete_where_matches_exact_and_is_a_commit(tmp_path):
    root = str(tmp_path / "s")
    _build(root)
    before = _state_dict(root)
    v_before = sink.current_version(root)
    wm_before = sink.read_manifest(root).watermark

    man, rep = dml.delete_where(root, [("lang", "==", "py")])
    assert man.version == v_before + 1
    assert man.watermark == wm_before + 1
    after = _state_dict(root)
    want = {k: v for k, v in before.items() if v[0] != "py"}
    assert after == want
    assert len(after) < len(before)
    assert rep["files_total"] > 0

    # time travel still sees the pre-delete rows
    assert _state_dict(root, v_before) == before

    # idempotent re-issue: nothing matches now -> no-op commit
    man2, _ = dml.delete_where(root, [("lang", "==", "py")])
    assert man2.version == man.version

    # the changefeed reports exactly the deleted keys
    ch = sink.read_changes(root, v_before, man.version)
    got = {(r["repo"], r["path"]): r["change_type"]
           for r in ch.take_all()}
    assert got == {k: "deleted" for k in before if before[k][0] == "py"}


def test_delete_where_prunes_on_clustered_layout(tmp_path):
    root = str(tmp_path / "s")
    _build(root)
    sink.cluster_state(root, ("lang",), rows_per_file=40)
    man, rep = dml.delete_where(root, [("lang", "==", "rs")])
    assert rep["files_pruned"] > 0
    assert all(r["lang"] != "rs"
               for r in sink.read_state(root).take_all())


def test_update_where_literal_and_computed(tmp_path):
    root = str(tmp_path / "s")
    _build(root)
    before = _state_dict(root)
    wm = sink.read_manifest(root).watermark

    man, _ = dml.update_where(
        root, [("lang", "==", "go")],
        {"content": "[REDACTED]",
         "commit": lambda t: pc.utf8_upper(t["commit"])})
    after = _state_dict(root)
    red_sha = hashlib.sha256(b"[REDACTED]").hexdigest()
    assert len(after) == len(before)
    for k, (lang, content, sha, seq) in after.items():
        if before[k][0] == "go":
            assert content == "[REDACTED]" and sha == red_sha
            assert seq == wm + 1
        else:
            assert (lang, content, sha, seq) == before[k]


def test_update_where_rejects_key_columns(tmp_path):
    root = str(tmp_path / "s")
    _build(root)
    try:
        dml.update_where(root, [("lang", "==", "go")], {"repo": "x"})
        assert False, "expected ValueError"
    except ValueError:
        pass


def _merge_fixture(tmp_path):
    root = str(tmp_path / "s")
    events = _build(root)
    st = _state_dict(root)
    keys = sorted(st)
    # source: 2 matched-to-update, 2 matched-to-delete (t_lang cond),
    # 2 brand-new keys (one filtered out by the insert condition)
    upd = [k for k in keys if st[k][0] != "java"][:2]
    dele = [k for k in keys if st[k][0] == "java"][:2]
    assert len(upd) == 2 and len(dele) == 2
    rows = []
    for k in upd + dele:
        rows.append({"repo": k[0], "path": k[1], "commit": "m" * 8,
                     "lang": "merged", "content": f"merged {k[1]}"})
    rows.append({"repo": "new-repo", "path": "a.py", "commit": "n" * 8,
                 "lang": "py", "content": "new a"})
    rows.append({"repo": "new-repo", "path": "skip.py", "commit": "n" * 8,
                 "lang": "skipme", "content": "new skip"})
    src = ray.data.from_arrow(pa.Table.from_pylist(rows))
    return root, st, upd, dele, src


def test_merge_into_clause_routing(tmp_path):
    root, st, upd, dele, src = _merge_fixture(tmp_path)
    wm = sink.read_manifest(root).watermark
    man = dml.merge_into(
        root, src,
        delete_condition=lambda j: pc.equal(j["t_lang"], "java"),
        insert_condition=lambda j: pc.not_equal(j["lang"], "skipme"))
    after = _state_dict(root)

    want = dict(st)
    for k in dele:
        del want[k]
    for k in upd:
        body = f"merged {k[1]}"
        want[k] = ("merged", body,
                   hashlib.sha256(body.encode()).hexdigest(), wm + 1)
    want[("new-repo", "a.py")] = (
        "py", "new a", hashlib.sha256(b"new a").hexdigest(), wm + 1)
    assert after == want
    assert man.watermark == wm + 1


def test_merge_into_update_only_and_insert_off(tmp_path):
    root, st, upd, dele, src = _merge_fixture(tmp_path)
    dml.merge_into(root, src, when_not_matched_insert=False)
    after = _state_dict(root)
    assert ("new-repo", "a.py") not in after
    assert ("new-repo", "skip.py") not in after
    for k in upd + dele:                 # all matched rows updated
        assert after[k][0] == "merged"
    assert len(after) == len(st)


def test_merge_into_rejects_duplicate_source_keys(tmp_path):
    root = str(tmp_path / "s")
    _build(root)
    rows = [{"repo": "r", "path": "p", "commit": "c", "lang": "py",
             "content": "x"}] * 2
    src = ray.data.from_arrow(pa.Table.from_pylist(rows))
    try:
        dml.merge_into(root, src)
        assert False, "expected ValueError"
    except Exception as e:                    # surfaced through Ray task
        assert "key-unique" in str(e)
