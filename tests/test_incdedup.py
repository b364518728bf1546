"""Incrementally maintained LSH near-dup index (ops/incdedup.py):
incremental == batch over the final corpus, COW touched-bucket
invariants, update/delete semantics across commits, compaction."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from kettleray.ops import dedup, incdedup

KW = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5,
          num_buckets=8, num_partitions=2)


def _mk_docs():
    """24 docs: 4 near-dup families (template + light mutations), the
    rest unique; a couple of short-text edge cases."""
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(40)]
    rows = []
    did = 0
    for fam in range(4):
        base = [words[(fam * 7 + j) % 40] for j in range(30)]
        for copy in range(3):
            toks = list(base)
            if copy:      # mutate one token per copy -> J ~ 28/32
                toks[copy * 5] = f"mut{fam}{copy}"
            rows.append((did, " ".join(toks)))
            did += 1
    for i in range(10):
        rows.append((did, " ".join(
            rng.choice(words, 25).tolist() + [f"uniq{i}x{j}"
                                              for j in range(8)])))
        did += 1
    rows.append((did, "tiny doc")); did += 1
    rows.append((did, "tiny doc")); did += 1      # exact short dup
    return pa.table({"doc_id": pa.array([r[0] for r in rows],
                                        type=pa.int64()),
                     "text": pa.array([r[1] for r in rows])})


def _batch_pairs(docs_ds):
    cand = dedup.minhash_lsh_pairs(docs_ds, "doc_id", "text",
                                   num_perm=64, bands=16, shingle_k=3,
                                   num_partitions=2)
    ref = dedup.jaccard_verify(cand, docs_ds, "doc_id", "text",
                               shingle_k=3, threshold=0.5)
    return ref.to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


def _inc_pairs(root):
    return incdedup.read_pairs(root).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)


@pytest.fixture()
def root(tmp_path):
    d = os.path.join(str(tmp_path), "lsh_index")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_incremental_equals_batch(root):
    t = _mk_docs()
    docs = rd.from_arrow(t).materialize()
    # three commits split by doc_id % 3
    for r in (0, 1, 2):
        part = docs.map_batches(
            lambda b, r=r: b.filter(pc.equal(
                pc.subtract(b["doc_id"], pc.multiply(
                    pc.divide(b["doc_id"], 3), 3)), r)),
            batch_format="pyarrow", zero_copy_batch=True)
        incdedup.apply_incremental_lsh(root, part, **KW)
    inc = _inc_pairs(root)
    ref = _batch_pairs(docs)
    assert len(inc) == len(ref) > 0
    assert inc[["doc_a", "doc_b"]].values.tolist() == \
        ref[["doc_a", "doc_b"]].values.tolist()
    assert np.array_equal(inc["jaccard"].values, ref["jaccard"].values)


def test_touched_buckets_cow(root):
    """Commit 2 must hardlink every fragment of untouched band buckets
    (same inode) and only ADD fragments elsewhere — never rewrite."""
    t = _mk_docs()
    docs = rd.from_arrow(t)
    half1 = docs.map_batches(
        lambda b: b.filter(pc.less(b["doc_id"], 12)),
        batch_format="pyarrow", zero_copy_batch=True)
    half2 = docs.map_batches(
        lambda b: b.filter(pc.greater_equal(b["doc_id"], 12)),
        batch_format="pyarrow", zero_copy_batch=True)
    incdedup.apply_incremental_lsh(root, half1, **KW)
    v1 = {}
    for base, _, names in os.walk(os.path.join(root, "v0001")):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(base, n)
                v1[os.path.relpath(p, os.path.join(root, "v0001"))] = \
                    os.stat(p).st_ino
    incdedup.apply_incremental_lsh(root, half2, **KW)
    carried = 0
    for rel, ino in v1.items():
        p2 = os.path.join(root, "v0002", rel)
        assert os.path.exists(p2), f"v1 fragment {rel} dropped"
        assert os.stat(p2).st_ino == ino, f"{rel} rewritten, not linked"
        carried += 1
    assert carried == len(v1) > 0
    man = incdedup.read_manifest(root)
    assert 0 < len(man["touched_buckets"]) <= KW["num_buckets"]


def test_update_supersedes_and_delete_tombstones(root):
    t = _mk_docs()
    docs = rd.from_arrow(t)
    incdedup.apply_incremental_lsh(root, docs, **KW)
    base = _inc_pairs(root)
    # family 0 = docs 0,1,2: update doc 1 to a unique text -> its pairs
    # must vanish; (0,2) survives
    upd = rd.from_arrow(pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["completely different standalone text now"])}))
    incdedup.apply_incremental_lsh(root, upd, **KW)
    after_upd = _inc_pairs(root)
    assert not ((after_upd.doc_a == 1) | (after_upd.doc_b == 1)).any()
    assert ((after_upd.doc_a == 0) & (after_upd.doc_b == 2)).any()
    # delete doc 2 -> (0,2) gone too
    incdedup.apply_incremental_lsh(root, None, deletes=[2], **KW)
    after_del = _inc_pairs(root)
    assert not ((after_del.doc_a == 2) | (after_del.doc_b == 2)).any()
    assert len(after_del) < len(after_upd) < len(base)
    # re-insert doc 1 with its ORIGINAL text -> pairs with doc 0 come
    # back (doc 2 stays dead)
    orig1 = rd.from_arrow(t.filter(pc.equal(t["doc_id"], 1)))
    incdedup.apply_incremental_lsh(root, orig1, **KW)
    back = _inc_pairs(root)
    assert ((back.doc_a == 0) & (back.doc_b == 1)).any()
    assert not ((back.doc_a == 2) | (back.doc_b == 2)).any()
    # view == batch over the final live corpus
    final = t.filter(pc.invert(pc.equal(t["doc_id"], 2)))
    ref = _batch_pairs(rd.from_arrow(final))
    assert back[["doc_a", "doc_b"]].values.tolist() == \
        ref[["doc_a", "doc_b"]].values.tolist()


def test_compact_preserves_view_and_folds(root):
    t = _mk_docs()
    docs = rd.from_arrow(t)
    for r in (0, 1):
        part = docs.map_batches(
            lambda b, r=r: b.filter(pc.equal(
                pc.subtract(b["doc_id"], pc.multiply(
                    pc.divide(b["doc_id"], 2), 2)), r)),
            batch_format="pyarrow", zero_copy_batch=True)
        incdedup.apply_incremental_lsh(root, part, **KW)
    incdedup.apply_incremental_lsh(root, None, deletes=[0], **KW)
    before = _inc_pairs(root)
    man = incdedup.compact_lsh(root)
    after = _inc_pairs(root)
    assert after.values.tolist() == before.values.tolist()
    # tombstone log cleared; deleted doc's band rows physically gone
    v = incdedup.current_version(root)
    assert not os.path.isdir(os.path.join(root, f"v{v:04d}", "deleted"))
    band_files = incdedup._bucket_dirs(
        os.path.join(root, f"v{v:04d}"), "bands")
    import pyarrow.parquet as pq
    ids = set()
    for f in band_files:
        ids.update(pq.read_table(f, columns=["doc_id"])
                   ["doc_id"].to_pylist())
    assert 0 not in ids
    assert man["counts"]["live_pairs"] == len(after)


def test_sync_from_feed_matches_batch_over_final_state(root, tmp_path):
    """Lake -> index chaining: a CDC sink takes two commits (with
    updates and deletes); the LSH index follows via bootstrap + change
    feed. The live pair view must equal the batch pipeline run over the
    sink's FINAL state (same stable ids)."""
    from kettleray.io import sink
    from kettleray.ops.incdedup import (stable_doc_id,
                                        sync_lsh_from_feed)
    src = os.path.join(str(tmp_path), "lake")
    docs_t = _mk_docs()
    # events: v0 inserts every doc; v1 updates doc 1 (new unique text),
    # re-touches doc 4, deletes docs 2 and 15
    def _ev(ids, texts, ops, seqs):
        n = len(ids)
        return rd.from_arrow(pa.table({
            "repo": pa.array(["r0"] * n),
            "path": pa.array([f"d{i}.txt" for i in ids]),
            "commit": pa.array([f"c{s}_{i}" for s, i in zip(seqs, ids)]),
            "lang": pa.array(["en"] * n),
            "content": pa.array(texts),
            "op": pa.array(ops),
            "commit_seq": pa.array(seqs, type=pa.int64())}))
    ids0 = docs_t["doc_id"].to_pylist()
    txt0 = docs_t["text"].to_pylist()
    b1 = _ev(ids0, txt0, ["insert"] * len(ids0), list(range(len(ids0))))
    sink.apply_incremental_bucketed(src, b1, num_buckets=4,
                                    num_partitions=2)
    base_seq = len(ids0)
    b2 = _ev([1, 4, 2, 15],
             ["totally standalone replacement body", txt0[4] + " touched",
              "", ""],
             ["update", "update", "delete", "delete"],
             [base_seq + i for i in range(4)])
    sink.apply_incremental_bucketed(src, b2, num_buckets=4,
                                    num_partitions=2)

    idx = os.path.join(str(tmp_path), "index")
    kw = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5,
              num_buckets=8, num_partitions=2)
    sync_lsh_from_feed(src, idx, **kw)            # bootstrap @ v1
    sync_lsh_from_feed(src, idx, **kw)            # feed v1 -> v2
    got = incdedup.read_pairs(idx).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)

    # batch reference over the sink's final state with the same ids
    st = sink.read_state(src).to_pandas()
    sid = stable_doc_id(st["repo"].tolist(), st["path"].tolist())
    final = rd.from_arrow(pa.table({
        "doc_id": pa.array(sid, type=pa.int64()),
        "text": pa.array(st["content"].tolist())}))
    ref = _batch_pairs(final)
    assert got[["doc_a", "doc_b"]].values.tolist() == \
        ref[["doc_a", "doc_b"]].values.tolist()
    assert np.array_equal(got["jaccard"].values, ref["jaccard"].values)
    # deleted docs' ids never appear
    dead = set(stable_doc_id(["r0", "r0"], ["d2.txt", "d15.txt"]))
    assert not (set(got["doc_a"]) | set(got["doc_b"])) & dead
    # caught-up sync is a no-op
    v = incdedup.current_version(idx)
    sync_lsh_from_feed(src, idx, **kw)
    assert incdedup.current_version(idx) == v


def test_probe_read_only(root):
    """probe_lsh finds cross near-dups without mutating the index."""
    t = _mk_docs()
    idx_docs = rd.from_arrow(t.filter(pc.invert(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0))))
    probes = rd.from_arrow(t.filter(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0)))
    incdedup.apply_incremental_lsh(root, idx_docs, **KW)
    v_before = incdedup.current_version(root)
    got = incdedup.probe_lsh(root, probes).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert incdedup.current_version(root) == v_before   # untouched
    # doc 0 (family 0, probe side) must match docs 1,2 (index side)
    hits0 = got[got.doc_a == 0]["doc_b"].tolist()
    assert set(hits0) == {1, 2}
    # every pair is probe (doc_id%3==0) vs index (doc_id%3!=0)
    assert (got.doc_a % 3 == 0).all() and (got.doc_b % 3 != 0).all()
    # probing again yields the identical result (read-only, stable)
    again = incdedup.probe_lsh(root, probes).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert again.values.tolist() == got.values.tolist()


def test_gc_and_fsck(root):
    t = _mk_docs()
    docs = rd.from_arrow(t)
    for r in (0, 1, 2):
        part = docs.map_batches(
            lambda b, r=r: b.filter(pc.equal(
                pc.subtract(b["doc_id"], pc.multiply(
                    pc.divide(b["doc_id"], 3), 3)), r)),
            batch_format="pyarrow", zero_copy_batch=True)
        incdedup.apply_incremental_lsh(root, part, **KW)
    before = _inc_pairs(root)
    audit = incdedup.fsck_lsh(root)
    assert audit["problems"] == [] and audit["pair_rows"] >= len(before)
    deleted = incdedup.gc_lsh(root, keep_last=1)
    assert deleted == [1, 2]
    assert not os.path.isdir(os.path.join(root, "v0001"))
    # current version still complete and readable after the vacuum
    assert _inc_pairs(root).values.tolist() == before.values.tolist()
    incdedup.fsck_lsh(root)
    # corrupt one band fragment -> fsck raises
    v = incdedup.current_version(root)
    frag = incdedup._bucket_dirs(
        os.path.join(root, f"v{v:04d}"), "bands")[0]
    with open(frag, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(ValueError, match="unreadable"):
        incdedup.fsck_lsh(root)


def test_compaction_policy(root):
    """maybe_compact_lsh folds only past the fragment/tombstone bounds
    and preserves the pair view."""
    t = _mk_docs()
    docs = rd.from_arrow(t)
    for r in (0, 1, 2):
        part = docs.map_batches(
            lambda b, r=r: b.filter(pc.equal(
                pc.subtract(b["doc_id"], pc.multiply(
                    pc.divide(b["doc_id"], 3), 3)), r)),
            batch_format="pyarrow", zero_copy_batch=True)
        incdedup.apply_incremental_lsh(root, part, **KW)
    before = _inc_pairs(root)
    s = incdedup.lsh_fragment_stats(root)
    assert s["max_fragments_per_bucket"] >= 2
    # below bounds -> no-op
    assert incdedup.maybe_compact_lsh(
        root, max_fragments_per_bucket=50) is None
    # above bounds -> compacts to one fragment per bucket, view intact
    man = incdedup.maybe_compact_lsh(root, max_fragments_per_bucket=1)
    assert man is not None
    assert incdedup.lsh_fragment_stats(
        root)["max_fragments_per_bucket"] == 1
    assert _inc_pairs(root).values.tolist() == before.values.tolist()


def test_crash_orphan_version_recovery(root):
    """A crash between the stage->vN rename and the CURRENT write
    leaves an orphan version dir; the next commit must allocate past it
    instead of failing the rename forever."""
    t = _mk_docs()
    h1 = rd.from_arrow(t.filter(pc.less(t["doc_id"], 12)))
    h2 = rd.from_arrow(t.filter(pc.greater_equal(t["doc_id"], 12)))
    incdedup.apply_incremental_lsh(root, h1, **KW)
    # simulate the crashed commit: v2 dir exists, CURRENT still v1
    os.makedirs(os.path.join(root, "v0002", "bands"))
    assert incdedup.current_version(root) == 1
    man = incdedup.apply_incremental_lsh(root, h2, **KW)
    assert man["version"] == 3
    assert incdedup.current_version(root) == 3
    # view complete: equals batch over the full corpus
    got = _inc_pairs(root)
    ref = _batch_pairs(rd.from_arrow(t))
    assert got[["doc_a", "doc_b"]].values.tolist() == \
        ref[["doc_a", "doc_b"]].values.tolist()
    incdedup.fsck_lsh(root)
    # the orphan is reaped once it falls below the keep window
    deleted = incdedup.gc_lsh(root, keep_last=1)
    assert 2 in deleted


def test_param_mismatch_rejected(root):
    docs = rd.from_arrow(_mk_docs())
    incdedup.apply_incremental_lsh(root, docs, **KW)
    bad = dict(KW)
    bad["bands"] = 8
    with pytest.raises(ValueError):
        incdedup.apply_incremental_lsh(root, docs, **bad)


def test_concurrent_writer_collision_is_loud(root, tmp_path):
    """A rename collision (second writer targeting the same version)
    raises the single-writer error, not a bare OSError; the loser's
    stage is cleaned up."""
    import glob

    t = _mk_docs()
    incdedup.apply_incremental_lsh(root, rd.from_arrow(t), **KW)
    # fake a concurrent winner at the version the next commit will pick
    winner = os.path.join(root, "v0002")
    os.makedirs(os.path.join(winner, "bands"))
    with open(os.path.join(winner, "manifest.json"), "w") as f:
        f.write("{}")
    stage = os.path.join(root, "_stage_v0002.test")
    os.makedirs(stage)
    with pytest.raises(RuntimeError, match="single-writer"):
        incdedup._commit_rename(root, stage, 2)
    assert not os.path.isdir(stage)
    assert not glob.glob(os.path.join(root, "_stage_v0002.test"))


from hypothesis import HealthCheck, given, settings, strategies as st


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_property_arbitrary_commit_splits_match_batch(tmp_path, data):
    """Hypothesis: ANY partition of the corpus into 1-4 commits, with
    an arbitrary trailing update set and delete set, yields the same
    live pair view as the batch pipeline over the final corpus."""
    t = _mk_docs()
    n = t.num_rows
    ids = list(range(n))
    n_commits = data.draw(st.integers(1, 4), label="n_commits")
    assign = data.draw(st.lists(st.integers(0, n_commits - 1),
                                min_size=n, max_size=n), label="assign")
    upd_ids = data.draw(st.sets(st.sampled_from(ids), max_size=4),
                        label="updates")
    del_ids = data.draw(st.sets(st.sampled_from(ids), max_size=4),
                        label="deletes")
    root = os.path.join(str(tmp_path), f"p{abs(hash(tuple(assign)))%997}")
    shutil.rmtree(root, ignore_errors=True)

    import pandas as pd
    for c in range(n_commits):
        sel = [i for i in ids if assign[i] == c]
        if not sel:
            continue
        part = rd.from_arrow(t.filter(pc.is_in(
            t["doc_id"], value_set=pa.array(sel, type=pa.int64()))))
        incdedup.apply_incremental_lsh(root, part, **KW)
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    if upd_ids:
        upd = rd.from_arrow(pa.table({
            "doc_id": pa.array(sorted(upd_ids), type=pa.int64()),
            "text": pa.array([texts[i] + " tail" + str(i)
                              for i in sorted(upd_ids)])}))
        incdedup.apply_incremental_lsh(root, upd, **KW)
    if del_ids:
        incdedup.apply_incremental_lsh(root, None,
                                       deletes=sorted(del_ids), **KW)
    got = _inc_pairs(root)

    final_rows = {"doc_id": [], "text": []}
    for i in ids:
        if i in del_ids:
            continue
        final_rows["doc_id"].append(i)
        final_rows["text"].append(texts[i] + " tail" + str(i)
                                  if i in upd_ids else texts[i])
    final = rd.from_arrow(pa.table({
        "doc_id": pa.array(final_rows["doc_id"], type=pa.int64()),
        "text": pa.array(final_rows["text"])}))
    ref = _batch_pairs(final)
    assert got[["doc_a", "doc_b"]].values.tolist() == \
        ref[["doc_a", "doc_b"]].values.tolist()
    assert np.array_equal(got["jaccard"].values, ref["jaccard"].values)
    shutil.rmtree(root, ignore_errors=True)


def test_probe_large_path_matches_small_and_stays_distributed(
        root, monkeypatch):
    """Round-4 fix: a probe batch above ``small_max_band_rows`` must run
    the DISTRIBUTED candidate+verify path — never concat its band rows
    on the driver (an incoming crawl shard of millions of docs was a
    driver OOM before). Poison any driver pull of band rows and force
    both the large-batch path and the distributed sketch-join verify;
    results must equal the small path's exactly."""
    import ray.data.dataset as dsmod

    t = _mk_docs()
    idx_docs = rd.from_arrow(t.filter(pc.invert(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0))))
    probes = rd.from_arrow(t.filter(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0)))
    incdedup.apply_incremental_lsh(root, idx_docs, **KW)
    v_before = incdedup.current_version(root)

    want = incdedup.probe_lsh(root, probes).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)

    orig = dsmod.Dataset.to_arrow_refs

    def _guarded(self, *a, **k):
        names = [f.name for f in self.schema().base_schema]
        # band rows scale with the probe batch — pulling them to the
        # driver is the exact regression under test. Bounded pulls
        # (pairs/sketch solidify, never batch-proportional) stay legal.
        assert "band_hash" not in names, \
            "probe_lsh pulled probe band rows onto the driver"
        return orig(self, *a, **k)

    monkeypatch.setattr(dsmod.Dataset, "to_arrow_refs", _guarded)
    monkeypatch.setattr(incdedup, "_BROADCAST_VERIFY_MAX", 0)
    got = incdedup.probe_lsh(
        root, probes, small_max_band_rows=0).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert incdedup.current_version(root) == v_before     # still read-only
    assert got.columns.tolist() == want.columns.tolist()
    assert got[["doc_a", "doc_b"]].values.tolist() == \
        want[["doc_a", "doc_b"]].values.tolist()
    assert (abs(got["jaccard"] - want["jaccard"]) < 1e-12).all()


def test_probe_large_path_broadcast_verify_gate(root, monkeypatch):
    """Large-batch candidate gen + the bounded broadcast verify (few
    candidates from a big batch) — the middle regime of the gate."""
    t = _mk_docs()
    idx_docs = rd.from_arrow(t.filter(pc.invert(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0))))
    probes = rd.from_arrow(t.filter(pc.equal(
        pc.subtract(t["doc_id"], pc.multiply(
            pc.divide(t["doc_id"], 3), 3)), 0)))
    incdedup.apply_incremental_lsh(root, idx_docs, **KW)
    want = incdedup.probe_lsh(root, probes).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    got = incdedup.probe_lsh(
        root, probes, small_max_band_rows=0).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    assert got[["doc_a", "doc_b"]].values.tolist() == \
        want[["doc_a", "doc_b"]].values.tolist()


def test_probe_large_path_superseded_id_absent(root):
    """A probe re-using an index doc_id supersedes it on the large path
    too: other probes must match neither its old nor its new text."""
    t = _mk_docs()
    idx_docs = rd.from_arrow(t)          # index everything
    incdedup.apply_incremental_lsh(root, idx_docs, **KW)
    # probe docs 0 (fresh near-dup text of family 0) and 1 (re-used id,
    # now totally unrelated text)
    probes = rd.from_arrow(pa.table({
        "doc_id": pa.array([100, 1], type=pa.int64()),
        "text": pa.array([t["text"][0].as_py(),
                          "completely different unrelated tokens xq"]),
    }))
    small = incdedup.probe_lsh(root, probes).to_pandas()
    large = incdedup.probe_lsh(
        root, probes, small_max_band_rows=0).to_pandas()
    for got in (small, large):
        hits = {(r.doc_a, r.doc_b) for r in got.itertuples()}
        # probe 100 matches family 0's index docs EXCEPT superseded 1
        assert (100, 0) in hits and (100, 2) in hits
        assert all(b != 1 for (_, b) in hits)
        assert all(a != 1 or b != 1 for (a, b) in hits)
    assert sorted(small[["doc_a", "doc_b"]].values.tolist()) == \
        sorted(large[["doc_a", "doc_b"]].values.tolist())
