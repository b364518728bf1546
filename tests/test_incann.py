"""Incrementally maintained embedding-ANN index (ops/incann.py):
incremental commits == brute force over the final corpus, supersede
across LSH buckets, tombstones, COW hardlinks, compaction, feed sync."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kettleray.ops import incann

DIM = 12
KW = dict(id_col="vec_id", vec_col="embedding", n_planes=4, seed=7,
          num_id_buckets=8, num_partitions=2)
EXACT = dict(probe_hamming=4)     # hamming ball = every bucket: exact


@pytest.fixture()
def root(tmp_path):
    d = os.path.join(str(tmp_path), "ann_index")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _vecs(n, seed=3):
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((n, DIM))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _ds(ids, m):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(list(m), type=pa.list_(pa.float64()))}))


def _brute_topk(ids, m, q, k):
    q = q / np.linalg.norm(q)
    sims = (m / np.linalg.norm(m, axis=1, keepdims=True)) @ q
    order = np.lexsort((np.asarray(ids), -sims))[:k]
    return [(int(np.asarray(ids)[i]), float(sims[i])) for i in order]


def _got_topk(root, q, k, **qkw):
    t, _, _ = incann.query_ann(root, q, k=k, **qkw)
    return [(int(r["vec_id"]), float(r["cosine"]))
            for r in t.to_pylist()]


def _final_corpus(n=60):
    """ids/vectors after: 3 insert commits (id%3), update commit
    (id%10==7 -> vector of id-5), delete commit (id%13==4)."""
    m = _vecs(n)
    final = {}
    for i in range(n):
        final[i] = m[i]
    for i in range(n):
        if i % 10 == 7 and i - 5 >= 0:
            final[i] = m[i - 5]
    for i in range(n):
        if i % 13 == 4:
            final.pop(i, None)
    return m, final


def _commit_sequence(root, n=60, **kw):
    m, final = _final_corpus(n)
    ids = np.arange(n)
    for r in (0, 1, 2):
        sel = ids[ids % 3 == r]
        incann.apply_incremental_ann(root, _ds(sel, m[sel]), **kw)
    upd = ids[(ids % 10 == 7) & (ids >= 5)]
    incann.apply_incremental_ann(root, _ds(upd, m[upd - 5]), **kw)
    dels = ids[ids % 13 == 4]
    incann.apply_incremental_ann(root, None, deletes=dels.tolist(),
                                 **kw)
    return m, final


def test_incremental_equals_bruteforce(root):
    m, final = _commit_sequence(root, **KW)
    fids = sorted(final)
    fm = np.stack([final[i] for i in fids])
    for qi in (0, 9, 31):
        q = m[qi]
        want = _brute_topk(fids, fm, q, 5)
        got = _got_topk(root, q, 5, **EXACT)
        assert [g[0] for g in got] == [w[0] for w in want]
        assert np.allclose([g[1] for g in got], [w[1] for w in want],
                           atol=1e-12)


def test_update_supersedes_across_buckets(root):
    """An update that flips the vector's LSH bucket: the stale row (old
    bucket) must never surface, the new row must be findable."""
    m = _vecs(8, seed=11)
    incann.apply_incremental_ann(root, _ds(range(8), m), **KW)
    # move vec 3 onto vec 0's exact direction (same bucket as vec 0)
    incann.apply_incremental_ann(root, _ds([3], m[[0]]), **KW)
    got = _got_topk(root, m[0], 3, **EXACT)
    assert got[0][0] in (0, 3) and got[1][0] in (0, 3)
    assert abs(got[0][1] - 1.0) < 1e-12 and abs(got[1][1] - 1.0) < 1e-12
    # query near OLD vec 3: stale row must not report cosine 1.0
    got_old = _got_topk(root, m[3], 3, **EXACT)
    for vid, cos in got_old:
        if vid == 3:
            assert cos < 0.999   # scored with the NEW vector


def test_delete_tombstones(root):
    m = _vecs(6, seed=5)
    incann.apply_incremental_ann(root, _ds(range(6), m), **KW)
    incann.apply_incremental_ann(root, None, deletes=[2, 4], **KW)
    got = _got_topk(root, m[2], 6, **EXACT)
    assert all(vid not in (2, 4) for vid, _ in got)
    # delete wins a same-commit tie with an insert
    incann.apply_incremental_ann(root, _ds([5], m[[5]]),
                                 deletes=[5], **KW)
    got = _got_topk(root, m[5], 6, **EXACT)
    assert all(vid != 5 for vid, _ in got)


def test_cow_hardlinks_untouched_buckets(root):
    m = _vecs(40, seed=9)
    incann.apply_incremental_ann(root, _ds(range(40), m), **KW)
    v1 = incann.current_version(root)
    incann.apply_incremental_ann(root, _ds([100], m[[0]]), **KW)
    v2 = incann.current_version(root)
    man2 = incann.read_manifest(root, v2)
    touched = set(man2["touched_buckets"])
    shared = fresh = 0
    for name in os.listdir(os.path.join(incann._vdir(root, v2),
                                        "vecs")):
        b = int(name.split("=", 1)[1])
        d2 = os.path.join(incann._vdir(root, v2), "vecs", name)
        d1 = os.path.join(incann._vdir(root, v1), "vecs", name)
        for f in os.listdir(d2):
            p2 = os.path.join(d2, f)
            p1 = os.path.join(d1, f) if os.path.isdir(d1) else None
            if p1 and os.path.exists(p1) and \
                    os.stat(p1).st_ino == os.stat(p2).st_ino:
                shared += 1
            else:
                fresh += 1
                assert b in touched     # fresh files only where touched
    assert shared > 0 and fresh >= 1


def test_compact_preserves_queries_and_folds(root):
    m, final = _commit_sequence(root, **KW)
    q = m[0]
    before = _got_topk(root, q, 5, **EXACT)
    s0 = incann.ann_fragment_stats(root)
    assert s0["live_tombstones"] > 0
    incann.compact_ann(root)
    after = _got_topk(root, q, 5, **EXACT)
    assert after == before
    s1 = incann.ann_fragment_stats(root)
    assert s1["max_fragments"] == 1
    assert s1["live_tombstones"] == 0
    chk = incann.fsck_ann(root)
    assert chk["ok"], chk["errors"]
    # dead ids are physically gone
    dead = {i for i in range(60) if i % 13 == 4}
    v = incann.current_version(root)
    import pyarrow.parquet as pq
    for f in incann._bucket_dirs(incann._vdir(root, v), "vecs"):
        assert not set(pq.read_table(f)["id"].to_pylist()) & dead


def test_gc_and_crash_orphan(root):
    m = _vecs(10)
    incann.apply_incremental_ann(root, _ds(range(10), m), **KW)
    incann.apply_incremental_ann(root, _ds([50], m[[1]]), **KW)
    # simulate crash between rename and pointer write
    incann._write_current(root, 1)
    v = incann._next_version(root)
    assert v == 3                       # skips the orphan slot
    incann.apply_incremental_ann(root, _ds([50], m[[1]]), **KW)
    assert incann.current_version(root) == 3
    deleted = incann.gc_ann(root, keep_last=1, stage_min_age_s=0.0)
    assert 2 in deleted                 # aged orphan reaped
    got = _got_topk(root, m[1], 2, **EXACT)
    assert got[0][0] in (1, 50)


def test_large_commit_path_equals_small(root, tmp_path):
    m, final = _final_corpus(50)
    ids = np.arange(50)
    big = os.path.join(str(tmp_path), "ann_big")
    for r, kwargs in ((root, KW),
                      (big, {**KW})):
        smr = 0 if r == big else 200_000
        for rr in (0, 1, 2):
            sel = ids[ids % 3 == rr]
            incann.apply_incremental_ann(
                r, _ds(sel, m[sel]), small_max_rows=smr, **kwargs)
        upd = ids[(ids % 10 == 7) & (ids >= 5)]
        incann.apply_incremental_ann(r, _ds(upd, m[upd - 5]),
                                     small_max_rows=smr, **kwargs)
        incann.apply_incremental_ann(
            r, None, deletes=ids[ids % 13 == 4].tolist(),
            small_max_rows=smr, **kwargs)
    for qi in (0, 7, 23):
        assert _got_topk(root, m[qi], 5, **EXACT) == \
            _got_topk(big, m[qi], 5, **EXACT)


def test_param_mismatch_rejected(root):
    m = _vecs(4)
    incann.apply_incremental_ann(root, _ds(range(4), m), **KW)
    with pytest.raises(ValueError, match="built with"):
        incann.apply_incremental_ann(root, _ds([9], m[[0]]),
                                     **{**KW, "seed": 99})


def test_sync_from_feed_matches_direct_index(root, tmp_path):
    """Lake -> ANN chaining: a CDC sink takes two commits (updates +
    deletes); the ANN index follows via bootstrap + change feed and
    must answer exactly like an index built directly from the sink's
    final state (same stable ids, same hash embeddings)."""
    from kettleray.io import sink
    from kettleray.ops.incdedup import stable_doc_id

    src = os.path.join(str(tmp_path), "lake")

    def _ev(ids, texts, ops, seqs):
        n = len(ids)
        return rd.from_arrow(pa.table({
            "repo": pa.array(["r0"] * n),
            "path": pa.array([f"d{i}.txt" for i in ids]),
            "commit": pa.array([f"c{s}" for s in seqs]),
            "lang": pa.array(["en"] * n),
            "content": pa.array(texts),
            "op": pa.array(ops),
            "commit_seq": pa.array(seqs, type=pa.int64())}))

    texts = [f"document body number {i} with words" for i in range(20)]
    b1 = _ev(list(range(20)), texts, ["insert"] * 20, list(range(20)))
    sink.apply_incremental_bucketed(src, b1, num_buckets=4,
                                    num_partitions=2)
    b2 = _ev([1, 2, 15], ["fully replaced body one", "", ""],
             ["update", "delete", "delete"], [20, 21, 22])
    sink.apply_incremental_bucketed(src, b2, num_buckets=4,
                                    num_partitions=2)

    skw = dict(dim=10, n_planes=4, seed=7, num_id_buckets=8,
               num_partitions=2)
    incann.sync_ann_from_feed(src, root, **skw)     # bootstrap @ v1
    incann.sync_ann_from_feed(src, root, **skw)     # feed v1 -> v2

    # direct index over the sink's final state
    st = sink.read_state(src).to_pandas()
    sid = stable_doc_id(st["repo"].tolist(), st["path"].tolist())
    emb = incann.hash_embedding(st["content"].tolist(), 10)
    direct = os.path.join(str(tmp_path), "ann_direct")
    incann.apply_incremental_ann(
        direct, rd.from_arrow(pa.table({
            "vec_id": pa.array(sid, type=pa.int64()),
            "embedding": emb})),
        id_col="vec_id", vec_col="embedding", n_planes=4, seed=7,
        num_id_buckets=8, num_partitions=2)

    q = np.asarray(emb[3].as_py())
    got = _got_topk(root, q, 5, probe_hamming=4)
    want = _got_topk(direct, q, 5, probe_hamming=4)
    assert got == want
    # deleted keys answer nowhere
    dead = set(stable_doc_id(["r0", "r0"], ["d2.txt", "d15.txt"]))
    t, _, _ = incann.query_ann(root, q, k=20, probe_hamming=4)
    assert not set(t["vec_id"].to_pylist()) & dead
    # caught-up sync is a no-op
    v = incann.current_version(root)
    incann.sync_ann_from_feed(src, root, **skw)
    assert incann.current_version(root) == v
