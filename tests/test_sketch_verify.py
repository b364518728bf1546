"""Sketch-join verify: the shared scoring kernel and the one-pass
dedup_corpus path (sign once -> band pairs + sketch verify).

Covers kettleray/ops/dedup.py::pairwise_sketch_jaccard /
sign_sketches / dedup_corpus(verify_method="sketch") — the round-4
rework that removed corpus text from the verify phase (reference
near-dup semantics per SURVEY.md §2 LLM-ops; no Kettle counterpart).
"""
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from kettleray.ops import dedup


def _pack(arrs):
    return pa.array([a.astype("<u8").tobytes() for a in arrs],
                    type=pa.binary())


def test_pairwise_sketch_jaccard_matches_set_ops():
    rng = np.random.RandomState(7)
    A = [np.unique(rng.randint(0, 300, rng.randint(1, 50))
                   .astype(np.uint64)) for _ in range(500)]
    B = [np.unique(rng.randint(0, 300, rng.randint(1, 50))
                   .astype(np.uint64)) for _ in range(500)]
    jac = dedup.pairwise_sketch_jaccard(_pack(A), _pack(B))
    ref = np.array([
        len(set(a.tolist()) & set(b.tolist())) /
        max(len(set(a.tolist()) | set(b.tolist())), 1)
        for a, b in zip(A, B)])
    assert np.allclose(jac, ref)


def test_pairwise_sketch_jaccard_edges():
    # identical, disjoint, and empty-vs-empty sketches
    a = np.array([1, 2, 3], np.uint64)
    b = np.array([4, 5], np.uint64)
    e = np.empty(0, np.uint64)
    jac = dedup.pairwise_sketch_jaccard(_pack([a, a, e]),
                                        _pack([a, b, e]))
    assert jac.tolist() == [1.0, 0.0, 0.0]
    assert dedup.pairwise_sketch_jaccard(
        pa.array([], type=pa.binary()),
        pa.array([], type=pa.binary())).size == 0


def test_pairwise_sketch_jaccard_sliced_input():
    # the kernel reads Arrow buffers directly — a sliced (offset != 0)
    # array must not misread neighbouring rows' bytes
    a = np.array([1, 2, 3], np.uint64)
    b = np.array([2, 3, 4], np.uint64)
    col = _pack([a, b, a, b])
    jac = dedup.pairwise_sketch_jaccard(col.slice(2), col.slice(0, 2))
    assert np.allclose(jac, [1.0, 1.0])


def _corpus():
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon")
    texts = [base,
             base.replace("iota", "iota2"),           # near-dup of 0
             "completely different text about rivers and mountains",
             base.replace("beta", "beta2"),           # near-dup of 0
             "another unrelated doc mentioning engines and pipelines",
             "short"]
    return ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))


def test_jaccard_verify_sketch_matches_join():
    docs = _corpus()
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                    num_perm=64, bands=32, shingle_k=2,
                                    num_partitions=2).materialize()

    def rows(ds):
        return sorted((r["doc_a"], r["doc_b"],
                       round(r["jaccard"], 12)) for r in ds.take_all())

    jn = rows(dedup.jaccard_verify(pairs, docs, "doc_id", "text",
                                   shingle_k=2, threshold=0.3,
                                   method="join", num_partitions=2))
    sk = rows(dedup.jaccard_verify(pairs, docs, "doc_id", "text",
                                   shingle_k=2, threshold=0.3,
                                   method="sketch", num_partitions=2))
    assert jn == sk and len(sk) > 0


def test_dedup_corpus_sketch_matches_join_mode():
    docs = _corpus()
    kw = dict(num_perm=64, bands=32, shingle_k=2, threshold=0.5,
              num_partitions=2)
    a = sorted(r["doc_id"] for r in dedup.dedup_corpus(
        docs, "doc_id", "text", verify_method="join", **kw).take_all())
    b = sorted(r["doc_id"] for r in dedup.dedup_corpus(
        docs, "doc_id", "text", verify_method="sketch", **kw).take_all())
    assert a == b
    assert 0 in b and 1 not in b and 3 not in b   # near-dups dropped


def test_sign_sketches_schema_and_counts():
    docs = _corpus()
    t = pa.concat_tables(ray.get(dedup.sign_sketches(
        docs, "doc_id", "text", num_perm=32, shingle_k=2,
        bands=16).to_arrow_refs()))
    assert t.column_names == ["doc_id", "bh", "sh", "n_sh"]
    n_sh = t["n_sh"].to_pylist()
    sh = t["sh"].to_pylist()
    assert all(len(b) == 8 * n for b, n in zip(sh, n_sh))
    # every sketch is sorted distinct
    for b in sh:
        v = np.frombuffer(b, np.uint64)
        assert (np.diff(v) > 0).all()


def test_string_ids_rejected_at_api_edge():
    # the MinHash-LSH family's pair wire format is int64; a string id
    # column must fail fast with a clear message, not deep in a task
    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["d0", "d1"], "text": ["a b c", "a b d"]}))
    with pytest.raises(ValueError, match="must be integer"):
        dedup.dedup_corpus(docs, "doc_id", "text", num_partitions=2)


def test_jaccard_verify_sketch_string_ids_fall_back_to_join():
    # jaccard_verify itself supports string ids on the text-join path;
    # method='sketch' must silently route them there
    docs = ray.data.from_arrow(pa.table({
        "doc_id": ["d0", "d1"],
        "text": ["alpha beta gamma delta", "alpha beta gamma zz"]}))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": ["d0"], "doc_b": ["d1"]}))
    out = dedup.jaccard_verify(pairs, docs, "doc_id", "text",
                               shingle_k=2, threshold=0.1,
                               method="sketch",
                               num_partitions=2).take_all()
    assert len(out) == 1 and out[0]["doc_a"] == "d0"


def test_minhash_signatures_unique_gram_path_bit_identical():
    """A gram-repetitive block takes the unique-gram gather path in
    MinHasher.signatures (permute each distinct gram once); signatures
    must stay bit-identical to an independent per-doc brute compute."""
    import hashlib
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = [base + f" tail{i % 7}" for i in range(500)]
    batch = pa.table({"doc_id": list(range(500)), "text": texts})
    mh = dedup.MinHasher("doc_id", "text", 64, 3, 16)
    sig = mh.signatures(batch)

    M = np.uint64((1 << 61) - 1)

    def ref(text):
        toks = text.lower().split()
        th = np.array([int.from_bytes(hashlib.blake2b(
            w.encode(), digest_size=8).digest(), "little")
            for w in toks], dtype=np.uint64)
        roll = np.uint64(0x100000001B3) ** np.arange(3, dtype=np.uint64)
        with np.errstate(over="ignore"):
            sh = np.zeros(len(th) - 2, dtype=np.uint64)
            for j in range(3):
                sh += th[j:len(th) - 2 + j] * roll[j]
            V = sh[:, None] * mh.a[None, :] + mh.b[None, :]
            V = (V & M) + (V >> np.uint64(61))
            V = np.where(V >= M, V - M, V)
        return V.min(axis=0)

    for d in (0, 3, 250, 499):
        assert np.array_equal(sig[d], ref(texts[d]))


def test_sign_sketches_without_bands_identical_sketches():
    """with_bands=False (the verify-only fast path) must emit exactly
    the same sh/n_sh payload as the full signer — minus the bh column
    and minus the signature-matrix compute it skips."""
    docs = _corpus()
    full = pa.concat_tables(ray.get(dedup.sign_sketches(
        docs, "doc_id", "text", num_perm=32, shingle_k=2,
        bands=16).to_arrow_refs()))
    lean = pa.concat_tables(ray.get(dedup.sign_sketches(
        docs, "doc_id", "text", num_perm=32, shingle_k=2,
        bands=16, with_bands=False).to_arrow_refs()))
    assert lean.column_names == ["doc_id", "sh", "n_sh"]
    fo = full.sort_by("doc_id")
    lo = lean.sort_by("doc_id")
    assert fo["doc_id"].to_pylist() == lo["doc_id"].to_pylist()
    assert fo["sh"].to_pylist() == lo["sh"].to_pylist()
    assert fo["n_sh"].to_pylist() == lo["n_sh"].to_pylist()
