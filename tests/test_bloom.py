"""ops/bloom.py — vectorized string hashing, Bloom build/probe, and
the bloom-prefiltered decontaminate path (bit-identical to the exact
join plan; no false negatives by construction)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kettleray.ops import bloom, dedup


def _hash_ref(strings):
    """Per-string scalar reference of the vectorized kernel's math."""
    out = []
    for s in strings:
        b = (s or "").encode()
        with np.errstate(over="ignore"):
            acc = (np.uint64(len(b)) * bloom._C1)
            p = np.uint64(1)
            tot = np.uint64(0)
            for ch in b:
                tot += np.uint64(ch) * p
                p *= bloom._FNV_PRIME
            acc ^= tot if len(b) else np.uint64(0)
        return_val = bloom._splitmix64(np.array([acc]))[0]
        out.append(int(return_val))
    return out


def test_hash_strings_matches_scalar_reference():
    vals = ["", "a", "ab", "ba", "hello world", "hello worle",
            "x" * 300, None, "Ünïcødé ƒtw", "a b c d e f g h"]
    arr = pa.array(vals, type=pa.string())
    got = bloom.hash_strings_u64(arr).tolist()
    assert got == _hash_ref(vals)


def test_hash_strings_slice_offset_and_large_string():
    vals = ["aaa", "bbb", "", "ccc", "dd"]
    base = pa.array(vals, type=pa.string())
    sl = base.slice(1, 3)                       # non-zero arr.offset
    assert bloom.hash_strings_u64(sl).tolist() == \
        bloom.hash_strings_u64(pa.array(vals[1:4])).tolist()
    big = pa.array(vals, type=pa.large_string())
    assert bloom.hash_strings_u64(big).tolist() == \
        bloom.hash_strings_u64(base).tolist()
    chunked = pa.chunked_array([base.slice(0, 2), base.slice(2, 3)])
    assert bloom.hash_strings_u64(chunked).tolist() == \
        bloom.hash_strings_u64(base).tolist()


def test_hash_strings_distinct():
    vals = [f"gram number {i} of the set" for i in range(20_000)]
    h = bloom.hash_strings_u64(pa.array(vals))
    assert len(np.unique(h)) == len(vals)


def test_bloom_no_false_negatives_and_bounded_fp():
    members = [f"member {i}" for i in range(50_000)]
    ds = rd.from_arrow(pa.table({"gram": members}))
    flt = bloom.build_bloom(ds, "gram", bits_per_key=12)
    import ray
    bm = ray.get(flt["ref"])
    hits = bloom.bloom_probe(pa.array(members), bm,
                             flt["m_bits"], flt["k"])
    assert hits.all()                               # never a miss
    others = pa.array([f"outsider {i}" for i in range(50_000)])
    fp = bloom.bloom_probe(others, bm, flt["m_bits"], flt["k"]).mean()
    assert fp < 0.02                                # ~3e-3 expected


def test_bloom_params_guard():
    with pytest.raises(ValueError, match="not broadcast-sized"):
        bloom.bloom_params(10**9, bits_per_key=12, max_bytes=1 << 20)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string())}))


def test_decontaminate_bloom_matches_join():
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    train = _docs([(0, base), (2, "totally unrelated train words here "
                                  "nothing shared with anything"),
                   (4, base.replace("quick", "slow"))])
    ev = _docs([(1, base),                       # fully contaminated
                (3, "fresh eval only content with zero overlap in "
                    "any five gram window at all thanks"),
                (5, "the quick brown fox jumps over something else "
                    "entirely different from the train set")])
    a = dedup.decontaminate(train, ev, "text", "doc_id", n=5,
                            threshold=0.5, num_partitions=4,
                            method="join").take_all()
    b = dedup.decontaminate(train, ev, "text", "doc_id", n=5,
                            threshold=0.5, num_partitions=4,
                            method="bloom").take_all()
    key = lambda r: r["doc_id"]
    assert sorted(a, key=key) == sorted(b, key=key)
    byid = {r["doc_id"]: r for r in b}
    assert byid[1]["contaminated"] and byid[1]["contamination"] == 1.0
    assert byid[3]["n_matched"] == 0


def test_decontaminate_bloom_disjoint_corpora():
    """Bloom drops EVERY train gram (train/eval fully disjoint) — the
    all-empty-filtered-side regime must still produce the zero-hit
    result, not a zero-column-block join crash."""
    train = _docs([(0, "alpha beta gamma delta epsilon zeta eta "
                       "theta iota kappa")])
    ev = _docs([(1, "one two three four five six seven eight nine "
                    "ten eleven")])
    out = dedup.decontaminate(train, ev, "text", "doc_id", n=5,
                              threshold=0.5, num_partitions=4,
                              method="bloom").take_all()
    assert len(out) == 1
    assert out[0]["n_matched"] == 0 and not out[0]["contaminated"]
