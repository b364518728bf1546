"""Mergeable sketches: HLL distinct + DDSketch quantiles.

The load-bearing property for a distributed engine is DETERMINISTIC
MERGE: sketch(A ∪ B) must equal merge(sketch(A), sketch(B)) exactly,
so results are invariant to partitioning / arrival order — same bar as
the CDC kernels. Accuracy bounds are checked against exact answers.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.ops.sketches import (DDSketch, HLL, MisraGries,
                                    approx_distinct, approx_distinct_by,
                                    approx_heavy_hitters, approx_quantiles)


def _strings(n, distinct, seed=7):
    rng = np.random.default_rng(seed)
    return pa.array([f"v{int(i)}" for i in rng.integers(0, distinct, n)])


# -- HLL ------------------------------------------------------------------

def test_hll_accuracy_p14():
    col = pa.array([f"k{i}" for i in range(100_000)])
    est = HLL(14).update_column(col).estimate()
    assert abs(est - 100_000) / 100_000 < 0.025      # ~3 sigma at p=14


def test_hll_merge_is_exact_and_partition_invariant():
    col = _strings(50_000, 9_000)
    whole = HLL(12).update_column(col)
    merged = HLL(12)
    for piece in (col[:13_000], col[13_000:20_000], col[20_000:]):
        merged.merge(HLL(12).update_column(piece))
    assert whole.to_bytes() == merged.to_bytes()     # bit-for-bit
    # reversed merge order too
    rev = HLL(12)
    for piece in (col[20_000:], col[13_000:20_000], col[:13_000]):
        rev.merge(HLL(12).update_column(piece))
    assert rev.to_bytes() == whole.to_bytes()


def test_hll_serialization_roundtrip():
    h = HLL(10).update_column(_strings(5_000, 700))
    h2 = HLL.from_bytes(h.to_bytes())
    assert h2.p == 10 and np.array_equal(h.reg, h2.reg)
    assert h2.estimate() == h.estimate()


def test_hll_nulls_and_empty():
    h = HLL(10).update_column(pa.array([None, None], pa.string()))
    assert h.estimate() == 0.0
    h.update_column(pa.array(["a", None, "b", "a"]))
    assert round(h.estimate()) == 2


# -- DDSketch ---------------------------------------------------------------

def test_ddsketch_relative_error_bound():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(3.0, 2.0, 200_000)
    sk = DDSketch(alpha=0.01).update_values(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999):
        true = np.quantile(vals, q)
        est = sk.quantile(q)
        assert abs(est - true) <= 0.0101 * abs(true), (q, est, true)


def test_ddsketch_negative_zero_mixed():
    vals = np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0])
    sk = DDSketch(0.01).update_values(vals)
    assert sk.count == 6
    assert sk.quantile(0.0) < -99
    assert sk.quantile(0.5) == 0.0
    assert abs(sk.quantile(1.0) - 100) <= 1.01


def test_ddsketch_merge_bitwise_deterministic():
    rng = np.random.default_rng(11)
    vals = rng.normal(0, 50, 30_000)
    whole = DDSketch(0.02).update_values(vals)
    m = DDSketch(0.02)
    for chunk in np.array_split(vals, 7):
        m.merge(DDSketch(0.02).update_values(chunk))
    assert m.to_bytes() == whole.to_bytes()
    rt = DDSketch.from_bytes(whole.to_bytes())
    assert rt.to_bytes() == whole.to_bytes()


# -- Misra-Gries ------------------------------------------------------------

def test_misra_gries_guarantee_and_bound():
    # one hot key at 30%, tail of 10k cold keys
    rng = np.random.default_rng(17)
    n = 50_000
    hot = np.array(["HOT"] * (n * 3 // 10))
    cold = np.array([f"c{i}" for i in rng.integers(0, 10_000, n - len(hot))])
    vals = np.concatenate([hot, cold])
    rng.shuffle(vals)
    col = pa.array(vals)
    mg = MisraGries(64)
    # feed in 5 chunks to exercise incremental shrink
    for chunk in np.array_split(np.arange(len(vals)), 5):
        mg.update_column(col.take(pa.array(chunk)))
    assert mg.n == n
    hh = mg.heavy_hitters(min_share=0.1)
    assert set(hh) == {"HOT"}
    true = len(hot)
    assert hh["HOT"] <= true <= hh["HOT"] + mg.error_bound()


def test_misra_gries_merge_keeps_guarantee_any_order():
    rng = np.random.default_rng(4)
    vals = pa.array([f"k{i}" for i in rng.zipf(1.5, 20_000) if i < 500])
    parts = [vals[i::4] for i in range(4)]
    import itertools
    for perm in itertools.permutations(range(4)):
        m = MisraGries(32)
        for i in perm:
            m.merge(MisraGries(32).update_column(parts[i]))
        hh = m.heavy_hitters(min_share=0.05)
        assert "k1" in hh                    # zipf head is ~30%+
        assert m.error_bound() <= m.n / 33 + 1e-9


def test_approx_heavy_hitters_dataset():
    n = 30_000
    rng = np.random.default_rng(9)
    repo = np.where(rng.random(n) < 0.4, "hot_repo",
                    np.array([f"r{i}" for i in rng.integers(0, 3_000, n)]))
    t = pa.table({"repo": pa.array(repo),
                  "path": pa.array(["p"] * n)})
    ds = ray.data.from_arrow(t).repartition(6)
    hh = approx_heavy_hitters(ds, "repo", k=128, min_share=0.2)
    assert set(hh) == {"hot_repo"}
    true = int((repo == "hot_repo").sum())
    assert hh["hot_repo"] <= true


# -- Dataset operators --------------------------------------------------------

def _events_ds(n=40_000, repos=5, paths=400, seed=5):
    rng = np.random.default_rng(seed)
    t = pa.table({
        "repo": pa.array([f"r{i}" for i in rng.integers(0, repos, n)]),
        "path": pa.array([f"p{i}" for i in rng.integers(0, paths, n)]),
        "size": pa.array(rng.lognormal(6, 1.5, n)),
    })
    return ray.data.from_arrow(t).repartition(8), t


def test_approx_distinct_dataset():
    ds, t = _events_ds()
    exact = len(set(zip(t["repo"].to_pylist(), t["path"].to_pylist())))
    est = approx_distinct(ds, ["repo", "path"], p=14)
    assert abs(est - exact) / exact < 0.03


def test_approx_quantiles_dataset():
    ds, t = _events_ds()
    vals = t["size"].to_numpy()
    got = approx_quantiles(ds, "size", [0.5, 0.95], alpha=0.01)
    for est, q in zip(got, (0.5, 0.95)):
        true = np.quantile(vals, q)
        assert abs(est - true) <= 0.011 * true


def test_approx_distinct_by_group():
    ds, t = _events_ds()
    out = {r["repo"]: r["approx_distinct"]
           for r in approx_distinct_by(ds, "repo", "path", p=12)
           .take_all()}
    df = t.to_pandas()
    exact = df.groupby("repo")["path"].nunique()
    assert set(out) == set(exact.index)
    for repo, ex in exact.items():
        assert abs(out[repo] - ex) / ex < 0.06, (repo, out[repo], ex)


def test_approx_quantiles_by_group():
    from kettleray.ops.sketches import approx_quantiles_by
    ds, t = _events_ds()
    qs = [0.1, 0.5, 0.9]
    out = {(r["repo"], r["q"]): r["approx_q"]
           for r in approx_quantiles_by(ds, "repo", "size", qs,
                                        alpha=0.01).take_all()}
    df = t.to_pandas()
    for repo, sub in df.groupby("repo"):
        vals = np.sort(sub["size"].to_numpy())
        n = len(vals)
        for q in qs:
            # DDSketch rank convention: element at floor(q*(n-1))
            true = vals[int(np.floor(q * (n - 1)))]
            est = out[(repo, q)]
            assert abs(est - true) <= 0.0101 * abs(true), (repo, q)


def test_approx_quantiles_by_partition_invariant():
    """Same rows, different partitioning -> bitwise-identical results
    (DDSketch merge is deterministic; group reduce merges per key)."""
    from kettleray.ops.sketches import approx_quantiles_by
    _, t = _events_ds(n=8_000)
    a = ray.data.from_arrow(t).repartition(3)
    b = ray.data.from_arrow(t).repartition(11)
    qs = [0.25, 0.75]
    ra = sorted((r["repo"], r["q"], r["approx_q"])
                for r in approx_quantiles_by(a, "repo", "size", qs)
                .take_all())
    rb = sorted((r["repo"], r["q"], r["approx_q"])
                for r in approx_quantiles_by(b, "repo", "size", qs)
                .take_all())
    assert ra == rb


def test_approx_quantiles_by_nulls_dropped():
    from kettleray.ops.sketches import approx_quantiles_by
    t = pa.table({"g": ["a"] * 4 + ["b"] * 4,
                  "v": [1.0, None, 3.0, None, 10.0, 20.0, None, 40.0]})
    ds = ray.data.from_arrow(t).repartition(2)
    out = {(r["g"], r["q"]): r["approx_q"]
           for r in approx_quantiles_by(ds, "g", "v", [0.5]).take_all()}
    # group a non-null values [1, 3]: rank floor(0.5*1) = 0 -> 1.0
    assert abs(out[("a", 0.5)] - 1.0) <= 0.0101
    # group b non-null values [10, 20, 40]: rank 1 -> 20.0
    assert abs(out[("b", 0.5)] - 20.0) <= 0.0101 * 20.0
