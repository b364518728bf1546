"""Running-window aggregates + ROLLUP/CUBE grouping sets vs DuckDB.

Covers what the sf-table gate queries can't: nulls in the aggregated
column (SQL skip-null semantics, NULL until first non-null), integer
min/max through the segmented log-doubling scan (dtype-exact), and a
NULL key value in a rollup (natural-NULL group at gid=0 vs rolled-up
NULL at gid>0 stay distinct rows).
"""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from kettleray.ops import aggregates as ag


def _cmp(ds, sql, tbl):
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    odf = con.execute(sql).fetchdf()
    df = ds.to_pandas()
    cols = sorted(df.columns)
    assert cols == sorted(odf.columns), (cols, sorted(odf.columns))
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                  check_exact=False, rtol=1e-9)


def _nullable_tbl():
    rng = np.random.RandomState(7)
    n = 500
    g = rng.randint(0, 8, n)
    o = np.arange(n)                       # tie-free order key
    x = rng.randint(-50, 50, n).astype(np.int64)
    mask = rng.rand(n) < 0.3               # 30% nulls, incl. group heads
    return pa.table({
        "g": pa.array(g, type=pa.int64()),
        "o": pa.array(o, type=pa.int64()),
        "x": pa.array(x, mask=mask),
    })


def test_running_aggregate_null_semantics(ray_session):
    tbl = _nullable_tbl()
    ds = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [("x", "sum", "rs"), ("x", "count", "rc"),
         ("x", "min", "rmin"), ("x", "max", "rmax"),
         ("x", "mean", "rmean"), (None, "row_number", "rn")],
        num_partitions=4)
    _cmp(ds,
         "SELECT g, o, x, SUM(x) OVER w AS rs, COUNT(x) OVER w AS rc, "
         "MIN(x) OVER w AS rmin, MAX(x) OVER w AS rmax, "
         "AVG(x) OVER w AS rmean, ROW_NUMBER() OVER w AS rn FROM t "
         "WINDOW w AS (PARTITION BY g ORDER BY o ROWS BETWEEN "
         "UNBOUNDED PRECEDING AND CURRENT ROW)", tbl)


def test_running_min_max_int_exact(ray_session):
    # large int64 values that would lose precision through float64
    big = 2**62
    tbl = pa.table({
        "g": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "o": pa.array([1, 2, 3, 1, 2], type=pa.int64()),
        "x": pa.array([big + 3, big + 1, big + 2, big + 9, big + 8],
                      type=pa.int64()),
    })
    out = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [("x", "min", "rmin"), ("x", "max", "rmax")],
        num_partitions=2).to_pandas().sort_values(["g", "o"])
    assert out["rmin"].tolist() == [big + 3, big + 1, big + 1,
                                    big + 9, big + 8]
    assert out["rmax"].tolist() == [big + 3, big + 3, big + 3,
                                    big + 9, big + 9]
    assert out["rmin"].dtype == np.int64


def test_rank_dense_rank_ties(ray_session):
    tbl = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3),
        "o": pa.array([10, 10, 20, 20, 30, 5, 5, 5], type=pa.int64()),
        "i": pa.array(list(range(8)), type=pa.int64()),
    })
    ds = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [(None, "rank", "rk"), (None, "dense_rank", "drk")],
        num_partitions=2)
    _cmp(ds,
         "SELECT g, o, i, RANK() OVER w AS rk, "
         "DENSE_RANK() OVER w AS drk FROM t "
         "WINDOW w AS (PARTITION BY g ORDER BY o)", tbl)


def test_rollup_with_null_key(ray_session):
    tbl = pa.table({
        "k1": pa.array(["x", "x", None, None, "y"]),
        "k2": pa.array(["p", "q", "p", "p", None]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
    })
    ds = ag.rollup_aggregate(
        ray.data.from_arrow(tbl), ["k1", "k2"],
        [ag.Agg("v", "sum", "sv"), ag.Agg(None, "count", "n"),
         ag.Agg("v", "avg", "av")])
    _cmp(ds,
         "SELECT k1, k2, GROUPING(k1, k2) AS grouping_id, "
         "SUM(v) AS sv, COUNT(*) AS n, AVG(v) AS av FROM t "
         "GROUP BY ROLLUP (k1, k2)", tbl)


def test_cube_matches_duckdb(ray_session):
    rng = np.random.RandomState(3)
    n = 300
    tbl = pa.table({
        "k1": pa.array(rng.choice(["a", "b", "c"], n)),
        "k2": pa.array(rng.randint(0, 4, n), type=pa.int64()),
        "v": pa.array(rng.randint(0, 100, n).astype(np.int64)),
    })
    ds = ag.cube_aggregate(
        ray.data.from_arrow(tbl), ["k1", "k2"],
        [ag.Agg("v", "min", "mn"), ag.Agg("v", "max", "mx"),
         ag.Agg("v", "sum", "sv")])
    _cmp(ds,
         "SELECT k1, k2, GROUPING(k1, k2) AS grouping_id, "
         "MIN(v) AS mn, MAX(v) AS mx, "
         "CAST(SUM(v) AS BIGINT) AS sv FROM t "
         "GROUP BY CUBE (k1, k2)", tbl)


def test_moving_frame_and_distribution_fns(ray_session):
    tbl = _nullable_tbl()
    ds = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [("x", "sum", "ms", 7), ("x", "count", "mc", 7),
         ("x", "mean", "ma", 7), ("x", "first_value", "fv"),
         (None, "percent_rank", "prk"), (None, "cume_dist", "cd"),
         (None, "ntile", "t4", 4)],
        num_partitions=4)
    _cmp(ds,
         "SELECT g, o, x, SUM(x) OVER w7 AS ms, COUNT(x) OVER w7 AS "
         "mc, AVG(x) OVER w7 AS ma, FIRST_VALUE(x) OVER wu AS fv, "
         "PERCENT_RANK() OVER (PARTITION BY g ORDER BY o) AS prk, "
         "CUME_DIST() OVER (PARTITION BY g ORDER BY o) AS cd, "
         "NTILE(4) OVER (PARTITION BY g ORDER BY o) AS t4 FROM t "
         "WINDOW w7 AS (PARTITION BY g ORDER BY o ROWS BETWEEN 6 "
         "PRECEDING AND CURRENT ROW), wu AS (PARTITION BY g ORDER BY "
         "o ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", tbl)


def test_ntile_more_tiles_than_rows(ray_session):
    tbl = pa.table({"g": pa.array([1, 1, 2], type=pa.int64()),
                    "o": pa.array([1, 2, 1], type=pa.int64())})
    out = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [(None, "ntile", "t5", 5)],
        num_partitions=2).to_pandas().sort_values(["g", "o"])
    assert out["t5"].tolist() == [1, 2, 1]


def test_multi_column_order_ties(ray_session):
    # ties on o1 broken by o2; rank ties = equal FULL (o1, o2) tuple
    tbl = pa.table({
        "g": pa.array([1] * 6, type=pa.int64()),
        "o1": pa.array([10, 10, 10, 20, 20, 30], type=pa.int64()),
        "o2": pa.array([2, 1, 2, 1, 1, 1], type=pa.int64()),
        "x": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    ds = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], ["o1", "o2"],
        [(None, "rank", "rk"), (None, "dense_rank", "drk"),
         ("x", "sum", "rs")],
        num_partitions=2)
    _cmp(ds,
         "SELECT g, o1, o2, x, RANK() OVER w AS rk, "
         "DENSE_RANK() OVER w AS drk, SUM(x) OVER (PARTITION BY g "
         "ORDER BY o1, o2 ROWS BETWEEN UNBOUNDED PRECEDING AND "
         "CURRENT ROW) AS rs FROM t "
         "WINDOW w AS (PARTITION BY g ORDER BY o1, o2)", tbl)


def test_sliding_min_max_kernel_bruteforce():
    # pure-numpy kernel check: random segments, every frame width
    rng = np.random.RandomState(11)
    for trial in range(20):
        n = rng.randint(1, 120)
        segs = np.sort(rng.choice(np.arange(1, n), size=min(
            rng.randint(0, 6), n - 1), replace=False)) if n > 1 \
            else np.array([], dtype=int)
        bounds = np.concatenate([[0], segs, [n]]).astype(np.int64)
        seg_begin_idx = np.zeros(n, dtype=np.int64)
        pos = np.zeros(n, dtype=np.int64)
        for a, b in zip(bounds[:-1], bounds[1:]):
            seg_begin_idx[a:b] = a
            pos[a:b] = np.arange(b - a)
        x = rng.randint(-1000, 1000, n).astype(np.int64)
        for w in (1, 2, 3, 5, 8, 64):
            for op, red in ((np.minimum, min), (np.maximum, max)):
                got = ag._sliding_min_max(x, pos, seg_begin_idx, w, op)
                want = np.array([
                    red(x[max(i - w + 1, seg_begin_idx[i]):i + 1])
                    for i in range(n)])
                assert (got == want).all(), (trial, w, op)


def test_moving_min_max_nth_value_vs_duckdb(ray_session):
    tbl = _nullable_tbl()
    ds = ag.running_aggregate(
        ray.data.from_arrow(tbl), ["g"], "o",
        [("x", "min", "mmin", 6), ("x", "max", "mmax", 6),
         ("x", "nth_value", "n3", 3)],
        num_partitions=4)
    _cmp(ds,
         "SELECT g, o, x, MIN(x) OVER w6 AS mmin, "
         "MAX(x) OVER w6 AS mmax, "
         "NTH_VALUE(x, 3) OVER wu AS n3 FROM t WINDOW "
         "w6 AS (PARTITION BY g ORDER BY o ROWS BETWEEN 5 PRECEDING "
         "AND CURRENT ROW), wu AS (PARTITION BY g ORDER BY o ROWS "
         "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", tbl)
