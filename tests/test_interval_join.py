"""interval_join: stream-stream time-band join.

Covers the band-boundary cases the sf-fixture gate (events_interval_join,
exact-match vs a DuckDB BETWEEN join) cannot isolate: left rows
replicated across two bands must not emit duplicate pairs, inclusive
bounds on both ends, keys with no right rows, purely-backward and
purely-forward windows, and randomized parity vs brute force.
"""

import numpy as np
import pyarrow as pa
import ray.data

from kettleray.ops.joins import interval_join


def _pairs(lt, rt, lower, upper, by=("k",), right_cols=("rid",),
           num_partitions=4):
    out = interval_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        by=list(by), on="ts", lower=lower, upper=upper,
        right_cols=list(right_cols),
        num_partitions=num_partitions).take_all()
    return sorted((r["lid"], r["rid"]) for r in out)


def _brute(lt, rt, lower, upper):
    lk, lts, lid = (lt[c].to_numpy() for c in ("k", "ts", "lid"))
    rk, rts, rid = (rt[c].to_numpy() for c in ("k", "ts", "rid"))
    want = []
    for i in range(len(lid)):
        m = (rk == lk[i]) & (rts >= lts[i] + lower) & \
            (rts <= lts[i] + upper)
        want.extend((lid[i], rid[j]) for j in np.nonzero(m)[0])
    return sorted(want)


def test_interval_join_hand_checked_inclusive_bounds():
    lt = pa.table({"k": pa.array([1, 1], type=pa.int64()),
                   "ts": pa.array([100, 200], type=pa.int64()),
                   "lid": pa.array([0, 1], type=pa.int64())})
    rt = pa.table({"k": pa.array([1, 1, 1, 2], type=pa.int64()),
                   "ts": pa.array([90, 100, 111, 100], type=pa.int64()),
                   "rid": pa.array([0, 1, 2, 3], type=pa.int64())})
    # backward window [ts-10, ts]: both endpoints inclusive
    assert _pairs(lt, rt, -10, 0) == [(0, 0), (0, 1)]
    # symmetric window [ts-11, ts+11] picks up rid=2 at 111
    assert _pairs(lt, rt, -11, 11) == [(0, 0), (0, 1), (0, 2)]
    # key 2's right row never matches key 1 lefts
    assert all(p[1] != 3 for p in _pairs(lt, rt, -1000, 1000))


def test_interval_join_band_replication_no_duplicates():
    # window span 100 -> band width 100; left at ts=150 with window
    # [100, 250] straddles bands 1 and 2: the pair for a right row in
    # each band must appear EXACTLY once
    lt = pa.table({"k": pa.array([7], type=pa.int64()),
                   "ts": pa.array([150], type=pa.int64()),
                   "lid": pa.array([0], type=pa.int64())})
    rt = pa.table({"k": pa.array([7, 7, 7], type=pa.int64()),
                   "ts": pa.array([120, 199, 201], type=pa.int64()),
                   "rid": pa.array([0, 1, 2], type=pa.int64())})
    assert _pairs(lt, rt, -50, 51) == [(0, 0), (0, 1), (0, 2)]


def test_interval_join_no_right_rows_for_key():
    lt = pa.table({"k": pa.array([1, 2], type=pa.int64()),
                   "ts": pa.array([10, 10], type=pa.int64()),
                   "lid": pa.array([0, 1], type=pa.int64())})
    rt = pa.table({"k": pa.array([2], type=pa.int64()),
                   "ts": pa.array([10], type=pa.int64()),
                   "rid": pa.array([0], type=pa.int64())})
    assert _pairs(lt, rt, -5, 5) == [(1, 0)]


def test_interval_join_forward_and_detached_windows():
    rng = np.random.RandomState(11)
    lt = pa.table({"k": rng.randint(0, 4, 120).astype("int64"),
                   "ts": rng.randint(0, 500, 120).astype("int64"),
                   "lid": np.arange(120, dtype="int64")})
    rt = pa.table({"k": rng.randint(0, 4, 150).astype("int64"),
                   "ts": rng.randint(0, 500, 150).astype("int64"),
                   "rid": np.arange(150, dtype="int64")})
    for lower, upper in [(0, 40), (-40, 0), (60, 120), (-120, -60),
                         (-7, 7)]:
        assert _pairs(lt, rt, lower, upper) == \
            _brute(lt, rt, lower, upper), (lower, upper)


def test_interval_join_randomized_vs_brute():
    rng = np.random.RandomState(5)
    lt = pa.table({"k": rng.randint(0, 10, 300).astype("int64"),
                   "ts": rng.randint(0, 2000, 300).astype("int64"),
                   "lid": np.arange(300, dtype="int64")})
    rt = pa.table({"k": rng.randint(0, 10, 400).astype("int64"),
                   "ts": rng.randint(0, 2000, 400).astype("int64"),
                   "rid": np.arange(400, dtype="int64")})
    assert _pairs(lt, rt, -63, 15) == _brute(lt, rt, -63, 15)


def test_interval_join_timestamp_on_column_and_suffix():
    lt = pa.table({
        "k": pa.array([1], type=pa.int64()),
        "ts": pa.array([1_000_000], type=pa.timestamp("us")),
        "lid": pa.array([0], type=pa.int64())})
    rt = pa.table({
        "k": pa.array([1, 1], type=pa.int64()),
        "ts": pa.array([400_000, 2_000_000], type=pa.timestamp("us")),
        "rid": pa.array([0, 1], type=pa.int64())})
    out = interval_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        by=["k"], on="ts", lower=-700_000, upper=0,
        right_cols=["rid", "ts"], num_partitions=2).take_all()
    assert len(out) == 1 and out[0]["rid"] == 0
    # right's clashing column name picked up the suffix
    assert "ts_r" in out[0]


def test_interval_join_lower_gt_upper_raises():
    import pytest
    lt = ray.data.from_arrow(pa.table(
        {"k": pa.array([1], type=pa.int64()),
         "ts": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError):
        interval_join(lt, lt, by=["k"], on="ts", lower=5, upper=-5,
                      right_cols=[])


def test_interval_join_left_outer_nulls_and_no_dups():
    lt = pa.table({"k": pa.array([1, 1, 2], type=pa.int64()),
                   "ts": pa.array([100, 500, 100], type=pa.int64()),
                   "lid": pa.array([0, 1, 2], type=pa.int64())})
    rt = pa.table({"k": pa.array([1], type=pa.int64()),
                   "ts": pa.array([95], type=pa.int64()),
                   "rid": pa.array([7], type=pa.int64())})
    out = interval_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        by=["k"], on="ts", lower=-10, upper=0,
        right_cols=["rid"], num_partitions=4, how="left").take_all()
    got = sorted((r["lid"], r["rid"]) for r in out)
    # lid 0 matched; lids 1 (window miss) and 2 (no rights for key)
    # survive exactly once with null rid
    assert got == [(0, 7), (1, None), (2, None)]


def test_interval_join_left_cross_band_match_not_duplicated():
    """A left row whose window straddles two bands and matches ONLY in
    its second band must NOT also emit a null candidate row (the
    anti-join must see the cross-band match)."""
    # span 100 -> band width 100. left ts=150, window [100, 250]:
    # bands 1 and 2. right at 201 sits in band 2 (the dup copy's band).
    lt = pa.table({"k": pa.array([7], type=pa.int64()),
                   "ts": pa.array([150], type=pa.int64()),
                   "lid": pa.array([0], type=pa.int64())})
    rt = pa.table({"k": pa.array([7], type=pa.int64()),
                   "ts": pa.array([201], type=pa.int64()),
                   "rid": pa.array([3], type=pa.int64())})
    out = interval_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        by=["k"], on="ts", lower=-50, upper=100,
        right_cols=["rid"], num_partitions=4, how="left").take_all()
    assert sorted((r["lid"], r["rid"]) for r in out) == [(0, 3)]


def test_interval_join_left_randomized_vs_brute():
    rng = np.random.RandomState(21)
    lt = pa.table({"k": rng.randint(0, 8, 200).astype("int64"),
                   "ts": rng.randint(0, 1500, 200).astype("int64"),
                   "lid": np.arange(200, dtype="int64")})
    rt = pa.table({"k": rng.randint(0, 8, 250).astype("int64"),
                   "ts": rng.randint(0, 1500, 250).astype("int64"),
                   "rid": np.arange(250, dtype="int64")})
    for lower, upper in [(-40, 0), (-25, 25), (30, 90)]:
        out = interval_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            by=["k"], on="ts", lower=lower, upper=upper,
            right_cols=["rid"], num_partitions=4, how="left").take_all()
        got = sorted([(r["lid"], r["rid"]) for r in out],
                     key=lambda p: (p[0], -1 if p[1] is None else p[1]))
        want = _brute(lt, rt, lower, upper)
        matched_lids = {p[0] for p in want}
        want += [(i, None) for i in range(200) if i not in matched_lids]
        want = sorted(want,
                      key=lambda p: (p[0], -1 if p[1] is None else p[1]))
        assert got == want, (lower, upper)


def test_interval_join_bad_how_raises():
    import pytest
    lt = ray.data.from_arrow(pa.table(
        {"k": pa.array([1], type=pa.int64()),
         "ts": pa.array([1], type=pa.int64())}))
    with pytest.raises(ValueError):
        interval_join(lt, lt, by=["k"], on="ts", lower=0, upper=1,
                      right_cols=[], how="full")


def test_interval_join_salted_identical_output():
    """salt>1 splits each (key, band)'s rights across sub-partitions
    and replicates lefts — output must be IDENTICAL to unsalted, for
    both inner and left-outer (no duplicate pairs, no duplicate null
    rows)."""
    rng = np.random.RandomState(33)
    # one celebrity key (0) holding most rows — the salting target
    lk = np.where(rng.rand(200) < 0.7, 0, rng.randint(1, 5, 200))
    rk = np.where(rng.rand(300) < 0.7, 0, rng.randint(1, 5, 300))
    lt = pa.table({"k": lk.astype("int64"),
                   "ts": rng.randint(0, 800, 200).astype("int64"),
                   "lid": np.arange(200, dtype="int64")})
    rt = pa.table({"k": rk.astype("int64"),
                   "ts": rng.randint(0, 800, 300).astype("int64"),
                   "rid": np.arange(300, dtype="int64")})
    for how in ("inner", "left"):
        plain = interval_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            by=["k"], on="ts", lower=-30, upper=10,
            right_cols=["rid"], num_partitions=4, how=how).take_all()
        salted = interval_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            by=["k"], on="ts", lower=-30, upper=10,
            right_cols=["rid"], num_partitions=4, how=how,
            salt=4).take_all()
        key = lambda p: (p[0], -1 if p[1] is None else p[1])
        assert sorted([(r["lid"], r["rid"]) for r in plain], key=key) \
            == sorted([(r["lid"], r["rid"]) for r in salted], key=key), how
