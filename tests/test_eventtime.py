"""Event-time tumbling windows: watermark advance, exactly-once
finalization, late routing, redelivery fence, crash-orphan skip."""
import os

import pyarrow as pa
import pytest
import ray

from kettleray.ops import eventtime as et

W = 10          # window_s
L = 5           # lateness_s


def _ev(rows):
    """rows: (ts_seconds, key, value)"""
    return ray.data.from_arrow(pa.table({
        "ts": pa.array([int(r[0]) * 1_000_000 for r in rows], pa.int64()),
        "k": [r[1] for r in rows],
        "value": pa.array([float(r[2]) for r in rows]),
    }))


def _ingest(root, rows, batch_id=None):
    return et.ingest(root, _ev(rows), time_col="ts", window_s=W,
                     lateness_s=L, group_cols=("k",),
                     aggs={"n": ("count", None),
                           "sum_value": ("sum", "value")},
                     batch_id=batch_id)


def _fin(root):
    ds = et.finalized(root)
    return sorted((r["k"], r["window_start"] // 1_000_000, r["n"],
                   r["sum_value"]) for r in (ds.take_all() if ds else []))


def test_windows_finalize_on_watermark(tmp_path):
    root = str(tmp_path / "w")
    # batch 1: events in windows [0,10) and [10,20); max ts 18 → wm 13:
    # window [0,10) is complete, [10,20) stays open
    m = _ingest(root, [(1, "a", 1.0), (2, "a", 2.0), (11, "b", 5.0),
                       (18, "a", 4.0)])
    assert m["watermark"] == 13_000_000
    assert m["n_finalized"] == 1 and m["n_open"] == 2
    assert _fin(root) == [("a", 0, 2, 3.0)]
    # batch 2: ts 25 → wm 20 finalizes [10,20) for both groups
    m = _ingest(root, [(25, "b", 7.0)])
    assert m["watermark"] == 20_000_000
    assert _fin(root) == [("a", 0, 2, 3.0), ("a", 10, 1, 4.0),
                          ("b", 10, 1, 5.0)]
    ow = et.open_windows(root)
    assert ow.num_rows == 1 and ow["k"][0].as_py() == "b"


def test_late_events_never_mutate_finalized(tmp_path):
    root = str(tmp_path / "w")
    _ingest(root, [(1, "a", 1.0), (18, "a", 4.0)])     # wm 13, [0,10) out
    before = _fin(root)
    # ts 3 targets finalized [0,10): routed to the late log, results
    # unrevised; ts 14 is older than wm but its window [10,20) is still
    # open → merges normally
    m = _ingest(root, [(3, "a", 99.0), (14, "a", 6.0)])
    assert m["n_late"] == 1
    assert _fin(root) == before
    late = et.late_log(root).take_all()
    assert len(late) == 1 and late[0]["ts"] == 3_000_000
    # window [10,20) finalizes with BOTH its rows when wm passes 20
    _ingest(root, [(26, "b", 0.5)])
    assert ("a", 10, 2, 10.0) in _fin(root)


def test_watermark_is_monotone(tmp_path):
    root = str(tmp_path / "w")
    _ingest(root, [(30, "a", 1.0)])
    m = _ingest(root, [(14, "a", 1.0)])    # older batch: wm must not regress
    assert m["watermark"] == 25_000_000


def test_redelivery_fence(tmp_path):
    root = str(tmp_path / "w")
    _ingest(root, [(1, "a", 1.0)], batch_id="b1")
    m1 = _ingest(root, [(18, "a", 4.0)], batch_id="b2")
    m2 = _ingest(root, [(18, "a", 4.0)], batch_id="b2")   # redelivered
    assert m2 == m1
    assert et.current_version(root) == 2       # no third version
    assert _fin(root) == [("a", 0, 1, 1.0)]    # applied exactly once


def test_empty_and_all_late_batches_are_schema_stable(tmp_path):
    root = str(tmp_path / "w")
    _ingest(root, [(1, "a", 1.0), (18, "a", 4.0)])
    m = _ingest(root, [(2, "a", 9.0)])         # entirely late
    assert m["n_late"] == 1 and m["n_finalized"] == 0
    assert _fin(root) == [("a", 0, 1, 1.0)]
    ow = et.open_windows(root)
    assert ow.schema.field("sum_value").type == pa.float64()


def test_spec_drift_rejected(tmp_path):
    root = str(tmp_path / "w")
    _ingest(root, [(1, "a", 1.0)])
    with pytest.raises(ValueError):
        et.ingest(root, _ev([(2, "a", 1.0)]), time_col="ts",
                  window_s=W + 1, lateness_s=L, group_cols=("k",),
                  aggs={"n": ("count", None),
                        "sum_value": ("sum", "value")})
    with pytest.raises(ValueError):
        et.ingest(str(tmp_path / "w2"), _ev([(1, "a", 1.0)]),
                  time_col="ts", window_s=W,
                  aggs={"med": ("median", "value")})


def test_crash_orphan_version_skipped(tmp_path):
    """A version dir above CURRENT (crash between rename and pointer
    write) is invisible to readers and its slot is not reused."""
    root = str(tmp_path / "w")
    _ingest(root, [(1, "a", 1.0)])
    os.makedirs(os.path.join(root, "v0002"))      # orphan, no manifest
    m = _ingest(root, [(18, "a", 4.0)])
    assert m["version"] == 3
    assert et.current_version(root) == 3
    assert _fin(root) == [("a", 0, 1, 1.0)]


def test_timestamp_column(tmp_path):
    root = str(tmp_path / "w")
    t = pa.table({
        "ts": pa.array([1_000_000, 18_000_000], pa.timestamp("us")),
        "k": ["a", "a"], "value": [1.0, 4.0]})
    et.ingest(root, ray.data.from_arrow(t), time_col="ts", window_s=W,
              lateness_s=L, group_cols=("k",),
              aggs={"n": ("count", None), "sum_value": ("sum", "value")})
    assert _fin(root) == [("a", 0, 1, 1.0)]


class TestApproxDistinct:
    def _ingest(self, root, rows, batch_id=None):
        """rows: (ts_seconds, key, user)"""
        ds = ray.data.from_arrow(pa.table({
            "ts": pa.array([int(r[0]) * 1_000_000 for r in rows],
                           pa.int64()),
            "k": [r[1] for r in rows],
            "user": pa.array([r[2] for r in rows], pa.int64())}))
        return et.ingest(root, ds, time_col="ts", window_s=W,
                         lateness_s=L, group_cols=("k",),
                         aggs={"n": ("count", None),
                               "users": ("approx_distinct", "user")},
                         hll_p=12, batch_id=batch_id)

    def test_exact_at_small_cardinality(self, tmp_path):
        """p=12 HLL is exact (linear counting) at tiny cardinalities;
        duplicates across rows AND across batches collapse."""
        root = str(tmp_path / "w")
        self._ingest(root, [(1, "a", 7), (2, "a", 7), (3, "a", 9)])
        # same window, new batch, one repeat + one new user
        self._ingest(root, [(4, "a", 9), (5, "a", 11), (18, "a", 1)])
        ds = et.finalized(root).take_all()
        fin = {(r["k"], r["window_start"] // 1_000_000):
               (r["n"], r["users"]) for r in ds}
        assert fin[("a", 0)] == (5, 3)        # users {7, 9, 11}
        # open state holds REGISTERS (mergeable binary), not estimates
        ow = et.open_windows(root)
        assert ow.schema.field("users").type == pa.binary()
        assert ow.schema.field("n").type == pa.int64()

    def test_estimate_accuracy_at_1k(self, tmp_path):
        root = str(tmp_path / "w")
        rows = [(1 + (i % 9), "a", i) for i in range(1000)]
        self._ingest(root, rows)
        self._ingest(root, [(25, "a", 0)])    # push watermark past [0,10)
        r = et.finalized(root).take_all()
        est = {x["k"]: x["users"] for x in r}["a"]
        assert abs(est - 1000) / 1000 < 0.05


def test_eventtime_gc_reclaims_open_keeps_finalized(tmp_path):
    from kettleray.ops import eventtime as et
    root = str(tmp_path / "w")
    for k in range(4):
        ev = ray.data.from_arrow(pa.table({
            "g": ["a", "b"],
            "ts": pa.array([k * 1000 * 1_000_000,
                            (k * 1000 + 1) * 1_000_000],
                           type=pa.int64())}))
        et.ingest(root, ev, time_col="ts", window_s=10, lateness_s=0,
                  group_cols=("g",), aggs={"n": ("count", None)},
                  batch_id=f"b{k}")
    fin_before = et.finalized(root).count()
    rep = et.gc(root, keep_last=2)
    assert rep["removed_open_files"] == 2 and rep["bytes_reclaimed"] > 0
    assert et.finalized(root).count() == fin_before
    assert et.open_windows(root) is not None
