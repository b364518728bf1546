"""Incremental event-time sessionization (kettleray.ops.sessions):
cross-batch session bridging, watermark finalization, late routing,
redelivery fence, min/max aggregates — the micro-batch orderings the
sf-fixture gate (events_sessions_final, zero-late by construction)
cannot hit.
"""

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from kettleray.ops import sessions as ss

AGGS = {"n": ("count", None), "sv": ("sum", "v"),
        "mn": ("min", "v"), "mx": ("max", "v")}


def _ds(rows):
    return ray.data.from_arrow(pa.table({
        "user": pa.array([r[0] for r in rows], type=pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows],
                       type=pa.int64()),
        "v": pa.array([float(r[2]) for r in rows])}))


def _ingest(root, rows, bid, gap_s=10, lateness_s=0):
    return ss.ingest(root, _ds(rows), time_col="ts", gap_s=gap_s,
                     lateness_s=lateness_s, key_cols=("user",),
                     aggs=AGGS, num_partitions=4, batch_id=bid)


def test_sessions_bridge_across_batches(tmp_path):
    """An event in batch 2 within gap of batch 1's open session must
    EXTEND it (interval merge of the carried open state), and the
    bridged session finalizes once the watermark passes end+gap."""
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0), (1, 10, 2.0)], "b0")
    # t=18 is within gap(10) of the open session's end (10)
    _ingest(root, [(1, 18, 4.0)], "b1")
    _ingest(root, [(1, 100, 0.5)], "b2")   # wm=100 -> [0,18] finalizes
    fin = sorted(ss.finalized(root).take_all(),
                 key=lambda r: r["session_start"])
    assert len(fin) == 1
    s = fin[0]
    assert (s["session_start"], s["session_end"]) == (0, 18_000_000)
    assert s["n"] == 3 and s["sv"] == 7.0
    assert s["mn"] == 1.0 and s["mx"] == 4.0
    op = ss.open_sessions(root).to_pylist()
    assert len(op) == 1 and op[0]["session_start"] == 100_000_000


def test_sessions_late_events_quarantined(tmp_path):
    """ts <= watermark is late (it could extend an already-finalized
    session): routed to the late log, never into state."""
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0), (1, 100, 1.0)], "b0")   # wm = 100s
    man = _ingest(root, [(1, 50, 9.0), (1, 200, 2.0)], "b1")
    assert man["n_late"] == 1
    late = ss.late_log(root).take_all()
    assert len(late) == 1 and late[0]["v"] == 9.0
    # the late event's value never contaminated any session
    allv = [r["sv"] for r in ss.finalized(root).take_all()]
    allv += [r["sv"] for r in ss.open_sessions(root).to_pylist()]
    assert 9.0 not in allv and sum(allv) == 4.0


def test_sessions_redelivery_fence_is_noop(tmp_path):
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0)], "b0")
    m1 = _ingest(root, [(1, 100, 2.0)], "b1")
    m2 = _ingest(root, [(1, 100, 2.0)], "b1")   # redelivered
    assert m1 == m2
    from kettleray.io.sink import current_version
    assert current_version(root) == 2


def test_sessions_exact_gap_boundary_merges(tmp_path):
    """Consecutive events exactly gap apart belong to ONE session
    (inclusive rule, matching the SQL oracle's `> INTERVAL` break)."""
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0), (1, 10, 1.0), (1, 21, 1.0),
                   (1, 100, 0.0)], "b0")
    fin = sorted(ss.finalized(root).take_all(),
                 key=lambda r: r["session_start"])
    # 0->10 merges (diff == gap); 10->21 breaks (diff > gap)
    assert [(r["session_start"], r["session_end"], r["n"])
            for r in fin] == [(0, 10_000_000, 2), (21_000_000, 21_000_000, 1)]


def test_sessions_lateness_holds_finalization(tmp_path):
    root = str(tmp_path / "s")
    man = _ingest(root, [(1, 0, 1.0), (1, 100, 1.0)], "b0",
                  lateness_s=50)
    assert man["watermark"] == 50_000_000
    # [0,0]: 0 + 10 <= 50 -> finalized; [100,100] stays open
    assert man["n_finalized"] == 1 and man["n_open"] == 1


def test_sessions_matches_batch_sessionize_oracle(tmp_path):
    """Randomized parity: incremental ingest over 3 time-ordered
    batches == one-shot gaps-and-islands clustering, for every session
    fully under the final watermark."""
    rng = np.random.RandomState(9)
    users = rng.randint(0, 12, 300)
    ts = np.sort(rng.randint(0, 3000, 300))
    vals = rng.rand(300).round(3)
    rows = list(zip(users.tolist(), ts.tolist(), vals.tolist()))
    root = str(tmp_path / "s")
    gap = 40
    # lateness > 0: a batch boundary can split two events sharing a
    # timestamp, and with lateness 0 the second is (correctly) late —
    # any positive lateness keeps time-ordered splits late-free
    for k, chunk in enumerate(np.array_split(np.arange(300), 3)):
        _ingest(root, [rows[i] for i in chunk], f"b{k}", gap_s=gap,
                lateness_s=5)
    wm = int(ts.max()) * 1_000_000 - 5_000_000
    # brute force sessions
    want = {}
    for u in np.unique(users):
        uts = ts[users == u]
        uv = vals[users == u]
        cur = [0]
        sessions = []
        for i in range(1, len(uts)):
            if uts[i] - uts[cur[-1]] > gap:
                sessions.append(cur)
                cur = [i]
            else:
                cur.append(i)
        sessions.append(cur)
        for s in sessions:
            lo, hi = int(uts[s[0]]), int(uts[s[-1]])
            if hi * 1_000_000 + gap * 1_000_000 <= wm:
                want[(int(u), lo * 1_000_000)] = (
                    hi * 1_000_000, len(s), round(float(uv[s].sum()), 6))
    got = {(r["user"], r["session_start"]):
           (r["session_end"], r["n"], round(r["sv"], 6))
           for r in ss.finalized(root).take_all()}
    assert got == want


def test_sessions_spec_drift_rejected(tmp_path):
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0)], "b0")
    with pytest.raises(ValueError):
        _ingest(root, [(1, 5, 1.0)], "b1", gap_s=99)


def test_sessions_atomic_no_partial_publish(tmp_path):
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0)], "b0")
    # no stage dirs left behind
    assert not [d for d in os.listdir(root) if d.startswith("_stage")]


def _sink_events(rows):
    import pyarrow as pa
    import ray.data
    return ray.data.from_arrow(pa.table({
        "repo": [r[0] for r in rows], "path": [r[1] for r in rows],
        "commit": [f"c{r[2]}" for r in rows],
        "lang": ["py"] * len(rows),
        "content": [r[3] for r in rows], "op": [r[4] for r in rows],
        "commit_seq": pa.array([r[2] for r in rows], type=pa.int64())}))


def test_sessions_sync_from_feed(tmp_path):
    """Lake -> session-analytics composition: activity sessions over a
    CDC sink's change feed — bootstrap from state, then per-commit
    deltas; the durable cursor makes a re-sync of an unchanged sink a
    no-op."""
    from kettleray.io import sink
    src = str(tmp_path / "lake")
    sr = str(tmp_path / "sess")
    kw = dict(num_buckets=4, num_partitions=2)
    # commit 1: two repos active at seqs 1,2
    sink.apply_incremental_bucketed(src, _sink_events(
        [("r1", "a", 1, "x", "insert"), ("r2", "b", 2, "y", "insert")]),
        **kw)
    m1 = ss.sync_from_feed(src, sr, gap_s=5, key_cols=("repo",),
                           num_partitions=2)
    assert m1["n_late"] == 0
    # commit 2: r1 active again at seq 3 (within gap of 1) and at 20
    sink.apply_incremental_bucketed(src, _sink_events(
        [("r1", "a", 3, "x2", "update"), ("r1", "c", 20, "z", "insert")]),
        **kw)
    m2 = ss.sync_from_feed(src, sr, gap_s=5, key_cols=("repo",),
                           num_partitions=2)
    # watermark 20s: r1 [1,3] finalizes (3+5 <= 20); r2 [2,2] finalizes
    fin = {(r["repo"], r["session_start"]): r
           for r in ss.finalized(sr).take_all()}
    assert (("r1", 1_000_000) in fin) and (("r2", 2_000_000) in fin)
    assert fin[("r1", 1_000_000)]["session_end"] == 3_000_000
    assert fin[("r1", 1_000_000)]["n_changes"] == 2
    op = ss.open_sessions(sr).to_pylist()
    assert [(o["repo"], o["session_start"]) for o in op] == \
        [("r1", 20_000_000)]
    # unchanged sink: cursor short-circuits (manifest returned as-is)
    m3 = ss.sync_from_feed(src, sr, gap_s=5, key_cols=("repo",),
                           num_partitions=2)
    assert m3 == m2


def test_cluster_kernel_overflow_fallback_matches_biased_path():
    """nseg * span past the int64 bias budget must take the per-key
    fallback and produce the SAME clustering as the biased path does on
    the scaled-down equivalent."""
    from kettleray.ops.sessions import _cluster, _validate_aggs
    aggs = _validate_aggs({"n": ("count", None)})
    big = 3_000_000_000_000_000_000        # 3e18: 2 segs -> 6e18 > 2^62
    t_big = pa.table({
        "user": pa.array([1, 1, 2, 2], type=pa.int64()),
        "session_start": pa.array([0, big - 5, 0, big], type=pa.int64()),
        "session_end": pa.array([0, big - 5, 0, big], type=pa.int64()),
        "n": pa.array([1, 1, 1, 1], type=pa.int64())})
    out = _cluster(t_big, ["user"], 10, aggs).sort_by(
        [("user", "ascending"), ("session_start", "ascending")])
    # same shape, small values: biased path
    t_small = pa.table({
        "user": pa.array([1, 1, 2, 2], type=pa.int64()),
        "session_start": pa.array([0, 95, 0, 100], type=pa.int64()),
        "session_end": pa.array([0, 95, 0, 100], type=pa.int64()),
        "n": pa.array([1, 1, 1, 1], type=pa.int64())})
    out_s = _cluster(t_small, ["user"], 10, aggs).sort_by(
        [("user", "ascending"), ("session_start", "ascending")])
    # both: every interval far apart -> 4 singleton sessions
    assert out.num_rows == 4 == out_s.num_rows
    assert out["n"].to_pylist() == out_s["n"].to_pylist()
    assert out["session_end"].to_pylist() == \
        [0, big - 5, 0, big]
    # and a bridging case under the fallback: user 2's huge span forces
    # the per-key path, user 1's within-gap pair must still merge
    t_bridge = pa.table({
        "user": pa.array([1, 1, 2, 2], type=pa.int64()),
        "session_start": pa.array([big, big + 7, 0, big],
                                  type=pa.int64()),
        "session_end": pa.array([big, big + 7, 0, big],
                                type=pa.int64()),
        "n": pa.array([1, 1, 1, 1], type=pa.int64())})
    ob = _cluster(t_bridge, ["user"], 10, aggs)
    assert sorted(ob["n"].to_pylist()) == [1, 1, 2]


def test_sessions_gc_reclaims_open_copies_keeps_logs(tmp_path):
    root = str(tmp_path / "s")
    for k in range(5):
        _ingest(root, [(1, k * 100, 1.0), (2, k * 100 + 3, 1.0)],
                f"b{k}")
    fin_before = sorted(map(dict, ss.finalized(root).take_all()),
                        key=lambda r: (r["user"], r["session_start"]))
    rep = ss.gc(root, keep_last=2)
    assert rep["removed_open_dirs"] == 3 and rep["bytes_reclaimed"] > 0
    # finalized log and current open state untouched
    fin_after = sorted(map(dict, ss.finalized(root).take_all()),
                       key=lambda r: (r["user"], r["session_start"]))
    assert fin_after == fin_before
    assert ss.open_sessions(root).num_rows == 2
    # next ingest still works (it only reads the PREVIOUS version's open)
    _ingest(root, [(1, 1000, 1.0)], "b5")
    assert ss.open_sessions(root).num_rows == 1


def test_sessions_crash_mid_stage_publishes_nothing(tmp_path, monkeypatch):
    """A failure after routing but before the rename must leave no
    version, no stage dir, and an untouched CURRENT; the retry with the
    same batch applies cleanly."""
    root = str(tmp_path / "s")
    _ingest(root, [(1, 0, 1.0)], "b0")
    from kettleray.io.sink import current_version
    assert current_version(root) == 1
    # inject at a DRIVER-side step (worker-side fns can't be patched
    # from the driver): the manifest write, after all data is staged
    # but before the atomic rename
    orig_dump = ss.json.dump

    def _boom(*a, **kw):
        raise RuntimeError("injected manifest-write failure")

    monkeypatch.setattr(ss.json, "dump", _boom)
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="injected"):
        _ingest(root, [(1, 100, 2.0)], "b1")
    monkeypatch.setattr(ss.json, "dump", orig_dump)
    assert current_version(root) == 1          # nothing published
    assert not [d for d in os.listdir(root) if d.startswith("_stage")]
    m = _ingest(root, [(1, 100, 2.0)], "b1")   # retry applies
    assert m["version"] == 2 and current_version(root) == 2


def test_sessions_approx_distinct_accuracy_and_merge():
    """approx_distinct sessions: registers built per block, register-
    maxed across blocks and the carried open state; the finalized
    estimate must track the exact per-session distinct count, and must
    be INVARIANT to how the events are split into micro-batches."""
    import tempfile, shutil as _sh
    rng = np.random.RandomState(4)
    # one user, one long session (ts 0..999 all within gap 10), with
    # values drawn from 200 distinct ids
    ts = np.arange(1000)
    vals = rng.randint(0, 200, 1000)
    rows = [(1, int(t), int(v)) for t, v in zip(ts, vals)]
    rows.append((1, 5000, 0))   # closer event -> finalizes the session

    def _ingest_hll(root, chunk_bounds):
        for k, (a, b) in enumerate(chunk_bounds):
            ds = ray.data.from_arrow(pa.table({
                "user": pa.array([r[0] for r in rows[a:b]],
                                 type=pa.int64()),
                "ts": pa.array([r[1] * 1_000_000 for r in rows[a:b]],
                               type=pa.int64()),
                "uid": pa.array([r[2] for r in rows[a:b]],
                                type=pa.int64())}))
            ss.ingest(root, ds, time_col="ts", gap_s=10, lateness_s=0,
                      key_cols=("user",),
                      aggs={"n": ("count", None),
                            "nd": ("approx_distinct", "uid")},
                      num_partitions=2, hll_p=12, batch_id=f"b{k}")
        fin = ss.finalized(root).take_all()
        return {r["session_start"]: (r["n"], r["nd"]) for r in fin}

    exact = len(set(vals.tolist()))
    r1 = tempfile.mkdtemp(prefix="kr_hll1_")
    r2 = tempfile.mkdtemp(prefix="kr_hll2_")
    try:
        one = _ingest_hll(r1, [(0, 1001)])
        many = _ingest_hll(r2, [(0, 300), (300, 700), (700, 1001)])
        assert set(one) == set(many)
        k = 0
        n1, nd1 = one[k]
        n2, nd2 = many[k]
        assert n1 == n2 == 1000
        # register-max merging is exact algebra: identical estimates
        # regardless of batching
        assert nd1 == nd2
        assert abs(nd1 - exact) / exact < 0.05, (nd1, exact)
        # raw registers still available for downstream merging
        raw = ss.finalized(r1, estimate=False).take_all()
        assert isinstance(raw[0]["nd"], bytes)
    finally:
        _sh.rmtree(r1, ignore_errors=True)
        _sh.rmtree(r2, ignore_errors=True)
