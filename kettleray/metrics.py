"""Per-step runtime metrics: live row/byte counters + time-series
performance snapshots over a running Dataset pipeline.

This is parity with the reference's ONLY performance instrumentation
(see BASELINE.md "Reference-published numbers"):

- ``engine/src/main/java/org/pentaho/di/trans/step/BaseStep.java`` —
  per-step ``linesRead`` / ``linesWritten`` / ``linesRejected``
  counters, surfaced as StepStatus with rows/s speed;
- ``engine/src/main/java/org/pentaho/di/trans/performance/
  StepPerformanceSnapShot.java`` — periodic per-step row snapshots.

Kettle runs every step as a concurrent thread joined by row buffers;
Ray Data's streaming executor has the same shape (operators pipelined
over blocks), so a step's honest "seconds" here is — exactly as in
Kettle's StepStatus — its ACTIVE WINDOW (first batch seen → last batch
seen), not a serial fraction of the job wall time. Speeds of pipelined
steps legitimately sum to more than job rows/s.

Design (Ray-Data-native, not a port): a zero-copy pass-through
``map_batches`` counter is spliced after each step. It fire-and-forgets
``(step, rows, bytes, t)`` to a zero-CPU collector actor — one Arrow
metadata read + one async actor call per BATCH (not per row); the data
itself is never touched or copied, and the counter fuses into the
step's own task like any other map stage. At 100 TB the collector sees
one tiny message per block (~128 MB), i.e. ~10^6 messages total —
trivially driver-side, while the counting itself is fully distributed.
"""

from __future__ import annotations

import time
from typing import Any

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class _Collector:
    """Driver-adjacent accumulator for per-step counter messages.

    Holds totals per (step, channel) plus a per-``snapshot_interval_s``
    time-bucketed row count per step (the StepPerformanceSnapShot
    series). Memory is O(steps x elapsed/interval), never O(rows).
    """

    def __init__(self, snapshot_interval_s: float = 1.0):
        self._interval = max(float(snapshot_interval_s), 1e-3)
        # (step, channel) -> [rows, bytes, batches, first_t, last_t]
        self._tot: dict[tuple[str, str], list] = {}
        # (step, bucket) -> rows   (written channel only)
        self._snaps: dict[tuple[str, int], int] = {}

    def add(self, step: str, rows: int, nbytes: int, t: float,
            channel: str = "written") -> None:
        key = (step, channel)
        s = self._tot.get(key)
        if s is None:
            self._tot[key] = [rows, nbytes, 1, t, t]
        else:
            s[0] += rows
            s[1] += nbytes
            s[2] += 1
            if t < s[3]:
                s[3] = t
            if t > s[4]:
                s[4] = t
        if channel == "written":
            b = int(t / self._interval)
            self._snaps[(step, b)] = self._snaps.get((step, b), 0) + rows

    def totals(self) -> dict:
        return {f"{st}\x00{ch}": list(v) for (st, ch), v in
                self._tot.items()}

    def snapshots(self) -> list[tuple[str, int, int]]:
        return [(st, b, r) for (st, b), r in sorted(self._snaps.items())]

    def interval(self) -> float:
        return self._interval

    def reset(self) -> None:
        self._tot.clear()
        self._snaps.clear()


class PipelineMetrics:
    """Handle pairing a collector actor with splice-in counters.

    Usage::

        m = PipelineMetrics("my_job")
        out = pipe.run(ds, metrics=m)       # Pipeline.run splices counters
        out.write_parquet(...)              # counters fill during execution
        print(m.step_status().to_pandas())  # Kettle StepStatus table
        print(m.performance_snapshots())    # StepPerformanceSnapShot series

    Counts appear only when the dataset actually EXECUTES (Ray Data is
    lazy); ``step_status`` waits for the async counter stream to go
    quiet before reading (two equal consecutive totals), bounded by
    ``settle_s``.
    """

    def __init__(self, name: str = "pipeline",
                 snapshot_interval_s: float = 1.0):
        self.name = name
        self._steps: list[str] = []           # splice order
        self._actor = _Collector.remote(snapshot_interval_s)

    # -- splicing -------------------------------------------------------
    def count(self, ds: "ray.data.Dataset", step: str,
              channel: str = "written") -> "ray.data.Dataset":
        """Splice a zero-copy pass-through counter after ``step``."""
        if channel == "written" and step not in self._steps:
            self._steps.append(step)
        actor = self._actor

        def _count(t: pa.Table) -> pa.Table:
            actor.add.remote(step, t.num_rows, t.nbytes, time.time(),
                             channel)
            return t

        return ds.map_batches(_count, batch_format="pyarrow",
                              zero_copy_batch=True)

    def count_rejected(self, ds: "ray.data.Dataset",
                       step: str) -> "ray.data.Dataset":
        """Splice a counter on a step's ERROR stream (the second dataset
        of (good, bad) ops like ``data_validator`` /
        ``read_text_with_errors``) — Kettle's linesRejected."""
        return self.count(ds, step, channel="rejected")

    # -- reading --------------------------------------------------------
    def _settled_totals(self, settle_s: float = 3.0) -> dict:
        """Totals after the async counter stream goes quiet: poll until
        two consecutive reads agree (fire-and-forget adds from worker
        tasks may still be in flight right after execution returns)."""
        prev = None
        deadline = time.time() + settle_s
        while True:
            cur = ray.get(self._actor.totals.remote())
            if cur == prev or time.time() >= deadline:
                return cur
            prev = cur
            time.sleep(0.05)

    def step_status(self, settle_s: float = 3.0) -> pa.Table:
        """≙ Kettle StepStatus: one row per spliced step, in splice
        order. ``lines_read`` is the preceding step's ``lines_written``
        (the runner splices an ``input`` counter first, so step 1 reads
        the true input count); ``seconds`` is the step's active window;
        ``speed`` = lines_written / max(seconds, interval)."""
        raw = self._settled_totals(settle_s)
        tot: dict[tuple[str, str], list] = {}
        for k, v in raw.items():
            st, ch = k.split("\x00")
            tot[(st, ch)] = v
        interval = ray.get(self._actor.interval.remote())
        names, read, written, rejected, secs, speed, nbytes = \
            [], [], [], [], [], [], []
        prev_written = None
        for st in self._steps:
            w = tot.get((st, "written"), [0, 0, 0, 0.0, 0.0])
            rj = tot.get((st, "rejected"), [0, 0, 0, 0.0, 0.0])
            names.append(st)
            read.append(prev_written if prev_written is not None else w[0])
            written.append(w[0])
            rejected.append(rj[0])
            window = max(w[4] - w[3], 0.0)
            secs.append(window)
            speed.append(w[0] / max(window, interval))
            nbytes.append(w[1])
            prev_written = w[0]
        return pa.table({
            "step": pa.array(names, pa.string()),
            "lines_read": pa.array(read, pa.int64()),
            "lines_written": pa.array(written, pa.int64()),
            "lines_rejected": pa.array(rejected, pa.int64()),
            "bytes_written": pa.array(nbytes, pa.int64()),
            "seconds": pa.array(secs, pa.float64()),
            "speed_rows_per_s": pa.array(speed, pa.float64()),
        })

    def performance_snapshots(self, settle_s: float = 3.0) -> pa.Table:
        """≙ StepPerformanceSnapShot: per-step rows written per time
        bucket (bucket width = ``snapshot_interval_s``). ``t_offset_s``
        is seconds since the first bucket of the run."""
        self._settled_totals(settle_s)        # barrier: let adds land
        snaps = ray.get(self._actor.snapshots.remote())
        interval = ray.get(self._actor.interval.remote())
        if not snaps:
            return pa.table({"step": pa.array([], pa.string()),
                             "t_offset_s": pa.array([], pa.float64()),
                             "rows": pa.array([], pa.int64())})
        base = min(b for _, b, _ in snaps)
        order = {st: i for i, st in enumerate(self._steps)}
        snaps.sort(key=lambda x: (x[1], order.get(x[0], 1 << 30)))
        return pa.table({
            "step": pa.array([s for s, _, _ in snaps], pa.string()),
            "t_offset_s": pa.array([(b - base) * interval
                                    for _, b, _ in snaps], pa.float64()),
            "rows": pa.array([r for _, _, r in snaps], pa.int64()),
        })

    def reset(self) -> None:
        self._steps.clear()
        ray.get(self._actor.reset.remote())
