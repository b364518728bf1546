"""WAL/binlog directory tailer: the micro-batch ingest loop.

North-rule shape — "binlog/WAL tail → lake upsert": a WAL here is an
append-only directory of segment files of change events (Parquet rows
in the canonical event schema, or Debezium-style envelope JSONL via
``kettleray.io.source.read_cdc_envelope``). The tailer discovers
unconsumed segments, groups them into micro-batches, applies each
through ONE exactly-once incremental sink commit (COW / MOR / SCD2
layout), and durably acks via an atomic cursor file under the sink
root — the consumer-side mirror of ``io.sink.ChangeSubscription``.

Crash-safety contract (at-least-once delivery x idempotent apply =
exactly-once state): the ack is written AFTER the commit, so a crash
between them makes the next run re-apply the same segments — the
sink's watermark filter (`commit_seq > watermark`) reduces that to a
no-op commit. The cursor records consumed segment NAMES (not a byte or
lexicographic offset), so segments may land / be discovered in any
order; the ordering contract lives where it always does in this
engine: monotone ``commit_seq`` on the events themselves.

Scale notes: discovery is one listdir (the WAL dir is a feed, not the
lake — segments are pruned after consumption by retention, not by us);
each micro-batch flows straight into ``apply_incremental_*`` whose
cost is ∝ batch size + touched buckets, never table size. The cursor
file grows O(consumed segments) — ``compact_cursor`` folds acked names
older than a horizon into a count + bloomless tombstone list, bounded
by retention in practice.

≙ Kettle provenance: this is the loop a user builds around Kettle's
"CDC input → Synchronize after merge" transformation with a Start
entry on a schedule (job.py's Job covers the control flow); here it is
a first-class engine primitive.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import ray.data

from kettleray.io import sink as _sink

_CURSOR = "wal_cursor.json"

_APPLY = {
    "cow": "apply_incremental_bucketed",
    "mor": "apply_incremental_mor",
    "scd2": "apply_incremental_scd2",
    "flat": "apply_incremental",
}


def consumed_segments(root: str) -> set[str]:
    """Segment names this sink has durably acked."""
    p = os.path.join(root, _CURSOR)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        cur = json.load(f)
    return set(cur.get("consumed", []))


def discover_segments(wal_dir: str, consumed: set[str],
                      suffixes: Sequence[str] = (".parquet", ".json"),
                      ) -> list[str]:
    """Unconsumed segment file names under ``wal_dir`` (non-recursive;
    dot/tmp files skipped — writers must publish segments by rename).
    Sorted by name for deterministic batching, not as an ordering
    guarantee."""
    if not os.path.isdir(wal_dir):
        return []
    out = []
    for name in os.listdir(wal_dir):
        if name.startswith((".", "_")) or name.endswith(".tmp"):
            continue
        if suffixes and not name.endswith(tuple(suffixes)):
            continue
        if name in consumed:
            continue
        if os.path.isfile(os.path.join(wal_dir, name)):
            out.append(name)
    return sorted(out)


def _ack(root: str, names: Sequence[str]) -> None:
    cur = consumed_segments(root)
    cur.update(names)
    _sink.atomic_write_json(os.path.join(root, _CURSOR),
                            {"consumed": sorted(cur)})


@dataclass
class TailResult:
    """One ``tail_once`` outcome."""
    segments: list[str] = field(default_factory=list)
    manifests: list[Any] = field(default_factory=list)

    @property
    def versions(self) -> list[int]:
        return [m.version for m in self.manifests]


def tail_once(wal_dir: str, root: str, *,
              layout: str = "mor",
              fmt: str = "parquet",
              max_segments_per_batch: int | None = None,
              transform: Callable[["ray.data.Dataset"],
                                  "ray.data.Dataset"] | None = None,
              **apply_kwargs: Any) -> TailResult:
    """Consume every currently-unconsumed WAL segment: read → optional
    ``transform`` (parse/validate/enrich on the change stream) → ONE
    exactly-once incremental commit per micro-batch → durable ack.

    ``layout``: ``mor`` (default — commit IO ∝ batch), ``cow``,
    ``scd2`` (dimension history), or ``flat``. ``fmt``: ``parquet``
    segments of canonical events, or ``envelope`` (Debezium JSONL via
    ``read_cdc_envelope``). ``max_segments_per_batch`` bounds each
    commit's size (None = all pending in one commit).
    """
    if layout not in _APPLY:
        raise ValueError(f"unknown layout {layout!r}; "
                         f"one of {sorted(_APPLY)}")
    apply_fn = getattr(_sink, _APPLY[layout])
    pending = discover_segments(
        wal_dir, consumed_segments(root),
        suffixes=(".parquet",) if fmt == "parquet" else (".json",))
    res = TailResult()
    step = max_segments_per_batch or len(pending) or 1
    for i in range(0, len(pending), step):
        batch = pending[i:i + step]
        paths = [os.path.join(wal_dir, n) for n in batch]
        if fmt == "parquet":
            ds = ray.data.read_parquet(paths)
        elif fmt == "envelope":
            from kettleray.io.source import read_cdc_envelope
            ds = read_cdc_envelope(paths)
        else:
            raise ValueError(f"unknown fmt {fmt!r}")
        if transform is not None:
            ds = transform(ds)
        man = apply_fn(root, ds, **apply_kwargs)
        _ack(root, batch)                     # AFTER the commit
        res.segments.extend(batch)
        res.manifests.append(man)
    return res


def tail_until_idle(wal_dir: str, root: str, *,
                    poll_s: float = 1.0, idle_rounds: int = 3,
                    max_rounds: int = 1_000_000,
                    **tail_kwargs: Any) -> TailResult:
    """Poll loop: ``tail_once`` until ``idle_rounds`` consecutive empty
    polls (a bounded demo/test driver; a service would loop forever on a
    schedule or an inotify signal)."""
    import time
    total = TailResult()
    idle = 0
    for _ in range(max_rounds):
        r = tail_once(wal_dir, root, **tail_kwargs)
        total.segments.extend(r.segments)
        total.manifests.extend(r.manifests)
        if r.segments:
            idle = 0
        else:
            idle += 1
            if idle >= idle_rounds:
                break
            time.sleep(poll_s)
    return total


def compact_cursor(root: str, keep: int = 10_000) -> int:
    """Bound the cursor file: keep only the most recent ``keep`` names
    (sorted order) plus a count of the folded prefix. Safe when WAL
    retention has already deleted segments older than the kept window —
    a re-delivered ancient segment would re-apply as a watermark no-op
    anyway. Returns the number of names folded away."""
    p = os.path.join(root, _CURSOR)
    if not os.path.exists(p):
        return 0
    with open(p) as f:
        cur = json.load(f)
    names = sorted(cur.get("consumed", []))
    folded = max(0, len(names) - keep)
    if folded:
        _sink.atomic_write_json(p, {
            "consumed": names[folded:],
            "folded_count": int(cur.get("folded_count", 0)) + folded})
    return folded
