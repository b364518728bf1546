"""Changefeed-driven derived tables — delta-chained sinks.

A derived table is a second kettleray sink whose rows are a function of
an upstream sink's state (enrichment join, computed columns,
projection). Recomputing ``transform(full upstream state)`` per
upstream commit is the batch anti-pattern; ``sync_derived_view``
instead consumes the upstream CHANGE DATA FEED: only keys that changed
between the last-applied and current upstream version flow through the
transform and into the downstream sink, so per-sync cost tracks the
upstream COMMIT, not the table (the feed itself prunes untouched
buckets by file identity — see ``sink.read_changes``).

Exactly-once across the chain: feed events are stamped with the
upstream VERSION as their ``commit_seq``, so the downstream sink's own
watermark filter makes re-application of an already-applied feed window
a no-op; the durable sync cursor advances only AFTER the downstream
commit, giving crash-safe at-least-once polling with exactly-once
effect (same contract as ``sink.ChangeSubscription``).

Kettle parity: this is the 'transformation reading a CDC stream into a
Table Output' composition (core/src/.../trans/steps/tableoutput +
mergerows chained in a Trans), re-expressed as sink-to-sink delta
propagation.
"""
from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from kettleray.io import sink

_CURSOR = "SYNC_CURSOR.json"


def _applied_version(dst_root: str) -> int | None:
    p = os.path.join(dst_root, _CURSOR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["src_version"]


def _feed_to_events(ds, src_version: int, *, bootstrap: bool):
    """Changefeed (or bootstrap state) rows -> event rows for the
    downstream sink: op derived from change_type ('deleted' ->
    'delete', else upsert), commit_seq = the upstream version (the
    feed epoch — monotone, one row per key per epoch), upstream
    bookkeeping columns dropped (the downstream sink derives its own)."""
    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 and t.num_columns == 0:
            return t
        drop = [c for c in ("content_sha256", "last_commit_seq",
                            "bucket", "change_type")
                if c in t.column_names]
        if bootstrap:
            op = pa.array(["update"] * t.num_rows, type=pa.string())
        else:
            op = pc.if_else(pc.equal(t["change_type"], "deleted"),
                            "delete", "update")
        out = t.drop_columns(drop)
        out = out.append_column("op", op)
        return out.append_column(
            "commit_seq", pa.array([src_version] * t.num_rows,
                                   type=pa.int64()))
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def sync_derived_view(src_root: str, dst_root: str, transform=None, *,
                      num_buckets: int = 16, num_partitions: int = 16):
    """Advance the derived table at ``dst_root`` to reflect the current
    version of ``src_root``. First call bootstraps from the full
    upstream state; later calls apply only the change feed between the
    applied and current upstream version. ``transform`` (optional) maps
    an event-row Dataset to an event-row Dataset: it must preserve the
    key/op/commit_seq columns and may add or rewrite payload columns
    (it sees delete rows too — their payload carries the pre-delete
    values and is ignored downstream). Returns the downstream Manifest
    (unchanged if already caught up)."""
    src_v = sink.current_version(src_root)
    if src_v is None:
        raise FileNotFoundError(f"no committed state under {src_root}")
    applied = _applied_version(dst_root)
    if applied == src_v:
        return sink.read_manifest(dst_root)
    if applied is not None and applied > src_v:
        raise ValueError(
            f"cursor at {applied} is ahead of upstream {src_v} "
            f"(upstream GC'd/reset?)")

    if applied is None:
        fresh = _feed_to_events(sink.read_state(src_root, src_v),
                                src_v, bootstrap=True)
    else:
        feed = sink.read_changes(src_root, applied, src_v,
                                 num_partitions=num_partitions)
        schema = feed.schema()
        if schema is not None and schema.names and \
                "content" not in schema.names:
            # rebucket boundary: read_changes fell back to the
            # layout-independent diff, which carries only
            # (key, content_sha256, change_type) — not enough to build
            # events. Full resync: every live key re-upserts at this
            # epoch (value-idempotent downstream), deleted keys from
            # the flagged diff become tombstones with null payload.
            ups = _feed_to_events(sink.read_state(src_root, src_v),
                                  src_v, bootstrap=True)
            ev_schema = ups.schema().base_schema
            dels = feed.map_batches(
                lambda t: t.filter(pc.equal(t["change_type"],
                                            "deleted")),
                batch_format="pyarrow", zero_copy_batch=True)

            def _tombstone(t: pa.Table) -> pa.Table:
                if t.num_columns == 0:
                    return t
                n = t.num_rows
                cols = {}
                for f in ev_schema:
                    if f.name in ("repo", "path"):
                        cols[f.name] = t[f.name]
                    elif f.name == "op":
                        cols["op"] = pa.array(["delete"] * n,
                                              type=pa.string())
                    elif f.name == "commit_seq":
                        cols["commit_seq"] = pa.array(
                            [src_v] * n, type=pa.int64())
                    else:
                        cols[f.name] = pa.nulls(n, type=f.type)
                return pa.table(cols)

            fresh = ups.union(dels.map_batches(
                _tombstone, batch_format="pyarrow",
                zero_copy_batch=True))
        else:
            fresh = _feed_to_events(feed, src_v, bootstrap=False)
    if transform is not None:
        fresh = transform(fresh)
        sch = fresh.schema()
        missing = [c for c in ("repo", "path", "op", "commit_seq")
                   if sch is not None and sch.names
                   and c not in sch.names]
        if missing:
            raise ValueError(
                f"sync_derived_view: transform dropped required event "
                f"columns {missing} — it must preserve key/op/"
                f"commit_seq and may only add or rewrite payload "
                f"columns")
    man = sink.apply_incremental_bucketed(
        dst_root, fresh, num_buckets=num_buckets,
        num_partitions=num_partitions)
    sink.atomic_write_json(os.path.join(dst_root, _CURSOR),
                           {"src_version": src_v})
    return man
