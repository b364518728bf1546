"""Cross-lake replication: mirror one bucketed sink into another via
its change data feed, with lag metrics and a distributed parity audit.

This is the DR / read-replica composition (≙ chaining Kettle's Merge
Rows into a second Table Output across databases —
core/src/.../trans/steps/mergerows + tableoutput; re-expressed as
sink→sink delta propagation): the replica advances by consuming ONLY
the keys that changed between its applied source version and source
CURRENT, so per-sync cost tracks the source *commit*, not the table —
the property that makes a 100 TB replica affordable to keep fresh.

Built on :func:`kettleray.ops.derived.sync_derived_view` with the
identity transform (replication IS the degenerate derived view), plus
the two things a replica needs that a view does not:

- :func:`replication_lag` — metadata-only freshness probe (versions
  behind, watermark delta); costs two manifest reads, never data.
- :func:`verify_replica` — distributed parity audit on
  (key, content_sha256): a per-bucket co-partitioned diff via
  ``sink.read_changes``-style semantics (we reuse
  ``cdc.diff_snapshots``, one hash exchange) returning mismatch counts.
  An in-sync replica returns all-zero. Run it out-of-band; it reads
  both lakes once.

Exactly-once across the chain is inherited from the derived-view
contract: feed rows are stamped with the source VERSION as
``commit_seq``, the replica's own watermark makes re-application a
no-op, and the durable cursor advances only after the replica commit.
Combine with :mod:`kettleray.io.lease` on the replica root to fence a
zombie replicator after failover.
"""
from __future__ import annotations

from kettleray.io import sink
from kettleray.ops import cdc
from kettleray.ops.derived import _applied_version, sync_derived_view


def replicate_sink(src_root: str, dst_root: str, *,
                   num_buckets: int | None = None,
                   bucket_cols: tuple | None = None,
                   num_partitions: int = 16,
                   mode: str = "bucketed") -> "sink.Manifest":
    """Advance the replica at ``dst_root`` to source CURRENT. First
    call bootstraps from the full source state; later calls apply only
    the change feed. ``num_buckets`` AND ``bucket_cols`` default to the
    SOURCE layout so feed reads and replica writes stay co-partitioned —
    a repo-bucketed source whose trickle commits touch 4 repos must
    touch ~4 replica buckets per sync, not all of them.
    ``mode="mor"`` keeps the replica merge-on-read: each sync is a
    delta append (no touched-bucket replay job), the right default for
    high-cadence mirrors; compact out-of-band with
    ``sink.maybe_compact_mor(dst_root)``."""
    man = sink.read_manifest(src_root)
    if num_buckets is None:
        num_buckets = int(man.metrics.get("num_buckets", 64)) if man \
            else 64
    if bucket_cols is None:
        bucket_cols = tuple(man.metrics.get("bucket_cols",
                                            ("repo", "path"))) \
            if man else ("repo", "path")
    return sync_derived_view(src_root, dst_root, None,
                             num_buckets=num_buckets,
                             bucket_cols=bucket_cols,
                             num_partitions=num_partitions, mode=mode)


def replication_lag(src_root: str, dst_root: str) -> dict:
    """Freshness probe: versions and watermarks on both sides plus the
    deltas. Metadata-only (two manifest/cursor reads) — safe to poll at
    any cadence regardless of table size."""
    src_v = sink.current_version(src_root)
    applied = _applied_version(dst_root)
    src_man = sink.read_manifest(src_root)
    dst_man = sink.read_manifest(dst_root)
    src_wm = src_man.watermark if src_man else None
    dst_wm = dst_man.watermark if dst_man else None
    return {
        "src_version": src_v,
        "applied_src_version": applied,
        "versions_behind": (src_v - applied)
        if src_v is not None and applied is not None else None,
        "src_watermark": src_wm,
        "dst_watermark": dst_wm,
        "in_sync": src_v is not None and applied == src_v,
    }


def verify_replica(src_root: str, dst_root: str, *,
                   src_version: int | None = None,
                   num_partitions: int = 16) -> dict:
    """Distributed parity audit: diff the two lakes' live states on
    (repo, path, content_sha256) and count divergences. Returns
    ``{"src_rows", "dst_rows", "missing", "extra", "mismatched"}``
    where missing = keys live in src but absent in dst, extra = the
    reverse, mismatched = present in both with different content
    hashes. All-zero (except the row counts) == byte-parity.

    One hash exchange over (key, sha) pairs — column-pruned at the
    read, so the audit moves ~40 bytes/row, not content. Compare at a
    pinned ``src_version`` when the source may commit concurrently."""
    def _keys(root: str, version: int | None):
        ds = sink.read_state(root, version)
        return ds.map_batches(
            lambda t: t.select([c for c in ("repo", "path",
                                            "content_sha256")
                                if c in t.column_names]),
            batch_format="pyarrow", zero_copy_batch=True)

    a = _keys(src_root, src_version)
    b = _keys(dst_root, None)
    diff = cdc.diff_snapshots(a, b, num_partitions=num_partitions)
    counts = {"new": 0, "deleted": 0, "changed": 0, "identical": 0}
    for row in diff.groupby("change_type").count().take_all():
        counts[row["change_type"]] = int(row["count()"])
    n_src = int(a.count())
    n_dst = int(b.count())
    return {"src_rows": n_src, "dst_rows": n_dst,
            # diff_snapshots flags relative to (reference=a, compare=b):
            # 'deleted' = in a not b; 'new' = in b not a
            "missing": counts["deleted"], "extra": counts["new"],
            "mismatched": counts["changed"]}


def failover(src_root: str, dst_root: str, *, writer_id: str) -> dict:
    """Promote the replica: fence writers on BOTH roots (any zombie
    ingestor on the old primary and any zombie replicator on the
    replica lose their next publish) and report the promotion point.
    The caller resumes ingest against ``dst_root`` from the replica's
    watermark — events at or below it are already applied and replay
    idempotently under LWW."""
    from kettleray.io import lease

    src_lease = lease.acquire_lease(src_root, f"{writer_id}:fence-src")
    lease.release_lease(src_lease)      # fence only; we won't write src
    dst_lease = lease.acquire_lease(dst_root, writer_id)
    man = sink.read_manifest(dst_root)
    return {"promoted_root": dst_root,
            "resume_watermark": man.watermark if man else -1,
            "writer_epoch": dst_lease.epoch}
