"""Exactly-once Parquet state sink: staged writes, manifests, checkpoints.

≙ Table Output's transactional commit (tableoutput/TableOutput.java batch
commit) re-expressed for a lake: there is no transactional layer over
plain Parquet, so exactly-once is built from

  1. staged directory writes (write to a writer-unique ``_stage_vN.<id>``
     dir, fsync-free atomic ``rename`` to ``vN`` — a crashed writer leaves
     only garbage stages, and concurrent writers can never touch each
     other's stage),
  2. a JSON manifest per committed version: high-watermark commit offset,
     schema, per-file lineage (rows/bytes), metrics,
  3. a CURRENT pointer file updated by atomic rename,
  4. idempotent replay: ``apply_incremental`` filters incoming events to
     ``commit_seq > watermark``, so re-applied batches are harmless.

Layout:
  root/
    CURRENT            -> {"version": N}
    v0001/ *.parquet
    v0001/manifest.json
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from kettleray.ops import cdc


@dataclass
class Manifest:
    version: int
    watermark: int                      # max commit_seq applied (incl. deletes)
    schema: str
    files: list[dict] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


def _version_dir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def current_version(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def read_manifest(root: str, version: int | None = None) -> Manifest | None:
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    with open(os.path.join(_version_dir(root, v), "manifest.json")) as f:
        return Manifest.from_json(f.read())


def _parquet_files(vdir: str) -> list[str]:
    out = []
    for base, _, names in os.walk(vdir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                out.append(os.path.join(base, n))
    return sorted(out)


def read_state(root: str,
               version: int | None = None) -> "ray.data.Dataset | None":
    """Read a committed state version (default CURRENT). Passing an older
    retained ``version`` is snapshot time travel over the SINK layout —
    every version is immutable (copy-on-write buckets), so old reads are
    consistent even while new commits land."""
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    vdir = _version_dir(root, v)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {v} not found under {root} (GC'd or never committed)")
    return ray.data.read_parquet(_parquet_files(vdir))


def lookup_state(root: str, repo: str, path: str, *,
                 version: int | None = None) -> pa.Table:
    """Point lookup on the bucketed state: route the key to its bucket
    (same crc32 routing the writer used) and scan ONLY that bucket's
    files with a parquet predicate — O(one bucket), not O(table). This is
    the read side of a CDC-ingested serving table; no Ray tasks needed
    for a single key."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    nb = man.metrics.get("num_buckets") if man else None
    vdir = _version_dir(root, v)
    if nb is None:
        # non-bucketed layout: predicate scan over all files
        files = _parquet_files(vdir)
    else:
        key = pa.table({"repo": pa.array([repo]), "path": pa.array([path])})
        b = int(cdc.stable_key_buckets(key, ("repo", "path"), int(nb))[0])
        bdir = os.path.join(vdir, f"bucket={b}")
        files = _parquet_files(bdir) if os.path.isdir(bdir) else []
    if not files:
        return pa.table({})
    import pyarrow.dataset as pads
    flt = (pads.field("repo") == repo) & (pads.field("path") == path)
    return pads.dataset(files).to_table(filter=flt)


def commit_state(ds: "ray.data.Dataset", root: str, *, watermark: int,
                 metrics: dict | None = None) -> Manifest:
    """Stage-write ``ds`` as the next state version and atomically commit.

    Idempotent: if the target version dir already exists (a concurrent or
    prior identical commit), the stage is discarded and the existing
    manifest returned.
    """
    os.makedirs(root, exist_ok=True)
    prev = current_version(root)
    v = 1 if prev is None else prev + 1
    final_dir = _version_dir(root, v)
    if os.path.exists(final_dir):
        return read_manifest(root, v)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    ds.write_parquet(stage)
    os.makedirs(stage, exist_ok=True)   # empty ds writes no files at all
    if not any(n.endswith(".parquet") for n in os.listdir(stage)):
        # write an explicit typed empty file so read_state of an empty
        # version works instead of read_parquet([]) blowing up
        try:
            sch = ds.schema()
            arrow_schema = getattr(sch, "base_schema", None)
            if arrow_schema is not None:
                pq.write_table(arrow_schema.empty_table(),
                               os.path.join(stage, "empty-0.parquet"))
        except Exception:
            pass
    try:                         # per-stage Ray execution stats -> lineage
        stats_tail = ds.stats()[-1800:]
    except Exception:
        stats_tail = ""
    files = []
    for name in sorted(os.listdir(stage)):
        fp = os.path.join(stage, name)
        md = pq.read_metadata(fp)
        files.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(fp)})
    schema = str(pq.read_schema(os.path.join(stage, files[0]["file"]))) \
        if files else ""
    man = Manifest(version=v, watermark=watermark, schema=schema,
                   files=files,
                   metrics={"write_sec": round(time.time() - t0, 3),
                            "total_rows": sum(f["rows"] for f in files),
                            "ray_stats_tail": stats_tail,
                            **(metrics or {})})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man.to_json())
    try:
        os.rename(stage, final_dir)         # atomic commit of the version
    except OSError:
        # concurrent writer won the rename race: discard our stage and
        # return the committed manifest (the documented idempotent path).
        if os.path.exists(final_dir):
            shutil.rmtree(stage, ignore_errors=True)
            return read_manifest(root, v)
        raise
    _write_current(root, v)
    return man


def _write_current(root: str, v: int) -> None:
    """Atomically advance the CURRENT pointer (fsynced for crash safety:
    rename alone does not guarantee the file CONTENT hit disk)."""
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": v}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(root, "CURRENT"))


def apply_incremental(root: str, events: "ray.data.Dataset", *,
                      num_partitions: int = 64) -> Manifest:
    """Apply a (micro-)batch of change events on top of the current state.

    Exactly-once: events at or below the committed watermark are filtered
    out (idempotent re-application); the new watermark is the max
    commit_seq across the incoming filtered events (deletes included).
    """
    import pyarrow.compute as pc

    man = read_manifest(root)
    wm = man.watermark if man else -1

    def _above(b):
        return b.filter(pc.greater(b["commit_seq"], wm))

    import pyarrow as pa

    from kettleray.ops.cdc import evolve_to_schema, unify_event_schemas

    fresh = events.map_batches(_above, batch_format="pyarrow",
                               zero_copy_batch=True)
    try:
        new_wm = int(fresh.max("commit_seq"))
    except (TypeError, ValueError):
        new_wm = wm
    if new_wm <= wm and man is not None:
        return man                      # nothing new — no-op commit

    state = read_state(root)
    if state is not None:
        def _state_as_events(b):
            b = b.drop_columns([c for c in ("content_sha256",)
                                if c in b.column_names])
            b = b.rename_columns(
                [c if c != "last_commit_seq" else "commit_seq"
                 for c in b.column_names])
            return b.append_column(
                "op", pa.array(["insert"] * b.num_rows))
        pseudo = state.map_batches(_state_as_events, batch_format="pyarrow")
        # schema evolution across generations: additive columns backfill
        # null, widening casts apply, on BOTH sides before the union
        target = unify_event_schemas(
            [pseudo.schema().base_schema, fresh.schema().base_schema])
        merged = evolve_to_schema(pseudo, target).union(
            evolve_to_schema(fresh, target))
    else:
        merged = fresh
    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    return commit_state(final, root, watermark=new_wm,
                        metrics={"prev_watermark": wm})


# ---------------------------------------------------------------------------
# Bucketed state: rewrite only the buckets a batch touches (copy-on-write
# file groups, ≙ a lake-upsert layout). Untouched buckets are HARDLINKED
# into the new version — resumable output per SURVEY.md §7.2.5.
# ---------------------------------------------------------------------------

def add_bucket_column(ds: "ray.data.Dataset", num_buckets: int,
                      col: str = "bucket",
                      bucket_cols: tuple = ("repo", "path"),
                      ) -> "ray.data.Dataset":
    """Stable key bucket: crc32 of the \\x00-joined ``bucket_cols`` % B
    (process-independent, unlike Python's salted hash); crc32 computed
    once per UNIQUE key via dictionary encoding (cdc.stable_key_buckets).

    ``bucket_cols`` must be a prefix-compatible grouping of the upsert
    key (repo, path): the default buckets by the full key (uniform
    spread); ``("repo",)`` aligns buckets with commit locality — a
    micro-batch touching few repos rewrites few buckets — at the cost of
    hot-repo bucket skew (compact those via compact_state)."""

    def _fn(t):
        import pyarrow as pa
        from kettleray.ops.cdc import stable_key_buckets
        b = stable_key_buckets(t, bucket_cols, num_buckets)
        return t.append_column(col, pa.array(b))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def apply_incremental_bucketed(root: str, events: "ray.data.Dataset", *,
                               num_buckets: int = 64,
                               num_partitions: int = 16,
                               bucket_cols: tuple = ("repo", "path"),
                               ) -> Manifest:
    """Incremental upsert over a bucket-partitioned state layout.

    Only buckets containing keys touched by this batch are re-replayed
    and rewritten; every other bucket's files are hardlinked from the
    previous version (O(1) per file). At 10^10 events with micro-batches
    touching a small key subset, this turns each commit from a full
    table rewrite into work proportional to the touched buckets.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    man = read_manifest(root)
    wm = man.watermark if man else -1

    def _above(b):
        return b.filter(pc.greater(b["commit_seq"], wm))

    fresh = events.map_batches(_above, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    fresh = add_bucket_column(fresh, num_buckets,
                              bucket_cols=bucket_cols).materialize()
    if fresh.count() == 0:
        if man is not None:
            return man
        # first-ever commit with nothing above the (empty) watermark:
        # commit an empty v0001 with the FINAL-STATE schema (not the raw
        # event schema) so later versions and readers agree.
        empty_state = ray.data.from_arrow(pa.table({
            c: pa.array([], type=pa.int64()
                        if c == "last_commit_seq" else pa.string())
            for c in cdc.FINAL_STATE_COLS}))
        return commit_state(empty_state, root, watermark=wm)
    new_wm = int(fresh.max("commit_seq"))
    # Touched-bucket set: per-block unique + driver union — a map-only
    # stage over ≤num_buckets ints per block. (A groupby here would pay a
    # full hash-shuffle + aggregator-actor spawn just to list ≤B values.)
    touched = sorted({r["bucket"] for r in fresh.map_batches(
        lambda t: pa.table({"bucket": pc.unique(t["bucket"])}),
        batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).take_all()})

    prev_v = current_version(root)
    v = 1 if prev_v is None else prev_v + 1
    os.makedirs(root, exist_ok=True)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)

    t0 = time.time()
    if prev_v is not None:
        prev_dir = _version_dir(root, prev_v)
        # hardlink untouched bucket dirs into the stage
        for name in sorted(os.listdir(prev_dir)):
            if not name.startswith("bucket="):
                continue
            b = int(name.split("=", 1)[1])
            if b in touched:
                continue
            os.makedirs(os.path.join(stage, name), exist_ok=True)
            for f in os.listdir(os.path.join(prev_dir, name)):
                os.link(os.path.join(prev_dir, name, f),
                        os.path.join(stage, name, f))
        # merge touched buckets: old rows of those buckets + fresh events
        touched_dirs = [os.path.join(prev_dir, f"bucket={b}")
                        for b in touched
                        if os.path.isdir(os.path.join(prev_dir,
                                                      f"bucket={b}"))]
        old_files = [f for d in touched_dirs for f in _parquet_files(d)]
        if old_files:
            old = ray.data.read_parquet(old_files)

            def _as_events(b):
                b = b.drop_columns(
                    [c for c in ("content_sha256", "bucket")
                     if c in b.column_names])
                b = b.rename_columns(
                    [c if c != "last_commit_seq" else "commit_seq"
                     for c in b.column_names])
                return b.append_column("op",
                                       pa.array(["insert"] * b.num_rows))

            pseudo = old.map_batches(_as_events, batch_format="pyarrow",
                                     batch_size=None)
            from kettleray.ops.cdc import (evolve_to_schema,
                                           unify_event_schemas)
            fresh_e = fresh.drop_columns(["bucket"])
            target = unify_event_schemas(
                [pseudo.schema().base_schema, fresh_e.schema().base_schema])
            merged = evolve_to_schema(pseudo, target).union(
                evolve_to_schema(fresh_e, target))
        else:
            merged = fresh.drop_columns(["bucket"])
    else:
        touched = list(range(num_buckets))
        merged = fresh.drop_columns(["bucket"])

    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    final = add_bucket_column(final, num_buckets, bucket_cols=bucket_cols)
    final.write_parquet(stage, partition_cols=["bucket"])

    files = []
    for fp in _parquet_files(stage):
        md = pq.read_metadata(fp)
        files.append({"file": os.path.relpath(fp, stage),
                      "rows": md.num_rows,
                      "bytes": os.path.getsize(fp)})
    man2 = Manifest(
        version=v, watermark=new_wm,
        schema=str(pq.read_schema(_parquet_files(stage)[0]))
        if files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "total_rows": sum(f["rows"] for f in files),
                 "touched_buckets": len(touched),
                 "num_buckets": num_buckets,
                 "prev_watermark": wm})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, v))
    except OSError:
        if os.path.isdir(_version_dir(root, v)):
            # Concurrent writer committed this version first. Unlike
            # commit_state (identical-input retries), our batch may hold
            # DIFFERENT events than the winner's — discard the stage and
            # re-apply against the new CURRENT: the watermark filter
            # keeps exactly the not-yet-applied suffix, so the retry is
            # exactly-once (a same-batch retry no-ops to the winner's
            # manifest).
            shutil.rmtree(stage, ignore_errors=True)
            return apply_incremental_bucketed(
                root, events, num_buckets=num_buckets,
                num_partitions=num_partitions, bucket_cols=bucket_cols)
        raise
    _write_current(root, v)
    return man2


def gc_versions(root: str, *, keep_last: int = 2,
                stage_min_age_s: float = 3600.0) -> list[int]:
    """Expire old state versions (a lake 'vacuum'): delete version dirs
    older than the newest ``keep_last``, never CURRENT. Safe with the
    bucketed layout's hardlinks — deleting an old version only drops
    link counts; files shared with surviving versions remain. Leftover
    ``_stage_*`` dirs from crashed writers are removed too — but ONLY
    when older than ``stage_min_age_s`` (a young stage may belong to a
    concurrently running commit; deleting it mid-write would corrupt
    that commit). Returns the deleted version numbers."""
    cur = current_version(root)
    if cur is None:
        return []
    versions = sorted(
        int(n[1:]) for n in os.listdir(root)
        if n.startswith("v") and n[1:].isdigit())
    cutoff = max(versions[-keep_last:][0] if len(versions) >= keep_last
                 else versions[0], 1)
    deleted = []
    for v in versions:
        if v < cutoff and v != cur:
            shutil.rmtree(_version_dir(root, v))
            deleted.append(v)
    now = time.time()
    for n in os.listdir(root):
        p = os.path.join(root, n)
        if n.startswith("_stage_") and \
                now - os.path.getmtime(p) >= stage_min_age_s:
            shutil.rmtree(p, ignore_errors=True)
    # prune view-partial caches (ops.ivm) for expired versions, plus any
    # stale cache stages — caches are rebuildable, so this is always safe
    agg_root = os.path.join(root, "_agg")
    if os.path.isdir(agg_root):
        for view in os.listdir(agg_root):
            vd = os.path.join(agg_root, view)
            for n in os.listdir(vd):
                p = os.path.join(vd, n)
                stale_stage = (n.endswith(".stage") and
                               now - os.path.getmtime(p) >= stage_min_age_s)
                expired = (n.startswith("v") and n[1:].isdigit()
                           and int(n[1:]) in deleted)
                if stale_stage or expired:
                    shutil.rmtree(p, ignore_errors=True)
    return deleted


def compact_state(root: str, *, max_files_per_bucket: int = 4) -> Manifest:
    """Compaction for the bucketed layout: buckets accumulating more than
    ``max_files_per_bucket`` fragments (one per incremental commit) are
    rewritten as a single file; small buckets are hardlinked through.
    Commits a new version atomically — the LSM merge step of the state
    store, run out-of-band like any lake table service."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    prev_dir = _version_dir(root, v)
    nv = v + 1
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    compacted = linked = 0
    for name in sorted(os.listdir(prev_dir)):
        if not name.startswith("bucket="):
            continue
        src = os.path.join(prev_dir, name)
        dst = os.path.join(stage, name)
        os.makedirs(dst, exist_ok=True)
        frags = _parquet_files(src)
        if len(frags) > max_files_per_bucket:
            # streaming merge: copy row groups fragment-by-fragment into
            # one ParquetWriter — peak memory is ONE row group, not the
            # whole bucket (a hot bucket can exceed worker heap at scale)
            writer = None
            try:
                for f in frags:
                    pf = pq.ParquetFile(f)
                    for rg in range(pf.num_row_groups):
                        t = pf.read_row_group(rg)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                os.path.join(dst, "compacted-0.parquet"),
                                t.schema)
                        writer.write_table(t)
            finally:
                if writer is not None:
                    writer.close()
            compacted += 1
        else:
            for f in frags:
                os.link(f, os.path.join(dst, os.path.basename(f)))
            linked += 1
    files = []
    for fp in _parquet_files(stage):
        md = pq.read_metadata(fp)
        files.append({"file": os.path.relpath(fp, stage),
                      "rows": md.num_rows, "bytes": os.path.getsize(fp)})
    man2 = Manifest(version=nv, watermark=man.watermark,
                    schema=man.schema, files=files,
                    metrics={"write_sec": round(time.time() - t0, 3),
                             "total_rows": sum(f["rows"] for f in files),
                             "compacted_buckets": compacted,
                             "linked_buckets": linked,
                             "compaction_of": v})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    os.rename(stage, _version_dir(root, nv))
    _write_current(root, nv)
    return man2
