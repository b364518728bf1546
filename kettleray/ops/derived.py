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
                      num_buckets: int = 16, num_partitions: int = 16,
                      bucket_cols: tuple = ("repo", "path"),
                      mode: str = "bucketed"):
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
        # materialize ONCE: the feed is commit-sized (touched keys, not
        # the table), and without this the schema probe below, the
        # transform-contract check and the downstream apply each
        # re-execute the whole per-bucket diff DAG (measured 3x the
        # sync latency at trickle scale)
        feed = sink.read_changes(src_root, applied, src_v,
                                 num_partitions=num_partitions) \
            .materialize()
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
    # mode="mor": delta-append the feed window instead of replaying
    # touched buckets — per-sync cost drops to the feed itself + one
    # append; compaction (sink.maybe_compact_mor) runs out-of-band
    apply = sink.apply_incremental_mor if mode == "mor" \
        else sink.apply_incremental_bucketed
    man = apply(
        dst_root, fresh, num_buckets=num_buckets,
        num_partitions=num_partitions, bucket_cols=bucket_cols)
    sink.atomic_write_json(os.path.join(dst_root, _CURSOR),
                           {"src_version": src_v})
    return man


# ---------------------------------------------------------------------------
# Incrementally maintained JOIN view (delta join over two sink tables)
# ---------------------------------------------------------------------------

_JOIN_CURSOR = "JOIN_CURSOR.json"


def _join_cursor(dst_root: str) -> "dict | None":
    p = os.path.join(dst_root, _JOIN_CURSOR)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _payload_fields(sch: pa.Schema) -> list[pa.Field]:
    from kettleray.ops import cdc
    skip = set(cdc.KEY_COLS) | {"content_sha256", "last_commit_seq",
                                "bucket"}
    return [sch.field(i) for i in range(len(sch))
            if sch.field(i).name not in skip]


def _key_strings(t: pa.Table) -> pa.Array:
    """repo + NUL + path composite (both sides of the set-difference use
    the same construction, so collisions are impossible for valid keys:
    NUL never appears in a path)."""
    arr = pc.binary_join_element_wise(t["repo"], t["path"], "\x00")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def sync_join_view(dst_root: str, a_root: str, b_root: str, *,
                   how: str = "inner", b_suffix: str = "_r",
                   num_partitions: int = 16,
                   dst_num_buckets: int | None = None,
                   apply: str = "bucketed"):
    """Incrementally maintained JOIN of two sink tables (Δ(A⋈B) =
    ΔA⋈B ∪ A⋈ΔB — the delta-join rule of incremental view maintenance;
    ≙ a Kettle Merge Join Trans re-run per CDC batch, re-expressed as
    touched-bucket maintenance): the view at ``dst_root`` holds, per
    key, A's payload joined with B's payload (B columns suffixed
    ``b_suffix``). ``how='inner'`` keeps keys present in both;
    ``how='left'`` keeps every A key with null B columns on a miss.

    Scale shape: A and B must share the bucket layout (enforced), so a
    key's rows co-locate — each sync (1) discovers TOUCHED buckets by
    file-inode identity (metadata-only, no file opened), (2) re-joins
    only those buckets in independent per-bucket tasks (zero shuffle —
    the co-partitioned merge), (3) derives delete tombstones inside the
    same task from the bucket's key universe at the CURSOR versions
    plus now (a key deleted from BOTH sides since the cursor appears in
    neither current state; the old-version reads are key-pruned —
    keys+seq+op columns only). Per-sync cost tracks the COMMITS, not
    the tables, and the normal path runs NO per-sync feed job. Rebucket
    boundaries degrade to a full resync where the feeds'
    layout-independent fallback supplies the tombstones instead.
    ``apply='mor'`` commits the view merge-on-read (delta appends —
    the cheap-commit layout for trickle syncs; pair with compact_mor).

    Exactly-once: events are stamped with the monotone epoch
    ``a_version + b_version`` (each sync advances at least one), so the
    downstream sink's watermark filter no-ops crash retries; the cursor
    advances only AFTER the downstream commit."""
    import ray
    import ray.data as rd

    from kettleray.ops import cdc

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    a_v, b_v = sink.current_version(a_root), sink.current_version(b_root)
    if a_v is None or b_v is None:
        raise FileNotFoundError("both join inputs need a committed state")
    cur = _join_cursor(dst_root)
    if cur is not None and cur["a_version"] == a_v \
            and cur["b_version"] == b_v:
        return sink.read_manifest(dst_root)

    ma, mb = sink.read_manifest(a_root, a_v), sink.read_manifest(b_root,
                                                                 b_v)

    def _layout(m):
        return (m.metrics.get("num_buckets"),
                tuple(m.metrics.get("bucket_cols", ("repo", "path"))))

    if _layout(ma) != _layout(mb) or ma.metrics.get("num_buckets") is None:
        raise ValueError(
            f"sync_join_view requires co-partitioned inputs (same "
            f"num_buckets/bucket_cols); got {_layout(ma)} vs "
            f"{_layout(mb)}")
    if dst_num_buckets is None:
        dst_num_buckets = int(ma.metrics["num_buckets"])

    # --- target event schema (driver-side, footers only) ----------------
    a_pay = _payload_fields(sink.state_schema(a_root, a_v))
    b_pay = _payload_fields(sink.state_schema(b_root, b_v))
    a_names = {f.name for f in a_pay}
    clash = [f.name for f in b_pay if f.name + b_suffix in a_names]
    if clash:
        raise ValueError(f"suffixed B columns collide with A payload: "
                         f"{clash}")
    ev_schema = pa.schema(
        [pa.field("repo", pa.string()), pa.field("path", pa.string())]
        + a_pay
        + [pa.field(f.name + b_suffix, f.type) for f in b_pay]
        + [pa.field("op", pa.string()),
           pa.field("commit_seq", pa.int64())])
    epoch = a_v + b_v

    # --- touched buckets (inode identity; None => rebucketed) -----------
    bootstrap = cur is None
    resync = bootstrap
    if not bootstrap:
        ca = sink.changed_bucket_names(a_root, cur["a_version"], a_v)
        cb = sink.changed_bucket_names(b_root, cur["b_version"], b_v)
        if ca is None or cb is None:
            resync = True
    ga = sink._bucket_file_groups(sink._version_dir(a_root, a_v))
    gb = sink._bucket_file_groups(sink._version_dir(b_root, b_v))
    # a touched bucket absent from the current versions (all its keys
    # gone) still runs — empty inputs yield no upserts, and its deleted
    # keys arrive via the feed-tombstone path below
    names = sorted(set(ga) | set(gb)) if resync else sorted(ca | cb)

    a_pay_names = [f.name for f in a_pay]
    b_pay_names = [f.name for f in b_pay]

    a_cm = sink.read_column_mapping(a_root)
    b_cm = sink.read_column_mapping(b_root)

    @ray.remote
    def _join_bucket(a_base, a_delta, b_base, b_delta, old_groups):
        A = sink.merged_bucket_state(a_base, a_delta, colmap=a_cm)
        B = sink.merged_bucket_state(b_base, b_delta, colmap=b_cm)

        def _side(t, pay, suffix):
            if t.num_columns == 0:
                t = pa.schema(
                    [pa.field("repo", pa.string()),
                     pa.field("path", pa.string())]
                    + [pa.field(n, ev_schema.field(
                        n if not suffix else n + suffix).type)
                       for n in pay]).empty_table()
            keep = ["repo", "path"] + [c for c in pay
                                       if c in t.column_names]
            t = t.select(keep)
            tgt = pa.schema(
                [pa.field("repo", pa.string()),
                 pa.field("path", pa.string())]
                + [pa.field(n, ev_schema.field(
                    n if not suffix else n + suffix).type) for n in pay])
            t = cdc.conform_table(t, tgt)
            if suffix:
                t = t.rename_columns(
                    ["repo", "path"] + [n + suffix for n in pay])
            return t

        At = _side(A, a_pay_names, "")
        Bt = _side(B, b_pay_names, b_suffix)
        joined = At.join(Bt, keys=["repo", "path"],
                         join_type="inner" if how == "inner"
                         else "left outer")
        n = joined.num_rows
        up = joined.append_column(
            "op", pa.array(["update"] * n, type=pa.string()))
        up = up.append_column(
            "commit_seq", pa.array([epoch] * n, type=pa.int64()))
        up = cdc.conform_table(up, ev_schema)
        # tombstones: any key live in this bucket at the CURSOR versions
        # or now, that no longer produces a view row (inner: either side
        # missing; left: A-side missing). Old keys come from key-pruned
        # bucket-local reads (keys+seq+op columns only) — a key deleted
        # from BOTH sides since the cursor exists in neither current
        # state, so the current universe alone would miss it.
        view_keys = _key_strings(At if how == "left" else joined)
        uni_parts = [At.select(["repo", "path"]),
                     Bt.select(["repo", "path"])]
        for obase, odelta in old_groups:
            K = sink.merged_bucket_state(obase, odelta, columns=[],
                                         with_sha=False)
            if K.num_columns:
                uni_parts.append(K.select(["repo", "path"]))
        uni = pa.concat_tables(uni_parts) \
            .group_by(["repo", "path"]).aggregate([])
        gone = uni.filter(pc.invert(pc.is_in(
            _key_strings(uni), value_set=view_keys)))
        tomb = cdc.conform_table(
            pa.table({"repo": gone["repo"], "path": gone["path"],
                      "op": pa.array(["delete"] * gone.num_rows,
                                     type=pa.string()),
                      "commit_seq": pa.array([epoch] * gone.num_rows,
                                             type=pa.int64())}),
            ev_schema)
        return pa.concat_tables([up, tomb])

    # old bucket-file groups at the cursor versions: the per-bucket task
    # derives its own tombstone universe from them — no per-sync feed
    # job in the normal path (trickle syncs would otherwise pay a fixed
    # Dataset-job latency per side for ~0 rows)
    if not bootstrap and not resync:
        ga_old = sink._bucket_file_groups(
            sink._version_dir(a_root, cur["a_version"]))
        gb_old = sink._bucket_file_groups(
            sink._version_dir(b_root, cur["b_version"]))
    else:
        ga_old = gb_old = {}

    def _grp(g, n):
        e = g.get(n)
        return (e["base"], e["delta"]) if e else ([], [])

    refs = [_join_bucket.remote(
        *_grp(ga, n), *_grp(gb, n),
        [_grp(ga_old, n), _grp(gb_old, n)])
        for n in names]
    events = rd.from_arrow_refs(refs) if refs \
        else rd.from_arrow(ev_schema.empty_table())

    if resync and not bootstrap:
        # rebucket boundary: old bucket names no longer correspond, so
        # per-bucket old-universe reads are impossible — the feeds'
        # layout-independent fallback supplies the deleted keys instead
        def _feed_deletes(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return ev_schema.empty_table()
            d = t.filter(pc.equal(t["change_type"], "deleted"))
            return cdc.conform_table(
                pa.table({"repo": d["repo"], "path": d["path"],
                          "op": pa.array(["delete"] * d.num_rows,
                                         type=pa.string()),
                          "commit_seq": pa.array([epoch] * d.num_rows,
                                                 type=pa.int64())}),
                ev_schema)

        for root, frm, to in ((a_root, cur["a_version"], a_v),
                              (b_root, cur["b_version"], b_v)):
            if frm == to:
                continue
            feed = sink.read_changes(root, frm, to,
                                     num_partitions=num_partitions)
            events = events.union(feed.map_batches(
                _feed_deletes, batch_format="pyarrow",
                zero_copy_batch=True))

    apply_fn = (sink.apply_incremental_mor if apply == "mor"
                else sink.apply_incremental_bucketed)
    man = apply_fn(
        dst_root, events, num_buckets=dst_num_buckets,
        num_partitions=num_partitions)
    sink.atomic_write_json(os.path.join(dst_root, _JOIN_CURSOR),
                           {"a_version": a_v, "b_version": b_v})
    return man
