"""Set-based DML over committed lake state: DELETE / UPDATE / MERGE.

Reimagines Kettle's table-maintenance steps Ray-Data-first:

- Delete (ref: engine/.../steps/delete/Delete.java — key-driven row
  deletion against a table)            -> :func:`delete_where`
- Update (ref: engine/.../steps/update/Update.java — field updates for
  matching rows)                        -> :func:`update_where`
- Insert/Update + Synchronize After Merge conditional routing
  (ref: engine/.../steps/insertupdate/InsertUpdate.java,
   synchronizeaftermerge/SynchronizeAfterMerge.java) -> :func:`merge_into`
  (ANSI MERGE semantics: WHEN MATCHED [AND cond] THEN UPDATE/DELETE,
   WHEN NOT MATCHED [AND cond] THEN INSERT)

Scale shape (the whole point at 10^10 rows):

- DELETE/UPDATE predicate scans go through :func:`sink.scan_state` —
  zone-map file skipping means a selective predicate on a clustered
  column opens only the files that can match, never the table.
- Every operation emits CHANGE EVENTS (op + commit_seq = watermark + 1)
  and commits through ``apply_incremental_mor``: cost ∝ matched rows
  (delta append + hardlink forward), never a table rewrite. Tombstones,
  exactly-once retry, the changefeed, time travel, derived-view sync and
  compaction all compose for free because DML *is* a CDC commit.
- MERGE joins source↔target per bucket: the source is hash-bucketed once
  by the sink's own key routing, each bucket task joins locally against
  its co-partitioned base+delta files — no all-to-all exchange and no
  driver materialization.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from kettleray.ops import cdc

_EVENT_VALUE_COLS = ("commit", "lang", "content")


def _state_to_events(t: pa.Table, op: str, commit_seq: int) -> pa.Table:
    """Final-state rows → change events with the given op at one commit
    position. Value columns ride along (a tombstone's values are
    irrelevant to LWW but keep the delta files schema-uniform)."""
    t = t.drop_columns([c for c in ("content_sha256", "bucket")
                        if c in t.column_names])
    if "last_commit_seq" in t.column_names:
        t = t.drop_columns(["last_commit_seq"])
    t = t.append_column("op", pa.array([op] * t.num_rows))
    return t.append_column(
        "commit_seq", pa.array([commit_seq] * t.num_rows,
                               type=pa.int64()))


def _layout(man) -> tuple[int, tuple]:
    m = man.metrics or {}
    return (int(m.get("num_buckets", 64)),
            tuple(m.get("bucket_cols", ("repo", "path"))))


def delete_where(root: str, filters, *,
                 num_partitions: int = 16) -> "tuple":
    """DELETE FROM state WHERE <filters> — as one CDC commit.

    ``filters``: the ``(col, op, literal)`` conjunction of
    :func:`sink.scan_state` (zone-map pruned: on a clustered layout only
    candidate files are opened). Matched rows become tombstone events at
    ``watermark + 1`` and commit through the merge-on-read path — a
    million-row delete writes ~a delta file per touched bucket, zero
    base rewrites. Returns ``(manifest, scan_report)``.
    """
    from kettleray.io import sink
    man = sink.read_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed state under {root}")
    wm = man.watermark
    nb, bc = _layout(man)
    report: dict = {}
    matched = sink.scan_state(root, filters, report=report)
    events = matched.map_batches(
        lambda t: _state_to_events(t, cdc.OP_DELETE, wm + 1),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    man2 = sink.apply_incremental_mor(root, events, num_buckets=nb,
                                      num_partitions=num_partitions,
                                      bucket_cols=bc)
    return man2, report


def update_where(root: str, filters, set_values: dict, *,
                 num_partitions: int = 16) -> "tuple":
    """UPDATE state SET <col=value, ...> WHERE <filters> — as one CDC
    commit (≙ Kettle Update). ``set_values`` maps an event value column
    to a literal OR a callable ``fn(matched_rows: pa.Table) -> pa.Array``
    (computed updates, e.g. redaction of the old value). Matched rows
    re-emit as ``update`` events carrying the new values at
    ``watermark + 1``; the content digest is re-derived downstream, so
    the per-row sha256 invariant stays intact. Returns
    ``(manifest, scan_report)``."""
    from kettleray.io import sink
    for c in set_values:
        if c not in _EVENT_VALUE_COLS:
            raise ValueError(
                f"update_where can set {sorted(_EVENT_VALUE_COLS)}, "
                f"got {c!r} (key columns are immutable — delete+insert)")
    man = sink.read_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no committed state under {root}")
    wm = man.watermark
    nb, bc = _layout(man)
    report: dict = {}
    matched = sink.scan_state(root, filters, report=report)

    def _to_updates(t: pa.Table) -> pa.Table:
        ev = _state_to_events(t, cdc.OP_UPDATE, wm + 1)
        for col, val in set_values.items():
            arr = val(t) if callable(val) else pa.array(
                [val] * t.num_rows,
                type=ev[col].type if col in ev.column_names else None)
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array(arr)
            ev = ev.set_column(ev.column_names.index(col), col, arr) \
                if col in ev.column_names else ev.append_column(col, arr)
        return ev

    events = matched.map_batches(_to_updates, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
    man2 = sink.apply_incremental_mor(root, events, num_buckets=nb,
                                      num_partitions=num_partitions,
                                      bucket_cols=bc)
    return man2, report


def _key_index(keys_a: pa.Table, keys_b: pa.Table,
               key_cols) -> pa.Array:
    """Vectorized key join: position of each row of ``keys_a`` in
    ``keys_b`` (null = no match), via \\x00-joined composite keys."""
    def _j(t):
        cols = [pc.cast(t[c], pa.string()) for c in key_cols]
        return pc.binary_join_element_wise(*cols, "\x00")
    return pc.index_in(_j(keys_a), pa.chunked_array([_j(keys_b)]))


def merge_into(root: str, source: "ray.data.Dataset", *,
               when_matched_update: bool = True,
               matched_condition=None,
               delete_condition=None,
               when_not_matched_insert: bool = True,
               insert_condition=None,
               num_partitions: int = 16) -> "object":
    """ANSI-MERGE over the lake state, executed as ONE CDC commit.

    ``source`` rows carry the sink's key columns plus the event value
    columns (``commit, lang, content``) and must be key-unique (ANSI
    MERGE cardinality rule — enforced per bucket, raises otherwise).

    Clause semantics (evaluated in this order, like SQL MERGE):

    - matched AND ``delete_condition``      → DELETE (tombstone event)
    - matched AND ``matched_condition``     → UPDATE with source values
      (``when_matched_update=True`` with no condition updates every
      remaining matched row)
    - not matched AND ``insert_condition``  → INSERT with source values

    Conditions are callables ``fn(joined: pa.Table) -> bool array``
    where ``joined`` has the source columns plain and the target row's
    columns prefixed ``t_`` (``t_lang``, ``t_content``, ...).

    Execution: the source is bucketed ONCE by the sink's own key
    routing and spilled per bucket; each bucket task then reads its
    co-partitioned base+delta files, joins locally (vectorized
    ``index_in`` on composite keys), routes rows through the clauses,
    and emits events at ``watermark + 1``. The commit itself is the
    merge-on-read delta append — cost ∝ source rows, not table size.
    """
    from kettleray.io import sink
    man = sink.read_manifest(root)
    if man is None:
        raise FileNotFoundError(
            f"no committed state under {root} — commit a base version "
            f"first (apply_incremental_mor/bucketed)")
    wm = man.watermark
    nb, bc = _layout(man)
    v = sink.current_version(root)
    vdir = sink._version_dir(root, v)

    src = sink.add_bucket_column(source, nb, bucket_cols=bc)
    tmp = tempfile.mkdtemp(prefix="kr_merge_src_")
    try:
        src.write_parquet(tmp, partition_cols=["bucket"])
        groups = sink._bucket_file_groups(vdir)
        src_by_bucket = {}
        for name in os.listdir(tmp):
            if name.startswith("bucket="):
                src_by_bucket[name] = [
                    os.path.join(tmp, name, f)
                    for f in sorted(os.listdir(os.path.join(tmp, name)))]
        items = []
        for name, files in sorted(src_by_bucket.items()):
            g = groups.get(name, {"base": [], "delta": []})
            items.append({"bucket": name, "src": files,
                          "base": g["base"], "delta": g["delta"]})
        if not items:
            return man                      # empty source: no-op

        key_cols = list(bc) if set(bc) >= set(cdc.KEY_COLS) else \
            list(cdc.KEY_COLS)

        mi_cm = sink.read_column_mapping(root)

        def _merge_bucket(t: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq
            outs = []
            for i in range(t.num_rows):
                s = pa.concat_tables(
                    [pq.read_table(f) for f in t["src"][i].as_py()],
                    promote_options="permissive")
                if "bucket" in s.column_names:
                    s = s.drop_columns(["bucket"])
                # ANSI MERGE cardinality: key-unique source
                kj = pc.binary_join_element_wise(
                    *[pc.cast(s[c], pa.string()) for c in key_cols],
                    "\x00")
                if pc.count_distinct(kj).as_py() != s.num_rows:
                    raise ValueError(
                        "merge_into: source is not key-unique "
                        f"(bucket {t['bucket'][i].as_py()})")
                tgt = sink.merged_bucket_state(
                    t["base"][i].as_py(), t["delta"][i].as_py(),
                    colmap=mi_cm)
                if tgt.num_rows:
                    if "bucket" in tgt.column_names:
                        tgt = tgt.drop_columns(["bucket"])
                    pos = _key_index(s, tgt, key_cols)
                else:
                    pos = pa.array([None] * s.num_rows, type=pa.int64())
                matched_mask = pc.is_valid(pos)
                # joined view: source cols plain + target cols t_-prefixed
                # (null t_ columns on unmatched rows)
                safe_pos = pc.fill_null(pos, 0)
                joined = s
                for c in tgt.column_names:
                    if tgt.num_rows:
                        col = tgt[c].take(safe_pos).combine_chunks()
                        col = pc.if_else(
                            matched_mask, col,
                            pa.scalar(None, type=col.type))
                    else:
                        col = pa.nulls(s.num_rows,
                                       type=tgt.schema.field(c).type)
                    joined = joined.append_column("t_" + c, col)

                false_all = pa.array([False] * s.num_rows)

                def _cond(fn, enabled):
                    if not enabled:
                        return false_all
                    if fn is None:
                        return pa.array([True] * s.num_rows)
                    m = fn(joined)
                    if not isinstance(m, (pa.Array, pa.ChunkedArray)):
                        m = pa.array(m)
                    return pc.fill_null(m, False)

                del_m = pc.and_(matched_mask,
                                _cond(delete_condition,
                                      delete_condition is not None))
                upd_m = pc.and_(
                    pc.and_(matched_mask, pc.invert(del_m)),
                    _cond(matched_condition, when_matched_update))
                ins_m = pc.and_(pc.invert(matched_mask),
                                _cond(insert_condition,
                                      when_not_matched_insert))

                parts = []
                dels = s.filter(del_m)
                if dels.num_rows:
                    parts.append(_state_to_events(
                        dels, cdc.OP_DELETE, wm + 1))
                upds = s.filter(upd_m)
                if upds.num_rows:
                    parts.append(_state_to_events(
                        upds, cdc.OP_UPDATE, wm + 1))
                ins = s.filter(ins_m)
                if ins.num_rows:
                    parts.append(_state_to_events(
                        ins, cdc.OP_INSERT, wm + 1))
                if parts:
                    outs.append(pa.concat_tables(
                        parts, promote_options="permissive"))
            if outs:
                return pa.concat_tables(outs,
                                        promote_options="permissive")
            empty = s.schema.empty_table() if t.num_rows else pa.table({})
            return _state_to_events(empty, cdc.OP_UPDATE, wm + 1)

        events = ray.data.from_items(
            items, override_num_blocks=len(items)).map_batches(
            _merge_bucket, batch_format="pyarrow", batch_size=None)
        # materialize before the tmp source spill is deleted — the
        # events are commit-sized (≤ source rows), not table-sized
        events = events.materialize()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return sink.apply_incremental_mor(root, events, num_buckets=nb,
                                      num_partitions=num_partitions,
                                      bucket_cols=bc)
