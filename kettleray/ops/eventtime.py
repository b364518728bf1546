"""Event-time tumbling windows with watermarks and exactly-once
finalization.

The streaming semantics Kettle approximates with timed micro-Trans runs
(≙ engine/.../steps/groupby re-run per load window) and that the brief
names as a wanted custom operator ("a streaming window"): events carry
an EVENT-TIME column and arrive out of order across micro-batches; a
monotone watermark (max event time seen − allowed lateness) decides
when a tumbling window is COMPLETE; complete windows are emitted to an
append-only finalized log EXACTLY ONCE and never revised; events older
than the watermark (their window already finalized) are routed to a
late log for audit instead of silently mutating emitted results — the
Flink/Beam watermark contract, built on this repo's versioned-store
discipline.

Scale shape (the 100-TB argument):

* Per-event work is DISTRIBUTED: one ``map_batches`` pass stamps
  window ids and the late flag, late rows stream straight to parquet,
  and good rows fold into per-block PARTIAL aggregates (count/sum/min/
  max — algebraic, so block partials merge associatively).
* Only the PARTIALS reach the driver: bounded by
  ``groups × open windows × blocks``, the same driver-gets-partials
  contract as ``ops.ivm`` — never the events. Open-window state is
  ``groups × windows inside the lateness horizon`` rows: metadata-sized
  by construction, independent of event volume.
* Each ``ingest`` is ONE atomic version commit (stage → rename →
  CURRENT): open state, this batch's finalized windows, and its late
  rows publish together or not at all. A crash before the rename
  publishes nothing; a redelivered batch is fenced by ``batch_id``
  (recorded in the manifest) and by version allocation that skips
  crash orphans (max(dirs, CURRENT) + 1 — readers only trust CURRENT).
  Finalized files are append-only per version, so re-reading the log
  never sees a window twice.

Store layout::

    root/SPEC.json                 window/lateness/groups/aggs (pinned)
    root/v000N/open.parquet        open-window partials after batch N
    root/v000N/finalized.parquet   windows finalized BY batch N
    root/v000N/late/*.parquet      raw late events of batch N
    root/v000N/manifest.json      {version, watermark, batch_id, counts}
    root/CURRENT                   {"version": N}

Aggregate fns are restricted to MERGEABLE forms on purpose —
count/sum/min/max (partial == final representation; count partials
merge by sum) plus ``approx_distinct`` (HLL registers in the open
state, register-max merge, int64 estimate in the finalized log) — so
open state, merge and finalize share one algebra.
"""
from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from kettleray.io.sink import atomic_write_json, current_version

_MERGE_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
# approx_distinct rides mergeable HLL sketches (ops.sketches): the open
# state stores REGISTERS (binary, 2^p bytes per group-window), merge is
# register-max, finalize emits the int64 estimate. Same partial/merge/
# finalize algebra as count/sum/min/max, so watermarks, exactly-once
# and the bounded-driver contract all hold unchanged.
_SKETCH_FN = "approx_distinct"


def _vdir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def _next_version(root: str) -> int:
    vs = [int(n[1:]) for n in os.listdir(root)
          if n.startswith("v") and n[1:].isdigit()] \
        if os.path.isdir(root) else []
    cur = current_version(root)
    if cur is not None:
        vs.append(cur)
    return (max(vs) + 1) if vs else 1


def _load_spec(root: str) -> "dict | None":
    p = os.path.join(root, "SPEC.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _check_spec(root: str, spec: dict) -> dict:
    stored = _load_spec(root)
    if stored is None:
        os.makedirs(root, exist_ok=True)
        atomic_write_json(os.path.join(root, "SPEC.json"), spec)
        return spec
    if stored != spec:
        raise ValueError(
            f"window spec drifted: stored {stored}, got {spec} — a "
            f"window store is single-spec (open a new root to change)")
    return stored


def _validate_aggs(aggs: Mapping[str, tuple]) -> "dict[str, list]":
    out = {}
    for name, (fn, col) in aggs.items():
        if fn not in _MERGE_FN and fn != _SKETCH_FN:
            raise ValueError(
                f"agg fn {fn!r} not in "
                f"{sorted(_MERGE_FN) + [_SKETCH_FN]} "
                f"(mergeable fns only — partials must merge)")
        if fn != "count" and col is None:
            raise ValueError(f"agg {name!r}: {fn} needs a column")
        out[name] = [fn, col]
    return out


def read_manifest(root: str, version: "int | None" = None) -> "dict | None":
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    with open(os.path.join(_vdir(root, v), "manifest.json")) as f:
        return json.load(f)


def watermark(root: str) -> int:
    man = read_manifest(root)
    return man["watermark"] if man else -(1 << 62)


def open_windows(root: str) -> "pa.Table | None":
    v = current_version(root)
    if v is None:
        return None
    return pq.read_table(os.path.join(_vdir(root, v), "open.parquet"))


def finalized(root: str) -> "ray.data.Dataset | None":
    """All finalized windows: union of every version's append-only
    finalized file up to CURRENT (crash orphans above CURRENT are
    invisible — same reader contract as the state sink)."""
    v = current_version(root)
    if v is None:
        return None
    files = [p for i in range(1, v + 1)
             if os.path.exists(p := os.path.join(_vdir(root, i),
                                                 "finalized.parquet"))]
    return ray.data.read_parquet(files) if files else None


def late_log(root: str) -> "ray.data.Dataset | None":
    v = current_version(root)
    if v is None:
        return None
    files = []
    for i in range(1, v + 1):
        d = os.path.join(_vdir(root, i), "late")
        if os.path.isdir(d):
            files.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                         if f.endswith(".parquet"))
    return ray.data.read_parquet(files) if files else None


def _time_us(col: "pa.ChunkedArray") -> "pa.ChunkedArray":
    if pa.types.is_timestamp(col.type):
        return pc.cast(col, pa.int64())        # µs for timestamp[us]
    return pc.cast(col, pa.int64())


def _group_sketches(lists: "pa.ChunkedArray", p: int, *,
                    merge_bytes: bool) -> pa.Array:
    """Per-group HLL registers from an arrow ``list`` aggregate column:
    partial stage sketches each group's raw values, merge stage
    register-maxes its already-built sketches. One Python iteration per
    GROUP (partial-row bounded — the per-value work is the vectorized
    hash kernel inside HLL.update_column)."""
    from kettleray.ops.sketches import HLL
    la = lists.combine_chunks()
    out = []
    for i in range(len(la)):
        vals = la[i].values
        h = HLL(p)
        if merge_bytes:
            for b in vals:
                h.merge(HLL.from_bytes(b.as_py()))
        else:
            h.update_column(vals)
        out.append(h.to_bytes())
    return pa.array(out, type=pa.binary())


def _partial_table(t: pa.Table, group_cols: Sequence[str],
                   aggs: "dict[str, list]", hll_p: int) -> pa.Table:
    """Per-block partial aggregates over (group_cols, window bounds)."""
    keys = list(group_cols) + ["window_start", "window_end"]
    plan, src_cols, sk_lists = [], {}, {}
    for name, (fn, col) in aggs.items():
        if fn == _SKETCH_FN:
            if (col, "list") not in plan:
                plan.append((col, "list"))
            sk_lists[name] = f"{col}_list"
            continue
        src = col if fn != "count" else "window_start"
        arrow_fn = "count" if fn == "count" else fn
        if (src, arrow_fn) not in plan:    # two aggs may share a kernel
            plan.append((src, arrow_fn))
        src_cols[name] = f"{src}_{arrow_fn}"
    g = t.select(keys + sorted({c for c, _ in plan
                                if c not in keys})) \
        .group_by(keys).aggregate(plan)
    cols = {k: g[k] for k in keys}
    for name in aggs:
        if name in sk_lists:
            cols[name] = _group_sketches(g[sk_lists[name]], hll_p,
                                         merge_bytes=False)
        else:
            cols[name] = g[src_cols[name]]
    return pa.table(cols)


def _merge_partials(parts: "list[pa.Table]", group_cols: Sequence[str],
                    aggs: "dict[str, list]", hll_p: int) -> pa.Table:
    """Merge partial tables (associative: count merges by sum,
    sketches by register max)."""
    t = pa.concat_tables([p for p in parts if p.num_rows],
                         promote_options="permissive") \
        if any(p.num_rows for p in parts) else parts[0]
    keys = list(group_cols) + ["window_start", "window_end"]
    plan = [(name, "list" if fn == _SKETCH_FN else _MERGE_FN[fn])
            for name, (fn, _) in aggs.items()]
    g = t.group_by(keys).aggregate(plan)
    cols = {k: g[k] for k in keys}
    for name, (fn, _) in aggs.items():
        if fn == _SKETCH_FN:
            cols[name] = _group_sketches(g[f"{name}_list"], hll_p,
                                         merge_bytes=True)
        else:
            cols[name] = g[f"{name}_{_MERGE_FN[fn]}"]
    return pa.table(cols)


def _finalize_sketches(fin: pa.Table, aggs: "dict[str, list]") -> pa.Table:
    """Emitted (finalized) rows carry int64 ESTIMATES, not registers —
    the log is the queryable result; open state keeps the mergeable
    form."""
    from kettleray.ops.sketches import HLL
    for name, (fn, _) in aggs.items():
        if fn != _SKETCH_FN:
            continue
        est = pa.array(
            [int(round(HLL.from_bytes(b.as_py()).estimate()))
             for b in fin[name].combine_chunks()], type=pa.int64())
        fin = fin.set_column(fin.column_names.index(name), name, est)
    return fin


def gc(root: str, *, keep_last: int = 2) -> dict:
    """Reclaim superseded OPEN-state snapshots: every version rewrites
    ``open.parquet`` in full, so a long-running store accumulates one
    copy per micro-batch. GC deletes ``open.parquet`` from versions
    older than the newest ``keep_last`` — ``finalized.parquet`` and
    ``late/`` are APPEND-ONLY logs read across all versions and are
    never touched; manifests stay for audit. Crash-orphaned
    ``_stage_*`` dirs are swept."""
    v = current_version(root)
    if v is None:
        return {"removed_open_files": 0, "bytes_reclaimed": 0,
                "stage_dirs_swept": 0}
    cutoff = v - max(int(keep_last), 1) + 1
    removed = swept = freed = 0
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if name.startswith("_stage_") and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
            swept += 1
            continue
        if not (name.startswith("v") and name[1:].isdigit()):
            continue
        if int(name[1:]) >= cutoff:
            continue
        of = os.path.join(p, "open.parquet")
        if os.path.exists(of):
            freed += os.path.getsize(of)
            os.remove(of)
            removed += 1
    return {"removed_open_files": removed, "bytes_reclaimed": freed,
            "stage_dirs_swept": swept}


def ingest(root: str, events: "ray.data.Dataset", *,
           time_col: str = "ts",
           window_s: int,
           lateness_s: int = 0,
           group_cols: Sequence[str] = (),
           aggs: Mapping[str, tuple],
           hll_p: int = 12,
           batch_id: "str | None" = None) -> dict:
    """Apply one micro-batch and return the new manifest (see module
    docstring for semantics and the atomicity/exactly-once contract).

    ``aggs``: ``{out_name: (fn, col)}`` with fn in count/sum/min/max
    (col ignored for count). Returns the EXISTING manifest unchanged
    when ``batch_id`` matches the LAST applied batch — the fence covers
    in-order retries (the delivery discipline of ``kettleray.tail``'s
    cursor loop: a batch is re-sent only until its apply is acked, never
    after a later batch applied); out-of-order replays of older batches
    must be deduplicated upstream.
    """
    w_us = int(window_s) * 1_000_000
    l_us = int(lateness_s) * 1_000_000
    aggs = _validate_aggs(aggs)
    spec = {"window_us": w_us, "lateness_us": l_us,
            "group_cols": list(group_cols),
            "aggs": aggs, "time_col": time_col, "hll_p": int(hll_p)}
    _check_spec(root, spec)
    man = read_manifest(root)
    if man and batch_id is not None and man.get("batch_id") == batch_id:
        return man                       # redelivered batch: no-op
    prev_wm = man["watermark"] if man else None

    def _route(t: pa.Table) -> pa.Table:
        us = _time_us(t[time_col]).to_numpy()
        ws = (us // w_us) * w_us
        t = t.append_column("window_start", pa.array(ws, pa.int64()))
        t = t.append_column("window_end", pa.array(ws + w_us, pa.int64()))
        late = np.zeros(len(ws), dtype=bool) if prev_wm is None \
            else (ws + w_us) <= prev_wm
        return t.append_column("_late", pa.array(late))

    routed = events.map_batches(_route, batch_format="pyarrow",
                                batch_size=None,
                                zero_copy_batch=True).materialize()
    v = _next_version(root)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    try:
        late_ds = routed.map_batches(
            lambda b: b.filter(b["_late"]).drop_columns(["_late"]),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        n_late = late_ds.count()
        if n_late:
            late_ds.write_parquet(os.path.join(stage, "late"))

        # distributed per-block partials; only partial rows (bounded by
        # groups x windows x blocks) ever reach the driver
        good_partials = routed.map_batches(
            lambda b, gc=tuple(group_cols), ag=aggs, p=hll_p:
            _partial_table(b.filter(pc.invert(b["_late"])), gc, ag, p),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        parts = list(ray.get(good_partials.to_arrow_refs()))
        # typed zero-row fallback derived from the routed schema, so an
        # all-late / empty batch still writes schema-stable files
        empty = _partial_table(
            routed.schema().base_schema.empty_table().drop_columns(
                ["_late"]), group_cols, aggs, hll_p)
        prev_open = open_windows(root)
        merged = _merge_partials(
            [p for p in parts if p.num_rows]
            + ([prev_open] if prev_open is not None and prev_open.num_rows
               else []) or [empty],
            group_cols, aggs, hll_p)

        # watermark: monotone max-event-time − lateness
        hi = routed.map_batches(
            lambda b: pa.table({"m": [pc.max(_time_us(b[time_col])).as_py()
                                      if b.num_rows else None]}),
            batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
        hs = [r["m"] for r in hi.take_all() if r["m"] is not None]
        new_wm = max([prev_wm if prev_wm is not None else -(1 << 62)]
                     + [h - l_us for h in hs])

        ripe = pc.less_equal(merged["window_end"], new_wm)
        fin = _finalize_sketches(merged.filter(ripe), aggs)
        still_open = merged.filter(pc.invert(ripe))
        pq.write_table(still_open, os.path.join(stage, "open.parquet"))
        pq.write_table(fin, os.path.join(stage, "finalized.parquet"))
        man2 = {"version": v, "watermark": int(new_wm),
                "batch_id": batch_id,
                "n_open": still_open.num_rows,
                "n_finalized": fin.num_rows, "n_late": int(n_late)}
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            json.dump(man2, f)
        os.rename(stage, _vdir(root, v))
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    atomic_write_json(os.path.join(root, "CURRENT"), {"version": v})
    return man2
