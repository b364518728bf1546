"""Event-time SESSION windows with watermarks and exactly-once
finalization — the gap-based sibling of :mod:`kettleray.ops.eventtime`.

Kettle approximates sessionization with a sorted Group By over a
"fields change sequence" computed by an Analytic Query step
(≙ engine/.../steps/analyticquery + groupby re-run per load), which
only works on a complete, sorted extract. Here sessions are maintained
INCREMENTALLY across micro-batches: events carry an event-time column;
a session is a maximal chain of per-key events where consecutive
timestamps are ``<= gap`` apart; a monotone watermark (max event time
seen − allowed lateness) decides when a session is COMPLETE (no future
event can extend it: ``session_end + gap <= watermark`` means any
extender would have ``ts <= watermark``, which the late filter already
quarantines); complete sessions are appended to a finalized log
EXACTLY ONCE and never revised.

Why this shape survives 100 TB:

* Per-event work is DISTRIBUTED and COMBINED map-side: one
  ``map_batches`` pass stamps event-time µs and the late flag, late
  rows stream straight to parquet, and good rows collapse into
  per-block PARTIAL SESSIONS (each block's events clustered by the gap
  rule; aggregates restricted to mergeable count/sum/min/max, so
  partial sessions merge associatively — interval-chaining two partial
  sessions is itself the gap rule applied to intervals).
* The cross-block merge is ONE hash shuffle of PARTIAL SESSIONS (not
  events) on the session key, then a vectorized per-partition interval
  merge (lexsort + segmented running-max; no Python row loop). State
  and shuffle volume are bounded by ``keys x open sessions``, never by
  event count.
* Open state and the finalized log are written DISTRIBUTED (each
  partition writes its own parquet) inside one atomic version commit
  (stage -> rename -> CURRENT), with the same ``batch_id`` redelivery
  fence as eventtime.ingest.

Store layout::

    root/SPEC.json                  gap/lateness/keys/aggs (pinned)
    root/v000N/open/*.parquet       open partial sessions after batch N
    root/v000N/finalized/*.parquet  sessions finalized BY batch N
    root/v000N/late/*.parquet       raw late events of batch N
    root/v000N/manifest.json        {version, watermark, batch_id, counts}
    root/CURRENT                    {"version": N}

Late contract (stricter than tumbling windows on purpose): an event
with ``ts <= watermark`` is late — it could extend a session that the
watermark already finalized, so it must never reach the merge.
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
from kettleray.ops.eventtime import (_next_version, _time_us, _vdir,
                                     read_manifest)

_FNS = ("count", "sum", "min", "max", "approx_distinct")


def _validate_aggs(aggs: Mapping[str, tuple]) -> "dict[str, list]":
    out = {}
    for name, (fn, col) in aggs.items():
        if fn not in _FNS:
            raise ValueError(
                f"session agg fn {fn!r} not in {_FNS} (mergeable fns "
                f"only — partial sessions must merge associatively; "
                f"approx_distinct rides mergeable HLL registers)")
        if fn != "count" and col is None:
            raise ValueError(f"agg {name!r}: {fn} needs a column")
        if name in ("session_start", "session_end"):
            raise ValueError(f"agg name {name!r} is reserved")
        out[name] = [fn, col]
    return out


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
            f"session spec drifted: stored {stored}, got {spec} — a "
            f"session store is single-spec (open a new root to change)")
    return stored


def watermark(root: str) -> int:
    man = read_manifest(root)
    return man["watermark"] if man else -(1 << 62)


def _read_dir(path: str) -> "pa.Table | None":
    if not os.path.isdir(path):
        return None
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.endswith(".parquet"))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f) for f in files])


def open_sessions(root: str) -> "pa.Table | None":
    v = current_version(root)
    if v is None:
        return None
    return _read_dir(os.path.join(_vdir(root, v), "open"))


def finalized(root: str, *,
              estimate: bool = True) -> "ray.data.Dataset | None":
    """Append-only finalized-session log across ALL versions. State
    files keep approx_distinct aggs as raw HLL REGISTERS (so partials
    stay mergeable end to end); by default the reader converts them to
    int64 estimates — pass ``estimate=False`` for the raw registers."""
    v = current_version(root)
    if v is None:
        return None
    dirs = [os.path.join(_vdir(root, i), "finalized")
            for i in range(1, v + 1)]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return None
    ds = ray.data.read_parquet(files)
    spec = _load_spec(root) or {}
    sketch_cols = [name for name, (fn, _) in
                   (spec.get("aggs") or {}).items()
                   if fn == "approx_distinct"]
    if not estimate or not sketch_cols:
        return ds

    def _est(t: pa.Table) -> pa.Table:
        from kettleray.ops.sketches import HLL
        for c in sketch_cols:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = [int(round(HLL.from_bytes(b.as_py()).estimate()))
                    for b in col]
            t = t.set_column(t.schema.get_field_index(c), c,
                             pa.array(vals, type=pa.int64()))
        return t

    return ds.map_batches(_est, batch_format="pyarrow",
                          zero_copy_batch=True)


def late_log(root: str) -> "ray.data.Dataset | None":
    v = current_version(root)
    if v is None:
        return None
    dirs = [os.path.join(_vdir(root, i), "late") for i in range(1, v + 1)]
    files = [os.path.join(d, f) for d in dirs if os.path.isdir(d)
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not files:
        return None
    return ray.data.read_parquet(files)


def _session_schema(key_fields: "list[pa.Field]",
                    aggs: "dict[str, list]") -> pa.Schema:
    fields = list(key_fields)
    fields += [pa.field("session_start", pa.int64()),
               pa.field("session_end", pa.int64())]
    for name, (fn, _) in aggs.items():
        fields.append(pa.field(
            name, pa.int64() if fn == "count"
            else pa.binary() if fn == "approx_distinct"
            else pa.float64()))
    return pa.schema(fields)


def _cluster(t: pa.Table, key_cols: Sequence[str], gap_us: int,
             aggs: "dict[str, list]", *, sketch_mode: str = "bytes",
             hll_p: int = 12) -> pa.Table:
    """Vectorized per-key interval clustering: rows are partial
    sessions (session_start/session_end + mergeable agg partials);
    output is the gap-merged partial sessions. Lexsort by (key, start),
    segmented running-max of end (per-key offset bias, with a per-key
    fallback when the bias could overflow int64), chain-break where
    ``start > running_max_end + gap``, then one ``reduceat`` per
    aggregate."""
    schema = _session_schema(
        [t.schema.field(c) for c in key_cols], aggs)
    n = t.num_rows
    if n == 0:
        return schema.empty_table()
    from kettleray.ops.cdc import _composite_key_codes
    codes = _composite_key_codes(t, list(key_cols)) if key_cols else \
        np.zeros(n, dtype=np.int64)
    start = t["session_start"].to_numpy(zero_copy_only=False)
    end = t["session_end"].to_numpy(zero_copy_only=False)
    order = np.lexsort((start, codes))
    s_code, s_start, s_end = codes[order], start[order], end[order]
    seg_first = np.empty(n, dtype=bool)
    seg_first[0] = True
    seg_first[1:] = s_code[1:] != s_code[:-1]
    sid = np.cumsum(seg_first) - 1
    firsts = np.nonzero(seg_first)[0]
    base = s_start[firsts][sid]            # each key's min start
    e_rel = s_end - base                   # >= 0: end >= start >= base
    span = int(e_rel.max()) + 1
    nseg = len(firsts)
    if nseg * span < (1 << 62):
        biased = sid.astype(np.int64) * span + e_rel
        cme = np.maximum.accumulate(biased) - sid.astype(np.int64) * span
    else:                                  # pathological span x keys
        cme = np.empty(n, dtype=np.int64)
        bounds = np.append(firsts, n)
        for a, b in zip(bounds[:-1], bounds[1:]):
            cme[a:b] = np.maximum.accumulate(e_rel[a:b])
    brk = seg_first.copy()
    brk[1:] |= (s_start[1:] - base[1:]) > (cme[:-1] + gap_us)
    idx = np.nonzero(brk)[0]
    # closed chain end per output session = running max at the LAST row
    # of the chain (cme is relative to the key base)
    last = np.append(idx[1:] - 1, n - 1)
    out_start = s_start[idx]
    out_end = cme[last] + base[idx]
    taken = t.take(pa.array(order[idx], type=pa.int64()))
    cols = {c: taken[c] for c in key_cols}
    cols["session_start"] = pa.array(out_start, type=pa.int64())
    cols["session_end"] = pa.array(out_end, type=pa.int64())
    for name, (fn, _) in aggs.items():
        if fn == "approx_distinct":
            # HLL registers per chain: raw mode sketches member values
            # (vectorized hash kernel per chain), bytes mode register-
            # maxes the members' already-built sketches. One Python
            # iteration per CHAIN — partial-session bounded, the same
            # pattern as eventtime._group_sketches.
            from kettleray.ops.sketches import HLL
            col = t[name]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            sc = col.take(pa.array(order, type=pa.int64()))
            bounds = np.append(idx, n)
            out = []
            for a, b in zip(bounds[:-1], bounds[1:]):
                h = HLL(hll_p)
                sl = sc.slice(a, b - a)
                if sketch_mode == "raw":
                    h.update_column(sl)
                else:
                    for bb in sl:
                        h.merge(HLL.from_bytes(bb.as_py()))
                out.append(h.to_bytes())
            cols[name] = pa.array(out, type=pa.binary())
            continue
        v = t[name].to_numpy(zero_copy_only=False)[order]
        if fn in ("count", "sum"):
            if fn == "sum":
                v = np.nan_to_num(v.astype(np.float64), nan=0.0)
            red = np.add.reduceat(v, idx)
            cols[name] = pa.array(
                red, type=pa.int64() if fn == "count" else pa.float64())
        elif fn == "min":
            cols[name] = pa.array(
                np.fmin.reduceat(v.astype(np.float64), idx),
                type=pa.float64())
        else:
            cols[name] = pa.array(
                np.fmax.reduceat(v.astype(np.float64), idx),
                type=pa.float64())
    return pa.table(cols).cast(schema)


def _seed(t: pa.Table, key_cols: Sequence[str], time_col: str,
          aggs: "dict[str, list]") -> pa.Table:
    """Events -> singleton partial sessions (start = end = ts)."""
    us = _time_us(t[time_col])
    cols = {c: t[c] for c in key_cols}
    cols["session_start"] = pc.cast(us, pa.int64())
    cols["session_end"] = pc.cast(us, pa.int64())
    for name, (fn, col) in aggs.items():
        if fn == "count":
            cols[name] = pa.array(np.ones(t.num_rows, np.int64))
        elif fn == "approx_distinct":
            cols[name] = t[col]          # raw values; the seed-side
            # _cluster (sketch_mode='raw') turns each chain into registers
        else:
            cols[name] = pc.cast(t[col], pa.float64())
    return pa.table(cols)


def gc(root: str, *, keep_last: int = 2) -> dict:
    """Reclaim superseded OPEN-state copies: every version rewrites the
    full open-session state, so a long-running store accumulates one
    copy per micro-batch. GC deletes ``open/`` from versions older than
    the newest ``keep_last`` — finalized/ and late/ are APPEND-ONLY
    logs read across all versions and are never touched, manifests stay
    for audit/time-travel of counts. Crash-orphaned ``_stage_*`` dirs
    (no manifest published, never readable) are swept too."""
    v = current_version(root)
    if v is None:
        return {"removed_open_dirs": 0, "bytes_reclaimed": 0,
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
        od = os.path.join(p, "open")
        if os.path.isdir(od):
            freed += sum(os.path.getsize(os.path.join(od, f))
                         for f in os.listdir(od))
            shutil.rmtree(od, ignore_errors=True)
            removed += 1
    return {"removed_open_dirs": removed, "bytes_reclaimed": freed,
            "stage_dirs_swept": swept}


def sync_from_feed(src_root: str, sessions_root: str, *,
                   gap_s: int, lateness_s: int = 0,
                   key_cols: Sequence[str] = ("repo",),
                   num_partitions: int = 8) -> dict:
    """Activity sessionization over a CDC sink's change stream (the
    lake → session-analytics leg, same composition discipline as
    sync_lsh_from_feed / sync_ann_from_feed): every key change between
    the applied and current sink version is one activity event at
    event-time ``last_commit_seq`` (treated as seconds); per-``key_cols``
    sessions of modification activity are maintained by :func:`ingest`.
    The first call bootstraps from the sink's full state.

    Exactly-once: the ingest ``batch_id`` is the feed window
    (``vA->vB``) — a crashed-and-retried window is a manifest no-op at
    the ingest layer — and the durable ``FEED_CURSOR`` advances only
    AFTER the ingest commit (the post-commit cursor contract)."""
    from kettleray.io import sink

    src_v = sink.current_version(src_root)
    if src_v is None:
        raise FileNotFoundError(f"no committed state under {src_root}")
    cursor = os.path.join(sessions_root, "FEED_CURSOR.json")
    applied = None
    if os.path.exists(cursor):
        with open(cursor) as f:
            applied = json.load(f)["src_version"]
    if applied == src_v:
        return read_manifest(sessions_root)
    if applied is not None and applied > src_v:
        raise ValueError(
            f"cursor at {applied} ahead of upstream {src_v}")

    feed = sink.read_state(src_root, src_v) if applied is None else \
        sink.read_changes(src_root, applied, src_v,
                          num_partitions=num_partitions)
    kc = list(key_cols)

    def _ev(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.schema(
                [(c, pa.string()) for c in kc]
                + [("ev_us", pa.int64())]).empty_table()
        cols = {c: t[c] for c in kc}
        cols["ev_us"] = pc.multiply(
            pc.cast(t["last_commit_seq"], pa.int64()), 1_000_000)
        return pa.table(cols)

    events = feed.map_batches(_ev, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    man = ingest(sessions_root, events, time_col="ev_us", gap_s=gap_s,
                 lateness_s=lateness_s, key_cols=kc,
                 aggs={"n_changes": ("count", None)},
                 num_partitions=num_partitions,
                 batch_id=f"v{applied}->v{src_v}")
    atomic_write_json(cursor, {"src_version": src_v})
    return man


def ingest(root: str, events: "ray.data.Dataset", *,
           time_col: str = "ts",
           gap_s: int,
           lateness_s: int = 0,
           key_cols: Sequence[str] = (),
           aggs: Mapping[str, tuple],
           num_partitions: int = 16,
           hll_p: int = 12,
           batch_id: "str | None" = None) -> dict:
    """Apply one micro-batch of events and return the new manifest.

    ``aggs``: ``{out_name: (fn, col)}`` with fn in count/sum/min/max.
    Redelivering the LAST applied ``batch_id`` is an exact no-op (the
    same in-order-retry fence as :func:`eventtime.ingest`)."""
    from kettleray.context import configure_ray_data
    configure_ray_data()
    gap_us = int(gap_s) * 1_000_000
    l_us = int(lateness_s) * 1_000_000
    aggs = _validate_aggs(aggs)
    spec = {"gap_us": gap_us, "lateness_us": l_us,
            "key_cols": list(key_cols), "aggs": aggs,
            "time_col": time_col, "hll_p": int(hll_p)}
    _check_spec(root, spec)
    man = read_manifest(root)
    if man and batch_id is not None and man.get("batch_id") == batch_id:
        return man                        # redelivered batch: no-op
    prev_wm = man["watermark"] if man else None
    prev_v = man["version"] if man else None

    def _route(t: pa.Table) -> pa.Table:
        us = _time_us(t[time_col])
        late = pa.array(np.zeros(t.num_rows, bool)) if prev_wm is None \
            else pc.less_equal(pc.cast(us, pa.int64()), prev_wm)
        return t.append_column("_late", pc.cast(late, pa.bool_()))

    routed = events.map_batches(_route, batch_format="pyarrow",
                                batch_size=None,
                                zero_copy_batch=True).materialize()
    v = _next_version(root)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    try:
        # ONE stats pass: late count + max event time (scalar partials
        # per block — the naive late_ds.count() + hi.take_all() pair
        # was two driver jobs per micro-batch of pure fixed latency)
        def _stats(b: pa.Table) -> pa.Table:
            nl = int(pc.sum(pc.cast(b["_late"], pa.int64())).as_py()
                     or 0) if b.num_rows else 0
            mx = pc.max(_time_us(b[time_col])).as_py() \
                if b.num_rows else None
            return pa.table({"nl": pa.array([nl], type=pa.int64()),
                             "m": pa.array([mx], type=pa.int64())})

        st = routed.map_batches(_stats, batch_format="pyarrow",
                                batch_size=None,
                                zero_copy_batch=True).take_all()
        n_late = sum(r["nl"] for r in st)
        hs = [r["m"] for r in st if r["m"] is not None]
        new_wm = max([prev_wm if prev_wm is not None else -(1 << 62)]
                     + [h - l_us for h in hs])
        if n_late:
            routed.map_batches(
                lambda b: b.filter(b["_late"]).drop_columns(["_late"]),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True).write_parquet(
                os.path.join(stage, "late"))

        # per-block partial sessions (map-side combine: events never
        # leave their block unclustered)
        def _block(b: pa.Table) -> pa.Table:
            good = b.filter(pc.invert(b["_late"]))
            return _cluster(_seed(good, key_cols, time_col, aggs),
                            key_cols, gap_us, aggs,
                            sketch_mode="raw", hll_p=hll_p)

        partials = routed.map_batches(_block, batch_format="pyarrow",
                                      batch_size=None,
                                      zero_copy_batch=True)
        prev_open_dir = os.path.join(_vdir(root, prev_v), "open") \
            if prev_v else None
        if prev_open_dir and os.path.isdir(prev_open_dir) and \
                any(f.endswith(".parquet")
                    for f in os.listdir(prev_open_dir)):
            partials = partials.union(ray.data.read_parquet(prev_open_dir))

        # ONE hash shuffle of partial sessions on the key, the same
        # interval-merge kernel per partition, the ripe flag stamped in
        # the same pass, and ONE hive-partitioned write — finalized and
        # open state split by the writer, not by two extra filter jobs
        if key_cols:
            partials = partials.repartition(num_partitions,
                                            keys=list(key_cols))
        else:
            partials = partials.repartition(1)

        def _merge(b: pa.Table) -> pa.Table:
            out = _cluster(b, key_cols, gap_us, aggs,
                           sketch_mode="bytes", hll_p=hll_p)
            ripe = pc.less_equal(pc.add(out["session_end"], gap_us),
                                 new_wm)
            return out.append_column("_ripe", pc.cast(ripe, pa.bool_()))

        tmp = os.path.join(stage, "_merged")
        partials.map_batches(_merge, batch_format="pyarrow",
                             batch_size=None,
                             zero_copy_batch=True).write_parquet(
            tmp, partition_cols=["_ripe"])
        n_fin = n_open = 0
        for part, dst in (("_ripe=true", "finalized"),
                          ("_ripe=false", "open")):
            src = os.path.join(tmp, part)
            if not os.path.isdir(src):
                continue
            rows = 0
            dd = os.path.join(stage, dst)
            os.makedirs(dd, exist_ok=True)
            for f in sorted(os.listdir(src)):
                if not f.endswith(".parquet"):
                    continue
                fp = os.path.join(src, f)
                rows += pq.read_metadata(fp).num_rows
                os.rename(fp, os.path.join(dd, f))
            if rows == 0:
                os.rmdir(dd)
            if dst == "finalized":
                n_fin = rows
            else:
                n_open = rows
        shutil.rmtree(tmp, ignore_errors=True)
        man2 = {"version": v, "watermark": int(new_wm),
                "batch_id": batch_id, "n_open": int(n_open),
                "n_finalized": int(n_fin), "n_late": int(n_late)}
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            json.dump(man2, f)
        os.rename(stage, _vdir(root, v))
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    atomic_write_json(os.path.join(root, "CURRENT"), {"version": v})
    return man2
