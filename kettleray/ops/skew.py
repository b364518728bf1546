"""Skew handling: hot-key detection, salted key-splitting, and the
post-merge reconciliation reduce (north-star requirement; SURVEY.md §4,
§7.2.8).

Kettle has NO skew story (a hot ModPartitioner partition simply stalls
the pipeline); this module is the Ray-native answer:

- LWW replay: the map-side combiner already collapses a hot key to one
  row per input block BEFORE the shuffle, so replay skew is structurally
  bounded (partials per key <= num input blocks). ``replay_lww_salted``
  additionally splits those partials across ``salt_factor`` partitions
  and reconciles with a second (tiny) LWW reduce — for clusters where
  even the partials of a pathological key overwhelm one aggregator.

- SCD2 history CANNOT pre-combine (it needs every event), so a hot key
  genuinely concentrates work: ``scd2_history_salted`` range-salts hot
  keys by commit_seq windows, builds per-salt partial histories in
  parallel, then a reconciliation pass stitches the salt boundaries
  (closing each salt's open tail with the next salt's first event and
  re-basing version numbers).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from kettleray.ops import cdc
from kettleray.ops.cdc import KEY_COLS, SEQ_COL


def detect_hot_keys(events, *, keys: Sequence[str] = KEY_COLS,
                    top_k: int = 16, min_count: int = 10_000,
                    sample_rate: float = 1.0,
                    method: str = "exact",
                    sketch_k: int = 4096) -> pa.Table:
    """Cheap pre-pass: per-batch partial counts (combiner) -> small
    groupby -> top-k keys above ``min_count``. Only the two key columns
    leave the scan. With ``sample_rate`` < 1 the scan counts a seeded
    row sample and scales the threshold — hot keys by definition
    dominate, so sampling finds them at a fraction of the cost.

    ``method="sketch"``: zero-shuffle Misra-Gries path
    (:func:`kettleray.ops.sketches.approx_heavy_hitters` machinery) —
    per-block k-counter sketches, ONE small row per block to the
    driver, no key-hash exchange at all. Counts are lower bounds with
    error <= n/(sketch_k+1); every key with true count >
    min_count + n/(sketch_k+1) is GUARANTEED found, and no key below
    ``min_count`` minus nothing is reported above its true count (MG
    never over-counts). The right detector when even the combined
    partials are too many to exchange; feeding salting only needs the
    key set, not exact counts."""
    keys = list(keys)
    if method == "sketch":
        return _detect_hot_keys_sketch(events, keys=keys, top_k=top_k,
                                       min_count=min_count,
                                       sketch_k=sketch_k)
    if sample_rate < 1.0:
        events = events.random_sample(sample_rate, seed=42)
        min_count = max(1, int(min_count * sample_rate))

    def _partial(t: pa.Table) -> pa.Table:
        codes = cdc._composite_key_codes(t, keys)
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        start = np.empty(len(sk), dtype=bool)
        if len(sk):
            start[0] = True
            start[1:] = sk[1:] != sk[:-1]
        reps = order[start] if len(sk) else np.array([], dtype=np.int64)
        counts = np.diff(np.append(np.nonzero(start)[0], len(sk))) \
            if len(sk) else np.array([], dtype=np.int64)
        out = t.select(keys).take(pa.array(reps, type=pa.int64()))
        return out.append_column("__cnt", pa.array(counts,
                                                   type=pa.int64()))

    partials = events.select_columns(keys).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    # Distributed finish for BOTH paths (sampled included): the partial
    # count set scales with unique-keys-in-sample x blocks — at 10^10
    # events far beyond driver comfort. ONE key-hash exchange co-locates
    # every key's partials; each partition sums and keeps its local
    # top-k, so the driver merge is bounded at partitions x top_k rows
    # (exact: a key lives wholly in one partition).
    part = partials.repartition(16, keys=keys)

    def _sum_topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({**{k: pa.array([], type=pa.string())
                                for k in keys},
                             "n_events": pa.array([], type=pa.int64())})
        codes = cdc._composite_key_codes(t, keys)
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        cnt = cdc._col_np(t, "__cnt")[order]
        start = np.empty(len(sk), dtype=bool)
        start[0] = True
        start[1:] = sk[1:] != sk[:-1]
        begins = np.nonzero(start)[0]
        sums = np.add.reduceat(cnt, begins)
        kk = min(top_k, len(sums))
        top_idx = np.argpartition(sums, -kk)[-kk:]
        sel = pa.array(order[begins[top_idx]], type=pa.int64())
        out = t.select(keys).take(sel)
        return out.append_column(
            "n_events", pa.array(sums[top_idx], type=pa.int64()))

    cand = pa.Table.from_pylist(
        part.map_batches(_sum_topk, batch_format="pyarrow",
                         batch_size=None,
                         zero_copy_batch=True).take_all())
    if cand.num_rows == 0:
        return cand
    t = cand.sort_by([("n_events", "descending")]).slice(0, top_k)
    return t.filter(pc.greater_equal(t["n_events"], min_count))


def _detect_hot_keys_sketch(events, *, keys: Sequence[str], top_k: int,
                            min_count: int, sketch_k: int) -> pa.Table:
    """Misra-Gries hot-key detection: per-block sketches, driver merge
    of #blocks x sketch_k counters, NO shuffle. Returns the same
    (keys..., n_events) schema as the exact path; n_events is the MG
    lower-bound count (true count <= n_events + n/(sketch_k+1))."""
    import pickle

    from kettleray.ops.sketches import MisraGries

    keys = list(keys)

    def _sk(t: pa.Table) -> pa.Table:
        mg = MisraGries(sketch_k)
        if len(keys) == 1:
            mg.update_column(t[keys[0]])
        else:
            mg.update_column(pc.binary_join_element_wise(
                *[pc.cast(t[k], pa.string()) for k in keys], "\x1f"))
        return pa.table({"sketch": pa.array(
            [pickle.dumps((mg.k, mg.counters, mg.n))], pa.binary())})

    part = events.select_columns(keys).map_batches(
        _sk, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    out = MisraGries(sketch_k)
    for r in part.take_all():
        kk, counters, n = pickle.loads(r["sketch"])
        out.merge(MisraGries(kk, counters, n))
    err = out.error_bound()
    # keep keys whose count could plausibly reach min_count (upper
    # bound = counter + err), rank by lower bound, cut at top_k, then
    # apply the caller's threshold on the lower bound for parity with
    # the exact path's contract ("reported keys have >= min_count").
    cand = sorted(((ct, it) for it, ct in out.counters.items()
                   if ct + err >= min_count), reverse=True)[:top_k]
    cand = [(ct, it) for ct, it in cand if ct >= min_count]
    cols: dict = {k: [] for k in keys}
    counts = []
    for ct, it in cand:
        parts = it.split("\x1f") if len(keys) > 1 else [it]
        for k, v in zip(keys, parts):
            cols[k].append(v)
        counts.append(int(ct))
    return pa.table({**{k: pa.array(cols[k], pa.string())
                        for k in keys},
                     "n_events": pa.array(counts, pa.int64())})


def _add_salt(events, hot_keys: pa.Table, *,
              keys: Sequence[str] = KEY_COLS, salt_factor: int,
              range_salt: bool = False, window: int = 1 << 20):
    """Append a __salt column: 0 for cold keys; hot keys get either
    hash-salt (commit_seq % factor, LWW-safe) or range-salt
    (commit_seq // window, order-preserving for SCD2)."""
    keys = list(keys)
    if hot_keys.num_rows:
        joined_hot = pc.binary_join_element_wise(
            *[pc.cast(hot_keys[k], pa.string()) for k in keys], "\x00")
        if isinstance(joined_hot, pa.ChunkedArray):
            joined_hot = joined_hot.combine_chunks()
    else:
        joined_hot = pa.array([], type=pa.string())
    hot_ref = ray.put(joined_hot)

    def _salt(t: pa.Table) -> pa.Table:
        hs = ray.get(hot_ref)
        if len(hs) == 0:
            return t.append_column(
                "__salt", pa.array(np.zeros(t.num_rows, np.int64)))
        joined = pc.binary_join_element_wise(
            *[t[k] for k in keys], "\x00")
        ishot = pc.is_in(joined, value_set=hs)
        if isinstance(ishot, pa.ChunkedArray):
            ishot = ishot.combine_chunks()
        ishot = ishot.to_numpy(zero_copy_only=False)
        seq = cdc._col_np(t, SEQ_COL)
        salt = np.zeros(t.num_rows, dtype=np.int64)
        if range_salt:
            salt[ishot] = seq[ishot] // window + 1
        else:
            salt[ishot] = seq[ishot] % salt_factor + 1
        return t.append_column("__salt", pa.array(salt))

    return events.map_batches(_salt, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=None)


def replay_lww_salted(events, *, num_partitions: int = 64,
                      salt_factor: int = 8,
                      hot_keys: pa.Table | None = None,
                      hot_top_k: int = 16, hot_min_count: int = 10_000,
                      detect_sample_rate: float = 0.05):
    """LWW replay with explicit hot-key salting + reconciliation reduce.

    Stage 1: salt hot keys -> hash repartition on (key, salt) ->
    per-block LWW => <= salt_factor partial winners per hot key.
    Stage 2 (reconciliation): standard replay over the partials — tiny,
    because stage 1 reduced each (key, salt) to one row. Reconciliation
    compares commit_seq (never arrival order), per SURVEY.md §7.4.3.
    """
    if hot_keys is None:
        hot_keys = detect_hot_keys(events, top_k=hot_top_k,
                                   min_count=hot_min_count,
                                   sample_rate=detect_sample_rate)
    salted = _add_salt(events, hot_keys, salt_factor=salt_factor)
    combined = salted.map_batches(
        lambda t: cdc.lww_reduce_table(t, keys=list(KEY_COLS) + ["__salt"]),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)
    stage1 = combined.repartition(num_partitions,
                                  keys=list(KEY_COLS) + ["__salt"])

    # Per-partition reduce leaves exactly ONE row per (key, salt):
    # cold keys (salt 0) are therefore already final; only the hot keys'
    # <= salt_factor partials go through the reconciliation reduce.
    def _cold_final(t: pa.Table) -> pa.Table:
        t = cdc.lww_reduce_table(t, keys=list(KEY_COLS) + ["__salt"])
        t = t.filter(pc.equal(t["__salt"], 0)).drop_columns(["__salt"])
        return cdc.finalize_state_table(t)

    def _hot_partials(t: pa.Table) -> pa.Table:
        t = cdc.lww_reduce_table(t, keys=list(KEY_COLS) + ["__salt"])
        return t.filter(pc.greater(t["__salt"], 0)) \
            .drop_columns(["__salt"])

    stage1 = stage1.materialize()   # reused by both branches
    cold = stage1.map_batches(_cold_final, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    hot = stage1.map_batches(_hot_partials, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)

    # Reconciliation input is bounded at hot_keys × salt_factor rows
    # (stage 1 left ONE row per (key, salt)) — metadata-sized, so a plain
    # single-partition concat + reduce beats a keyed hash exchange (whose
    # aggregator-actor spawn costs seconds on tiny input).
    def _hot_finish(t: pa.Table) -> pa.Table:
        return cdc.finalize_state_table(cdc.lww_reduce_table(t))

    hot_final = hot.repartition(1).map_batches(
        _hot_finish, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    return cold.union(hot_final)


def scd2_history_salted(events, *, num_partitions: int = 64,
                        hot_keys: pa.Table | None = None,
                        window: int = 1 << 20,
                        hot_top_k: int = 16, hot_min_count: int = 10_000,
                        detect_sample_rate: float = 0.05):
    """SCD2 with range-salted hot keys + boundary-stitch reconciliation.

    Hot keys are split by commit_seq windows (order-preserving), each
    window's history built independently (its tail left open, versions
    numbered locally), then a reconciliation pass over per-window
    boundary stats — (key, salt) -> (first_seq, first_is_any_event,
    n_live) — closes window tails and re-bases version numbers. The
    boundary table is tiny (hot keys × windows), so reconciliation is a
    broadcast, not a shuffle."""
    if hot_keys is None:
        # sampled by default (cheap); pass detect_sample_rate=1.0 for
        # exact detection when marginal hot keys matter more than the
        # extra scan
        hot_keys = detect_hot_keys(events, top_k=hot_top_k,
                                   min_count=hot_min_count,
                                   sample_rate=detect_sample_rate)
    if hot_keys.num_rows == 0:
        # adaptive: no skew detected -> the salt/stitch machinery is pure
        # overhead; run the plain one-shuffle SCD2 (cost of salting on
        # clean data = the sampled detection pre-pass only)
        return cdc.scd2_history(events, num_partitions=num_partitions)

    def _slim(t: pa.Table) -> pa.Table:
        # hash + drop the payload before the exchange (same optimization
        # as cdc.scd2_history: history rows carry only the sha)
        if "content" in t.column_names:
            if "content_sha256" not in t.column_names:
                t = cdc.add_content_sha256(t)
            t = t.drop_columns(["content"])
        return t

    slim = events.map_batches(_slim, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    salted = _add_salt(slim, hot_keys, salt_factor=0, range_salt=True,
                       window=window)
    shuffled = salted.repartition(num_partitions,
                                  keys=list(KEY_COLS) + ["__salt"])

    def _partial_history(t: pa.Table) -> pa.Table:
        """ONE pass per shuffled block: emits history rows (open-tailed
        per salt) AND boundary rows in a single tagged union table — the
        SCD2 kernel runs once, not once per consumer."""
        t = cdc.dedup_events_table(t, keys=list(KEY_COLS) + ["__salt"])
        if t.num_rows == 0:
            return _empty_partial()
        codes = cdc._composite_key_codes(t, list(KEY_COLS) + ["__salt"])
        seq = cdc._col_np(t, SEQ_COL)
        order = np.lexsort((seq, codes))
        sk, ss = codes[order], seq[order]
        n = len(sk)
        same_next = np.empty(n, dtype=bool)
        same_next[:-1] = sk[1:] == sk[:-1]
        same_next[-1] = False
        # int64 + mask, never float64/NaN (commit_seq > 2^53 must survive)
        next_seq = np.zeros(n, dtype=np.int64)
        next_seq[:-1] = ss[1:]
        has_next = same_next

        tt = t if "content_sha256" in t.column_names \
            else cdc.add_content_sha256(t)
        op_sorted = cdc._col_np(tt, "op")[order]
        live = op_sorted != cdc.OP_DELETE
        run_start = np.empty(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        live_cum = np.cumsum(live)
        base = np.zeros(n, dtype=np.int64)
        starts = np.nonzero(run_start)[0]
        base[starts] = live_cum[starts] - live[starts]
        np.maximum.accumulate(base, out=base)
        local_version = live_cum - base

        keep = np.nonzero(live)[0]
        sel = order[keep]
        hist = tt.take(pa.array(sel, type=pa.int64()))
        vt = next_seq[keep]
        open_tail = ~has_next[keep]
        hist = hist.append_column("local_version",
                                  pa.array(local_version[keep],
                                           type=pa.int64()))
        hist = hist.append_column("valid_from_seq", hist[SEQ_COL])
        hist = hist.append_column(
            "valid_to_seq", pa.array(vt, type=pa.int64(), mask=open_tail))
        hist = hist.append_column("open_tail",
                                  pa.array(open_tail, type=pa.bool_()))
        hist = hist.select(["repo", "path", "__salt", "local_version",
                            "valid_from_seq", "valid_to_seq", "open_tail",
                            "commit", "lang", "content_sha256"])

        # boundary stats — ONLY for salted (hot) groups: cold keys have a
        # single salt-0 group whose stitch is the identity, and emitting
        # a boundary row per cold key would make reconciliation O(all
        # keys) on the driver instead of O(hot keys x windows)
        ends = np.append(starts[1:], n)
        salt_np = cdc._col_np(t, "__salt")[order]
        hot_groups = np.nonzero(salt_np[starts] > 0)[0]
        gs = starts[hot_groups]
        n_live = live_cum[ends[hot_groups] - 1] - base[gs]
        first_seq = ss[gs]
        btab = t.select(list(KEY_COLS) + ["__salt"]).take(
            pa.array(order[gs], type=pa.int64()))
        btab = btab.append_column("first_seq",
                                  pa.array(first_seq, type=pa.int64()))
        btab = btab.append_column("n_live",
                                  pa.array(n_live, type=pa.int64()))
        return _tag_union(hist, btab)

    combined = shuffled.map_batches(_partial_history,
                                    batch_format="pyarrow",
                                    batch_size=None, zero_copy_batch=True) \
        .materialize()   # consumed twice (hist + bounds); payload-light

    def _only(kind: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["__kind"], kind)) \
                .drop_columns(["__kind"])
        return fn

    hist = combined.map_batches(_only("h"), batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
    bounds_rows = combined.map_batches(
        _only("b"), batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True).take_all()

    # ---- reconciliation (tiny): per key ordered by salt, compute version
    # offsets and the closing seq for each salt's open tail. The stitch
    # table is hot-keys x windows rows — broadcast as an Arrow table and
    # applied per block with Arrow's C++ hash join, no per-row Python.
    st_repo, st_path, st_salt, st_close, st_off = [], [], [], [], []
    if bounds_rows:
        rows = sorted(bounds_rows,
                      key=lambda r: (r["repo"], r["path"], r["__salt"]))
        i = 0
        while i < len(rows):
            j = i
            key = (rows[i]["repo"], rows[i]["path"])
            while j < len(rows) and (rows[j]["repo"],
                                     rows[j]["path"]) == key:
                j += 1
            offset = 0
            for k in range(i, j):
                r = rows[k]
                st_repo.append(r["repo"])
                st_path.append(r["path"])
                st_salt.append(r["__salt"])
                st_close.append(rows[k + 1]["first_seq"]
                                if k + 1 < j else None)
                st_off.append(offset)
                offset += r["n_live"]
            i = j
    stitch_tbl = pa.table({
        "repo": pa.array(st_repo, type=pa.string()),
        "path": pa.array(st_path, type=pa.string()),
        "__salt": pa.array(st_salt, type=pa.int64()),
        "__close": pa.array(st_close, type=pa.int64()),
        "__offset": pa.array(st_off, type=pa.int64()),
    })
    stitch_ref = ray.put(stitch_tbl)

    def _apply_stitch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _scd2_select(t)
        st = ray.get(stitch_ref)
        j = t.join(st, keys=["repo", "path", "__salt"],
                   join_type="left outer")
        lv = cdc._col_np(j, "local_version")
        off = pc.fill_null(j["__offset"], 0)
        if isinstance(off, pa.ChunkedArray):
            off = off.combine_chunks()
        version = lv + off.to_numpy(zero_copy_only=False)
        open_tail = cdc._col_np(j, "open_tail")
        close = j["__close"].combine_chunks() \
            if isinstance(j["__close"], pa.ChunkedArray) else j["__close"]
        close_valid = pc.is_valid(close).to_numpy(zero_copy_only=False)
        close_np = pc.fill_null(close, 0).to_numpy(zero_copy_only=False)
        vt = j["valid_to_seq"].combine_chunks() \
            if isinstance(j["valid_to_seq"], pa.ChunkedArray) \
            else j["valid_to_seq"]
        vt_valid = pc.is_valid(vt).to_numpy(zero_copy_only=False)
        vt_np = pc.fill_null(vt, 0).to_numpy(zero_copy_only=False)
        stitched = open_tail & close_valid
        new_vt = np.where(stitched, close_np, vt_np)
        new_vt_valid = vt_valid | stitched
        is_current = open_tail & ~close_valid
        j = j.drop_columns(["local_version", "open_tail", "__salt",
                            "valid_to_seq", "__close", "__offset"])
        j = j.append_column("version", pa.array(version, type=pa.int64()))
        j = j.append_column("valid_to_seq",
                            pa.array(new_vt, type=pa.int64(),
                                     mask=~new_vt_valid))
        j = j.append_column("is_current",
                            pa.array(is_current, type=pa.bool_()))
        return _scd2_select(j)

    return hist.map_batches(_apply_stitch, batch_format="pyarrow",
                            zero_copy_batch=True)


def _tag_union(hist: pa.Table, bound: pa.Table) -> pa.Table:
    """Union the history and boundary outputs into one tagged table
    (null-backfilled columns) so one kernel pass serves both consumers."""
    all_cols = list(dict.fromkeys(hist.column_names + bound.column_names))

    def _conform(t: pa.Table, kind: str) -> pa.Table:
        arrays, fields = [], []
        for c in all_cols:
            if c in t.column_names:
                col = t[c]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                arrays.append(col)
                fields.append(pa.field(c, col.type))
            else:
                typ = _UNION_TYPES[c]
                arrays.append(pa.nulls(t.num_rows, type=typ))
                fields.append(pa.field(c, typ))
        arrays.append(pa.array([kind] * t.num_rows, type=pa.string()))
        fields.append(pa.field("__kind", pa.string()))
        return pa.Table.from_arrays(arrays, schema=pa.schema(fields))

    return pa.concat_tables([_conform(hist, "h"), _conform(bound, "b")])


_UNION_TYPES = {
    "local_version": pa.int64(), "valid_from_seq": pa.int64(),
    "valid_to_seq": pa.int64(), "open_tail": pa.bool_(),
    "commit": pa.string(), "lang": pa.string(),
    "content_sha256": pa.string(), "first_seq": pa.int64(),
    "n_live": pa.int64(),
}


def _scd2_select(t: pa.Table) -> pa.Table:
    cols = cdc.SCD2_COLS
    if t.num_rows == 0:
        return pa.table({c: pa.array([], type=cdc._scd2_type(c))
                         for c in cols})
    return t.select(cols)


def _empty_partial() -> pa.Table:
    hist = pa.table({
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "__salt": pa.array([], pa.int64()),
        "local_version": pa.array([], pa.int64()),
        "valid_from_seq": pa.array([], pa.int64()),
        "valid_to_seq": pa.array([], pa.int64()),
        "open_tail": pa.array([], pa.bool_()),
        "commit": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "content_sha256": pa.array([], pa.string()),
    })
    bound = pa.table({
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "__salt": pa.array([], pa.int64()),
        "first_seq": pa.array([], pa.int64()),
        "n_live": pa.array([], pa.int64()),
    })
    return _tag_union(hist, bound)
