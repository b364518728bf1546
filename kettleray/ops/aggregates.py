"""Aggregation / sort / dedup / set / window operators (SURVEY.md §2.6).

≙ Kettle steps: Group by (groupby/GroupBy.java), Memory group by
(memgroupby/MemoryGroupBy.java), Unique rows (uniquerows/UniqueRows.java,
uniquerowsbyhashset/UniqueRowsByHashSet.java), Sort rows
(sort/SortRows.java), Analytic query (analyticquery/AnalyticQuery.java),
Univariate statistics (univariatestats/UnivariateStats.java), Append
streams (append/Append.java).

Two group-by paths, chosen like Kettle's two steps but for scale reasons:

- algebraic aggregates (sum/min/max/count/avg/std): Ray-native
  ``groupby().aggregate`` — internally partial+merge, one shuffle of
  partial states only.
- holistic aggregates (first/last-by-order, count_distinct, median,
  percentile, string concat): hash ``repartition(keys)`` then ONE
  vectorized pandas groupby per block (each group fully co-located) —
  no per-group Python calls.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data.aggregate import Count, Max, Mean, Min, Quantile, Std, Sum


@dataclass
class Agg:
    col: str | None        # source column (None for count rows)
    fn: str                # sum avg min max count count_distinct first last
    #                        median percentile std concat_comma concat_string
    alias: str
    order_col: str | None = None      # for first/last
    q: float | None = None            # for percentile
    sep: str = ","                    # for concat


_NATIVE = {"sum", "avg", "min", "max", "count", "std", "median",
           "percentile"}


def _native_agg(a: Agg):
    if a.fn == "sum":
        return Sum(a.col, alias_name=a.alias)
    if a.fn == "avg":
        return Mean(a.col, alias_name=a.alias)
    if a.fn == "min":
        return Min(a.col, alias_name=a.alias)
    if a.fn == "max":
        return Max(a.col, alias_name=a.alias)
    if a.fn == "count":
        return Count(a.col, alias_name=a.alias) if a.col \
            else Count(alias_name=a.alias)
    if a.fn == "std":
        return Std(a.col, alias_name=a.alias, ddof=1)
    if a.fn == "median":
        return Quantile(a.col, q=0.5, alias_name=a.alias)
    if a.fn == "percentile":
        return Quantile(a.col, q=a.q, alias_name=a.alias)
    raise ValueError(a.fn)


def group_by(ds, keys: Sequence[str], aggs: Sequence[Agg], *,
             num_partitions: int | None = None):
    """Grouped aggregate; picks the scalable path per agg mix."""
    if all(a.fn in _NATIVE for a in aggs):
        gb = ds.groupby(list(keys), num_partitions=num_partitions)
        return gb.aggregate(*[_native_agg(a) for a in aggs])
    return _holistic_group_by(ds, keys, aggs,
                              num_partitions=num_partitions or 32)


def _holistic_agg_type(a: Agg, src: pa.DataType | None) -> pa.DataType:
    if a.fn in ("avg", "std", "median", "percentile"):
        return pa.float64()
    if a.fn in ("count", "count_distinct"):
        return pa.int64()
    if a.fn == "sum":
        return src if pa.types.is_integer(src) else pa.float64()
    if a.fn in ("concat_comma", "concat_string"):
        return pa.string()
    return src                                  # min/max/first/last


def _holistic_group_by(ds, keys, aggs, *, num_partitions: int):
    """Arrow/numpy-native holistic path: ONE key-hash shuffle, then per
    co-located block a composite-key-code lexsort and np.*.reduceat
    kernels per aggregate — no pandas detour (the pandas groupby cost
    2-3x memory + boxing for identical results and lost the Arrow
    schema on empty blocks)."""
    keys = list(keys)
    shuffled = ds.repartition(num_partitions, keys=keys)

    def _per_block(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        if t.num_columns == 0:
            return t        # Ray hash shuffle emits schema-less empties
        if t.num_rows == 0:
            cols = {k: t[k] for k in keys}
            for a in aggs:
                src = t.schema.field(a.col).type if a.col else None
                cols[a.alias] = pa.array(
                    [], type=_holistic_agg_type(a, src))
            return pa.table(cols)
        codes = _composite_key_codes(t, keys)
        base = np.argsort(codes, kind="stable")
        sk = codes[base]
        n = len(sk)
        run_start = np.empty(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        begins = np.nonzero(run_start)[0]
        ends = np.append(begins[1:], n)
        counts = ends - begins
        key_rows = pa.array(base[begins], type=pa.int64())
        out = {k: (t[k].combine_chunks()
                   if isinstance(t[k], pa.ChunkedArray) else t[k])
               .take(key_rows) for k in keys}

        def _arrow_col(name):
            c = t[name]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) \
                else c

        G = len(begins)

        def _sub_runs(g_sorted):
            """Run boundaries of a group-sorted subset -> (begins, ends,
            dense group positions via searchsorted on the full key set)."""
            m = len(g_sorted)
            if m == 0:
                e = np.empty(0, np.int64)
                return e, e, e
            rs = np.empty(m, dtype=bool)
            rs[0] = True
            rs[1:] = g_sorted[1:] != g_sorted[:-1]
            b = np.nonzero(rs)[0]
            e = np.append(b[1:], m)
            gpos = np.searchsorted(sk[begins], g_sorted[b])
            return b, e, gpos

        def _scatter_pick(col, row_idx, gpos):
            """Arrow array of len G: col[row_idx[i]] at group gpos[i],
            null elsewhere (groups whose values are all null)."""
            take = np.zeros(G, dtype=np.int64)
            present = np.zeros(G, dtype=bool)
            take[gpos] = row_idx
            present[gpos] = True
            picked = col.take(pa.array(take, type=pa.int64()))
            return pc.if_else(pa.array(present), picked,
                              pa.nulls(G, col.type))

        for a in aggs:
            if a.fn in ("first", "last"):
                # first/last non-null BY ORDER (pandas/DuckDB skipna
                # semantics): lexsort the valid subset by (order, group)
                col = _arrow_col(a.col)
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                rows = np.nonzero(valid)[0]
                g_sub = codes[rows]
                o_sub = _col_np(t, a.order_col)[rows] if a.order_col \
                    else rows
                perm = np.lexsort((o_sub, g_sub))
                b, e, gpos = _sub_runs(g_sub[perm])
                pick = perm[b] if a.fn == "first" else perm[e - 1]
                out[a.alias] = _scatter_pick(col, rows[pick], gpos)
            elif a.fn == "count" and not a.col:
                out[a.alias] = pa.array(counts, type=pa.int64())
            elif a.fn == "count":
                nn = pc.is_valid(_arrow_col(a.col)) \
                    .to_numpy(zero_copy_only=False)[base].astype(np.int64)
                out[a.alias] = pa.array(np.add.reduceat(nn, begins),
                                        type=pa.int64())
            elif a.fn == "count_distinct":
                col = _arrow_col(a.col)
                enc = pc.dictionary_encode(col)
                if isinstance(enc, pa.ChunkedArray):
                    enc = enc.combine_chunks()
                vc = enc.indices.to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                g, v = codes[valid], vc[valid]
                perm = np.lexsort((v, g))
                gs, vs = g[perm], v[perm]
                if len(gs):
                    new_pair = np.empty(len(gs), dtype=bool)
                    new_pair[0] = True
                    new_pair[1:] = (gs[1:] != gs[:-1]) | (vs[1:] != vs[:-1])
                else:
                    new_pair = np.empty(0, dtype=bool)
                # map group code -> dense run index for bincount
                pos = np.searchsorted(sk[begins], gs[new_pair]) \
                    if len(gs) else np.empty(0, np.int64)
                out[a.alias] = pa.array(
                    np.bincount(pos, minlength=len(begins))
                    .astype(np.int64), type=pa.int64())
            elif a.fn in ("concat_comma", "concat_string"):
                # nulls skipped (DuckDB string_agg semantics); order_col
                # gives a deterministic in-group concat order
                col = pc.cast(_arrow_col(a.col), pa.string())
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                rows = np.nonzero(valid)[0]
                g_sub = codes[rows]
                o_sub = _col_np(t, a.order_col)[rows] if a.order_col \
                    else rows
                perm = np.lexsort((o_sub, g_sub))
                b, e, gpos = _sub_runs(g_sub[perm])
                sorted_vals = col.take(
                    pa.array(rows[perm], type=pa.int64()))
                offsets = pa.array(np.append(b, len(perm))
                                   .astype(np.int32))
                if len(b) == 0:
                    out[a.alias] = pa.nulls(G, pa.string())
                else:
                    joined = pc.binary_join(
                        pa.ListArray.from_arrays(offsets, sorted_vals),
                        a.sep)
                    present = np.zeros(G, dtype=bool)
                    present[gpos] = True
                    take = np.zeros(G, dtype=np.int64)
                    take[gpos] = np.arange(len(b))
                    out[a.alias] = pc.if_else(
                        pa.array(present),
                        joined.take(pa.array(take, type=pa.int64())),
                        pa.nulls(G, pa.string()))
            elif a.fn in ("min", "max"):
                # order-by-value lexsort over the VALID subset (nulls
                # never win); source Arrow type preserved, strings
                # included; all-null group -> null
                col = _arrow_col(a.col)
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                rows = np.nonzero(valid)[0]
                g_sub = codes[rows]
                v_sub = _col_np(t, a.col)[rows]
                perm = np.lexsort((v_sub, g_sub))
                b, e, gpos = _sub_runs(g_sub[perm])
                pick = perm[b] if a.fn == "min" else perm[e - 1]
                out[a.alias] = _scatter_pick(col, rows[pick], gpos)
            else:
                # numeric family over the valid subset (skipna, pandas
                # semantics: sum of all-null = 0, mean/std/median -> null)
                col = _arrow_col(a.col)
                valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
                rows = np.nonzero(valid)[0]
                g_dense = np.searchsorted(sk[begins], codes[rows])
                v = _col_np(t, a.col)[rows]
                nv = np.bincount(g_dense, minlength=G).astype(np.int64)
                src = t.schema.field(a.col).type
                if a.fn == "sum":
                    if pa.types.is_integer(src):
                        acc = np.zeros(G, dtype=np.int64)
                        np.add.at(acc, g_dense, v.astype(np.int64))
                        out[a.alias] = pa.array(acc, type=src)
                    else:
                        s = np.bincount(g_dense,
                                        weights=v.astype(np.float64),
                                        minlength=G)
                        out[a.alias] = pa.array(s, type=pa.float64())
                elif a.fn == "avg":
                    s = np.bincount(g_dense, weights=v.astype(np.float64),
                                    minlength=G)
                    out[a.alias] = pa.array(
                        s / np.maximum(nv, 1), type=pa.float64(),
                        mask=nv == 0)
                elif a.fn == "std":
                    vf = v.astype(np.float64)
                    s = np.bincount(g_dense, weights=vf, minlength=G)
                    mean = s / np.maximum(nv, 1)
                    sq = np.bincount(g_dense,
                                     weights=(vf - mean[g_dense]) ** 2,
                                     minlength=G)
                    var = sq / np.maximum(nv - 1, 1)
                    out[a.alias] = pa.array(np.sqrt(var),
                                            type=pa.float64(),
                                            mask=nv < 2)
                elif a.fn in ("median", "percentile"):
                    q = 0.5 if a.fn == "median" else a.q
                    vf = v.astype(np.float64)
                    perm = np.lexsort((vf, g_dense))
                    sv = vf[perm]
                    b, e, gpos = _sub_runs(g_dense[perm])
                    cnt = e - b
                    pos = b + q * (cnt - 1)
                    lo = np.floor(pos).astype(np.int64)
                    hi = np.ceil(pos).astype(np.int64)
                    frac = pos - lo
                    vals_g = np.full(G, np.nan)
                    if len(b):
                        vals_g[gpos] = sv[lo] * (1 - frac) + sv[hi] * frac
                    out[a.alias] = pa.array(vals_g, type=pa.float64(),
                                            mask=nv == 0)
                else:
                    raise ValueError(a.fn)
        return pa.table(out)

    return shuffled.map_batches(_per_block, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def unique_rows(ds, cols: Sequence[str], *, count_col: str | None = None,
                num_partitions: int = 32):
    """Exact dedup on ``cols`` = hash-partition + per-block first
    (UniqueRowsByHashSet semantics — input order irrelevant), optional
    duplicate count column (UniqueRows' count field)."""
    cols = list(cols)
    shuffled = ds.repartition(num_partitions, keys=cols)

    def _fn(t: pa.Table) -> pa.Table:
        # Arrow-native (no pandas): composite key codes -> stable argsort
        # -> run boundaries = first occurrence per key (+ run length as
        # the duplicate count). Keeps the exact input schema on empty
        # blocks — the pandas path lost it, poisoning downstream joins.
        from kettleray.ops.cdc import _composite_key_codes
        if t.num_columns == 0:
            return t        # Ray hash shuffle emits schema-less empties
        if t.num_rows == 0:
            if count_col:
                return t.select(cols).append_column(
                    count_col, pa.array([], type=pa.int64()))
            return t
        codes = _composite_key_codes(t, cols)
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        n = len(sk)
        run_start = np.empty(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        begins = np.nonzero(run_start)[0]
        sel = pa.array(order[begins], type=pa.int64())
        if count_col:
            counts = np.diff(np.append(begins, n))
            return t.select(cols).take(sel).append_column(
                count_col, pa.array(counts, type=pa.int64()))
        return t.take(sel)

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def sort_rows(ds, keys: Sequence[str], *, descending=False):
    """≙ Sort rows — Ray Data shuffle sort (spill handled by object
    store instead of SortRows.java's gzip temp files)."""
    return ds.sort(list(keys), descending=descending)


def top_k(ds, key: str, k: int, *, descending: bool = True):
    """Global top-k WITHOUT a global sort: per-block partial top-k
    (numpy argsort on the key column only), then one sort over the tiny
    k x num_blocks candidate set. At web scale the full-sort version
    shuffles the entire dataset to order rows it then throws away."""
    import numpy as np

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        from kettleray.ops.cdc import _col_np
        val = _col_np(t, key)
        order = np.argsort(val, kind="stable")
        sel = order[-k:] if descending else order[:k]
        return t.take(pa.array(np.sort(sel), type=pa.int64()))

    cands = ds.map_batches(_partial, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    return cands.sort(key, descending=descending).limit(k)


def top_k_per_group(ds, group: Sequence[str], order: str, k: int, *,
                    descending: bool = True, num_partitions: int = 32,
                    rank_col: str | None = "rank"):
    """Per-group top-k (row_number() OVER (PARTITION BY g ORDER BY o)
    <= k): ONE hash shuffle on the group key, then a vectorized
    per-block selection — never a global sort. Ties broken by the order
    value then arrival index (deterministic). ``rank_col`` appends the
    1-based in-group rank (None to skip)."""
    import numpy as np
    group = list(group)
    shuffled = ds.repartition(num_partitions, keys=group)

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            if rank_col:
                return t.append_column(rank_col,
                                       pa.array([], type=pa.int64()))
            return t
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, group)
        val = _col_np(t, order)
        if np.issubdtype(val.dtype, np.unsignedinteger):
            val = val.astype(np.int64)     # negation-safe
        sortable = -val if descending and np.issubdtype(
            val.dtype, np.number) else val
        if descending and not np.issubdtype(val.dtype, np.number):
            # strings: lexsort ascending, then reverse within groups via
            # a stable trick — sort ascending and rank from the end
            order_idx = np.lexsort((sortable, codes))
            sk = codes[order_idx]
            run_start = np.empty(len(sk), dtype=bool)
            run_start[0] = True
            run_start[1:] = sk[1:] != sk[:-1]
            run_id = np.cumsum(run_start) - 1
            run_len = np.bincount(run_id)
            pos = np.arange(len(sk)) - np.repeat(
                np.concatenate([[0], np.cumsum(run_len)[:-1]]), run_len)
            rank = run_len[run_id] - pos  # descending rank, ties inverted
        else:
            order_idx = np.lexsort((sortable, codes))
            sk = codes[order_idx]
            run_start = np.empty(len(sk), dtype=bool)
            run_start[0] = True
            run_start[1:] = sk[1:] != sk[:-1]
            run_id = np.cumsum(run_start) - 1
            run_len = np.bincount(run_id)
            rank = np.arange(len(sk)) - np.repeat(
                np.concatenate([[0], np.cumsum(run_len)[:-1]]),
                run_len) + 1
        keep = rank <= k
        sel = order_idx[keep]
        out = t.take(pa.array(sel, type=pa.int64()))
        if rank_col:
            out = out.append_column(
                rank_col, pa.array(rank[keep], type=pa.int64()))
        return out

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def hopping_window(ds, ts_col: str, *, size_us: int, hop_us: int,
                   keys: Sequence[str] = (), aggs: Sequence["Agg"],
                   out_col: str = "window_start",
                   num_partitions: int = 32):
    """Hopping (sliding) window aggregate: windows of ``size_us`` every
    ``hop_us`` (size must be a multiple of hop). Each event is expanded
    to its size/hop overlapping windows VECTORIZED (np.repeat + window
    arithmetic — window membership is data, like the tumbling variant;
    Ray Data needs no watermark because commit order is explicit), then
    ONE keyed groupby over (keys, window_start). Expansion factor is
    size/hop, so shuffle volume scales with overlap — pre-aggregation
    still applies through group_by's native partial+merge."""
    import numpy as np
    if size_us % hop_us:
        raise ValueError("size_us must be a multiple of hop_us")
    r = size_us // hop_us

    def _expand(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        n = t.num_rows
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(n, dtype=np.int64), r)
        j = np.tile(np.arange(r, dtype=np.int64), n)
        start = (ts[idx] // hop_us - j) * hop_us
        out = t.take(pa.array(idx))
        return out.append_column(out_col, pa.array(start))

    expanded = ds.map_batches(_expand, batch_format="pyarrow",
                              zero_copy_batch=True)
    return group_by(expanded, list(keys) + [out_col], list(aggs),
                    num_partitions=num_partitions)


def stratified_sample(ds, group: Sequence[str], key: Sequence[str],
                      k: int, *, num_partitions: int = 32):
    """Deterministic per-stratum k-sample (training-data mix balancing):
    rows ranked inside each ``group`` stratum by md5 of the row ``key``
    — a uniform, arrival-order-independent pseudo-random order that any
    engine can reproduce — keeping the first k. ONE hash shuffle on the
    stratum key, then top_k_per_group's vectorized per-block selection.
    SQL-equivalent: ``row_number() OVER (PARTITION BY group ORDER BY
    md5(key)) <= k``."""
    from kettleray.ops.rowops import checksum
    tagged = checksum(ds, list(key), algo="md5",
                      out_col="__strat_order", sep="|")
    out = top_k_per_group(tagged, group, "__strat_order", k,
                          descending=False,
                          num_partitions=num_partitions, rank_col=None)
    return out.drop_columns(["__strat_order"])


def mixture_sample(ds, group_col: str, key: Sequence[str],
                   quotas: dict, *, num_partitions: int = 32):
    """Domain-weighted mixture sampling (training-data mixing): each
    ``group_col`` value gets its own row quota (e.g. target mixture
    weight × token budget), rows chosen deterministically by md5 of the
    row ``key`` within the group — reproducible by any engine, immune to
    arrival order. Groups absent from ``quotas`` contribute nothing.
    ONE hash shuffle on the group column, then a vectorized per-block
    rank-vs-quota selection (the quota table is broadcast in the
    closure — it is mixture-spec-sized, not data-sized).
    SQL-equivalent: ``row_number() OVER (PARTITION BY g ORDER BY
    md5(key)) <= quota[g]``."""
    import numpy as np
    from kettleray.ops.rowops import checksum
    tagged = checksum(ds, list(key), algo="md5",
                      out_col="__mix_order", sep="|")
    shuffled = tagged.repartition(num_partitions, keys=[group_col])

    def _fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0:
            return t.drop_columns(["__mix_order"])
        g = t[group_col]
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = pc.dictionary_encode(g)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        quota_by_code = np.array(
            [int(quotas.get(v, 0)) for v in enc.dictionary.to_pylist()],
            dtype=np.int64)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order_val = t["__mix_order"]
        if isinstance(order_val, pa.ChunkedArray):
            order_val = order_val.combine_chunks()
        order_idx = np.lexsort(
            (order_val.to_numpy(zero_copy_only=False), codes))
        sk = codes[order_idx]
        run_start = np.empty(len(sk), dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        run_id = np.cumsum(run_start) - 1
        run_len = np.bincount(run_id)
        rank = np.arange(len(sk)) - np.repeat(
            np.concatenate([[0], np.cumsum(run_len)[:-1]]), run_len) + 1
        keep = rank <= quota_by_code[sk]
        out = t.take(pa.array(order_idx[keep], type=pa.int64()))
        return out.drop_columns(["__mix_order"])

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def temperature_mixture_sample(ds, group_col: str, key: Sequence[str],
                               *, budget: int, alpha: float = 0.5,
                               num_partitions: int = 32):
    """Temperature-scaled data mixing (the LLaMA/multilingual-LM
    upsampling rule): source g gets quota floor(budget * n_g^alpha /
    sum_h n_h^alpha) — alpha < 1 flattens the mix toward rare sources,
    alpha = 1 is proportional sampling, alpha = 0 is uniform. Rows are
    then chosen by the same deterministic md5-rank rule as
    :func:`mixture_sample`.

    Scale shape: group counts are ONE metadata-sized aggregate (rows =
    distinct sources — a mixture spec, never data); the weighted quota
    table is computed on the driver from those scalars; the data pass
    is mixture_sample's single hash shuffle."""
    import numpy as np
    counts = {r[group_col]: int(r["count()"])
              for r in ds.groupby(group_col).count().take_all()}
    w = {g: float(c) ** alpha for g, c in counts.items()}
    z = sum(w[g] for g in sorted(w))
    quotas = {g: int(np.floor(budget * w[g] / z)) for g in w}
    return mixture_sample(ds, group_col, key, quotas,
                          num_partitions=num_partitions)


def append_streams(*datasets):
    """≙ Append streams / Prioritize streams: ordered concatenation.
    Row order beyond stream order is not guaranteed (document ordering
    explicitly with a column if it matters — SURVEY.md §2.10)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def analytic_query(ds, group: Sequence[str], order: str,
                   specs: Sequence[tuple[str, str, int, str]], *,
                   num_partitions: int = 32):
    """≙ Analytic query: LAG/LEAD N within sorted groups.

    specs: (src_col, 'lag'|'lead', n, out_col). Vectorized per block
    after key-hash repartition: sort by (group, order), shift with numpy,
    null out cross-group leakage via boundary masks.
    """
    group = list(group)
    shuffled = ds.repartition(num_partitions, keys=group)

    def _fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from kettleray.ops.cdc import _composite_key_codes
        if t.num_rows == 0:
            for _, _, _, out in specs:
                t = t.append_column(out, pa.array([], type=pa.null()))
            return t
        codes = _composite_key_codes(t, group)
        ocol = t[order].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(t[order], pa.ChunkedArray) else \
            t[order].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ocol, codes))
        t = t.take(pa.array(perm, type=pa.int64()))
        sk = codes[perm]
        n = len(sk)
        for src, kind, N, out in specs:
            col = t[src].combine_chunks() if isinstance(
                t[src], pa.ChunkedArray) else t[src]
            if kind == "lag":
                idx = np.arange(n) - N
                valid = idx >= 0
            else:
                idx = np.arange(n) + N
                valid = idx < n
            same = np.zeros(n, dtype=bool)
            same[valid] = sk[idx[valid]] == sk[valid.nonzero()[0]]
            take_idx = np.where(same, np.clip(idx, 0, n - 1), 0)
            shifted = col.take(pa.array(take_idx, type=pa.int64()))
            shifted = pc.if_else(pa.array(same), shifted,
                                 pa.nulls(n, type=col.type))
            t = t.append_column(out, shifted)
        return t

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def fields_change_sequence(ds, watch: Sequence[str], order: str, *,
                           out_col: str = "seq", num_partitions: int = 32):
    """≙ Add value fields changing sequence: counter restarting at 1 each
    time the watched fields change, under ``order`` within each watch
    group (the distributed reading of 'requires sorted input')."""
    watch = list(watch)
    shuffled = ds.repartition(num_partitions, keys=watch)

    def _fn(t: pa.Table) -> pa.Table:
        from kettleray.ops.cdc import _composite_key_codes
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        codes = _composite_key_codes(t, watch)
        ocol = t[order].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(t[order], pa.ChunkedArray) else \
            t[order].to_numpy(zero_copy_only=False)
        perm = np.lexsort((ocol, codes))
        t = t.take(pa.array(perm, type=pa.int64()))
        sk = codes[perm]
        n = len(sk)
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = sk[1:] != sk[:-1]
        pos = np.arange(n, dtype=np.int64)
        base = np.where(start, pos, 0)
        np.maximum.accumulate(base, out=base)
        return t.append_column(out_col,
                               pa.array(pos - base + 1, type=pa.int64()))

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def sessionize(ds, key: str, ts_col: str, *, gap_us: int,
               out_col: str = "session_id", num_partitions: int = 16):
    """Session windows (gaps-and-islands): a new session starts when the
    gap to the previous event of the same key exceeds ``gap_us``.
    session_id = 1-based session index within the key. Ray Data has no
    watermarks; sessions are derived data after one key-co-locating
    shuffle + a vectorized per-block pass (SURVEY.md §2.10)."""
    shuffled = ds.repartition(num_partitions, keys=[key])

    def _fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from kettleray.ops.cdc import _composite_key_codes
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        codes = _composite_key_codes(t, [key])
        ts = pc.cast(t[ts_col], pa.int64())
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        ts = ts.to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, codes))
        sk, st_ = codes[order], ts[order]
        n = len(sk)
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (sk[1:] != sk[:-1]) | \
            ((st_[1:] - st_[:-1]) > gap_us)
        run_start = np.empty(n, dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        sess_cum = np.cumsum(new_sess)
        base = np.zeros(n, dtype=np.int64)
        starts = np.nonzero(run_start)[0]
        base[starts] = sess_cum[starts] - 1
        np.maximum.accumulate(base, out=base)
        sess_id = sess_cum - base
        out = t.take(pa.array(order, type=pa.int64()))
        return out.append_column(out_col,
                                 pa.array(sess_id, type=pa.int64()))

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def univariate_stats(ds, col: str) -> pa.Table:
    """One-row global stats (UnivariateStats). Ray's Dataset.aggregate
    returns a plain dict row; wrap it as a one-row Arrow table."""
    row = ds.aggregate(Count(col, alias_name=f"{col}_n"),
                       Mean(col, alias_name=f"{col}_mean"),
                       Std(col, alias_name=f"{col}_std", ddof=1),
                       Min(col, alias_name=f"{col}_min"),
                       Max(col, alias_name=f"{col}_max"),
                       Quantile(col, q=0.5, alias_name=f"{col}_median"))
    return pa.Table.from_pylist([row])


# ---------------------------------------------------------------------
# Running (cumulative) window aggregates + rank family
# ---------------------------------------------------------------------

def _segmented_scan(x: np.ndarray, seg_begin_idx: np.ndarray,
                    op) -> np.ndarray:
    """Segmented inclusive prefix scan for an idempotent associative op
    (np.minimum / np.maximum) via Hillis-Steele log-doubling: log2(n)
    vectorized passes, each position folds in the value d back IF that
    position is still inside its own segment. No per-group Python loop,
    dtype-preserving (int64 min/max stays exact)."""
    out = x.copy()
    n = len(x)
    idx = np.arange(n)
    d = 1
    while d < n:
        src = idx - d
        valid = src >= seg_begin_idx
        prev = out.copy()
        out[valid] = op(prev[idx[valid]], prev[src[valid]])
        d <<= 1
    return out


def _sliding_min_max(x: np.ndarray, pos: np.ndarray,
                     seg_begin_idx: np.ndarray, w: int,
                     op) -> np.ndarray:
    """Per-row min/max over the trailing ``w``-row frame (clamped at
    the segment head) — the two-scan block trick, segment-aligned:
    blocks of size ``w`` restart at every segment start, ``left`` is
    the prefix scan resetting at block starts, ``right`` the suffix
    scan resetting at block ends; a full frame [i-w+1, i] tiles
    exactly as right[frame start] ∪ left[i], and a head-truncated
    frame sits inside its segment's first block where left[i] alone
    covers it. O(n log w) vectorized passes, dtype-preserving."""
    n = len(x)
    if n == 0:
        return x
    block_begin = np.arange(n) - (pos % w)
    # left: prefix op within blocks (log-doubling capped at w)
    left = x.copy()
    idx = np.arange(n)
    d = 1
    while d < w:
        src = idx - d
        valid = src >= block_begin
        prev = left.copy()
        left[valid] = op(prev[idx[valid]], prev[src[valid]])
        d <<= 1
    # right: suffix op within blocks = prefix op on the reversed
    # array with reversed block boundaries. Forward block end =
    # min(block_begin + w, next segment start) - 1; its reversed
    # index is the reversed block's begin.
    rx = x[::-1]
    is_last = np.zeros(n, dtype=bool)           # segment last rows
    is_last[-1] = True
    is_last[:-1] = seg_begin_idx[1:] != seg_begin_idx[:-1]
    ends = np.nonzero(is_last)[0]
    seg_end = ends[np.searchsorted(ends, np.arange(n))]
    bend = np.minimum(block_begin + w - 1, seg_end)
    rbegin = (n - 1) - bend
    right = rx.copy()
    d = 1
    while d < w:
        src = idx - d
        valid = src >= rbegin[::-1]
        prev = right.copy()
        right[valid] = op(prev[idx[valid]], prev[src[valid]])
        d <<= 1
    right = right[::-1]
    a = idx - (w - 1)                       # full-frame start
    truncated = pos < w                     # frame clamped at seg head
    out = np.where(truncated, left,
                   op(right[np.maximum(a, 0)], left))
    return out


def running_aggregate(ds, group: Sequence[str], order: str,
                      specs: Sequence[tuple[str | None, str, str]], *,
                      num_partitions: int = 32):
    """Cumulative window aggregates within sorted groups — SQL
    ``fn(col) OVER (PARTITION BY group ORDER BY order ROWS BETWEEN
    UNBOUNDED PRECEDING AND CURRENT ROW)`` plus the rank family.

    specs: ``(src_col, fn, out_col)`` or ``(src_col, fn, out_col,
    opt)`` with fn in {``sum``, ``count``, ``mean``, ``min``, ``max``,
    ``first_value``, ``nth_value``, ``row_number``, ``rank``,
    ``dense_rank``, ``percent_rank``, ``cume_dist``, ``ntile``}. The
    rank family ranks by the ORDER column (src ignored, pass None).
    ``opt`` is the moving-frame size in rows for sum/count/mean/min/
    max (SQL ``ROWS BETWEEN opt-1 PRECEDING AND CURRENT ROW``;
    omitted = unbounded; moving min/max runs the segment-aligned
    two-scan block trick, O(n log w)), the tile count for ``ntile``,
    and the 1-based n for ``nth_value``. SQL null semantics for the aggregates:
    nulls in src are skipped; the running value is NULL until the
    first non-null (``first_value`` keeps SQL's take-the-row rule —
    a leading null IS the first value). Use a tie-free order column
    for the cumulative fns (SQL's default RANGE frame folds peers
    together; this kernel is ROWS — they agree iff the order key is
    unique per group). The rank family is tie-stable either way.

    Scale shape: ONE key-hash exchange co-locates each group, then
    every kernel is a vectorized segmented prefix scan over the
    block's lexsort order (cumsum for sum/count/mean, log-doubling
    min/max, boundary-indicator scans for the ranks) — no per-group
    Python loop, no driver materialization. Beyond the reference:
    Kettle's Analytic Query step (AnalyticQuery.java) only ships
    LAG/LEAD; running totals there need a scripted accumulator which
    breaks on any parallel row split."""
    group = list(group)
    specs = [s if len(s) == 4 else (*s, None) for s in specs]
    shuffled = ds.repartition(num_partitions, keys=group)

    def _out_type(src_t: pa.DataType | None, fn: str) -> pa.DataType:
        if fn in ("row_number", "rank", "dense_rank", "count",
                  "ntile"):
            return pa.int64()
        if fn in ("mean", "percent_rank", "cume_dist"):
            return pa.float64()
        if fn == "sum":
            return src_t if src_t is not None and \
                pa.types.is_integer(src_t) else pa.float64()
        return src_t          # min / max / first_value / nth_value

    def _fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        from kettleray.ops.cdc import _composite_key_codes
        if t.num_columns == 0:
            return t
        if t.num_rows == 0:
            for src, fn, out, _opt in specs:
                st = t.schema.field(src).type if src else None
                t = t.append_column(
                    out, pa.array([], type=_out_type(st, fn)))
            return t
        codes = _composite_key_codes(t, group)
        ovs = []
        for oc in ([order] if isinstance(order, str) else list(order)):
            oarr = t[oc].combine_chunks() if isinstance(
                t[oc], pa.ChunkedArray) else t[oc]
            ovs.append(oarr.to_numpy(zero_copy_only=False))
        perm = np.lexsort((*reversed(ovs), codes))
        t = t.take(pa.array(perm, type=pa.int64()))
        sk = codes[perm]
        ovs = [ov[perm] for ov in ovs]
        n = len(sk)
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = sk[1:] != sk[:-1]
        begins = np.nonzero(seg_start)[0]
        run_id = np.cumsum(seg_start) - 1
        seg_begin_idx = begins[run_id]
        pos = np.arange(n) - seg_begin_idx          # 0-based in segment
        new_val = seg_start.copy()
        for ov in ovs:                  # tie = equal FULL order tuple
            new_val[1:] |= ov[1:] != ov[:-1]
        run_len = np.append(begins[1:], n) - begins
        seg_len = run_len[run_id]           # partition size, per row
        for src, fn, out, opt in specs:
            if fn == "row_number":
                t = t.append_column(out, pa.array(pos + 1,
                                                  type=pa.int64()))
                continue
            if fn in ("rank", "percent_rank"):
                last_new = np.maximum.accumulate(
                    np.where(new_val, np.arange(n), -1))
                rk = last_new - seg_begin_idx + 1
                if fn == "rank":
                    t = t.append_column(out, pa.array(
                        rk, type=pa.int64()))
                else:           # SQL: (rank-1)/(n-1), 0 for n==1
                    t = t.append_column(out, pa.array(
                        (rk - 1) / np.maximum(seg_len - 1, 1),
                        type=pa.float64()))
                continue
            if fn == "dense_rank":
                dr = np.cumsum(new_val)
                t = t.append_column(out, pa.array(
                    dr - dr[seg_begin_idx] + 1, type=pa.int64()))
                continue
            if fn == "cume_dist":
                # frame end of each PEER run (ties share the value)
                starts = np.nonzero(new_val)[0]
                peer_id = np.cumsum(new_val) - 1
                peer_end = np.append(starts[1:], n) - 1
                t = t.append_column(out, pa.array(
                    (peer_end[peer_id] - seg_begin_idx + 1) / seg_len,
                    type=pa.float64()))
                continue
            if fn == "ntile":
                k = int(opt)
                size = seg_len // k
                rem = seg_len % k
                cut = rem * (size + 1)      # rows in the fat tiles
                fat = pos < cut
                tile = np.where(
                    fat, pos // np.maximum(size + 1, 1),
                    rem + (pos - cut) // np.maximum(size, 1))
                t = t.append_column(out, pa.array(
                    tile + 1, type=pa.int64()))
                continue
            if fn in ("first_value", "nth_value"):
                col = t[src].combine_chunks() if isinstance(
                    t[src], pa.ChunkedArray) else t[src]
                off = 0 if fn == "first_value" else int(opt) - 1
                at = seg_begin_idx + off
                got = col.take(pa.array(np.minimum(at, n - 1),
                                        type=pa.int64()))
                if off:         # frame shorter than n: SQL says NULL
                    got = pc.if_else(pa.array(pos >= off), got,
                                     pa.scalar(None, type=col.type))
                t = t.append_column(out, got)
                continue
            col = t[src].combine_chunks() if isinstance(
                t[src], pa.ChunkedArray) else t[src]
            valid = np.asarray(pc.is_valid(col))
            nn_c = np.cumsum(valid.astype(np.int64))
            # frame start: unbounded = segment head; moving = opt rows
            # ending at the current one (never crossing the segment)
            fa = seg_begin_idx if opt is None else np.maximum(
                np.arange(n) - (int(opt) - 1), seg_begin_idx)
            fprev = fa - 1
            nn = nn_c - np.where(fprev >= 0, nn_c[fprev], 0)
            never = nn == 0                 # in-frame non-null count
            if fn == "count":
                t = t.append_column(out, pa.array(nn, type=pa.int64()))
                continue
            if fn in ("sum", "mean"):
                x = np.asarray(pc.fill_null(col, 0).to_numpy(
                    zero_copy_only=False))
                c = np.cumsum(x)
                run = c - np.where(fprev >= 0, c[fprev],
                                   np.zeros(1, dtype=c.dtype))
                if fn == "mean":
                    vals = run.astype(np.float64) / np.maximum(nn, 1)
                    arr = pa.array(vals, type=pa.float64(),
                                   mask=never)
                else:
                    arr = pa.array(run, mask=never).cast(
                        _out_type(col.type, fn))
                t = t.append_column(out, arr)
                continue
            if fn in ("min", "max"):
                x = col.to_numpy(zero_copy_only=False)
                if valid.all():
                    xs = x
                else:                       # nulls: fold-neutral fill
                    if np.issubdtype(x.dtype, np.floating):
                        sent = np.inf if fn == "min" else -np.inf
                    else:
                        info = np.iinfo(x.dtype if np.issubdtype(
                            x.dtype, np.integer) else np.int64)
                        sent = info.max if fn == "min" else info.min
                    xs = np.where(valid, x, sent)
                op = np.minimum if fn == "min" else np.maximum
                if opt is None:
                    run = _segmented_scan(np.asarray(xs),
                                          seg_begin_idx, op)
                else:
                    run = _sliding_min_max(np.asarray(xs), pos,
                                           seg_begin_idx, int(opt), op)
                t = t.append_column(
                    out, pa.array(run, mask=never).cast(col.type))
                continue
            raise ValueError(f"running_aggregate: unknown fn {fn!r}")
        return t

    return shuffled.map_batches(_fn, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


# ---------------------------------------------------------------------
# ROLLUP / CUBE grouping sets from ONE pass over the data
# ---------------------------------------------------------------------

def grouping_sets_aggregate(ds, keys: Sequence[str],
                            aggs: Sequence[Agg],
                            sets: Sequence[Sequence[str]], *,
                            gid_col: str = "grouping_id",
                            num_partitions: int | None = None):
    """GROUP BY GROUPING SETS computed the OLAP way: the FINEST
    grouping (all keys) runs as ONE native distributed group_by over
    the input; every other set re-aggregates the finest result — which
    is group-cardinality-sized, so the coarser levels never rescan the
    data. Restricted to algebraic aggs (sum / count / min / max / avg;
    avg decomposes to sum+count and is finalized per level).

    ``gid_col`` carries SQL GROUPING(k1..kn) semantics: bit (n-1-i) set
    iff keys[i] is rolled up in that output row (DuckDB bit order).
    Rolled-up key columns are typed NULLs, so results value-match
    ``GROUP BY ROLLUP/CUBE`` byte for byte."""
    keys = list(keys)
    for a in aggs:
        if a.fn not in ("sum", "count", "min", "max", "avg"):
            raise ValueError(
                f"grouping_sets_aggregate: {a.fn} is not algebraic — "
                f"rollup-from-partials needs sum/count/min/max/avg")
    schema = ds.schema()
    key_type = {n: t for n, t in zip(schema.names, schema.types)}

    # decompose: avg -> (sum, count); count -> count at finest, then
    # SUMMED at coarser levels
    base_aggs: list[Agg] = []
    for a in aggs:
        if a.fn == "avg":
            base_aggs.append(Agg(a.col, "sum", f"__sum_{a.alias}"))
            base_aggs.append(Agg(a.col, "count", f"__cnt_{a.alias}"))
        else:
            base_aggs.append(Agg(a.col, a.fn, a.alias))
    finest = group_by(ds, keys, base_aggs,
                      num_partitions=num_partitions).materialize()

    re_aggs = [Agg(a.alias, "sum" if a.fn == "count" else a.fn,
                   a.alias) for a in base_aggs]
    out_names = keys + [gid_col] + [a.alias for a in aggs]

    def _level(sub: tuple[str, ...]):
        gid = sum(1 << (len(keys) - 1 - i)
                  for i, k in enumerate(keys) if k not in sub)
        if len(sub) == len(keys):
            lvl = finest
        elif sub:
            lvl = group_by(finest, list(sub), re_aggs)
        else:                       # grand total: constant-key groupby
            lvl = group_by(
                finest.map_batches(
                    lambda t: t.append_column(
                        "__all__", pa.array(np.zeros(t.num_rows,
                                                     dtype=np.int64))),
                    batch_format="pyarrow", zero_copy_batch=True),
                ["__all__"], re_aggs)

        def _shape(t: pa.Table, sub=sub, gid=gid) -> pa.Table:
            if t.num_columns == 0:
                return t
            n = t.num_rows
            cols = {}
            for k in keys:
                cols[k] = t[k] if k in sub else pa.nulls(
                    n, type=key_type[k])
            cols[gid_col] = pa.array(np.full(n, gid, dtype=np.int64))
            for a in aggs:
                if a.fn == "avg":
                    s = t[f"__sum_{a.alias}"].combine_chunks() \
                        if isinstance(t[f"__sum_{a.alias}"],
                                      pa.ChunkedArray) \
                        else t[f"__sum_{a.alias}"]
                    c = t[f"__cnt_{a.alias}"]
                    import pyarrow.compute as pc
                    cols[a.alias] = pc.divide(
                        s.cast(pa.float64()),
                        pa.array(np.maximum(
                            np.asarray(c.to_numpy(
                                zero_copy_only=False)), 1),
                            type=pa.float64()))
                else:
                    cols[a.alias] = t[a.alias]
            return pa.table({k: cols[k] for k in out_names})

        return lvl.map_batches(_shape, batch_format="pyarrow",
                               zero_copy_batch=True)

    out = None
    for sub in sets:
        lv = _level(tuple(sub))
        out = lv if out is None else out.union(lv)
    return out


def rollup_aggregate(ds, keys: Sequence[str], aggs: Sequence[Agg], *,
                     gid_col: str = "grouping_id",
                     num_partitions: int | None = None):
    """GROUP BY ROLLUP(keys): every key prefix + grand total."""
    keys = list(keys)
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets_aggregate(ds, keys, aggs, sets,
                                   gid_col=gid_col,
                                   num_partitions=num_partitions)


def cube_aggregate(ds, keys: Sequence[str], aggs: Sequence[Agg], *,
                   gid_col: str = "grouping_id",
                   num_partitions: int | None = None):
    """GROUP BY CUBE(keys): all 2^k key subsets (k is small by
    construction — this is an OLAP summary, not a shuffle fan-out; the
    input is scanned ONCE regardless of k)."""
    keys = list(keys)
    import itertools
    sets = [tuple(c) for r in range(len(keys), -1, -1)
            for c in itertools.combinations(keys, r)]
    return grouping_sets_aggregate(ds, keys, aggs, sets,
                                   gid_col=gid_col,
                                   num_partitions=num_partitions)
