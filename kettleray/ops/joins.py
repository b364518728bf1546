"""Joins & lookups (SURVEY.md §2.5).

≙ Kettle steps: Stream lookup (streamlookup/StreamLookup.java — broadcast
hash join), Merge join (mergejoin/MergeJoin.java — inner/left/right/full),
Join rows (joinrows/JoinRows.java — cartesian), Multiway merge join
(multimerge/MultiMergeJoin.java), Fuzzy match (fuzzymatch/FuzzyMatch.java),
Closure generator (closure/ClosureGenerator.java).

Scale rules: small side broadcast via ``ray.put`` ONCE and probed inside
``map_batches`` with Arrow's C++ hash join (pa.Table.join) — never
re-shipped per batch, no shuffle. Large-large joins use Ray's
hash-partitioned ``Dataset.join``.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import pyarrow as pa

import ray
import ray.data


def merge_join(left, right, on: Sequence[str], *, how: str = "inner",
               num_partitions: int = 32,
               right_on: Sequence[str] | None = None,
               left_suffix: str | None = None,
               right_suffix: str | None = "_r"):
    """Large-large equi-join via Ray's hash-partitioned Dataset.join.
    Kettle requires pre-sorted inputs; here sortedness is an executor
    concern — the hash shuffle replaces the sort contract."""
    how_map = {"inner": "inner", "left": "left_outer",
               "right": "right_outer", "full": "full_outer"}
    return left.join(right, join_type=how_map.get(how, how),
                     num_partitions=num_partitions, on=tuple(on),
                     right_on=tuple(right_on) if right_on else None,
                     left_suffix=left_suffix, right_suffix=right_suffix)


class _BroadcastProbe:
    """Actor-pool stage holding the broadcast lookup table: fetched from
    the object store ONCE per actor (``__init__``), probed per batch with
    Arrow's C++ hash join."""

    def __init__(self, lookup_ref, on, retain, defaults, join_type):
        lk: pa.Table = ray.get(lookup_ref)
        cols = list(dict.fromkeys(list(on) + list(retain)))
        self.lookup = lk.select(cols)
        self.on = list(on)
        self.retain = list(retain)
        self.defaults = defaults or {}
        self.join_type = join_type

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = batch.join(self.lookup, keys=self.on,
                         join_type=self.join_type)
        for col, default in self.defaults.items():
            if col in out.column_names:
                i = out.column_names.index(col)
                out = out.set_column(i, col, pc.fill_null(out[col], default))
        return out


def stream_lookup(main, lookup, on: Sequence[str],
                  retain: Sequence[str], *,
                  defaults: Mapping[str, Any] | None = None,
                  concurrency: "int | tuple[int, int] | None" = None,
                  batch_size: int | None = None):
    """Broadcast hash join: ``lookup`` (small) materialized once,
    ``ray.put`` once, left-join-probed from every batch of ``main``.
    Misses get ``defaults`` (Kettle's default-value-on-miss semantics).
    """
    # materialize small side on the driver (it must be broadcast-small)
    lk_table = pa.concat_tables(ray.get(lookup.to_arrow_refs()))
    ref = ray.put(lk_table)
    from kettleray.context import auto_pool
    return main.map_batches(
        _BroadcastProbe, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency or auto_pool(2),
        fn_constructor_args=(ref, list(on), list(retain), dict(defaults or {}),
                             "left outer"))


def semi_join(main, lookup, on: Sequence[str], *, anti: bool = False,
              method: str = "auto", num_partitions: int = 32,
              broadcast_limit: int = 2_000_000):
    """Semi/anti join.

    ``method='broadcast'``: key set pulled to the driver once, shipped via
    ``ray.put``, filtered inside map_batches — right when the lookup side
    is small (a dimension table, a blocklist).

    ``method='join'``: hash-partitioned ``Dataset.join`` with Ray's native
    ``left_semi`` / ``left_anti`` — the scale path: the key set never
    touches the driver, memory per task is one co-partitioned shard.

    ``method='auto'`` (default): materializes the lookup keys (distributed,
    object store) and picks broadcast below ``broadcast_limit`` keys,
    join above it.
    """
    keys = list(on)
    if method == "auto":
        lookup = lookup.materialize()
        method = ("broadcast" if lookup.count() <= broadcast_limit
                  else "join")
    if method == "join":
        lookup = lookup.materialize()
        if lookup.count() == 0:
            # guard: Ray 2.49's hash-shuffle join drops the schema of a
            # fully-empty side (zero-column partitions -> ArrowInvalid)
            return main if anti else main.limit(0)
        return main.join(
            lookup.select_columns(keys),
            join_type="left_anti" if anti else "left_semi",
            on=tuple(keys), num_partitions=num_partitions)
    # tolerate empty/zero-column blocks (e.g. a fully-filtered stage can
    # emit schema-less empties); empty lookup: anti keeps all, semi none
    tables = [t for t in ray.get(lookup.to_arrow_refs())
              if t.num_columns > 0]
    if not tables or sum(t.num_rows for t in tables) == 0:
        if anti:
            return main
        return main.limit(0)
    lk_table = pa.concat_tables(tables)
    lk_keys = lk_table.select(keys)
    ref = ray.put(lk_keys)

    class _Filter:
        def __init__(self):
            import pyarrow.compute as pc
            lk = ray.get(ref)
            if len(keys) == 1:
                self.key_set = pc.unique(lk[keys[0]])
            else:
                joined = pc.binary_join_element_wise(
                    *[pc.cast(lk[k], pa.string()) for k in keys], "\x00")
                self.key_set = pc.unique(joined)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if len(keys) == 1:
                probe = t[keys[0]]
            else:
                probe = pc.binary_join_element_wise(
                    *[pc.cast(t[k], pa.string()) for k in keys], "\x00")
            mask = pc.is_in(probe, value_set=self.key_set)
            if anti:
                mask = pc.invert(mask)
            return t.filter(mask)

    from kettleray.context import auto_pool
    return main.map_batches(_Filter, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=auto_pool())


def multiway_merge_join(inputs, on: Sequence[str], *, how: str = "inner",
                        num_partitions: int = 32):
    """True N-way merge join on a SHARED key in ONE exchange
    (≙ multimerge/MultiMergeJoin.java: N sorted streams, one pass).

    Instead of chaining N-1 two-way joins (which re-shuffles the growing
    intermediate N-2 times), every input is tagged with a source id,
    null-padded to the superset schema, unioned, and hash-partitioned
    ONCE on the key; inside each co-located block the N sides are split
    back out and joined with Arrow's in-memory C++ join — total shuffle
    volume is exactly sum(inputs), independent of N.

    ``how``: 'inner' or 'full' (Kettle's MultiMergeJoin modes).
    Non-key column names must be unique across inputs (rename first —
    Kettle's UI enforces the same)."""
    import numpy as np
    import pyarrow.compute as pc
    on = list(on)
    if how not in ("inner", "full"):
        raise ValueError("multiway_merge_join supports how='inner'|'full'")
    schemas = [ds.schema() for ds in inputs]
    own_cols: list[list[str]] = []      # non-key columns per input
    field_types: dict[str, pa.DataType] = {}
    for k in on:
        field_types[k] = schemas[0].base_schema.field(k).type
    for i, sch in enumerate(schemas):
        base = sch.base_schema
        cols = [n for n in base.names if n not in on]
        for n in cols:
            if n in field_types:
                raise ValueError(
                    f"duplicate non-key column {n!r} across inputs")
            field_types[n] = base.field(n).type
        own_cols.append(cols)
    all_names = list(field_types)

    def _pad(i):
        def _fn(t: pa.Table) -> pa.Table:
            cols = {}
            for n in all_names:
                if n in t.column_names:
                    cols[n] = t[n]
                else:
                    cols[n] = pa.nulls(t.num_rows, type=field_types[n])
            cols["__src"] = pa.array(
                np.full(t.num_rows, i, dtype=np.int8))
            return pa.table(cols)
        return _fn

    u = inputs[0].map_batches(_pad(0), batch_format="pyarrow",
                              zero_copy_batch=True)
    for i, ds in enumerate(inputs[1:], 1):
        u = u.union(ds.map_batches(_pad(i), batch_format="pyarrow",
                                   zero_copy_batch=True))
    shuffled = u.repartition(num_partitions, keys=on)
    jt = "inner" if how == "inner" else "full outer"
    n_inputs = len(inputs)

    def _merge(t: pa.Table) -> pa.Table:
        empty = pa.table({n: pa.array([], type=field_types[n])
                          for n in all_names})
        if t.num_columns == 0 or t.num_rows == 0:
            return empty
        src = t["__src"]
        out = None
        for i in range(n_inputs):
            side = t.filter(pc.equal(src, i)).select(on + own_cols[i])
            if out is None:
                out = side
            else:
                out = out.join(side, keys=on, join_type=jt)
            if out.num_rows == 0 and how == "inner":
                return empty
        return out.select(all_names)

    return shuffled.map_batches(_merge, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def join_rows_cartesian(main, small, *, suffix: str = "_r",
                        condition=None):
    """≙ Join rows: cross join against a broadcast-small side; optional
    post-filter condition (a rowops Cond/CondTree). There is deliberately
    no distributed-both-sides cross join — at 100 TB that is always a
    design error; Kettle buffers one side to temp files for the same
    reason."""
    import numpy as np
    sm = pa.concat_tables(ray.get(small.to_arrow_refs()))
    ref = ray.put(sm)

    def _fn(t: pa.Table) -> pa.Table:
        s = ray.get(ref)
        n, m = t.num_rows, s.num_rows
        left = t.take(pa.array(np.repeat(np.arange(n), m), type=pa.int64()))
        right = s.take(pa.array(np.tile(np.arange(m), n), type=pa.int64()))
        for name, col in zip(right.column_names, right.columns):
            out_name = name if name not in left.column_names \
                else f"{name}{suffix}"
            left = left.append_column(out_name, col)
        if condition is not None:
            from kettleray.ops.rowops import _eval_cond
            import pyarrow.compute as pc
            left = left.filter(pc.fill_null(_eval_cond(left, condition),
                                            False))
        return left

    return main.map_batches(_fn, batch_format="pyarrow",
                            zero_copy_batch=True)


_FUZZY_DISTANCE = ("levenshtein", "damerau_levenshtein")
_FUZZY_SIMILARITY = ("jaro", "jaro_winkler", "needleman_wunsch",
                     "pair_similarity")
_FUZZY_PHONETIC = ("soundex", "refined_soundex", "metaphone",
                   "double_metaphone")


def fuzzy_match(main, lookup, main_field: str, lookup_field: str, *,
                algo: str = "levenshtein", max_distance: int = 3,
                min_similarity: float = 0.0,
                out_match: str = "match", out_score: str = "score",
                concurrency: "int | tuple[int, int] | None" = None):
    """≙ Fuzzy match (fuzzymatch/FuzzyMatch.java): nearest lookup value
    under the chosen algorithm. Broadcast lookup values once per actor;
    per batch, a band-limited candidate scan.

    Algorithms (Kettle's matching modes):
    - levenshtein / damerau_levenshtein: min edit distance
      (<= max_distance), tie broken by candidate value;
    - jaro / jaro_winkler / pair_similarity: max similarity
      (>= min_similarity);
    - needleman_wunsch: max global-alignment score; scores are <= 0
      under the default unit penalties, so pass a negative
      min_similarity (e.g. -max_distance);
    - soundex / refined_soundex / metaphone / double_metaphone: first
      candidate whose phonetic code equals the input's (score = code).
    Lookup side must be broadcast-small (same constraint as Kettle's
    in-memory lookup stream)."""
    lk_table = pa.concat_tables(ray.get(lookup.to_arrow_refs()))
    ref = ray.put(lk_table[lookup_field].combine_chunks().to_pylist())

    class _Fuzzy:
        def __init__(self):
            from kettleray.ops import calculator as calc
            from kettleray.ops.phonetics import double_metaphone
            self.cands = sorted(c for c in ray.get(ref) if c is not None)
            if algo in _FUZZY_DISTANCE:
                self.fn = {"levenshtein": calc._levenshtein,
                           "damerau_levenshtein": calc._damerau_osa}[algo]
            elif algo in _FUZZY_SIMILARITY:
                self.fn = {"jaro": calc._jaro,
                           "jaro_winkler": calc._jaro_winkler,
                           "needleman_wunsch": calc._needleman_wunsch,
                           "pair_similarity": calc._pair_similarity}[algo]
            elif algo in _FUZZY_PHONETIC:
                enc = {"soundex": calc._soundex,
                       "refined_soundex": calc._refined_soundex,
                       "metaphone": calc._metaphone,
                       "double_metaphone":
                           lambda v: double_metaphone(v)[0]}[algo]
                self.enc = enc
                # encode each unique candidate ONCE per actor
                self.codes = [(c, enc(c)) for c in self.cands]
            else:
                raise ValueError(f"unknown fuzzy algorithm {algo!r}")

        def _best(self, v):
            from kettleray.ops import calculator as calc
            bm, bs = None, None
            if algo in _FUZZY_DISTANCE:
                capped = (calc._levenshtein_capped
                          if algo == "levenshtein" else None)
                for c in self.cands:
                    if abs(len(c) - len(v)) > max_distance:
                        continue
                    # early-exit DP: rejects most candidates in O(len)
                    d = capped(v, c, max_distance) if capped \
                        else self.fn(v, c)
                    if d <= max_distance and (
                            bs is None or d < bs
                            or (d == bs and c < bm)):
                        bm, bs = c, d
            elif algo in _FUZZY_SIMILARITY:
                for c in self.cands:
                    s = self.fn(v, c)
                    if s >= min_similarity and (
                            bs is None or s > bs
                            or (s == bs and c < bm)):
                        bm, bs = c, s
            else:
                code = self.enc(v)
                for c, ccode in self.codes:
                    if ccode == code:
                        bm, bs = c, code
                        break
            return bm, bs

        def __call__(self, t: pa.Table) -> pa.Table:
            vals = t[main_field].combine_chunks().to_pylist() \
                if isinstance(t[main_field], pa.ChunkedArray) \
                else t[main_field].to_pylist()
            best_m, best_s = [], []
            cache: dict = {}    # scan once per UNIQUE input value
            for v in vals:
                if v is None:
                    best_m.append(None)
                    best_s.append(None)
                    continue
                r = cache.get(v)
                if r is None:
                    r = self._best(v)
                    cache[v] = r
                bm, bs = r
                best_m.append(bm)
                best_s.append(bs)
            t = t.append_column(out_match, pa.array(best_m,
                                                    type=pa.string()))
            stype = pa.int64() if algo in _FUZZY_DISTANCE else (
                pa.float64() if algo in _FUZZY_SIMILARITY else pa.string())
            return t.append_column(out_score, pa.array(best_s, type=stype))

    from kettleray.context import auto_pool
    return main.map_batches(_Fuzzy, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=concurrency or auto_pool())


def closure_generator_distributed(pairs, parent_col: str, child_col: str,
                                  *, max_depth: int = 32,
                                  num_partitions: int = 8):
    """Distributed transitive closure by ITERATIVE DOUBLING: each round
    joins the reach set with itself (ancestor path of depth a+b from
    paths a and b), so all depths up to 2^r are covered after r rounds —
    O(log max_depth) hash-shuffle joins, no driver walk. Use when the
    hierarchy is too large for the driver-side ``closure_generator``
    (which is fine for dimension-sized inputs). Emits the same
    (parent=ancestor, child, depth) rows."""
    import pyarrow.compute as _pc

    def _base(t: pa.Table) -> pa.Table:
        edge = pa.table({"anc": t[parent_col], "node": t[child_col],
                         "depth": pa.array([1] * t.num_rows,
                                           type=pa.int64())})
        self_rows = pa.table({"anc": t[child_col], "node": t[child_col],
                              "depth": pa.array([0] * t.num_rows,
                                                type=pa.int64())})
        return pa.concat_tables([edge, self_rows])

    from kettleray.ops.aggregates import unique_rows
    reach = pairs.map_batches(_base, batch_format="pyarrow",
                              zero_copy_batch=True)
    reach = unique_rows(reach, ["anc", "node", "depth"],
                        num_partitions=num_partitions).materialize()
    rounds = max(1, (max_depth - 1).bit_length())
    prev_n = reach.count()
    for _ in range(rounds):
        # rename via an Arrow map (Ray's Project op chokes on the pandas
        # blocks the unique_rows stage emits)
        upper = reach.map_batches(
            lambda t: pa.table({"anc2": t["anc"], "anc": t["node"],
                                "depth2": t["depth"]}),
            batch_format="pyarrow")
        joined = reach.join(upper, join_type="inner",
                            num_partitions=num_partitions, on=("anc",),
                            right_suffix="_r")

        def _combine(t: pa.Table) -> pa.Table:
            d = _pc.add(t["depth"], t["depth2"])
            out = pa.table({"anc": t["anc2"], "node": t["node"],
                            "depth": d})
            return out.filter(_pc.less_equal(out["depth"], max_depth))

        new = joined.map_batches(_combine, batch_format="pyarrow")
        reach = unique_rows(reach.union(new), ["anc", "node", "depth"],
                            num_partitions=num_partitions).materialize()
        n = reach.count()
        if n == prev_n:
            break
        prev_n = n

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({parent_col: t["anc"], child_col: t["node"],
                         "depth": t["depth"]})

    # the driver variant emits self rows only once per distinct child
    return unique_rows(
        reach.map_batches(_rename, batch_format="pyarrow"),
        [parent_col, child_col, "depth"], num_partitions=num_partitions)


def closure_generator(pairs, parent_col: str, child_col: str, *,
                      max_depth: int = 32):
    """≙ Closure generator: transitive closure of a (parent, child)
    hierarchy, emitting (root, node, depth). Hierarchies are dimension-
    sized; computed on the driver (documented small-side assumption);
    see closure_generator_distributed for the log-rounds join variant."""
    t = pa.concat_tables(ray.get(pairs.to_arrow_refs()))
    parent = t[parent_col].to_pylist()
    child = t[child_col].to_pylist()
    up = dict(zip(child, parent))
    rows = []
    for c in child:
        node, depth = c, 0
        rows.append({parent_col: c, child_col: c, "depth": 0})
        while depth < max_depth:
            p = up.get(node)
            if p is None or p == node:
                break
            depth += 1
            rows.append({parent_col: p, child_col: c, "depth": depth})
            node = p
    return ray.data.from_items(rows)


def asof_join(left, right, *, by: Sequence[str], on: str,
              right_cols: Sequence[str], num_partitions: int = 32,
              strict: bool = False, suffix: str = "_r"):
    """As-of join (backward): each left row picks the LATEST right row
    with the same ``by`` key and ``right.on <= left.on`` (``strict``:
    ``<``). The canonical stream-enrichment operator (attach the most
    recent rate / profile / state to each event) — Ray Data has no
    native equivalent, so it is composed as:

      tag + schema-align both sides -> ONE hash shuffle on ``by``
      -> per-partition vectorized sorted sweep (lexsort + segmented
      running-maximum over right-row indices; no Python row loop).

    Partitioning assumption (documented per SURVEY §2.5): the keyed
    ``repartition(keys=by)`` co-locates ALL rows of a key in one block —
    the same invariant every per-key reduce in this engine relies on.
    Right rows that tie on (key, on) are resolved by the later one in
    block order; pre-dedupe the right side per (by, on) for a fully
    deterministic result. Unmatched left rows keep nulls (left-outer
    semantics, like DuckDB's ASOF LEFT JOIN)."""
    import numpy as np
    import pyarrow.compute as pc
    from kettleray.ops.cdc import _composite_key_codes

    by = list(by)
    right_cols = [c for c in right_cols if c not in by and c != on]

    def _id(t: pa.Table) -> pa.Table:
        return t

    # normalize to Arrow blocks so base_schema is a pa.Schema even for
    # pandas-block inputs (from_pandas)
    left = left.map_batches(_id, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(_id, batch_format="pyarrow",
                              zero_copy_batch=True)
    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema
    left_names = left_schema.names
    out_right = [(c, c + suffix if (c in left_names) else c)
                 for c in right_cols]

    def _align_left(t: pa.Table) -> pa.Table:
        for c, _ in out_right:
            t = t.append_column(
                "__r_" + c, pa.nulls(t.num_rows,
                                     type=right_schema.field(c).type))
        return t.append_column("__src",
                               pa.array(np.ones(t.num_rows, np.int8)))

    def _align_right(t: pa.Table) -> pa.Table:
        cols = {}
        for c in by:
            cols[c] = t[c]
        cols[on] = t[on]
        out = pa.table(cols)
        for c in left_names:
            if c in by or c == on:
                continue
            out = out.append_column(
                c, pa.nulls(t.num_rows, type=left_schema.field(c).type))
        out = out.select([c for c in left_names])
        for c, _ in out_right:
            out = out.append_column("__r_" + c, t[c])
        return out.append_column(
            "__src", pa.array(np.zeros(t.num_rows, np.int8)))

    u = left.map_batches(_align_left, batch_format="pyarrow",
                         zero_copy_batch=True).union(
        right.map_batches(_align_right, batch_format="pyarrow",
                          zero_copy_batch=True))
    shuffled = u.repartition(num_partitions, keys=by)

    def _sweep(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            cols = {c: pa.array([], type=left_schema.field(c).type)
                    for c in left_names}
            for c, oname in out_right:
                cols[oname] = pa.array(
                    [], type=right_schema.field(c).type)
            return pa.table(cols)
        codes = _composite_key_codes(t, by)
        onv = t[on].to_numpy(zero_copy_only=False)
        src = t["__src"].to_numpy(zero_copy_only=False)
        # sort: key, then on; at equal (key, on) right before left for
        # non-strict (so equality matches), left before right for strict
        tie = src if not strict else (1 - src)
        order = np.lexsort((tie, onv, codes))
        sk = codes[order]
        s_src = src[order]
        seg_start = np.empty(n, dtype=bool)
        seg_start[0] = True
        seg_start[1:] = sk[1:] != sk[:-1]
        seg = np.cumsum(seg_start) - 1
        val = np.where(s_src == 0, np.arange(n, dtype=np.int64), -1)
        biased = seg.astype(np.int64) * n + val
        acc = np.maximum.accumulate(biased)
        match = acc - seg.astype(np.int64) * n   # -1 => no right row yet
        is_left = s_src == 1
        left_sorted_idx = np.nonzero(is_left)[0]
        m = match[left_sorted_idx]
        has = m >= 0
        sorted_t = t.take(pa.array(order, type=pa.int64()))
        left_rows = sorted_t.filter(pa.array(is_left))
        out = {}
        for c in left_names:
            out[c] = left_rows[c]
        # gather matched right values (index 0 placeholder where none)
        gather = np.where(has, m, 0)
        for c, oname in out_right:
            col = sorted_t["__r_" + c].take(
                pa.array(gather, type=pa.int64()))
            if not has.all():
                col = pc.if_else(pa.array(has), col,
                                 pa.nulls(len(has), type=col.type))
            out[oname] = col
        return pa.table(out)

    return shuffled.map_batches(_sweep, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def range_join(left, bands, *, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               band_cols: Sequence[str], suffix: str = "_b",
               concurrency=None):
    """Range (interval) join: each left row matched to the band row with
    ``lo <= value < hi``. Bands are DIMENSION-sized (price bands, score
    buckets, time buckets): materialized once on the driver, broadcast
    via ``ray.put`` once, probed per batch with ``np.searchsorted`` —
    no shuffle at all. Bands must be non-overlapping (validated);
    unmatched left rows keep nulls (left-outer semantics)."""
    import numpy as np
    import pyarrow.compute as pc

    bt = pa.Table.from_pylist(bands.take_all()).sort_by(lo_col)
    lo = bt[lo_col].to_numpy(zero_copy_only=False).astype(np.float64)
    hi = bt[hi_col].to_numpy(zero_copy_only=False).astype(np.float64)
    if (hi < lo).any() or (len(lo) > 1 and (lo[1:] < hi[:-1]).any()):
        raise ValueError("bands must be non-overlapping with lo <= hi")
    keep = [c for c in band_cols if c in bt.column_names]
    payload = bt.select(keep)
    ref = ray.put((lo, hi, payload))
    left_names = left.schema().base_schema.names

    class _Probe:
        def __init__(self):
            self.lo, self.hi, self.payload = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = pc.cast(t[value_col], pa.float64()) \
                .to_numpy(zero_copy_only=False)
            i = np.searchsorted(self.lo, v, side="right") - 1
            ok = (i >= 0) & np.isfinite(v)
            ok[ok] &= v[ok] < self.hi[i[ok]]
            gather = np.where(ok, i, 0)
            oka = pa.array(ok)
            for c in self.payload.column_names:
                col = self.payload[c].take(
                    pa.array(gather, type=pa.int64()))
                if not ok.all():
                    col = pc.if_else(oka, col,
                                     pa.nulls(len(ok), type=col.type))
                name = c + suffix if c in left_names else c
                t = t.append_column(name, col)
            return t

    from kettleray.context import auto_pool
    return left.map_batches(_Probe, batch_format="pyarrow",
                            zero_copy_batch=True,
                            concurrency=concurrency or auto_pool())


def interval_join(left, right, *, by: Sequence[str], on: str,
                  lower: int, upper: int,
                  right_cols: Sequence[str],
                  num_partitions: int = 32, suffix: str = "_r",
                  how: str = "inner", salt: int = 1):
    """Stream-stream interval join: every (left, right) pair
    with equal ``by`` keys and ``right.on`` in the closed interval
    ``[left.on + lower, left.on + upper]``. The canonical event-
    correlation operator (clicks within 5 minutes before each
    purchase; sensor readings around each alarm) — Kettle expresses
    this as a Merge Join + post-filter Calculator over a full key join
    (≙ engine/.../steps/mergejoin + filterrows), which explodes on hot
    keys; Ray Data has no native equivalent, so it is composed as:

      time-band both sides (band width = interval span, so a left row
      touches <= 2 consecutive bands; right rows live in EXACTLY one
      band -> no duplicate pairs by construction) -> replicate left
      rows to their touched bands -> ONE hash shuffle on
      ``by + band`` -> per-partition vectorized range count
      (lexsort + segmented searchsorted; pairs emitted via
      repeat/arange — no Python row loop).

    Scale shape: shuffle volume is |left| * <=2 + |right| rows, never
    pairs; pair expansion happens inside the partition that owns the
    (key, band) — the same locality a 256-node exchange preserves.
    Skewed hot (key, band) combos expand in one task (inherent to the
    join's output size, same as any equi-join's hot key).

    ``on`` must be numeric or timestamp (cast to int64 internally —
    for ``timestamp[us]`` give ``lower``/``upper`` in microseconds).
    ``lower <= upper``; both may be negative (a purely-backward
    window is ``lower=-delta, upper=0``). Tie semantics: interval
    bounds are INCLUSIVE on both ends.

    ``how='left'`` keeps unmatched left rows with null right columns
    (the asof/range-join convention). Because a left row's window can
    straddle TWO bands, "unmatched" is only decidable across both of
    its partitions: left rows carry a synthetic id, each partition
    emits its zero-local-match CANONICAL copies as candidates, and one
    id-keyed ``left_anti`` join removes candidates that matched in
    their other band — one extra bounded exchange (ids + candidate
    rows, never pairs) that the inner path does not pay.

    ``salt > 1`` splits every (key, band)'s RIGHT rows across ``salt``
    sub-partitions and replicates left rows to all of them (the
    skew.py hot-key discipline applied to the pair expansion): a
    celebrity key's L x R output is produced by ``salt`` tasks instead
    of one, at the cost of ``salt``x left replication. Output is
    identical for any salt (sub-groups partition the rights; only the
    salt-0 copy stays canonical, so left-outer null rows never
    duplicate)."""
    import numpy as np
    import pyarrow.compute as pc
    from kettleray.ops.cdc import _composite_key_codes

    if lower > upper:
        raise ValueError(f"interval_join: lower={lower} > upper={upper}")
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how must be 'inner' or "
                         f"'left', got {how!r}")
    by = list(by)
    right_cols = [c for c in right_cols if c not in by]
    w = max(int(upper) - int(lower), 1)

    def _norm(t: pa.Table) -> pa.Table:
        return t

    left = left.map_batches(_norm, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(_norm, batch_format="pyarrow",
                              zero_copy_batch=True)
    left_schema = left.schema().base_schema
    right_schema = right.schema().base_schema
    left_names = left_schema.names
    out_right = [(c, c + suffix if (c in left_names) else c)
                 for c in right_cols]

    def _on_i64(t: pa.Table) -> "np.ndarray":
        return pc.cast(t[on], pa.int64()).to_numpy(zero_copy_only=False)

    def _tag_left(t: pa.Table) -> pa.Table:
        onv = _on_i64(t)
        for c, _ in out_right:
            t = t.append_column(
                "__r_" + c, pa.nulls(t.num_rows,
                                     type=right_schema.field(c).type))
        t = t.append_column("__on", pa.array(onv, type=pa.int64()))
        t = t.append_column("__src",
                            pa.array(np.ones(t.num_rows, np.int8)))
        if how == "left":
            # synthetic per-row id, unique across blocks w.o.p.: random
            # 64-bit block base + row offset (collision needs two block
            # bases within block-size of each other: ~n_blocks^2 *
            # rows / 2^63)
            import uuid as _uuid
            base_id = np.int64(_uuid.uuid4().int & ((1 << 63) - 1))
            t = t.append_column("__lid", pa.array(
                base_id + np.arange(t.num_rows, dtype=np.int64),
                type=pa.int64()))
        b0 = np.floor_divide(onv + int(lower), w)
        b1 = np.floor_divide(onv + int(upper), w)
        base = t.append_column("__band", pa.array(b0, type=pa.int64()))
        if how == "left":
            base = base.append_column(
                "__canon", pa.array(np.ones(t.num_rows, bool)))
        dup_mask = b1 != b0
        copies = [base]
        if dup_mask.any():
            dup = t.filter(pa.array(dup_mask)).append_column(
                "__band", pa.array(b1[dup_mask], type=pa.int64()))
            if how == "left":
                dup = dup.append_column(
                    "__canon", pa.array(np.zeros(dup.num_rows, bool)))
            copies.append(dup)
        if salt <= 1:
            return pa.concat_tables(copies) if len(copies) > 1 \
                else copies[0]
        # hot-key salting: every copy visits ALL right sub-groups;
        # only the salt-0 base copy stays canonical
        salted = []
        for ci, cp in enumerate(copies):
            for s in range(salt):
                c2 = cp
                if how == "left" and s > 0 and ci == 0:
                    c2 = c2.set_column(
                        c2.schema.get_field_index("__canon"), "__canon",
                        pa.array(np.zeros(c2.num_rows, bool)))
                salted.append(c2.append_column(
                    "__salt", pa.array(
                        np.full(c2.num_rows, s, np.int64))))
        return pa.concat_tables(salted)

    def _tag_right(t: pa.Table) -> pa.Table:
        onv = _on_i64(t)
        o = {}
        for c in left_names:
            o[c] = t[c] if c in by else pa.nulls(
                t.num_rows, type=left_schema.field(c).type)
        res = pa.table(o) if left_names else pa.table({})
        for c, _ in out_right:
            res = res.append_column("__r_" + c, t[c])
        res = res.append_column("__on", pa.array(onv, type=pa.int64()))
        res = res.append_column(
            "__src", pa.array(np.zeros(t.num_rows, np.int8)))
        if how == "left":
            res = res.append_column(
                "__lid", pa.nulls(t.num_rows, pa.int64()))
        res = res.append_column(
            "__band", pa.array(np.floor_divide(onv, w), type=pa.int64()))
        if how == "left":
            res = res.append_column(
                "__canon", pa.array(np.zeros(t.num_rows, bool)))
        if salt > 1:
            res = res.append_column("__salt", pa.array(
                np.arange(t.num_rows, dtype=np.int64) % salt))
        return res

    u = left.map_batches(_tag_left, batch_format="pyarrow",
                         zero_copy_batch=True).union(
        right.map_batches(_tag_right, batch_format="pyarrow",
                          zero_copy_batch=True))
    shuffle_keys = by + ["__band"] + (["__salt"] if salt > 1 else [])
    shuffled = u.repartition(num_partitions, keys=shuffle_keys)

    def _empty() -> pa.Table:
        cols = {c: pa.array([], type=left_schema.field(c).type)
                for c in left_names}
        for c, oname in out_right:
            cols[oname] = pa.array([], type=right_schema.field(c).type)
        if how == "left":
            cols["__lid"] = pa.array([], type=pa.int64())
            cols["__matched"] = pa.array([], type=pa.bool_())
        return pa.table(cols)

    def _emit_left(t: pa.Table, lt: pa.Table, rt: "pa.Table | None",
                   cand: "pa.Table | None") -> pa.Table:
        """Assemble the left-mode marker table: matched pairs (lt x rt
        rows, __matched=True) + zero-local-match canonical candidates
        (null right cols, __matched=False)."""
        parts = []
        if lt is not None and lt.num_rows:
            out = {c: lt[c] for c in left_names}
            for c, oname in out_right:
                out[oname] = rt["__r_" + c]
            out["__lid"] = lt["__lid"]
            out["__matched"] = pa.array(
                np.ones(lt.num_rows, bool))
            parts.append(pa.table(out))
        if cand is not None and cand.num_rows:
            out = {c: cand[c] for c in left_names}
            for c, oname in out_right:
                out[oname] = pa.nulls(
                    cand.num_rows, type=right_schema.field(c).type)
            out["__lid"] = cand["__lid"]
            out["__matched"] = pa.array(
                np.zeros(cand.num_rows, bool))
            parts.append(pa.table(out))
        return pa.concat_tables(parts) if parts else _empty()

    def _pairs(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return _empty()
        codes = _composite_key_codes(t, shuffle_keys)
        onv = t["__on"].to_numpy(zero_copy_only=False)
        src = t["__src"].to_numpy(zero_copy_only=False)
        r_mask = src == 0
        l_mask = ~r_mask
        if not r_mask.any() or not l_mask.any():
            if how == "left" and l_mask.any():
                canon = t.filter(pa.array(l_mask & t["__canon"]
                                 .to_numpy(zero_copy_only=False)))
                return _emit_left(t, None, None, canon)
            return _empty()
        r_idx = np.nonzero(r_mask)[0]
        l_idx = np.nonzero(l_mask)[0]
        r_seg, r_on = codes[r_idx], onv[r_idx]
        ro = np.lexsort((r_on, r_seg))
        r_seg, r_on, r_idx = r_seg[ro], r_on[ro], r_idx[ro]
        l_seg = codes[l_idx]
        lo_v = onv[l_idx] + int(lower)
        hi_v = onv[l_idx] + int(upper)
        # per-left right-segment bounds: two vectorized searchsorteds
        seg_lo = np.searchsorted(r_seg, l_seg, side="left")
        seg_hi = np.searchsorted(r_seg, l_seg, side="right")
        # offset-normalized global key makes r_on monotone ACROSS
        # segments so one searchsorted answers every left row's range
        # (per-segment spans are interval-sized, so offsets never
        # approach int64)
        nr = len(r_on)
        starts = np.empty(nr, dtype=bool)
        starts[0] = True
        starts[1:] = r_seg[1:] != r_seg[:-1]
        sid = np.cumsum(starts) - 1                # dense seg rank
        first = np.nonzero(starts)[0]
        seg_min = r_on[first]
        last = np.concatenate([first[1:] - 1, [nr - 1]])
        seg_max = r_on[last]
        span = (seg_max - seg_min).astype(np.int64)
        off = np.zeros(len(first), dtype=np.int64)
        np.cumsum(span[:-1] + np.int64(2), out=off[1:])
        g = (r_on - seg_min[sid]) + off[sid] + 1
        have = seg_hi > seg_lo
        lo_idx = seg_lo.copy()
        hi_idx = seg_lo.copy()
        if have.any():
            hs = np.nonzero(have)[0]
            lsid = sid[seg_lo[hs]]                 # dense rank of the
            # left row's segment (seg_lo points at its first right row)
            qlo = off[lsid] + 1 + np.clip(
                lo_v[hs] - seg_min[lsid], 0, span[lsid] + 1)
            qhi = off[lsid] + 1 + np.clip(
                hi_v[hs] - seg_min[lsid], -1, span[lsid])
            lo_idx[hs] = np.searchsorted(g, qlo, side="left")
            hi_idx[hs] = np.searchsorted(g, qhi, side="right")
        counts = np.maximum(hi_idx - lo_idx, 0)
        total = int(counts.sum())
        if how == "left":
            canon_np = t["__canon"].to_numpy(zero_copy_only=False)
            cand_rows = l_idx[(counts == 0) & canon_np[l_idx]]
            cand = t.take(pa.array(cand_rows, type=pa.int64())) \
                if len(cand_rows) else None
        if total == 0:
            if how == "left":
                return _emit_left(t, None, None, cand)
            return _empty()
        l_emit = np.repeat(np.arange(len(l_idx)), counts)
        cum = np.cumsum(counts) - counts
        r_emit = (np.arange(total, dtype=np.int64)
                  - np.repeat(cum, counts)
                  + np.repeat(lo_idx, counts))
        lt = t.take(pa.array(l_idx[l_emit], type=pa.int64()))
        rt = t.take(pa.array(r_idx[r_emit], type=pa.int64()))
        if how == "left":
            return _emit_left(t, lt, rt, cand)
        out = {c: lt[c] for c in left_names}
        for c, oname in out_right:
            out[oname] = rt["__r_" + c]
        return pa.table(out)

    marked = shuffled.map_batches(_pairs, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
    if how == "inner":
        return marked

    # left-outer finish: candidates that matched in their OTHER band
    # are dropped by ONE id-keyed anti join (ids + candidate rows move,
    # never pairs); matched pairs pass through untouched. The marked
    # stream MUST be pinned once: its three consumers below would
    # otherwise re-execute the tag stage and mint fresh synthetic ids
    # per consumer (the anti join would never match). The pinned bytes
    # are the join output + candidate rows — what the caller is about
    # to consume anyway; the object store spills them like any result.
    marked = marked.materialize()
    matched = marked.map_batches(
        lambda b: b.filter(b["__matched"]).drop_columns(["__matched"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    cands = marked.map_batches(
        lambda b: b.filter(pc.invert(b["__matched"]))
        .drop_columns(["__matched"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    lids = matched.map_batches(
        lambda b: b.select(["__lid"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    # tiny-regime repair ahead of the acero join (schema-less empty
    # shuffle blocks — see incdedup._solidify_small)
    from kettleray.ops.incdedup import _solidify_small
    mark_schema = pa.schema(
        [left_schema.field(c) for c in left_names]
        + [pa.field(oname, right_schema.field(c).type)
           for c, oname in out_right]
        + [pa.field("__lid", pa.int64())])
    cands = _solidify_small(cands, schema=mark_schema,
                            num_partitions=num_partitions)
    lids = _solidify_small(lids, schema=pa.schema(
        [pa.field("__lid", pa.int64())]),
        num_partitions=num_partitions)
    unmatched = cands.join(lids, join_type="left_anti", on=("__lid",),
                           num_partitions=num_partitions)
    out_names = left_names + [oname for _, oname in out_right]

    def _strip(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return _empty().drop_columns(["__lid", "__matched"])
        return b.select(out_names)

    return matched.union(unmatched).map_batches(
        _strip, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
