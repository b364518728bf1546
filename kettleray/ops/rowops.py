"""Stateless row-level operators (SURVEY.md §2.4).

Each function is ``Dataset -> Dataset`` (or a small tuple of Datasets for
multi-target steps), vectorized over zero-copy Arrow batches with
pyarrow.compute kernels — the Ray-native re-expression of Kettle's
row-at-a-time steps. Reference classes cited per function.
"""

from __future__ import annotations

import binascii
import hashlib
from dataclasses import dataclass
from typing import Any, Mapping, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _arrow_batches(ds, fn, **kw):
    kw.setdefault("batch_size", None)   # full blocks: vectorized kernels
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          **kw)


# ---------------------------------------------------------------------------
# Select values (selectvalues/SelectValues.java): project/rename/cast/remove
# ---------------------------------------------------------------------------

def select_values(ds, *, select: Sequence[str] | None = None,
                  rename: Mapping[str, str] | None = None,
                  casts: Mapping[str, pa.DataType] | None = None,
                  remove: Sequence[str] | None = None):
    def _fn(t: pa.Table) -> pa.Table:
        if select:
            t = t.select(list(select))
        if remove:
            t = t.drop_columns([c for c in remove if c in t.column_names])
        if casts:
            for col, typ in casts.items():
                i = t.column_names.index(col)
                t = t.set_column(i, col, pc.cast(t[col], typ))
        if rename:
            t = t.rename_columns([rename.get(c, c) for c in t.column_names])
        return t
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Filter rows (filterrows/FilterRows.java + core Condition.java):
# a nestable condition tree evaluated as vectorized boolean masks.
# ---------------------------------------------------------------------------

@dataclass
class Cond:
    """One leaf: (field op value) — ops mirror Condition.java functions."""
    field: str
    op: str          # = <> < <= > >= LIKE CONTAINS STARTS_WITH ENDS_WITH
    #                  IN_LIST IS_NULL IS_NOT_NULL REGEXP BETWEEN
    value: Any = None
    value2: Any = None


@dataclass
class CondTree:
    """AND/OR/NOT combination of Cond / CondTree nodes."""
    logic: str                      # AND | OR | NOT | XOR
    children: Sequence[Any]         # Cond | CondTree


def _eval_cond(t: pa.Table, c) -> pa.ChunkedArray:
    if isinstance(c, CondTree):
        masks = [_eval_cond(t, ch) for ch in c.children]
        if c.logic == "NOT":
            return pc.invert(masks[0])
        out = masks[0]
        for m in masks[1:]:
            if c.logic == "AND":
                out = pc.and_kleene(out, m)
            elif c.logic == "OR":
                out = pc.or_kleene(out, m)
            elif c.logic == "XOR":
                out = pc.xor(out, m)
            else:
                raise ValueError(c.logic)
        return out
    col = t[c.field]
    op = c.op
    if op == "=":
        return pc.equal(col, c.value)
    if op == "<>":
        return pc.not_equal(col, c.value)
    if op == "<":
        return pc.less(col, c.value)
    if op == "<=":
        return pc.less_equal(col, c.value)
    if op == ">":
        return pc.greater(col, c.value)
    if op == ">=":
        return pc.greater_equal(col, c.value)
    if op == "LIKE":
        return pc.match_like(col, c.value)
    if op == "CONTAINS":
        return pc.match_substring(col, c.value)
    if op == "STARTS_WITH":
        return pc.starts_with(col, c.value)
    if op == "ENDS_WITH":
        return pc.ends_with(col, c.value)
    if op == "IN_LIST":
        return pc.is_in(col, value_set=pa.array(c.value))
    if op == "IS_NULL":
        return pc.is_null(col)
    if op == "IS_NOT_NULL":
        return pc.is_valid(col)
    if op == "REGEXP":
        return pc.match_substring_regex(col, c.value)
    if op == "BETWEEN":
        return pc.and_(pc.greater_equal(col, c.value),
                       pc.less_equal(col, c.value2))
    raise ValueError(f"unknown condition op {op}")


def cond_from_config(c):
    """Build a Cond/CondTree from JSON-shaped config (the .ktr-spec
    surface): {"field","op","value"[,"value2"]} leaf, ["f","op",v] leaf,
    or {"logic": "AND", "children": [...]} tree. Cond/CondTree instances
    pass through."""
    if isinstance(c, (Cond, CondTree)):
        return c
    if isinstance(c, (list, tuple)):
        return Cond(*c)
    if isinstance(c, Mapping):
        if "logic" in c:
            return CondTree(c["logic"],
                            [cond_from_config(ch)
                             for ch in c["children"]])
        return Cond(c["field"], c["op"], c.get("value"), c.get("value2"))
    raise TypeError(f"cannot build a condition from {type(c).__name__}")


def filter_rows(ds, condition, *, false_target: bool = False):
    """True-target filter; with ``false_target`` returns (true_ds, false_ds)
    — Kettle's two-target routing as two filtered datasets of one parent.
    ``condition`` may be a Cond/CondTree or JSON-shaped config (see
    cond_from_config) so declared pipeline specs can filter."""
    condition = cond_from_config(condition)
    def _true(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(_eval_cond(t, condition), False))
    if not false_target:
        return _arrow_batches(ds, _true)

    def _false(t: pa.Table) -> pa.Table:
        m = pc.fill_null(_eval_cond(t, condition), False)
        return t.filter(pc.invert(m))
    return _arrow_batches(ds, _true), _arrow_batches(ds, _false)


# ---------------------------------------------------------------------------
# Switch / Case (switchcase/SwitchCase.java): value -> route label column
# ---------------------------------------------------------------------------

def switch_case(ds, field: str, cases: Mapping[Any, str],
                default: str = "default", route_col: str = "route"):
    keys = list(cases.keys())
    labels = list(cases.values())

    def _fn(t: pa.Table) -> pa.Table:
        col = t[field]
        out = pa.nulls(t.num_rows, pa.string())
        out = pc.fill_null(out, default)
        for k, lbl in zip(keys, labels):
            out = pc.if_else(pc.equal(col, k), lbl, out)
        return t.append_column(route_col, out)
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Add constants / Set field value (constant/Constant.java,
# setvalueconstant/SetValueConstant.java, setvaluefield/SetValueField.java)
# ---------------------------------------------------------------------------

def add_constants(ds, constants: Mapping[str, Any]):
    def _fn(t: pa.Table) -> pa.Table:
        for name, val in constants.items():
            arr = pa.array([val] * t.num_rows)
            if name in t.column_names:
                t = t.set_column(t.column_names.index(name), name, arr)
            else:
                t = t.append_column(name, arr)
        return t
    return _arrow_batches(ds, _fn)


def set_value_field(ds, target: str, source: str):
    def _fn(t: pa.Table) -> pa.Table:
        col = pc.cast(t[source], t[target].type) \
            if t[target].type != t[source].type else t[source]
        return t.set_column(t.column_names.index(target), target, col)
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Value mapper (valuemapper/ValueMapper.java): dict recode
# ---------------------------------------------------------------------------

def value_mapper(ds, field: str, mapping: Mapping[Any, Any],
                 target_field: str | None = None,
                 default: Any = None, keep_unmatched: bool = True):
    tgt = target_field or field

    def _fn(t: pa.Table) -> pa.Table:
        col = t[field]
        if keep_unmatched and default is None:
            out = col
        else:
            out = pa.nulls(t.num_rows, pa.string())
            if default is not None:
                out = pc.fill_null(pc.cast(out, pa.string()), default)
        for k, v in mapping.items():
            out = pc.if_else(pc.equal(col, k), v, out)
        if tgt in t.column_names:
            return t.set_column(t.column_names.index(tgt), tgt, out)
        return t.append_column(tgt, out)
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# If field value is null / Null if (ifnull/IfNull.java, nullif/NullIf.java)
# ---------------------------------------------------------------------------

def if_null(ds, defaults: Mapping[str, Any]):
    def _fn(t: pa.Table) -> pa.Table:
        for col, val in defaults.items():
            i = t.column_names.index(col)
            t = t.set_column(i, col, pc.fill_null(t[col], val))
        return t
    return _arrow_batches(ds, _fn)


def null_if(ds, matches: Mapping[str, Any]):
    def _fn(t: pa.Table) -> pa.Table:
        for col, val in matches.items():
            i = t.column_names.index(col)
            nulled = pc.if_else(pc.equal(t[col], val),
                                pa.nulls(t.num_rows, t[col].type if not
                                         isinstance(t[col], pa.ChunkedArray)
                                         else t[col].type), t[col])
            t = t.set_column(i, col, nulled)
        return t
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Number range (numberrange/NumberRange.java): bin numeric -> label
# ---------------------------------------------------------------------------

def number_range(ds, field: str, bounds: Sequence[float],
                 labels: Sequence[str], out_col: str = "range",
                 fallback: str = "other"):
    """labels[i] applies when bounds[i] <= x < bounds[i+1]; len(labels) ==
    len(bounds) - 1. Values outside get ``fallback``."""
    b = np.asarray(bounds, dtype=np.float64)

    def _fn(t: pa.Table) -> pa.Table:
        x = t[field].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(t[field], pa.ChunkedArray) else \
            t[field].to_numpy(zero_copy_only=False)
        idx = np.digitize(x.astype(np.float64), b) - 1
        lab = np.where((idx >= 0) & (idx < len(labels)),
                       np.array(list(labels) + [fallback],
                                dtype=object)[np.clip(idx, 0, len(labels))],
                       fallback)
        return t.append_column(out_col, pa.array(lab, type=pa.string()))
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Clone row (clonerow/CloneRow.java): duplicate each row N times
# ---------------------------------------------------------------------------

def clone_row(ds, n: int | None = None, clone_field: str | None = None,
              add_clone_num: bool = False, clone_num_col: str = "clone_num"):
    def _fn(t: pa.Table) -> pa.Table:
        if clone_field is not None:
            reps = t[clone_field].combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64) \
                if isinstance(t[clone_field], pa.ChunkedArray) else \
                t[clone_field].to_numpy(zero_copy_only=False).astype(np.int64)
        else:
            reps = np.full(t.num_rows, n, dtype=np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        out = t.take(pa.array(idx, type=pa.int64()))
        if add_clone_num:
            starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
            cn = np.arange(len(idx)) - np.repeat(starts, reps)
            out = out.append_column(clone_num_col,
                                    pa.array(cn, type=pa.int64()))
        return out
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Checksum (checksum/CheckSum.java): row hash over selected fields
# ---------------------------------------------------------------------------

def checksum(ds, fields: Sequence[str], algo: str = "sha256",
             out_col: str = "checksum", sep: str = ""):
    """MD5/SHA-1/SHA-256/CRC32/ADLER32 of the concatenated string repr of
    ``fields`` — mirrors CheckSum.java's string-concat hashing mode."""
    def _fn(t: pa.Table) -> pa.Table:
        cols = [pc.cast(t[f], pa.string()) for f in fields]
        joined = cols[0] if len(cols) == 1 else \
            pc.binary_join_element_wise(*cols, sep)
        if isinstance(joined, pa.ChunkedArray):
            joined = joined.combine_chunks()
        if algo in ("md5", "sha1", "sha256"):
            from kettleray.ops.cdc import hash_hex_array
            out = hash_hex_array(joined, algo)   # buffer-walking hot path
            return t.append_column(out_col, out)
        vals = joined.to_pylist()
        if algo == "crc32":
            out = pa.array([None if v is None else
                            binascii.crc32(v.encode("utf-8")) for v in vals],
                           type=pa.int64())
        elif algo == "adler32":
            out = pa.array([None if v is None else
                            binascii.adler32(v.encode()) for v in vals],
                           type=pa.int64())
        else:
            raise ValueError(f"unknown checksum algo {algo}")
        return t.append_column(out_col, out)
    return _arrow_batches(ds, _fn)


# ---------------------------------------------------------------------------
# Add sequence (addsequence/AddSequence.java) — ordering-sensitive.
# ---------------------------------------------------------------------------

def add_sequence(ds, order_by: Sequence[str], *, out_col: str = "seq",
                 start: int = 1, increment: int = 1,
                 descending: bool = False):
    """Deterministic global sequence: rank of the row under ``order_by``.

    Kettle's counter is an artifact of single-threaded row order; the
    distributed equivalent is an explicit rank. Implementation: sort
    (shuffle), then a per-block offset pass computed from block row
    counts — the sorted dataset is materialized once to fix block
    boundaries (ordering-sensitive ops are the documented exception to
    streaming, SURVEY.md §7.4)."""
    sorted_ds = ds.sort(list(order_by), descending=descending).materialize()
    bundles = list(sorted_ds.iter_internal_ref_bundles())
    offsets, acc = [], 0
    blocks = []
    for b in bundles:
        for ref, meta in b.blocks:
            blocks.append(ref)
            offsets.append(acc)
            acc += meta.num_rows

    @ray.remote
    def _number(block: pa.Table, offset: int) -> pa.Table:
        seq = start + (offset + np.arange(block.num_rows)) * increment
        return block.append_column(out_col, pa.array(seq, type=pa.int64()))

    out_refs = [_number.remote(ref, off) for ref, off in zip(blocks, offsets)]
    return ray.data.from_arrow_refs(out_refs)


def sample_rows(ds, ranges: Sequence[tuple[int, int]],
                order_by: Sequence[str]):
    """≙ Sample rows (samplerows/SampleRows.java): keep rows whose 1-based
    position under ``order_by`` falls in any [lo, hi] range."""
    seq = add_sequence(ds, order_by, out_col="__pos")

    def _fn(t: pa.Table) -> pa.Table:
        pos = t["__pos"]
        mask = None
        for lo, hi in ranges:
            m = pc.and_(pc.greater_equal(pos, lo), pc.less_equal(pos, hi))
            mask = m if mask is None else pc.or_(mask, m)
        return t.filter(mask).drop_columns(["__pos"])
    return _arrow_batches(seq, _fn)


# ---------------------------------------------------------------------------
# Data validator (validator/Validator.java): rules -> (good, bad)
# ---------------------------------------------------------------------------

@dataclass
class Rule:
    field: str
    not_null: bool = False
    regex: str | None = None
    min_val: Any = None
    max_val: Any = None
    allowed: Sequence[Any] | None = None
    code: str = "INVALID"


def data_validator(ds, rules: Sequence[Rule]):
    """Returns (good_ds, bad_ds); bad rows carry error_code/error_field —
    Kettle's per-step error-handling stream (StepErrorMeta) as a second
    dataset."""
    def _mask_and_code(t: pa.Table):
        ok = pa.array(np.ones(t.num_rows, dtype=bool))
        code = np.full(t.num_rows, None, dtype=object)
        field = np.full(t.num_rows, None, dtype=object)
        for r in rules:
            col = t[r.field]
            m = pa.array(np.ones(t.num_rows, dtype=bool))
            if r.not_null:
                m = pc.and_(m, pc.is_valid(col))
            if r.regex is not None:
                m = pc.and_(m, pc.fill_null(
                    pc.match_substring_regex(col, r.regex), False))
            if r.min_val is not None:
                m = pc.and_(m, pc.fill_null(
                    pc.greater_equal(col, r.min_val), False))
            if r.max_val is not None:
                m = pc.and_(m, pc.fill_null(
                    pc.less_equal(col, r.max_val), False))
            if r.allowed is not None:
                m = pc.and_(m, pc.fill_null(
                    pc.is_in(col, value_set=pa.array(list(r.allowed))),
                    False))
            bad_here = pc.and_(ok, pc.invert(m)).to_numpy(
                zero_copy_only=False)
            code[bad_here & (code == None)] = r.code        # noqa: E711
            field[bad_here & (field == None)] = r.field     # noqa: E711
            ok = pc.and_(ok, m)
        return ok, code, field

    def _good(t: pa.Table) -> pa.Table:
        ok, _, _ = _mask_and_code(t)
        return t.filter(ok)

    def _bad(t: pa.Table) -> pa.Table:
        ok, code, field = _mask_and_code(t)
        bad = pc.invert(ok)
        out = t.filter(bad)
        sel = bad.to_numpy(zero_copy_only=False)
        out = out.append_column("error_code",
                                pa.array(code[sel], type=pa.string()))
        out = out.append_column("error_field",
                                pa.array(field[sel], type=pa.string()))
        return out

    return _arrow_batches(ds, _good), _arrow_batches(ds, _bad)


# ---------------------------------------------------------------------------
# Row Normaliser / Denormaliser (normaliser/Normaliser.java,
# denormaliser/Denormaliser.java): unpivot / pivot
# ---------------------------------------------------------------------------

def row_normaliser(ds, id_cols: Sequence[str],
                   value_cols: Sequence[str], *,
                   type_col: str = "type", value_col: str = "value"):
    """Unpivot: one row per (id, value-column) pair — melt. Vectorized:
    per batch, one projected table per value column, concatenated."""
    id_cols, value_cols = list(id_cols), list(value_cols)

    def _fn(t: pa.Table) -> pa.Table:
        parts = []
        for vc in value_cols:
            p = t.select(id_cols)
            p = p.append_column(type_col,
                                pa.array([vc] * t.num_rows,
                                         type=pa.string()))
            p = p.append_column(value_col, pc.cast(t[vc], pa.float64())
                                if pa.types.is_integer(t[vc].type)
                                or pa.types.is_floating(t[vc].type)
                                else pc.cast(t[vc], pa.string()))
            parts.append(p)
        return pa.concat_tables(parts)
    return _arrow_batches(ds, _fn)


def row_denormaliser(ds, id_cols: Sequence[str], type_col: str,
                     value_col: str, types: Sequence[str], *,
                     num_partitions: int = 16):
    """Pivot: one row per id, one column per type value. Requires the
    one co-locating shuffle on the id key, then a per-block pandas pivot."""
    import pandas as pd
    id_cols = list(id_cols)
    shuffled = ds.repartition(num_partitions, keys=id_cols)

    def _fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(columns=id_cols + list(types))
        p = df.pivot_table(index=id_cols, columns=type_col,
                           values=value_col, aggfunc="first")
        p = p.reindex(columns=list(types)).reset_index()
        p.columns.name = None
        return p

    return shuffled.map_batches(_fn, batch_format="pandas",
                                batch_size=None)


# ---------------------------------------------------------------------------
# Metadata structure (metastructure/StepMetastructure.java)
# ---------------------------------------------------------------------------

def metadata_structure(ds):
    schema = ds.schema()
    rows = [{"position": i + 1, "fieldname": n, "type": str(t)}
            for i, (n, t) in enumerate(zip(schema.names, schema.types))]
    return ray.data.from_items(rows)


# ---------------------------------------------------------------------------
# Flow utilities: Dummy / Write to log / Delay / Abort
# (dummytrans/Dummy.java, writetolog/WriteToLog.java, delay/Delay.java,
#  abort/Abort.java — pass-through plumbing steps)
# ---------------------------------------------------------------------------

def dummy(ds):
    """≙ Dummy (do nothing): identity pass-through (a hop junction)."""
    return ds


def write_to_log(ds, *, fields: "Sequence[str] | None" = None,
                 limit: int = 10, level: str = "INFO",
                 logger_name: str = "kettleray.rows"):
    """≙ Write to log: log up to ``limit`` rows per BLOCK (the
    reference logs per copy; per-block is the Ray analogue — logging
    every row of a web-scale stream is a design error) and pass rows
    through unchanged."""
    import logging as _logging
    lvl = getattr(_logging, level.upper(), _logging.INFO)

    def _fn(t: pa.Table) -> pa.Table:
        log = _logging.getLogger(logger_name)
        sel = t.select(list(fields)) if fields else t
        for row in sel.slice(0, limit).to_pylist():
            log.log(lvl, "%s", row)
        return t

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def delay(ds, *, seconds_per_block: float):
    """≙ Delay row: throttle by sleeping per BLOCK (per-row sleeps in a
    vectorized engine would serialize the stream; per-block keeps the
    semantics — downstream sees rows no faster than the budget — while
    staying batched)."""
    import time as _time

    def _fn(t: pa.Table) -> pa.Table:
        _time.sleep(seconds_per_block)
        return t

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


class AbortError(RuntimeError):
    """Raised by abort_after when the row threshold is crossed."""


def abort_after(ds, *, max_rows: int = 0, message: str = "aborted"):
    """≙ Abort: fail the pipeline once more than ``max_rows`` rows flow
    through (max_rows=0 = abort on ANY row — the reference's default,
    used as a 'this branch must stay empty' tripwire). EAGER by
    design: the upstream executes here (blocks stay in the object
    store — the returned dataset is the materialized result, so
    downstream does NOT recompute), because a tripwire that only fires
    if someone happens to consume the branch is not a tripwire."""
    ds = ds.materialize()
    n = ds.count()
    if n > max_rows:
        raise AbortError(f"{message}: {n} rows > {max_rows}")
    return ds
