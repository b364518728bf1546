"""Calculator step: the scalar function surface (SURVEY.md §2.4/§2.8).

≙ calculator/Calculator.java + CalculatorMetaFunction (~90 functions) and
the Formula plugin: each CalcOp appends one computed column, evaluated
with pyarrow.compute kernels per batch. Apply a list of ops in one
map_batches pass (later ops may reference earlier results, like Kettle's
in-step field chaining).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc


@dataclass
class CalcOp:
    out: str                 # new field name
    fn: str                  # function name (see _FUNCS)
    a: str | None = None     # input field names (or constant via const_*)
    b: str | None = None
    c: str | None = None
    const_a: Any = None
    const_b: Any = None


def _get(t: pa.Table, name: str | None, const: Any):
    if name is not None:
        return t[name]
    return const


def _levenshtein(x: str | None, y: str | None) -> int | None:
    if x is None or y is None:
        return None
    if len(x) < len(y):
        x, y = y, x
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        for j, cy in enumerate(y, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (cx != cy)))
        prev = cur
    return prev[-1]


def _soundex(s: str | None) -> str | None:
    """Standard American Soundex."""
    if not s:
        return None
    s = "".join(ch for ch in s.upper() if ch.isalpha())
    if not s:
        return None
    codes = {**dict.fromkeys("BFPV", "1"), **dict.fromkeys("CGJKQSXZ", "2"),
             **dict.fromkeys("DT", "3"), "L": "4",
             **dict.fromkeys("MN", "5"), "R": "6"}
    out = s[0]
    last = codes.get(s[0], "")
    for ch in s[1:]:
        code = codes.get(ch, "")
        if code and code != last:
            out += code
        if ch not in "HW":
            last = code
        if len(out) == 4:
            break
    return (out + "000")[:4]


def _apply_py(arr, fn):
    vals = arr.combine_chunks().to_pylist() \
        if isinstance(arr, pa.ChunkedArray) else arr.to_pylist()
    return [fn(v) for v in vals]


_EPOCH_DAY_MS = 86_400_000


def _eval(t: pa.Table, op: CalcOp):
    A = _get(t, op.a, op.const_a)
    B = _get(t, op.b, op.const_b)
    f = op.fn
    # --- arithmetic ---
    if f == "add":
        return pc.add(A, B)
    if f == "subtract":
        return pc.subtract(A, B)
    if f == "multiply":
        return pc.multiply(A, B)
    if f == "divide":
        return pc.divide(pc.cast(A, pa.float64()), B)
    if f == "mod":
        import numpy as np
        a = A.combine_chunks().to_numpy(zero_copy_only=False) if \
            isinstance(A, pa.ChunkedArray) else A.to_numpy(zero_copy_only=False)
        return pa.array(np.mod(a, B))
    if f == "abs":
        return pc.abs(A)
    if f == "negate":
        return pc.negate(A)
    if f == "round":
        # half_towards_infinity == SQL ROUND (half away from zero), so
        # oracle comparisons agree on .5 boundaries
        return pc.round(A, ndigits=int(B or 0),
                        round_mode="half_towards_infinity")
    if f == "floor":
        return pc.floor(A)
    if f == "ceil":
        return pc.ceil(A)
    if f == "sqrt":
        return pc.sqrt(A)
    if f == "percent_of":          # A / B * 100
        return pc.multiply(pc.divide(pc.cast(A, pa.float64()), B), 100.0)
    if f == "min_of":
        return pc.min_element_wise(A, B)
    if f == "max_of":
        return pc.max_element_wise(A, B)
    # --- null handling / logic ---
    if f == "nvl":
        return pc.coalesce(A, B)
    if f == "is_null":
        return pc.is_null(A)
    # --- string ---
    if f == "concat":
        return pc.binary_join_element_wise(pc.cast(A, pa.string()),
                                           pc.cast(B, pa.string()), "")
    if f == "length":
        return pc.utf8_length(A)
    if f == "lower":
        return pc.utf8_lower(A)
    if f == "upper":
        return pc.utf8_upper(A)
    if f == "initcap":
        return pc.utf8_title(A)
    if f == "trim":
        return pc.utf8_trim_whitespace(A)
    if f == "substring":            # B = start (0-based), c-field/const = len
        start = int(op.const_b if op.b is None else op.const_b)
        ln = int(op.c) if op.c is not None else None
        return pc.utf8_slice_codeunits(
            A, start=start, stop=None if ln is None else start + ln)
    if f == "index_of":
        return pc.find_substring(A, pattern=B)
    if f == "reverse":
        return pc.utf8_reverse(A)
    if f == "levenshtein":
        av = _apply_py(A, lambda v: v)
        bv = [B] * len(av) if isinstance(B, str) else \
            _apply_py(B, lambda v: v)
        return pa.array([_levenshtein(x, y) for x, y in zip(av, bv)],
                        type=pa.int64())
    if f == "soundex":
        return pa.array(_apply_py(A, _soundex), type=pa.string())
    if f == "urlencode":
        from urllib.parse import quote
        return pa.array(_apply_py(A, lambda v: None if v is None
                                  else quote(v, safe="")), type=pa.string())
    if f == "urldecode":
        from urllib.parse import unquote
        return pa.array(_apply_py(A, lambda v: None if v is None
                                  else unquote(v)), type=pa.string())
    # --- hashes (≙ checksum calculator functions) ---
    if f in ("md5", "sha1", "sha256"):
        import hashlib
        h = getattr(hashlib, f)
        return pa.array(_apply_py(pc.cast(A, pa.string()),
                                  lambda v: None if v is None else
                                  h(v.encode()).hexdigest()),
                        type=pa.string())
    if f == "crc32":
        import binascii
        return pa.array(_apply_py(pc.cast(A, pa.string()),
                                  lambda v: None if v is None else
                                  binascii.crc32(v.encode())),
                        type=pa.int64())
    # --- date/time (Arrow timestamp kernels) ---
    if f == "year":
        return pc.year(A)
    if f == "month":
        return pc.month(A)
    if f == "day":
        return pc.day(A)
    if f == "day_of_week":
        return pc.day_of_week(A)   # Monday=0
    if f == "day_of_year":
        return pc.day_of_year(A)
    if f == "week_iso":
        return pc.iso_week(A)
    if f == "quarter":
        return pc.quarter(A)
    if f == "date_add_days":
        import datetime
        days = B if not isinstance(B, (int, float)) else None
        if days is None:
            return pc.add(A, pa.scalar(
                datetime.timedelta(days=int(B)), type=pa.duration("us")))
        return pc.add(A, pc.cast(pc.multiply(pc.cast(days, pa.int64()),
                                             86_400_000_000),
                                 pa.duration("us")))
    if f == "date_diff_days":
        d = pc.days_between(B, A)  # A - B in days
        return d
    if f == "first_day_of_month":
        return pc.floor_temporal(A, unit="month")
    if f == "truncate_day":
        return pc.floor_temporal(A, unit="day")
    raise ValueError(f"unknown calculator function {op.fn!r}")


def calculator(ds, ops: list[CalcOp]):
    def _fn(t: pa.Table) -> pa.Table:
        for op in ops:
            col = _eval(t, op)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            if op.out in t.column_names:
                t = t.set_column(t.column_names.index(op.out), op.out, col)
            else:
                t = t.append_column(op.out, col)
        return t
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
