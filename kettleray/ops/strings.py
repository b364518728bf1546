"""String-manipulation operators (SURVEY.md §2.4 string family).

≙ Kettle steps: String operations (stringoperations/StringOperations.java),
Strings cut (stringcut/StringCut.java), Replace in string
(replacestring/ReplaceString.java), Split fields
(fieldsplitter/FieldSplitter.java), Split field to rows
(splitfieldtorows/SplitFieldToRows.java), Concat fields
(concatfields/ConcatFields.java), Regex evaluation
(regexeval/RegexEval.java). All pyarrow.compute kernels.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc


def _mb(ds, fn):
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True,
                          batch_size=None)


_CASE_FNS = {
    "upper": pc.utf8_upper, "lower": pc.utf8_lower,
    "title": pc.utf8_title, "capitalize": pc.utf8_capitalize,
}
_TRIM_FNS = {
    "both": pc.utf8_trim_whitespace, "left": pc.utf8_ltrim_whitespace,
    "right": pc.utf8_rtrim_whitespace,
}


def string_operations(ds, *, trim: Mapping[str, str] | None = None,
                      case: Mapping[str, str] | None = None,
                      pad: Mapping[str, tuple[str, int, str]] | None = None,
                      digits_only: Sequence[str] = (),
                      remove_special: Sequence[str] = ()):
    """Per-field trim/case/pad/digits-only, mirroring StringOperations."""
    def _fn(t: pa.Table) -> pa.Table:
        def set_(name, arr):
            nonlocal t
            t = t.set_column(t.column_names.index(name), name, arr)
        for col, mode in (trim or {}).items():
            set_(col, _TRIM_FNS[mode](t[col]))
        for col, mode in (case or {}).items():
            set_(col, _CASE_FNS[mode](t[col]))
        for col, (side, width, char) in (pad or {}).items():
            fn = pc.utf8_lpad if side == "left" else pc.utf8_rpad
            set_(col, fn(t[col], width=width, padding=char))
        for col in digits_only:
            set_(col, pc.replace_substring_regex(t[col], r"\D", ""))
        for col in remove_special:
            set_(col, pc.replace_substring_regex(t[col], r"[^0-9A-Za-z ]",
                                                 ""))
        return t
    return _mb(ds, _fn)


def strings_cut(ds, cuts: Mapping[str, tuple[int, int]],
                out_cols: Mapping[str, str] | None = None):
    """Substring [start, end) per field (0-based, Kettle's cut-from/cut-to)."""
    def _fn(t: pa.Table) -> pa.Table:
        for col, (start, stop) in cuts.items():
            out = (out_cols or {}).get(col, col)
            arr = pc.utf8_slice_codeunits(t[col], start=start, stop=stop)
            if out in t.column_names:
                t = t.set_column(t.column_names.index(out), out, arr)
            else:
                t = t.append_column(out, arr)
        return t
    return _mb(ds, _fn)


def replace_in_string(ds, field: str, pattern: str, replacement: str,
                      *, regex: bool = False, out_col: str | None = None):
    def _fn(t: pa.Table) -> pa.Table:
        fn = pc.replace_substring_regex if regex else pc.replace_substring
        arr = fn(t[field], pattern=pattern, replacement=replacement)
        out = out_col or field
        if out in t.column_names:
            return t.set_column(t.column_names.index(out), out, arr)
        return t.append_column(out, arr)
    return _mb(ds, _fn)


def split_fields(ds, field: str, sep: str, out_cols: Sequence[str]):
    """One field -> N columns by delimiter (FieldSplitter)."""
    def _fn(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t[field], pattern=sep)
        for i, name in enumerate(out_cols):
            elem = pc.list_flatten(pc.list_slice(parts, start=i, stop=i + 1,
                                                 return_fixed_size_list=False))
            # list_slice keeps empty lists for short rows; element i absent
            lens = pc.list_value_length(parts)
            has = pc.greater(lens, i)
            # rebuild with nulls where missing
            idx_valid = pc.cumulative_sum(pc.cast(has, pa.int64()))
            import numpy as np
            hv = has.combine_chunks().to_numpy(zero_copy_only=False) \
                if isinstance(has, pa.ChunkedArray) else \
                has.to_numpy(zero_copy_only=False)
            ev = elem.combine_chunks() if isinstance(elem, pa.ChunkedArray) \
                else elem
            vals = np.full(t.num_rows, None, dtype=object)
            vals[hv] = ev.to_pylist()
            t = t.append_column(name, pa.array(vals, type=pa.string()))
        return t
    return _mb(ds, _fn)


def split_field_to_rows(ds, field: str, sep: str,
                        out_col: str | None = None,
                        keep_source: bool = False):
    """One field -> N ROWS by delimiter (SplitFieldToRows) — the explode.
    Vectorized: list split + parent-index take, no Python row loop."""
    out = out_col or field

    def _fn(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t[field], pattern=sep)
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = pc.list_flatten(parts)
        parent = pc.list_parent_indices(parts)
        base = t if keep_source else t.drop_columns([field])
        exploded = base.take(parent)
        if out in exploded.column_names:
            return exploded.set_column(exploded.column_names.index(out),
                                       out, flat)
        return exploded.append_column(out, flat)
    return _mb(ds, _fn)


def concat_fields(ds, fields: Sequence[str], sep: str, out_col: str):
    def _fn(t: pa.Table) -> pa.Table:
        cols = [pc.cast(t[f], pa.string()) for f in fields]
        return t.append_column(out_col,
                               pc.binary_join_element_wise(*cols, sep))
    return _mb(ds, _fn)


def regex_eval(ds, field: str, pattern: str, out_cols: Sequence[str],
               *, match_col: str | None = None):
    """Regex capture groups -> new fields (RegexEval). ``pattern`` must
    contain len(out_cols) capture groups, named or positional."""
    import re
    ngroups = re.compile(pattern).groups
    if ngroups != len(out_cols):
        raise ValueError(f"pattern has {ngroups} groups, "
                         f"need {len(out_cols)}")
    # pc.extract_regex needs named groups; rewrite positional ones.
    named = pattern
    if "(?P<" not in pattern:
        i = 0
        outp = []
        prev = ""
        for ch_i, ch in enumerate(pattern):
            if ch == "(" and prev != "\\" and \
                    not pattern[ch_i:ch_i + 3] == "(?:":
                outp.append(f"(?P<{out_cols[i]}>")
                i += 1
            else:
                outp.append(ch)
            prev = ch
        named = "".join(outp).replace("(?P<" + out_cols[0] + ">?:", "(?:")

    def _fn(t: pa.Table) -> pa.Table:
        res = pc.extract_regex(t[field], pattern=named)
        if isinstance(res, pa.ChunkedArray):
            res = res.combine_chunks()
        for name in out_cols:
            t = t.append_column(name, pc.struct_field(res, name))
        if match_col:
            t = t.append_column(match_col, pc.is_valid(res))
        return t
    return _mb(ds, _fn)
