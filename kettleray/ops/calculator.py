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


def _levenshtein_capped(x: str, y: str, cap: int) -> int:
    """Levenshtein with early exit: returns cap+1 as soon as every cell
    of a DP row exceeds ``cap`` (Ukkonen-style cutoff — the fuzzy-match
    candidate scan rejects most candidates in O(len) instead of
    O(len^2))."""
    if abs(len(x) - len(y)) > cap:
        return cap + 1
    if len(x) < len(y):
        x, y = y, x
    prev = list(range(len(y) + 1))
    for i, cx in enumerate(x, 1):
        cur = [i]
        row_min = i
        for j, cy in enumerate(y, 1):
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (cx != cy))
            cur.append(v)
            if v < row_min:
                row_min = v
        if row_min > cap:
            return cap + 1
        prev = cur
    return prev[-1]


def _jaro(x: str | None, y: str | None) -> float | None:
    """Standard Jaro similarity (matches DuckDB jaro_similarity and
    commons-codec)."""
    if x is None or y is None:
        return None
    if x == y:
        return 1.0
    lx, ly = len(x), len(y)
    if lx == 0 or ly == 0:
        return 0.0
    window = max(lx, ly) // 2 - 1
    xm = [False] * lx
    ym = [False] * ly
    m = 0
    for i, cx in enumerate(x):
        lo = max(0, i - window)
        hi = min(ly, i + window + 1)
        for j in range(lo, hi):
            if not ym[j] and y[j] == cx:
                xm[i] = ym[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(lx):
        if xm[i]:
            while not ym[j]:
                j += 1
            if x[i] != y[j]:
                t += 1
            j += 1
    t //= 2
    return (m / lx + m / ly + (m - t) / m) / 3.0


def _jaro_winkler(x: str | None, y: str | None, *, p: float = 0.1,
                  boost: float = 0.7) -> float | None:
    """Jaro-Winkler with the standard 0.7 boost threshold and max-4
    common prefix (matches DuckDB jaro_winkler_similarity)."""
    j = _jaro(x, y)
    if j is None:
        return None
    if j > boost:
        l = 0
        for a, b in zip(x[:4], y[:4]):
            if a != b:
                break
            l += 1
        j += l * p * (1.0 - j)
    return j


def _damerau_osa(x: str | None, y: str | None) -> int | None:
    """Optimal-string-alignment Damerau-Levenshtein (adjacent
    transposition counts 1; the variant Kettle's Utils implements)."""
    if x is None or y is None:
        return None
    lx, ly = len(x), len(y)
    prev2: list[int] = []
    prev = list(range(ly + 1))
    for i in range(1, lx + 1):
        cur = [i] + [0] * ly
        for j in range(1, ly + 1):
            cost = 0 if x[i - 1] == y[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (i > 1 and j > 1 and x[i - 1] == y[j - 2]
                    and x[i - 2] == y[j - 1]):
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[ly]


def _needleman_wunsch(x: str | None, y: str | None, *, match: int = 0,
                      mismatch: int = -1, gap: int = -1) -> int | None:
    """Global-alignment score (≙ Kettle FuzzyMatch/Calculator
    Needleman-Wunsch mode: unit-penalty global alignment). With the
    default scoring (match 0, mismatch/gap -1) the score is exactly
    -levenshtein(x, y); custom match/mismatch/gap give the general
    NW similarity."""
    if x is None or y is None:
        return None
    prev = [j * gap for j in range(len(y) + 1)]
    for i, cx in enumerate(x, 1):
        cur = [i * gap]
        for j, cy in enumerate(y, 1):
            cur.append(max(prev[j] + gap, cur[j - 1] + gap,
                           prev[j - 1] + (match if cx == cy
                                          else mismatch)))
        prev = cur
    return prev[-1]


def _letter_pairs(s: str) -> list[str]:
    return [w[i:i + 2] for w in s.split() for i in range(len(w) - 1)]


def _pair_similarity(x: str | None, y: str | None) -> float | None:
    """Letter-pair (bigram Dice / Simon White) similarity — Kettle
    FuzzyMatch 'Pair letters similarity' mode: 2*|shared word-bigram
    multiset| / (|pairs(x)| + |pairs(y)|)."""
    if x is None or y is None:
        return None
    px, py = _letter_pairs(x), _letter_pairs(y)
    total = len(px) + len(py)
    if total == 0:
        return 1.0 if x == y else 0.0
    from collections import Counter
    cx = Counter(px)
    inter = sum(min(n, cx[p]) for p, n in Counter(py).items())
    return 2.0 * inter / total


_METAPHONE_VOWELS = "AEIOU"


def _metaphone(s: str | None, max_len: int = 4) -> str | None:
    """Classic Lawrence Philips Metaphone (commons-codec Metaphone
    semantics, default code length 4) — ≙ Calculator METAPHONE."""
    if s is None:
        return None
    w = "".join(ch for ch in s.upper() if ch.isalpha())
    if not w:
        return ""
    if len(w) == 1:
        return w
    # initial-letter transforms
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]
    elif w[0] == "X":
        w = "S" + w[1:]
    out = []
    n = len(w)
    i = 0
    while i < n and len(out) < max_len:
        c = w[i]
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        # "\0" sentinel, NOT "": `"" in "EIY"` is vacuously True in Python
        nxt = w[i + 1] if i + 1 < n else "\0"
        nxt2 = w[i + 2] if i + 2 < n else "\0"
        if c in _METAPHONE_VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nxt2 == "A":
                out.append("X")
            elif nxt == "H":
                if i > 0 and w[i - 1] == "S":
                    out.append("K")
                else:
                    out.append("X")
            elif nxt in "IEY":
                if i > 0 and w[i - 1] == "S":
                    pass
                else:
                    out.append("S")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nxt2 in "EIY":
                out.append("J")
                i += 2
            else:
                out.append("T")
        elif c == "G":
            if nxt == "H":
                if not (i + 2 == n or w[i + 2] in _METAPHONE_VOWELS):
                    pass            # silent GH
                else:
                    out.append("K")
                    i += 1
            elif nxt == "N":
                pass                # silent as in GNAT tail
            elif nxt in "EIY":
                out.append("J")
            else:
                out.append("K")
        elif c == "H":
            if i > 0 and w[i - 1] in _METAPHONE_VOWELS and \
                    nxt not in _METAPHONE_VOWELS:
                pass
            elif i > 0 and w[i - 1] in "CSPTG":
                pass
            else:
                out.append("H")
        elif c in "FJLMNR":
            out.append(c)
        elif c == "K":
            if i == 0 or w[i - 1] != "C":
                out.append("K")
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
            if nxt == "H":
                i += 1
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
                i += 1
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "C" and nxt2 == "H":
                pass                    # silent T in TCH (watch -> WX)
            elif nxt == "H":
                out.append("0")
                i += 1
            elif nxt == "I" and nxt2 in "OA":
                out.append("X")
            else:
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if nxt in _METAPHONE_VOWELS:
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_len:
                out.append("S")
        elif c == "Y":
            if nxt in _METAPHONE_VOWELS:
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_len])


def _refined_soundex(s: str | None) -> str | None:
    """commons-codec RefinedSoundex: first letter + full digit string
    (no length-4 truncation, no H/W skip rule)."""
    if not s:
        return None
    w = "".join(ch for ch in s.upper() if ch.isalpha())
    if not w:
        return None
    codes = {**dict.fromkeys("BP", "1"), **dict.fromkeys("FV", "2"),
             **dict.fromkeys("CKS", "3"), **dict.fromkeys("GJ", "4"),
             **dict.fromkeys("QXZ", "5"), **dict.fromkeys("DT", "6"),
             "L": "7", **dict.fromkeys("MN", "8"), "R": "9",
             **dict.fromkeys("AEIOUYHW", "0")}
    out = w[0]
    last = None
    for ch in w:
        code = codes.get(ch, "")
        if code != last:
            out += code
        last = code
    return out


def _add_months(ts, months: int):
    """Calendar-correct month add with day clamping (Jan 31 + 1 month ->
    Feb 28/29) — java.util.Calendar.add semantics."""
    import calendar
    if ts is None:
        return None
    y = ts.year + (ts.month - 1 + months) // 12
    m = (ts.month - 1 + months) % 12 + 1
    d = min(ts.day, calendar.monthrange(y, m)[1])
    return ts.replace(year=y, month=m, day=d)


def _last_day_of_month(ts):
    import calendar
    if ts is None:
        return None
    return ts.replace(day=calendar.monthrange(ts.year, ts.month)[1])


_XML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                ('"', "&quot;"), ("'", "&apos;")]


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
    if f in ("levenshtein", "jaro", "jaro_winkler", "damerau_levenshtein",
             "needleman_wunsch", "pair_similarity"):
        av = _apply_py(A, lambda v: v)
        bv = [B] * len(av) if isinstance(B, str) else \
            _apply_py(B, lambda v: v)
        fn = {"levenshtein": _levenshtein, "jaro": _jaro,
              "jaro_winkler": _jaro_winkler,
              "damerau_levenshtein": _damerau_osa,
              "needleman_wunsch": _needleman_wunsch,
              "pair_similarity": _pair_similarity}[f]
        typ = pa.int64() if f in ("levenshtein", "damerau_levenshtein",
                                  "needleman_wunsch") else pa.float64()
        # compute once per UNIQUE operand pair (operands repeat heavily
        # in real columns; the O(len^2) DP is the cost, not the lookup)
        cache: dict = {}
        out = []
        for x, y in zip(av, bv):
            key = (x, y)
            r = cache.get(key, cache)
            if r is cache:
                r = fn(x, y)
                cache[key] = r
            out.append(r)
        return pa.array(out, type=typ)
    if f == "soundex":
        return pa.array(_apply_py(A, _soundex), type=pa.string())
    if f == "refined_soundex":
        return pa.array(_apply_py(A, _refined_soundex), type=pa.string())
    if f == "metaphone":
        ln = int(op.const_b) if op.const_b is not None else 4
        return pa.array(_apply_py(A, lambda v: _metaphone(v, ln)),
                        type=pa.string())
    if f == "double_metaphone":
        # primary code of the double-metaphone pair; the alternate code
        # differs only for ~10% of names — exposed as a second op if
        # needed (ref calculator/CalculatorMetaFunction.java
        # CALC_DOUBLE_METAPHONE delegates to commons-codec)
        from kettleray.ops.phonetics import double_metaphone
        return pa.array(_apply_py(A, lambda v: None if v is None
                                  else double_metaphone(v)[0]),
                        type=pa.string())
    # --- string cleanup / escape family (vectorized pc kernels) ---
    if f == "left":
        return pc.utf8_slice_codeunits(A, start=0, stop=int(B))
    if f == "right":
        # slice per row from len-k: reverse trick (vectorized)
        rev = pc.utf8_reverse(A)
        return pc.utf8_reverse(
            pc.utf8_slice_codeunits(rev, start=0, stop=int(B)))
    if f == "remove_cr":
        return pc.replace_substring(A, pattern="\r", replacement="")
    if f == "remove_lf":
        return pc.replace_substring(A, pattern="\n", replacement="")
    if f == "remove_crlf":
        return pc.replace_substring(
            pc.replace_substring(A, pattern="\r", replacement=""),
            pattern="\n", replacement="")
    if f == "remove_tab":
        return pc.replace_substring(A, pattern="\t", replacement="")
    if f == "get_only_digits":
        return pc.replace_substring_regex(A, pattern=r"[^0-9]",
                                          replacement="")
    if f == "remove_digits":
        return pc.replace_substring_regex(A, pattern=r"[0-9]",
                                          replacement="")
    if f in ("escape_xml", "mask_xml"):
        out = A
        for raw, ent in _XML_ESCAPES:
            out = pc.replace_substring(out, pattern=raw, replacement=ent)
        return out
    if f == "unescape_xml":
        out = A
        for raw, ent in reversed(_XML_ESCAPES):
            out = pc.replace_substring(out, pattern=ent, replacement=raw)
        return out
    if f == "escape_sql":
        return pc.replace_substring(A, pattern="'", replacement="''")
    if f == "use_cdata":
        return pc.binary_join_element_wise(
            "<![CDATA[", pc.cast(A, pa.string()), "]]>", "")
    if f == "hex_encode":
        import binascii
        return pa.array(_apply_py(A, lambda v: None if v is None else
                                  binascii.hexlify(v.encode()).decode()
                                  .upper()), type=pa.string())
    if f == "hex_decode":
        import binascii
        return pa.array(_apply_py(A, lambda v: None if v is None else
                                  binascii.unhexlify(v).decode()),
                        type=pa.string())
    if f == "base64_encode":
        import base64
        return pa.array(_apply_py(A, lambda v: None if v is None else
                                  base64.b64encode(v.encode()).decode()),
                        type=pa.string())
    if f == "base64_decode":
        import base64
        return pa.array(_apply_py(A, lambda v: None if v is None else
                                  base64.b64decode(v).decode()),
                        type=pa.string())
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
    if f == "date_format":
        # mask in const_b (strftime syntax, same masks DuckDB strftime
        # understands) — Kettle's "format with mask" conversion
        return pc.strftime(A, format=str(op.const_b))
    if f == "date_parse":
        return pc.strptime(A, format=str(op.const_b), unit="us")
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
    if f == "hour":
        return pc.hour(A)
    if f == "minute":
        return pc.minute(A)
    if f == "second":
        return pc.second(A)
    if f == "iso_year":
        return pc.iso_year(A)
    if f == "add_months":
        months = int(B)
        return pa.array(_apply_py(A, lambda v: _add_months(v, months)),
                        type=pa.timestamp("us"))
    if f == "add_years":
        months = int(B) * 12
        return pa.array(_apply_py(A, lambda v: _add_months(v, months)),
                        type=pa.timestamp("us"))
    if f == "last_day_of_month":
        return pa.array(_apply_py(A, _last_day_of_month),
                        type=pa.timestamp("us"))
    if f in ("add_hours", "add_minutes", "add_seconds"):
        unit_us = {"add_hours": 3_600_000_000,
                   "add_minutes": 60_000_000,
                   "add_seconds": 1_000_000}[f]
        import datetime
        if isinstance(B, (int, float)):
            return pc.add(A, pa.scalar(
                datetime.timedelta(microseconds=int(B) * unit_us),
                type=pa.duration("us")))
        return pc.add(A, pc.cast(pc.multiply(pc.cast(B, pa.int64()),
                                             unit_us), pa.duration("us")))
    if f == "add_time_to_date":
        # ≙ CALC_ADD_TIME_TO_DATE: seconds-of-day field B onto date A
        return pc.add(pc.floor_temporal(A, unit="day"),
                      pc.cast(pc.multiply(pc.cast(B, pa.int64()),
                                          1_000_000), pa.duration("us")))
    if f == "date_diff_ms":
        return pc.milliseconds_between(B, A)   # A - B in ms
    if f == "date_working_diff":
        # ≙ CALC_DATE_WORKING_DIFF: weekday count in (B, A], vectorized:
        # full weeks x 5 + weekday-indexed remainder lookup. Nulls in
        # either date propagate to null like every other date op.
        import numpy as np
        days = pc.days_between(B, A)
        if isinstance(days, pa.ChunkedArray):
            days = days.combine_chunks()
        valid = pc.is_valid(days).to_numpy(zero_copy_only=False)
        d = pc.fill_null(days, 0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        if isinstance(B, (pa.Array, pa.ChunkedArray)):
            dowB = pc.fill_null(pc.day_of_week(B), 0)    # Monday=0
            wb = dowB.combine_chunks().to_numpy(zero_copy_only=False) \
                if isinstance(dowB, pa.ChunkedArray) else \
                dowB.to_numpy(zero_copy_only=False)
            wb = wb.astype(np.int64)
        else:                                    # scalar constant date
            wb = np.full(len(d), B.weekday(), dtype=np.int64)
        sign = np.sign(d)
        ad = np.abs(d)
        start = np.where(sign >= 0, wb, (wb + d) % 7)
        full, rem = ad // 7, ad % 7
        # weekdays among the `rem` days following weekday `start`
        offs = (start[:, None] + 1 + np.arange(7)[None, :]) % 7
        wk = (offs < 5).cumsum(axis=1)
        extra = np.where(rem > 0, wk[np.arange(len(rem)),
                                     np.maximum(rem - 1, 0)], 0)
        return pa.array((sign * (full * 5 + extra)).astype(np.int64),
                        mask=~valid)
    if f == "round_even":          # ROUND_STD: banker's rounding
        return pc.round(A, ndigits=int(B or 0), round_mode="half_to_even")
    if f == "combination_linear":  # CALC_COMBINATION_1: A*K + B
        k = float(op.c) if op.c is not None else 1.0
        return pc.add(pc.multiply(pc.cast(A, pa.float64()), k), B)
    # --- extra arithmetic ---
    if f == "square":
        return pc.multiply(A, A)
    if f == "hypot":
        return pc.sqrt(pc.add(pc.multiply(A, A), pc.multiply(B, B)))
    if f == "percent_add":       # A + A*B%
        return pc.add(A, pc.divide(pc.multiply(
            pc.cast(A, pa.float64()), B), 100.0))
    if f == "percent_subtract":  # A - A*B%
        return pc.subtract(A, pc.divide(pc.multiply(
            pc.cast(A, pa.float64()), B), 100.0))
    if f == "adler32":
        import zlib
        return pa.array(_apply_py(pc.cast(A, pa.string()),
                                  lambda v: None if v is None else
                                  zlib.adler32(v.encode())),
                        type=pa.int64())
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
