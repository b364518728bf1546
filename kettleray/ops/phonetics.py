"""Double Metaphone (Lawrence Philips, 2000) — primary/secondary codes.

≙ Calculator CALC_DOUBLE_METAPHONE (ref calculator/CalculatorMetaFunction
.java delegates to commons-codec DoubleMetaphone) and Fuzzy match's
Double-Metaphone mode (fuzzymatch/FuzzyMatch.java). Public-domain
algorithm, reimplemented from the published description; max code length
4 (the commons-codec default).

Known scope limit: normalization strips non-letters INCLUDING spaces, so
the reference's multi-word rules ("VAN ", "VON ", "SAN ", word-boundary
lookaheads) apply per single word here — single-token name encoding (the
fuzzy-match use case) matches the reference on the tested vectors.
"""

from __future__ import annotations

VOWELS = "AEIOUY"


def _is_vowel(w: str, i: int) -> bool:
    return 0 <= i < len(w) and w[i] in VOWELS


def _at(w: str, i: int, n: int, *subs: str) -> bool:
    """True if w[i:i+n] is one of subs."""
    if i < 0:
        return False
    return w[i:i + n] in subs


def _slavo_germanic(w: str) -> bool:
    return any(s in w for s in ("W", "K", "CZ", "WITZ"))


def double_metaphone(value: str, max_len: int = 4) -> tuple[str, str]:
    """Return (primary, secondary) Double Metaphone codes."""
    w = "".join(ch for ch in value.upper() if "A" <= ch <= "Z" or
                ch in "ÇÑ")
    w = w.replace("Ç", "S").replace("Ñ", "N")
    n = len(w)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, s: str | None = None) -> None:
        pri.append(p)
        sec.append(p if s is None else s)

    i = 0
    # skip silent letters at start
    if w[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if w[:1] == "X":            # 'X' at start sounds like 'S'
        add("S")
        i = 1

    while i < n and (len("".join(pri)) < max_len or
                     len("".join(sec)) < max_len):
        c = w[i]
        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if _at(w, i + 1, 1, "B") else 1
            continue
        if c == "C":
            # various germanic
            if (i > 1 and not _is_vowel(w, i - 2) and
                    _at(w, i - 1, 3, "ACH") and
                    w[i + 2:i + 3] != "I" and
                    (w[i + 2:i + 3] != "E" or
                     _at(w, i - 2, 6, "BACHER", "MACHER"))):
                add("K")
                i += 2
                continue
            if i == 0 and _at(w, i, 6, "CAESAR"):
                add("S")
                i += 2
                continue
            if _at(w, i, 4, "CHIA"):
                add("K")
                i += 2
                continue
            if _at(w, i, 2, "CH"):
                if i > 0 and _at(w, i, 4, "CHAE"):
                    add("K", "X")
                elif (i == 0 and
                      (_at(w, i + 1, 5, "HARAC", "HARIS") or
                       _at(w, i + 1, 3, "HOR", "HYM", "HIA", "HEM")) and
                      not _at(w, 0, 5, "CHORE")):
                    add("K")
                elif (_at(w, 0, 4, "VAN ", "VON ") or
                      _at(w, 0, 3, "SCH") or
                      _at(w, i - 2, 6, "ORCHES", "ARCHIT", "ORCHID") or
                      _at(w, i + 2, 1, "T", "S") or
                      ((_at(w, i - 1, 1, "A", "O", "U", "E") or i == 0)
                       and (_at(w, i + 2, 1, "L", "R", "N", "M", "B",
                                "H", "F", "V", "W", " ")
                            or i + 1 == n - 1))):   # CH at end of word
                    add("K")
                else:
                    if i > 0:
                        if _at(w, 0, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if _at(w, i, 2, "CZ") and not _at(w, i - 2, 4, "WICZ"):
                add("S", "X")
                i += 2
                continue
            if _at(w, i + 1, 3, "CIA"):
                add("X")
                i += 3
                continue
            if _at(w, i, 2, "CC") and not (i == 1 and w[0] == "M"):
                if _at(w, i + 2, 1, "I", "E", "H") and \
                        not _at(w, i + 2, 2, "HU"):
                    if (i == 1 and w[0] == "A") or \
                            _at(w, i - 1, 5, "UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if _at(w, i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if _at(w, i, 2, "CI", "CE", "CY"):
                if _at(w, i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _at(w, i + 1, 2, " C", " Q", " G"):
                i += 3
            elif _at(w, i + 1, 1, "C", "K", "Q") and \
                    not _at(w, i + 1, 2, "CE", "CI"):
                i += 2
            else:
                i += 1
            continue
        if c == "D":
            if _at(w, i, 2, "DG"):
                if _at(w, i + 2, 1, "I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if _at(w, i, 2, "DT", "DD") else 1
            continue
        if c == "F":
            add("F")
            i += 2 if _at(w, i + 1, 1, "F") else 1
            continue
        if c == "G":
            if _at(w, i + 1, 1, "H"):
                if i > 0 and not _is_vowel(w, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if _at(w, i + 2, 1, "I"):
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                if (_at(w, i - 2, 1, "B", "H", "D") or
                        _at(w, i - 3, 1, "B", "H", "D") or
                        _at(w, i - 4, 1, "B", "H")):
                    i += 2
                    continue
                if i > 2 and _at(w, i - 1, 1, "U") and \
                        _at(w, i - 3, 1, "C", "G", "L", "R", "T"):
                    add("F")
                elif i > 0 and w[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if _at(w, i + 1, 1, "N"):
                if i == 1 and _is_vowel(w, 0) and not _slavo_germanic(w):
                    add("KN", "N")
                elif not _at(w, i + 2, 2, "EY") and \
                        w[i + 1:i + 2] != "Y" and not _slavo_germanic(w):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if _at(w, i + 1, 2, "LI") and not _slavo_germanic(w):
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (_at(w, i + 1, 1, "Y") or
                           _at(w, i + 1, 2, "ES", "EP", "EB", "EL", "EY",
                               "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
                continue
            if (_at(w, i + 1, 2, "ER") or _at(w, i + 1, 1, "Y")) and \
                    not _at(w, 0, 6, "DANGER", "RANGER", "MANGER") and \
                    not _at(w, i - 1, 1, "E", "I") and \
                    not _at(w, i - 1, 3, "RGY", "OGY"):
                add("K", "J")
                i += 2
                continue
            if _at(w, i + 1, 1, "E", "I", "Y") or \
                    _at(w, i - 1, 4, "AGGI", "OGGI"):
                if _at(w, 0, 4, "VAN ", "VON ") or _at(w, 0, 3, "SCH") \
                        or _at(w, i + 1, 2, "ET"):
                    add("K")
                elif _at(w, i + 1, 4, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if _at(w, i + 1, 1, "G") else 1
            continue
        if c == "H":
            if (i == 0 or _is_vowel(w, i - 1)) and _is_vowel(w, i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue
        if c == "J":
            if _at(w, i, 4, "JOSE") or _at(w, 0, 4, "SAN "):
                # normalization strips spaces, so the reference's
                # "JOSE " / "SAN " checks become: word-final JOSE (the
                # whole word is '...JOSE'/'JOSE') -> H
                if (i == 0 and i + 4 == n) or _at(w, 0, 4, "SAN "):
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and not _at(w, i, 4, "JOSE"):
                add("J", "A")
            elif _is_vowel(w, i - 1) and not _slavo_germanic(w) and \
                    _at(w, i + 1, 1, "A", "O"):
                add("J", "H")
            elif i == n - 1:
                add("J", "")
            elif not _at(w, i + 1, 1, "L", "T", "K", "S", "N", "M",
                         "B", "Z") and \
                    not _at(w, i - 1, 1, "S", "K", "L"):
                add("J")
            i += 2 if _at(w, i + 1, 1, "J") else 1
            continue
        if c == "K":
            add("K")
            i += 2 if _at(w, i + 1, 1, "K") else 1
            continue
        if c == "L":
            if _at(w, i + 1, 1, "L"):
                # spanish 'LL' as in 'cabrillo'
                if (i == n - 3 and _at(w, i - 1, 4, "ILLO", "ILLA",
                                       "ALLE")) or \
                        ((_at(w, n - 2, 2, "AS", "OS") or
                          _at(w, n - 1, 1, "A", "O")) and
                         _at(w, i - 1, 4, "ALLE")):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue
        if c == "M":
            add("M")
            if (_at(w, i - 1, 3, "UMB") and
                    (i + 1 == n - 1 or _at(w, i + 2, 2, "ER"))) or \
                    _at(w, i + 1, 1, "M"):
                i += 2
            else:
                i += 1
            continue
        if c == "N":
            add("N")
            i += 2 if _at(w, i + 1, 1, "N") else 1
            continue
        if c == "P":
            if _at(w, i + 1, 1, "H"):
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if _at(w, i + 1, 1, "P", "B") else 1
            continue
        if c == "Q":
            add("K")
            i += 2 if _at(w, i + 1, 1, "Q") else 1
            continue
        if c == "R":
            if i == n - 1 and not _slavo_germanic(w) and \
                    _at(w, i - 2, 2, "IE") and \
                    not _at(w, i - 4, 2, "ME", "MA"):
                add("", "R")
            else:
                add("R")
            i += 2 if _at(w, i + 1, 1, "R") else 1
            continue
        if c == "S":
            if _at(w, i - 1, 3, "ISL", "YSL"):
                i += 1
                continue
            if i == 0 and _at(w, i, 5, "SUGAR"):
                add("X", "S")
                i += 1
                continue
            if _at(w, i, 2, "SH"):
                if _at(w, i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            if _at(w, i, 3, "SIO", "SIA") or _at(w, i, 4, "SIAN"):
                if not _slavo_germanic(w):
                    add("S", "X")
                else:
                    add("S")
                i += 3
                continue
            if (i == 0 and _at(w, i + 1, 1, "M", "N", "L", "W")) or \
                    _at(w, i + 1, 1, "Z"):
                add("S", "X")
                i += 2 if _at(w, i + 1, 1, "Z") else 1
                continue
            if _at(w, i, 2, "SC"):
                if w[i + 2:i + 3] == "H":
                    if _at(w, i + 3, 2, "OO", "ER", "EN", "UY", "ED",
                           "EM"):
                        if _at(w, i + 3, 2, "ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not _is_vowel(w, 3) and \
                                w[3:4] != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                    continue
                if _at(w, i + 2, 1, "I", "E", "Y"):
                    add("S")
                else:
                    add("SK")
                i += 3
                continue
            if i == n - 1 and _at(w, i - 2, 2, "AI", "OI"):
                add("", "S")
            else:
                add("S")
            i += 2 if _at(w, i + 1, 1, "S", "Z") else 1
            continue
        if c == "T":
            if _at(w, i, 4, "TION") or _at(w, i, 3, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if _at(w, i, 2, "TH") or _at(w, i, 3, "TTH"):
                if _at(w, i + 2, 2, "OM", "AM") or \
                        _at(w, 0, 4, "VAN ", "VON ") or \
                        _at(w, 0, 3, "SCH"):
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if _at(w, i + 1, 1, "T", "D") else 1
            continue
        if c == "V":
            add("F")
            i += 2 if _at(w, i + 1, 1, "V") else 1
            continue
        if c == "W":
            if _at(w, i, 2, "WR"):
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(w, i + 1) or _at(w, i, 2, "WH")):
                if _is_vowel(w, i + 1):
                    add("A", "F")
                else:
                    add("A")
            if (i == n - 1 and _is_vowel(w, i - 1)) or \
                    _at(w, i - 1, 5, "EWSKI", "EWSKY", "OWSKI",
                        "OWSKY") or _at(w, 0, 3, "SCH"):
                add("", "F")
                i += 1
                continue
            if _at(w, i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if c == "X":
            if not (i == n - 1 and
                    (_at(w, i - 3, 3, "IAU", "EAU") or
                     _at(w, i - 2, 2, "AU", "OU"))):
                add("KS")
            i += 2 if _at(w, i + 1, 1, "C", "X") else 1
            continue
        if c == "Z":
            if _at(w, i + 1, 1, "H"):
                add("J")
                i += 2
                continue
            if _at(w, i + 1, 2, "ZO", "ZI", "ZA") or \
                    (_slavo_germanic(w) and i > 0 and
                     w[i - 1:i] != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if _at(w, i + 1, 1, "Z") else 1
            continue
        i += 1

    return "".join(pri)[:max_len], "".join(sec)[:max_len]
