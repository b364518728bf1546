"""Phonetic / distance calculator functions vs published vectors and
DuckDB's own kernels (jaro family verified bit-for-bit)."""

import duckdb
import pyarrow as pa
import ray.data

from kettleray.ops import calculator as calc
from kettleray.ops.phonetics import double_metaphone


def test_metaphone_known_vectors():
    vectors = {"howl": "HL", "testing": "TSTN", "The": "0",
               "quick": "KK", "brown": "BRN", "fox": "FKS",
               "jumped": "JMPT", "over": "OFR", "lazy": "LS",
               "dogs": "TKS", "dog": "TK", "FISHER": "FXR",
               "wood": "WT", "Knight": "NT", "metaphone": "MTFN",
               "aero": "ER", "Wright": "RT", "school": "SKL"}
    for word, code in vectors.items():
        assert calc._metaphone(word) == code, word


def test_double_metaphone_known_vectors():
    vectors = {
        "smith": ("SM0", "XMT"), "schmidt": ("XMT", "SMT"),
        "johnson": ("JNSN", "ANSN"), "williams": ("ALMS", "FLMS"),
        "jones": ("JNS", "ANS"), "brown": ("PRN", "PRN"),
        "davis": ("TFS", "TFS"), "jackson": ("JKSN", "AKSN"),
        "gonzalez": ("KNSL", "KNSL"), "martinez": ("MRTN", "MRTN"),
        "garcia": ("KRS", "KRX"), "catherine": ("K0RN", "KTRN"),
        "katherine": ("K0RN", "KTRN"), "thomas": ("TMS", "TMS"),
        "philip": ("FLP", "FLP"), "wright": ("RT", "RT"),
        "knight": ("NT", "NT"),
    }
    for word, codes in vectors.items():
        assert double_metaphone(word) == codes, word


def test_refined_soundex_and_soundex():
    assert calc._soundex("Robert") == "R163"
    assert calc._soundex("Rupert") == "R163"
    assert calc._soundex("Tymczak") == "T522"
    assert calc._refined_soundex("BRAZ") == "B1905"


def test_jaro_family_matches_duckdb_exactly():
    con = duckdb.connect()
    pairs = [("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
             ("JELLYFISH", "SMELLYFISH"), ("abc", "abc"), ("", "abc"),
             ("Customer#01", "Customer#02"), ("a", "b")]
    for a, b in pairs:
        dj, djw, dd = con.execute(
            "SELECT jaro_similarity(?, ?), "
            "jaro_winkler_similarity(?, ?), damerau_levenshtein(?, ?)",
            [a, b, a, b, a, b]).fetchone()
        assert abs(calc._jaro(a, b) - dj) < 1e-12, (a, b)
        assert abs(calc._jaro_winkler(a, b) - djw) < 1e-12, (a, b)
        assert calc._damerau_osa(a, b) == dd, (a, b)


def test_calculator_new_ops_end_to_end():
    t = pa.table({"s": pa.array(["a1b2", None, "x<y>'z"]),
                  "v": pa.array([3.0, 4.0, 5.0])})
    out = calc.calculator(ray.data.from_arrow(t), [
        calc.CalcOp("d", "get_only_digits", a="s"),
        calc.CalcOp("sq", "square", a="v"),
        calc.CalcOp("hx", "hex_encode", a="s"),
        calc.CalcOp("rt", "hex_decode", a="hx"),
        calc.CalcOp("mp", "metaphone", a="s"),
        calc.CalcOp("dm", "double_metaphone", a="s"),
        calc.CalcOp("ad", "adler32", a="s"),
    ]).take_all()
    assert out[0]["d"] == "12"
    assert out[0]["sq"] == 9.0
    assert out[1]["hx"] is None and out[1]["rt"] is None
    assert out[2]["rt"] == "x<y>'z"
    import zlib
    assert out[0]["ad"] == zlib.adler32(b"a1b2")


def test_round_even_and_combination_and_workdays():
    import datetime
    t = pa.table({"v": pa.array([0.5, 1.5, 2.5, 2.675]),
                  "b": pa.array([10.0, 10.0, 10.0, 10.0]),
                  "d": pa.array([datetime.datetime(1995, 1, 9)] * 4,
                                type=pa.timestamp("us"))})
    out = calc.calculator(ray.data.from_arrow(t), [
        calc.CalcOp("re", "round_even", a="v", const_b=0),
        calc.CalcOp("lin", "combination_linear", a="v", b="b", c=2.0),
        calc.CalcOp("wd", "date_working_diff", a="d",
                    const_b=datetime.datetime(1995, 1, 1)),
    ]).take_all()
    assert [r["re"] for r in out] == [0.0, 2.0, 2.0, 3.0]
    assert [r["lin"] for r in out] == [11.0, 13.0, 15.0, 15.35]
    # 1995-01-01 is a Sunday; through Mon 1995-01-09 = 6 weekdays
    assert all(r["wd"] == 6 for r in out)
