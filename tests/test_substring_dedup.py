"""Cross-document substring dedup: duplicated k-gram spans + cutting."""

import pyarrow as pa
import ray.data

from kettleray.ops import dedup

SHARED = ("the quick brown fox jumps over the lazy dog "
          "while seven wizards brew strong potions at midnight")
U1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
U2 = "one two three four five six seven eight nine ten eleven twelve"


def _docs(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _stats_dict(ds):
    return {r["doc_id"]: (r["dup_kgrams"], r["dup_spans"],
                          r["dup_tokens"]) for r in ds.take_all()}


def test_span_stats_planted_duplicate():
    docs = _docs([
        {"doc_id": 1, "text": U1 + " " + SHARED + " " + U2},
        {"doc_id": 2, "text": "prefix words here now " + SHARED},
        {"doc_id": 3, "text": U2 + " totally unique tail words"},
    ])
    st = _stats_dict(dedup.duplicate_span_stats(
        docs, "doc_id", "text", k=8, num_partitions=4))
    n_shared = len(SHARED.split())            # 17 tokens
    # SHARED has 17 tokens -> 10 k-grams (k=8), one maximal span of 17;
    # doc1/doc3 also share U2 (12 tokens -> 5 k-grams). In doc1 the
    # SHARED and U2 regions are ADJACENT, so the spans merge into one.
    assert st[2] == (10, 1, 17)
    assert st[1] == (10 + 5, 1, n_shared + 12)
    assert st[3][1] == 1 and st[3][2] == 12


def test_span_stats_no_duplicates_empty():
    docs = _docs([{"doc_id": 1, "text": U1},
                  {"doc_id": 2, "text": U2}])
    assert _stats_dict(dedup.duplicate_span_stats(
        docs, "doc_id", "text", k=8, num_partitions=4)) == {}


def test_span_stats_hashed_matches_string_mode():
    docs = _docs([
        {"doc_id": i, "text": (U1 if i % 3 == 0 else U2) + f" tail{i} "
         + (SHARED if i % 2 == 0 else "")} for i in range(20)])
    a = _stats_dict(dedup.duplicate_span_stats(
        docs, "doc_id", "text", k=8, hashed=False, num_partitions=4))
    b = _stats_dict(dedup.duplicate_span_stats(
        docs, "doc_id", "text", k=8, hashed=True, num_partitions=4))
    assert a == b and len(a) > 0


def test_overlapping_spans_merge():
    # doc2 repeats doc1's window shifted by 4 tokens: the two duplicated
    # regions in doc1 overlap and must merge into ONE span
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"
    docs = _docs([
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": "x1 x2 " + " ".join(base.split()[:8])},
        {"doc_id": 3, "text": " ".join(base.split()[4:]) + " y1 y2"},
    ])
    st = _stats_dict(dedup.duplicate_span_stats(
        docs, "doc_id", "text", k=8, num_partitions=4))
    assert st[1] == (2, 1, 12)          # grams at pos 1 and 5 merge


def test_cut_keeps_first_occurrence_only():
    docs = _docs([
        {"doc_id": 1, "text": U1 + " " + SHARED},
        {"doc_id": 2, "text": U2 + " " + SHARED},
        {"doc_id": 3, "text": SHARED + " " + U1.upper()},
    ])
    out = {r["doc_id"]: r["text"]
           for r in dedup.cut_duplicate_spans(
               docs, "doc_id", "text", k=8,
               num_partitions=4).take_all()}
    # doc1 holds the global-first occurrence (min doc_id): intact
    assert out[1] == U1 + " " + SHARED
    # doc2/doc3 lose the shared sentence but keep their unique parts
    assert out[2] == U2
    assert SHARED not in out[3]
    # case preserved outside the cut (matching is case-folded: doc3's
    # upper-cased U1 duplicates doc1's U1 and is cut as the later copy)
    assert out[3] == ""


def test_cut_case_preserved_and_unique_docs_untouched():
    docs = _docs([
        {"doc_id": 1, "text": "Unique Mixed Case words only here today "
                              "nothing repeats at all honest"},
        {"doc_id": 2, "text": U2},
    ])
    out = {r["doc_id"]: r["text"]
           for r in dedup.cut_duplicate_spans(
               docs, "doc_id", "text", k=8,
               num_partitions=4).take_all()}
    assert out[1].startswith("Unique Mixed Case")
    assert out[2] == U2
