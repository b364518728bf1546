"""Bigram Stupid-Backoff LM scoring and BM25 retrieval scoring.

Edge-case coverage beyond the sf0.01 DuckDB oracle gate
(lm_perplexity / bm25_scores in tools/check_queries.py).
"""
import math

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from kettleray.ops import textstats


def _ds(texts):
    return ray.data.from_arrow(pa.table(
        {"doc_id": list(range(len(texts))), "text": texts}))


def test_bigram_backoff_tiny_corpus_hand_checked():
    # corpus: "a b" and "a c"; T=4, c(a)=2 c(b)=1 c(c)=1
    # bigrams: (a,b)=1, (a,c)=1
    out = {r["doc_id"]: r for r in textstats.bigram_backoff_logprob(
        _ds(["a b", "a c"]), "doc_id", "text", num_partitions=2).take_all()}
    # doc0: first 'a' -> ln(4/2); 'b' after 'a': seen bigram 1/c(a)=1/2
    want = (math.log(2.0) + math.log(2.0)) / 2
    assert out[0]["n_tokens"] == 2
    assert abs(out[0]["avg_neg_logprob"] - round(want, 6)) < 1e-9
    assert out[1]["avg_neg_logprob"] == out[0]["avg_neg_logprob"]


def test_bigram_backoff_unseen_bigram_backs_off():
    # "x y" / "y x": bigrams (x,y) and (y,x) both seen once.
    # single doc "x x": bigram (x,x) unseen -> alpha backoff
    out = {r["doc_id"]: r for r in textstats.bigram_backoff_logprob(
        _ds(["x y", "y x", "x x"]), "doc_id", "text", num_partitions=2).take_all()}
    # corpus: c(x)=4, c(y)=2, T=6; bigrams (x,y)=1, (y,x)=1, (x,x)=1
    # doc2: first x -> ln(T/c(x)); (x,x) seen once -> p = 1/c(x)
    d2 = out[2]
    want = (math.log(6 / 4) + math.log(4 / 1)) / 2
    assert abs(d2["avg_neg_logprob"] - round(want, 6)) < 1e-9


def test_bigram_backoff_skips_empty_docs():
    rows = textstats.bigram_backoff_logprob(
        _ds(["hello world", "", "   "]), "doc_id", "text", num_partitions=2).take_all()
    assert sorted(r["doc_id"] for r in rows) == [0]


def test_bigram_backoff_single_token_doc():
    rows = {r["doc_id"]: r for r in textstats.bigram_backoff_logprob(
        _ds(["solo", "solo pair"]), "doc_id", "text", num_partitions=2).take_all()}
    # doc0: one token, unigram only: -ln(c(solo)/T) = -ln(2/3)
    assert rows[0]["n_tokens"] == 1
    assert abs(rows[0]["avg_neg_logprob"]
               - round(math.log(3 / 2), 6)) < 1e-9


def test_bm25_hand_checked_and_missing_terms():
    docs = _ds(["apple banana apple", "banana cherry", "durian"])
    out = {r["doc_id"]: r["bm25"] for r in textstats.bm25_scores(
        docs, "apple cherry", "doc_id", "text").take_all()}
    # doc2 matches no query term -> absent
    assert set(out) == {0, 1}
    n, avgdl = 3.0, (3 + 2 + 1) / 3
    k1, b = 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[0] - round(bm25(2, 1, 3), 6)) < 1e-9
    assert abs(out[1] - round(bm25(1, 1, 2), 6)) < 1e-9


def test_bm25_empty_query_raises():
    with pytest.raises(ValueError):
        textstats.bm25_scores(_ds(["x"]), "   ", "doc_id", "text")


def test_bm25_case_insensitive_and_dedup_terms():
    docs = _ds(["Foo foo BAR", "bar"])
    a = {r["doc_id"]: r["bm25"] for r in textstats.bm25_scores(
        docs, "foo bar", "doc_id", "text").take_all()}
    b = {r["doc_id"]: r["bm25"] for r in textstats.bm25_scores(
        docs, "FOO bar foo", "doc_id", "text").take_all()}
    assert a == b and set(a) == {0, 1}
