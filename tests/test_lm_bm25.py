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


def test_bm25_avgdl_ignores_empty_docs():
    """avgdl must average dl over docs with >= 1 token only, matching
    the DuckDB oracle (its dl CTE never emits a row for a zero-token
    doc). N for idf stays count(ALL docs)."""
    docs = _ds(["apple banana", "", "   ", "apple"])
    out = {r["doc_id"]: r["bm25"] for r in textstats.bm25_scores(
        docs, "apple", "doc_id", "text").take_all()}
    assert set(out) == {0, 3}
    n = 4.0                      # idf N counts ALL docs
    avgdl = (2 + 1) / 2          # dl averaged over NON-EMPTY docs only
    k1, b = 1.2, 0.75

    def bm25(tf, df, dl):
        idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(out[0] - round(bm25(1, 2, 2), 6)) < 1e-9
    assert abs(out[3] - round(bm25(1, 2, 1), 6)) < 1e-9


def test_bm25_matches_duckdb_oracle_with_empty_docs(tmp_path):
    """End-to-end vs the ORACLES['bm25_scores'] SQL on a corpus that
    CONTAINS empty/whitespace docs — the exact latent-divergence case
    from the round-4 advice."""
    import duckdb
    import pyarrow.parquet as pq
    from kettleray.pipelines.training import ORACLES
    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": ["hash join stream hash", "", "  \t ",
                 "stream stream", "no match here"]})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = {r[0]: float(r[1]) for r in
            con.execute(ORACLES["bm25_scores"]).fetchall()}
    got = {r["doc_id"]: r["bm25"] for r in textstats.bm25_scores(
        ray.data.from_arrow(t), "hash join stream",
        "doc_id", "text").take_all()}
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


def test_bm25_string_id_column_empty_partitions():
    """Non-integer id_col: empty join partitions must emit blocks whose
    id type matches the real schema (round-4 advice: the empty-batch
    branch hardcoded int64)."""
    docs = ray.data.from_arrow(pa.table({
        "doc": ["d0", "d1"], "text": ["alpha beta", "beta"]}))
    out = {r["doc"]: r["bm25"] for r in textstats.bm25_scores(
        docs, "beta", "doc", "text").take_all()}
    assert set(out) == {"d0", "d1"}


def test_bigram_backoff_string_id_column():
    docs = ray.data.from_arrow(pa.table({
        "doc": ["a", "b"], "text": ["x y", "x y x"]}))
    rows = textstats.bigram_backoff_logprob(
        docs, "doc", "text", num_partitions=2).take_all()
    assert sorted(r["doc"] for r in rows) == ["a", "b"]


def test_bigram_backoff_broadcast_and_join_paths_identical():
    """broadcast_limit=0 forces the shuffle-join scale path; results
    must be bit-identical to the gated model-broadcast bypass."""
    texts = ["a b c a b", "b c d", "a a a", "x y", "c b a"] * 4
    docs = _ds(texts)
    fast = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"])
            for r in textstats.bigram_backoff_logprob(
                docs, "doc_id", "text", num_partitions=2).take_all()}
    slow = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"])
            for r in textstats.bigram_backoff_logprob(
                docs, "doc_id", "text", num_partitions=2,
                broadcast_limit=0).take_all()}
    assert fast == slow and len(fast) == len(texts)
