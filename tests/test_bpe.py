"""Distributed BPE learning/encoding vs a naive pure-Python reference."""

import re
from collections import Counter

import pyarrow as pa
import ray.data

from kettleray.ops import bpe


def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"\s+", t):
            w = w.lower()
            if re.fullmatch(r"[a-z]+", w) and len(w) >= 2:
                c[w] += 1
    return c


def _ref_pair_counts(wc):
    c = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            c[w[i:i + 2]] += n
    return c


def _ref_learn(wc, num_merges):
    """Naive (recount-everything) Sennrich reference."""
    syms = {w: list(w) for w in wc}
    merges = []
    for _ in range(num_merges):
        pc_ = Counter()
        for w, s in syms.items():
            for p in zip(s, s[1:]):
                pc_[p] += wc[w]
        if not pc_:
            break
        best = min(pc_, key=lambda p: (-pc_[p], p))
        merges.append(best)
        ns = best[0] + best[1]
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(ns)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


TEXTS = ["the cat sat on the mat",
         "the bat and the rat sat flat",
         "LOW lower lowest low low",
         "newer new news newest 123 x",
         "batter better butter matter", ""]


def _ds():
    return ray.data.from_arrow(pa.table({"text": TEXTS})).repartition(3)


def test_word_and_pair_counts_match_reference():
    wc_ref = _ref_word_counts(TEXTS)
    wc = {r["word"]: r["cnt"] for r in bpe.word_counts(_ds()).take_all()}
    assert wc == dict(wc_ref)
    pc_ref = _ref_pair_counts(wc_ref)
    got = {r["pair"]: r["cnt"]
           for r in bpe.pair_counts(_ds()).take_all()}
    assert got == dict(pc_ref)


def test_learn_bpe_matches_naive_reference():
    wc_ref = _ref_word_counts(TEXTS)
    want = _ref_learn(wc_ref, 12)
    got = bpe.learn_bpe(_ds(), 12)
    assert got == want


def test_learn_bpe_deterministic_and_capped():
    rep = {}
    a = bpe.learn_bpe(_ds(), 8, report=rep)
    b = bpe.learn_bpe(_ds(), 8)
    assert a == b and rep["vocab_truncated"] == 0

    rep2 = {}
    capped = bpe.learn_bpe(_ds(), 8, top_k_vocab=5, report=rep2)
    assert rep2["vocab_size"] == 5 and rep2["vocab_truncated"] > 0
    # capped learning equals the reference run on the same top-5 vocab
    wc_ref = _ref_word_counts(TEXTS)
    top5 = dict(sorted(wc_ref.items(),
                       key=lambda kv: (-kv[1], kv[0]))[:5])
    assert capped == _ref_learn(top5, 8)


def test_encode_word_applies_ranks_in_order():
    merges = [("l", "o"), ("lo", "w"), ("e", "r"), ("low", "er")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.encode_word("lower", ranks) == ["lower"]
    assert bpe.encode_word("low", ranks) == ["low"]
    assert bpe.encode_word("slow", ranks) == ["s", "low"]
    assert bpe.encode_word("xyz", ranks) == ["x", "y", "z"]


def test_bpe_token_counts_match_per_row_reference():
    merges = bpe.learn_bpe(_ds(), 10)
    ranks = {p: i for i, p in enumerate(merges)}
    out = bpe.bpe_token_counts(_ds(), merges, concurrency=2)
    got = {r["text"]: r["bpe_token_count"] for r in out.take_all()}
    for text in TEXTS:
        want = sum(len(bpe.encode_word(w.lower(), ranks))
                   for w in re.split(r"\s+", text) if w)
        assert got[text] == want, text
