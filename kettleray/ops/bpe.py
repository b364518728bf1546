"""Distributed BPE tokenizer learning and encoding over the corpus.

A training-data pipeline doesn't just COUNT tokens (textstats.py) — it
learns the tokenizer from the corpus (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units" — public
algorithm). The scale split mirrors how production BPE trainers work:

- **Word counting is distributed**: one vectorized map-side combine
  per block (split → lower → filter → per-batch value_counts), then
  ONE hash exchange on the word — the only stage that sees corpus
  bytes, and it moves (word, count) pairs, not text.
- **Pair counting is distributed**: adjacent character 2-grams are
  extracted from the (word, count) vocab with a per-position
  ``utf8_slice_codeunits`` sweep (vectorized; the loop is over WORD
  LENGTH, ~a dozen iterations, not over rows), partial-aggregated per
  batch, then one small exchange on the pair.
- **Merge learning runs on the driver over a bounded top-K vocab**
  (``learn_bpe``): the classic incremental pair-count loop. This is
  NOT a cop-out — the merge loop is inherently sequential (merge i+1
  depends on i) and its input is the distinct-word vocab with counts,
  which every public BPE trainer (subword-nmt, GPT-2, SentencePiece)
  also holds in one process. The cap is explicit and logged; at 100 TB
  the top-1M vocab covers the mass that matters for merges.
- **Encoding is an actor-pool stage** (:class:`BpeEncoder`): merge
  ranks are compiled once per actor in ``__init__``; per-batch work
  encodes only the batch's DISTINCT words (dictionary-encode first)
  with an LRU word→tokens cache, then scatters counts back.

No Kettle analog (Kettle has no subword tooling); this belongs to the
brief's training-data surface next to token_count (textstats.py).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Tokenization contract shared by the Ray side and the DuckDB oracle
# (__ray_entry__.oracle_sql): split on \s+, lowercase, keep ^[a-z]+$
# words of length >= 2. RE2 semantics on both sides.
_WORD_RE = r"^[a-z]+$"


def _batch_word_counts(t: pa.Table, text_col: str) -> pa.Table:
    """Vectorized per-batch word histogram (map-side combine)."""
    toks = pc.list_flatten(
        pc.split_pattern_regex(t[text_col], pattern=r"\s+"))
    toks = pc.utf8_lower(toks)
    keep = pc.and_(pc.match_substring_regex(toks, _WORD_RE),
                   pc.greater_equal(pc.utf8_length(toks), 2))
    toks = toks.filter(keep)
    vc = toks.value_counts()
    if len(vc) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.table({"word": vc.field("values"),
                     "cnt": pc.cast(vc.field("counts"), pa.int64())})


def word_counts(ds, *, text_col: str = "text", num_partitions: int = 16):
    """Distributed word histogram: per-batch combine, ONE word exchange."""
    partial = ds.map_batches(
        lambda t: _batch_word_counts(t, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return partial.groupby("word").sum("cnt") \
        .map_batches(lambda t: t.rename_columns(["word", "cnt"]),
                     batch_format="pyarrow", zero_copy_batch=True)


def _batch_pair_counts(t: pa.Table) -> pa.Table:
    """Adjacent character-pair counts of a (word, cnt) batch,
    vectorized per POSITION (words are short; the loop is over the
    batch's max word length, not its rows)."""
    words, cnts = t["word"], t["cnt"]
    if t.num_rows == 0:
        return pa.table({"pair": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    maxlen = pc.max(pc.utf8_length(words)).as_py() or 0
    pairs, pcnts = [], []
    for i in range(max(0, maxlen - 1)):
        sl = pc.utf8_slice_codeunits(words, i, i + 2)
        mask = pc.equal(pc.utf8_length(sl), 2)
        pairs.append(sl.filter(mask).combine_chunks())
        pcnts.append(cnts.filter(mask).combine_chunks())
    if not pairs:
        return pa.table({"pair": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    flat = pa.table({"pair": pa.concat_arrays(
        [p if isinstance(p, pa.Array) else p.combine_chunks()
         for p in pairs]),
        "cnt": pa.concat_arrays(
            [c if isinstance(c, pa.Array) else c.combine_chunks()
             for c in pcnts])})
    # in-batch combine before the exchange
    return flat.group_by("pair").aggregate([("cnt", "sum")]) \
        .rename_columns(["pair", "cnt"])


def pair_counts(ds, *, text_col: str = "text",
                num_partitions: int = 16):
    """Initial BPE statistics: counts of adjacent character pairs,
    weighted by word frequency — the quantity iteration 0 of the merge
    loop maximizes. Two small exchanges total (word, then pair); corpus
    text never moves past the first combine."""
    wc = word_counts(ds, text_col=text_col,
                     num_partitions=num_partitions)
    partial = wc.map_batches(_batch_pair_counts, batch_format="pyarrow",
                             zero_copy_batch=True)
    return partial.groupby("pair").sum("cnt") \
        .map_batches(lambda t: t.rename_columns(["pair", "cnt"]),
                     batch_format="pyarrow", zero_copy_batch=True)


def learn_bpe(ds, num_merges: int, *, text_col: str = "text",
              top_k_vocab: int = 1_000_000,
              num_partitions: int = 16,
              report: dict | None = None) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Word counting is distributed (see :func:`word_counts`); the merge
    loop runs on the driver over the top ``top_k_vocab`` words by
    count (ties broken by word for determinism). If the vocab was
    truncated, the dropped distinct-word count is recorded in
    ``report`` — never silently.

    Deterministic: the best pair each round is (max count, then
    lexicographically smallest pair). Incremental update: only words
    containing the merged pair are revisited (indexed by pair), the
    classic subword-nmt optimization."""
    wc = word_counts(ds, text_col=text_col,
                     num_partitions=num_partitions)
    total = int(wc.count())
    if total > top_k_vocab:
        top = wc.sort(["cnt", "word"], descending=[True, False]) \
            .limit(top_k_vocab).take_all()
        if report is not None:
            report["vocab_truncated"] = total - top_k_vocab
    else:
        top = wc.take_all()
        if report is not None:
            report["vocab_truncated"] = 0
    if report is not None:
        report["vocab_size"] = min(total, top_k_vocab)

    # word -> list of symbols; pair -> count; pair -> {word indices}
    syms = [list(r["word"]) for r in top]
    freq = [int(r["cnt"]) for r in top]
    pair_cnt: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, s in enumerate(syms):
        f = freq[wi]
        for a, b in zip(s, s[1:]):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + f
            pair_words.setdefault((a, b), set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_cnt:
            break
        best = min(pair_cnt, key=lambda p: (-pair_cnt[p], p))
        if pair_cnt[best] <= 0:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for wi in list(pair_words.get(best, ())):
            s, f = syms[wi], freq[wi]
            # remove this word's contribution to all its pairs
            for a, b in zip(s, s[1:]):
                pair_cnt[(a, b)] -= f
                if pair_cnt[(a, b)] <= 0:
                    pair_cnt.pop((a, b), None)
                ws = pair_words.get((a, b))
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        pair_words.pop((a, b), None)
            # apply the merge left-to-right
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            # re-add contributions
            for a, b in zip(out, out[1:]):
                pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + f
                pair_words.setdefault((a, b), set()).add(wi)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merge rules (lowest rank first) to one word — the
    reference encoder the actor stage caches around."""
    s = list(word)
    while len(s) > 1:
        best, bi = None, -1
        for i, p in enumerate(zip(s, s[1:])):
            r = ranks.get(p)
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        s[bi:bi + 2] = [s[bi] + s[bi + 1]]
    return s


class BpeEncoder:
    """Actor-pool encode stage: merge ranks compiled ONCE per actor,
    per-batch work touches only the batch's distinct words (dictionary
    encode) with a persistent word→token-count cache. Emits
    ``bpe_token_count`` per row (whole-text subword count under the
    learned merges; out-of-alphabet words fall back to their character
    count, the standard byte/char fallback)."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text"):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.cache: dict[str, int] = {}

    def _count(self, word: str) -> int:
        n = self.cache.get(word)
        if n is None:
            n = len(encode_word(word, self.ranks))
            if len(self.cache) < 1_000_000:
                self.cache[word] = n
        return n

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[self.text_col], pattern=r"\s+")
        flat = pc.utf8_lower(pc.list_flatten(toks))
        # per-batch distinct words only (dictionary encode)
        dct = flat.dictionary_encode().combine_chunks()
        uniq = dct.dictionary.to_pylist()
        per_word = pa.array([self._count(w) if w else 0 for w in uniq],
                            type=pa.int64())
        counts = per_word.take(dct.indices)
        # scatter-add back to rows via the list offsets
        import numpy as np
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        row_id = np.repeat(np.arange(t.num_rows), lens)
        sums = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(sums, row_id,
                  counts.to_numpy(zero_copy_only=False))
        return t.append_column("bpe_token_count", pa.array(sums))


def bpe_token_counts(ds, merges: list[tuple[str, str]], *,
                     text_col: str = "text", concurrency: int = 4):
    """Encode the corpus with learned merges: stateful actor pool,
    ranks built once per actor."""
    return ds.map_batches(BpeEncoder,
                          fn_constructor_args=(merges, text_col),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=concurrency)
