"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

Stateful pieces (compiled regexes, stopword tables) live in actor-pool
classes (built once per actor in __init__); pure column math uses
pyarrow.compute.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


# GPT-2-style pre-tokenizer shape, RE2-compatible (no lookahead — RE2
# doesn't support it, and both pyarrow and DuckDB run RE2, which is what
# makes the count oracle-able end-to-end): contractions, letter runs,
# digit runs, punctuation runs, whitespace runs.
BPE_TOKEN_PATTERN = (r"'(?:[sdmt]|ll|ve|re)"
                     r"| ?\p{L}+| ?\p{N}+"
                     r"| ?[^\s\p{L}\p{N}]+"
                     r"|\s+")


def token_count(ds, text_col: str, out_col: str = "n_tokens",
                mode: str = "whitespace"):
    """Token count, fully vectorized. ``mode='whitespace'`` counts
    whitespace-separated words; ``mode='bpe'`` counts matches of a
    BPE-ish GPT-2-style pre-tokenizer regex (contraction suffixes,
    letter/digit/punctuation runs) — a deterministic proxy for LLM
    token budgeting with no tokenizer model in the loop."""
    def _fn(t: pa.Table) -> pa.Table:
        if mode == "bpe":
            n = pc.count_substring_regex(t[text_col],
                                         pattern=BPE_TOKEN_PATTERN)
        else:
            trimmed = pc.utf8_trim_whitespace(t[text_col])
            parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
            n = pc.list_value_length(parts)
        return t.append_column(out_col, pc.cast(n, pa.int64()))
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def text_quality(ds, text_col: str):
    """Quality-signal columns: length, alpha ratio, digit ratio, upper
    ratio, avg token length (rounded to 4dp so oracle floats compare)."""
    def _fn(t: pa.Table) -> pa.Table:
        s = t[text_col]
        n = pc.utf8_length(s)
        nf = pc.cast(n, pa.float64())
        alpha = pc.utf8_length(
            pc.replace_substring_regex(s, r"[^A-Za-z]", ""))
        digit = pc.utf8_length(
            pc.replace_substring_regex(s, r"[^0-9]", ""))
        upper = pc.utf8_length(
            pc.replace_substring_regex(s, r"[^A-Z]", ""))
        toks = pc.list_value_length(pc.split_pattern_regex(
            pc.utf8_trim_whitespace(s), pattern=r"\s+"))
        safe_n = pc.max_element_wise(nf, 1.0)
        t = t.append_column("n_chars_calc", pc.cast(n, pa.int64()))
        t = t.append_column("alpha_ratio", pc.round(
            pc.divide(pc.cast(alpha, pa.float64()), safe_n), ndigits=4,
            round_mode="half_towards_infinity"))
        t = t.append_column("digit_ratio", pc.round(
            pc.divide(pc.cast(digit, pa.float64()), safe_n), ndigits=4,
            round_mode="half_towards_infinity"))
        t = t.append_column("upper_ratio", pc.round(
            pc.divide(pc.cast(upper, pa.float64()), safe_n), ndigits=4,
            round_mode="half_towards_infinity"))
        t = t.append_column("avg_token_len", pc.round(
            pc.divide(safe_n, pc.cast(pc.max_element_wise(
                pc.cast(toks, pa.int64()), 1), pa.float64())), ndigits=4,
            round_mode="half_towards_infinity"))
        return t
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def repetition_stats(ds, text_col: str, id_col: str = "doc_id"):
    """In-document repetition signals (the Gopher/C4-style quality
    filters for LLM training data): per doc, the duplicate-token ratio
    (1 - distinct/total), the most-frequent-token share, and the
    duplicate word-2-gram / 3-gram ratios. Empty docs get n_tokens=0 and
    null ratios.

    Vectorized per batch (the MinHasher flat-stream pattern): Arrow
    lowercase+trim+whitespace split -> dictionary-encoded token codes
    over the flat stream -> per-doc distinct/top counts via lexsort +
    run-length kernels; n-gram distincts are code-tuple lexsorts (exact,
    no hashing). Pure map — no shuffle."""

    def _fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(
            pc.utf8_trim_whitespace(pc.utf8_lower(t[text_col])), "")
        toks = pc.utf8_split_whitespace(texts)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        raw_counts = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ndocs = len(raw_counts)
        doc_of = np.repeat(np.arange(ndocs), raw_counts)
        # empty/whitespace-only docs split to [''] — drop those tokens
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = doc_of[nonempty]
        n = np.bincount(doc_of, minlength=ndocs).astype(np.int64)

        def _distinct_per_doc(keys: tuple) -> np.ndarray:
            """#distinct key tuples per doc; keys are same-length int
            arrays, first is doc id."""
            if len(keys[0]) == 0:
                return np.zeros(ndocs, np.int64)
            perm = np.lexsort(keys[::-1])
            stacked = [k[perm] for k in keys]
            first = np.zeros(len(perm), dtype=bool)
            first[0] = True
            for sk in stacked:
                first[1:] |= sk[1:] != sk[:-1]
            return np.bincount(stacked[0][first], minlength=ndocs) \
                .astype(np.int64)

        nd = _distinct_per_doc((doc_of, codes))
        # top-token count per doc: run lengths of (doc, code), max per doc
        top = np.zeros(ndocs, np.int64)
        if len(codes):
            perm = np.lexsort((codes, doc_of))
            sd, sc = doc_of[perm], codes[perm]
            rs = np.zeros(len(sd), dtype=bool)
            rs[0] = True
            rs[1:] = (sd[1:] != sd[:-1]) | (sc[1:] != sc[:-1])
            begins = np.nonzero(rs)[0]
            rl = np.diff(np.append(begins, len(sd)))
            run_doc = sd[begins]
            drs = np.zeros(len(run_doc), dtype=bool)
            drs[0] = True
            drs[1:] = run_doc[1:] != run_doc[:-1]
            top_vals = np.maximum.reduceat(rl, np.nonzero(drs)[0])
            top[run_doc[np.nonzero(drs)[0]]] = top_vals
        # n-gram distincts over adjacent code pairs/triples within a doc
        same2 = doc_of[:-1] == doc_of[1:] if len(codes) > 1 else \
            np.zeros(0, bool)
        nd2 = _distinct_per_doc((doc_of[:-1][same2], codes[:-1][same2],
                                 codes[1:][same2])) \
            if same2.any() else np.zeros(ndocs, np.int64)
        same3 = same2[:-1] & same2[1:] if len(codes) > 2 else \
            np.zeros(0, bool)
        nd3 = _distinct_per_doc((doc_of[:-2][same3], codes[:-2][same3],
                                 codes[1:-1][same3], codes[2:][same3])) \
            if same3.any() else np.zeros(ndocs, np.int64)

        def _ratio(num, den, min_n):
            val = pa.array(np.where(n >= min_n, num, np.nan) /
                           np.maximum(den, 1), type=pa.float64())
            val = pc.round(val, ndigits=6,
                           round_mode="half_towards_infinity")
            return pc.if_else(pa.array(n >= min_n), val,
                              pa.nulls(ndocs, pa.float64()))

        out = t.select([id_col])
        out = out.append_column("n_tokens", pa.array(n, type=pa.int64()))
        out = out.append_column("dup_token_ratio", _ratio(n - nd, n, 1))
        out = out.append_column("top_token_ratio", _ratio(top, n, 1))
        out = out.append_column("dup_2gram_ratio",
                                _ratio((n - 1) - nd2, n - 1, 2))
        out = out.append_column("dup_3gram_ratio",
                                _ratio((n - 2) - nd3, n - 2, 3))
        return out

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def doc_fingerprint(ds, text_col: str, out_col: str = "fingerprint"):
    """Normalization fingerprint: md5 of lowercased, whitespace-collapsed
    text — the cheap canonical-form dedup key."""
    import hashlib

    def _fn(t: pa.Table) -> pa.Table:
        norm = pc.replace_substring_regex(
            pc.utf8_lower(t[text_col]), pattern=r"\s+", replacement=" ")
        norm = pc.utf8_trim_whitespace(norm)
        vals = norm.combine_chunks().to_pylist() \
            if isinstance(norm, pa.ChunkedArray) else norm.to_pylist()
        fp = [None if v is None else
              hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
        return t.append_column(out_col, pa.array(fp, type=pa.string()))
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def winnowing_fingerprints(ds, text_col: str, id_col: str = "doc_id",
                           *, k: int = 8, w: int = 4):
    """MOSS-style winnowing fingerprints (rolling-hash doc signatures):
    polynomial k-gram hashes over the codepoint stream, then the min of
    each window of ``w`` consecutive hashes (frame truncated at the doc
    tail, matching SQL window semantics), distinct per doc. Emits one
    (id, fingerprint) row per selected hash — the near-dup/plagiarism
    signature set.

    Hashes are EXACT small integers (base 31, k<=8 keeps the sum under
    2^53), so a DuckDB oracle recomputes them bit-identically with plain
    BIGINT arithmetic — no custom UDF. Per-batch work is vectorized: one
    utf-32 encode of the concatenated batch text -> numpy codepoints,
    sliding-window polynomial hash over the flat stream, per-doc slicing
    (windows crossing doc boundaries are never read)."""
    BASE = 31
    assert k <= 8, "k>8 overflows the exact-integer (2^53) hash bound"
    powers = (BASE ** np.arange(k - 1, -1, -1)).astype(np.uint64)
    sentinel = np.iinfo(np.uint64).max

    def _fn(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        if not texts:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "fingerprint": pa.array([], pa.int64())})
        codes = np.frombuffer("".join(texts).encode("utf-32-le"),
                              dtype=np.uint32).astype(np.uint64)
        lens = np.fromiter((len(s) for s in texts), dtype=np.int64,
                           count=len(texts))
        offs = np.concatenate([[0], np.cumsum(lens)])
        h_all = None
        if len(codes) >= k:
            wins = np.lib.stride_tricks.sliding_window_view(codes, k)
            h_all = (wins * powers).sum(axis=1)   # exact, < 2^53
        # Fully vectorized window-min (no per-doc Python loop): scatter
        # every doc's hash span into one flat stream with (w-1) sentinel
        # pads after each doc, so a w-window starting inside a doc can
        # only see that doc's hashes + its own pad — identical to the
        # per-doc truncated-frame semantics.
        ok = lens >= k
        if h_all is None or not ok.any():
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "fingerprint": pa.array([], pa.int64())})
        m = (lens[ok] - k + 1).astype(np.int64)       # hashes per doc
        doc_idx = np.nonzero(ok)[0]
        total = int(m.sum())
        starts = np.concatenate([[0], np.cumsum(m + w - 1)])
        padded = np.full(int(starts[-1]), sentinel, np.uint64)
        span_of = np.repeat(np.arange(len(m)), m)
        within = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(m)[:-1]]), m)
        pos = starts[span_of] + within
        src = np.repeat(offs[:-1][ok], m) + within
        padded[pos] = h_all[src]
        sw_min = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([padded,
                            np.full(w - 1, sentinel, np.uint64)]),
            w).min(axis=1)
        mins = sw_min[pos]
        # distinct (doc, fingerprint): lexsort + run boundaries
        order = np.lexsort((mins, span_of))
        sd, sm = span_of[order], mins[order]
        first = np.empty(total, dtype=bool)
        first[0] = True
        first[1:] = (sd[1:] != sd[:-1]) | (sm[1:] != sm[:-1])
        return pa.table({
            id_col: pa.array(ids[doc_idx[sd[first]]].astype(np.int64))
            .cast(t[id_col].type),
            "fingerprint": pa.array(sm[first].astype(np.int64),
                                    type=pa.int64()),
        })

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def word_counts(ds, text_col: str, *, lowercase: bool = True,
                num_partitions: int = 16):
    """Distributed vocabulary building (the tokenizer-training staple):
    per-batch PARTIAL word counts (Arrow split + value_counts — the
    map-side combiner, so the shuffle moves one row per distinct word
    per block, not one per token), then a hash-partitioned sum."""

    def _partial(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if lowercase:
            col = pc.utf8_lower(col)
        toks = pc.list_flatten(pc.utf8_split_whitespace(
            pc.fill_null(pc.utf8_trim_whitespace(col), "")))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        vc = toks.value_counts()       # StructArray<values, counts>
        words = vc.field("values")
        counts = vc.field("counts")
        keep = pc.not_equal(words, "")
        return pa.table({"word": words.filter(keep),
                         "n": pc.cast(counts.filter(keep), pa.int64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    shuffled = partials.repartition(num_partitions, keys=["word"])

    def _sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import numpy as np
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, ["word"])
        n = _col_np(t, "n")
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        run_start = np.empty(len(sk), dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        starts = np.nonzero(run_start)[0]
        sums = np.add.reduceat(n[order], starts)
        reps = t.take(pa.array(order[starts], type=pa.int64()))
        return pa.table({"word": reps["word"],
                         "n": pa.array(sums, type=pa.int64())})

    return shuffled.map_batches(_sum, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


DEFAULT_SCRUB_PATTERNS = (
    # order matters: URLs before bare domains would, emails before words
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b(?:\+?\d[\d\-\s]{7,}\d)\b", "<PHONE>"),
)


def scrub_text(ds, text_col: str, *, out_col: str | None = None,
               patterns=DEFAULT_SCRUB_PATTERNS):
    """PII/noise scrubbing for training corpora: ordered regex
    replacements (email/URL/phone by default) applied with Arrow's RE2
    kernel — compiled once, vectorized per batch."""
    out_col = out_col or text_col

    def _fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        for pat, repl in patterns:
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if out_col in t.column_names:
            return t.set_column(t.column_names.index(out_col), out_col,
                                col)
        return t.append_column(out_col, col)

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def normalize_text(ds, text_col: str, *, out_col: str | None = None,
                   form: str = "NFC", lowercase: bool = True,
                   collapse_ws: bool = True):
    """Canonical text normalization (the cheap pre-dedup pass): unicode
    normalize + lowercase + whitespace collapse, all Arrow kernels."""
    out_col = out_col or text_col

    def _fn(t: pa.Table) -> pa.Table:
        col = t[text_col]
        col = pc.utf8_normalize(col, form=form)
        if lowercase:
            col = pc.utf8_lower(col)
        if collapse_ws:
            col = pc.utf8_trim_whitespace(
                pc.replace_substring_regex(col, pattern=r"\s+",
                                           replacement=" "))
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if out_col in t.column_names:
            return t.set_column(t.column_names.index(out_col), out_col,
                                col)
        return t.append_column(out_col, col)

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


# Ordered dict: earlier languages win stopword-count ties (the voting
# loop only replaces on STRICTLY more hits). The lang_id oracle SQL is
# GENERATED from this table (pipelines/training.py::lang_id_oracle_sql)
# so the heuristic and its oracle cannot drift apart.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it",
           "was", "with", "as", "his", "on", "be", "at", "by", "this",
           "had"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den",
           "nicht", "ein", "eine", "auf", "im", "sich", "des", "auch",
           "es", "an", "als"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour",
           "dans", "que", "qui", "des", "du", "il", "au", "plus", "pas",
           "sur", "se"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "por", "con",
           "que", "del", "las", "en", "se", "no", "más", "como", "pero",
           "sus"},
    "it": {"il", "di", "che", "e", "la", "per", "un", "una", "non", "con",
           "del", "gli", "le", "si", "da", "dei", "nel", "alla", "come",
           "anche"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para",
           "com", "não", "uma", "os", "no", "se", "na", "por", "mais",
           "as"},
}


# shared by LangId and the generated oracle SQL (RE2-compatible, no
# shorthand classes) — keep in sync by construction
TOKEN_PATTERN = (r"[a-zA-Zäöüß"
                 r"éèêëàâçñ"
                 r"áíóúãõôîûìòù"
                 r"ÄÖÜ]+")


def _pattern_chars() -> list[str]:
    """Expand TOKEN_PATTERN's character class (handles x-y ranges)."""
    body = TOKEN_PATTERN[1:-2]
    chars, i = [], 0
    while i < len(body):
        if i + 2 < len(body) and body[i + 1] == "-":
            chars += [chr(c) for c in range(ord(body[i]),
                                            ord(body[i + 2]) + 1)]
            i += 3
        else:
            chars.append(body[i])
            i += 1
    return chars


class LangId:
    """Heuristic language ID: stopword-hit voting, vectorized to the
    byte level.

    TOKEN_PATTERN is a single character-class run whose members are
    ASCII letters plus a fixed set of 2-byte (0xC3 xx) UTF-8 letters —
    so tokenization is exact BYTE CLASSIFICATION over the Arrow string
    buffer (zero-copy): letter-run starts via shifted boolean masks,
    per-doc resets at value offsets, token->doc assignment by
    searchsorted. Every stopword is <= 5 UTF-8 bytes, so membership is
    an EXACT uint64 pack of the (lowercased) first 8 token bytes
    against per-language packed sets via ``np.isin`` — no hashing, no
    collisions, no per-row Python. Voting semantics are unchanged
    (first 200 tokens per doc, multiplicity counted, dict-order
    strict-greater wins) — the generated SQL oracle checks them
    bit-for-bit. Lookup tables built ONCE per actor (the stateful
    actor-pool pattern); ~10x faster than the per-row regex loop on
    the sf0.01 documents table (micro-bench in BASELINE.md)."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        import numpy as np
        chars = _pattern_chars()
        self.ascii_letter = np.zeros(256, dtype=bool)
        self.allowed2 = np.zeros(256, dtype=bool)     # 0xC3 2nd bytes
        for c in chars:
            b = c.encode()
            if len(b) == 1:
                self.ascii_letter[b[0]] = True
            else:                  # all 2-byte 0xC3 xx (checked below)
                assert len(b) == 2 and b[0] == 0xC3, c
                self.allowed2[b[1]] = True
        # lowercase LUTs: ASCII A-Z, and 0xC3-second-byte uppercase
        # accented letters (Ä/Ö/Ü -> +0x20); applied only inside tokens
        self.lower_lut = np.arange(256, dtype=np.uint8)
        self.lower_lut[ord("A"):ord("Z") + 1] += 32
        self.lower2_lut = np.arange(256, dtype=np.uint8)
        for c in chars:
            b = c.encode()
            if len(b) == 2 and c.lower() != c:
                self.lower2_lut[b[1]] = c.lower().encode()[1]
        self.langs = list(_STOPWORDS)
        self.pow8 = (np.uint64(256) ** np.arange(8, dtype=np.uint64))
        self.packed_sets = []
        for lang in self.langs:
            packs = []
            for w in _STOPWORDS[lang]:
                wb = w.encode()
                assert len(wb) <= 8, w
                v = np.zeros(8, dtype=np.uint64)
                v[:len(wb)] = np.frombuffer(wb, dtype=np.uint8)
                packs.append(int((v * self.pow8).sum()))
            self.packed_sets.append(np.asarray(sorted(packs),
                                               dtype=np.uint64))
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n_docs = len(texts)
        n_langs = len(self.langs)
        hits = np.zeros((n_docs, n_langs), dtype=np.int64)
        bufs = texts.buffers()
        off_dtype = np.int64 if pa.types.is_large_string(texts.type) \
            else np.int32
        off = np.frombuffer(bufs[1], dtype=off_dtype)[
            texts.offset:texts.offset + n_docs + 1].astype(np.int64)
        buf = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] \
            else np.zeros(0, np.uint8)
        lo, hi = off[0], off[-1]
        if hi > lo:
            b = buf[:hi]           # positions stay absolute (off-based)
            is_c3 = b == 0xC3
            letter = self.ascii_letter[b]
            al2 = self.allowed2[b]
            two = is_c3[:-1] & al2[1:]       # 2-byte letter sequences
            letter[:-1] |= two
            letter[1:] |= two
            prev = np.zeros(len(b), dtype=bool)
            prev[1:] = letter[:-1]
            start = letter & ~prev
            # a token never crosses a doc boundary: force a start there
            bound = off[:-1][(off[:-1] > lo) & (off[:-1] < hi)]
            start[bound] |= letter[bound]
            starts_pos = np.flatnonzero(start[lo:]) + lo
            n_tok = len(starts_pos)
            if n_tok:
                # token id per letter position -> byte lengths (forced
                # boundary starts split runs that span adjacent docs)
                tid = np.cumsum(start[lo:]) - 1
                letter_pos = np.flatnonzero(letter[lo:])
                lengths = np.bincount(tid[letter_pos],
                                      minlength=n_tok)
                doc_idx = np.searchsorted(off, starts_pos,
                                          side="right") - 1
                tokens_per_doc = np.bincount(doc_idx,
                                             minlength=n_docs)
                first_of_doc = np.r_[np.int64(0),
                                     np.cumsum(tokens_per_doc)[:-1]]
                rank = np.arange(n_tok) - first_of_doc[doc_idx]
                cand = (rank < 200) & (lengths <= 8)
                sp = starts_pos[cand]
                ln = lengths[cand]
                dix = doc_idx[cand]
                # lowercase + pack first 8 bytes (exact: stopwords
                # are <= 8 bytes; longer tokens can't match)
                idx = sp[:, None] + np.arange(8)[None, :]
                valid = np.arange(8)[None, :] < ln[:, None]
                raw = b[np.minimum(idx, len(b) - 1)]
                low = self.lower_lut[raw]
                prev_c3 = np.zeros_like(raw, dtype=bool)
                prev_c3[:, 1:] = raw[:, :-1] == 0xC3
                low = np.where(prev_c3, self.lower2_lut[raw], low)
                packed = ((low * valid).astype(np.uint64)
                          * self.pow8[None, :]).sum(axis=1)
                for j, ps in enumerate(self.packed_sets):
                    member = np.isin(packed, ps, assume_unique=False)
                    if member.any():
                        hits[:, j] = np.bincount(
                            dix[member], minlength=n_docs)[:n_docs]
        # dict-order voting: a later language wins only with STRICTLY
        # more hits than every earlier one
        best_hits = np.zeros(n_docs, dtype=np.int64)
        best_idx = np.full(n_docs, n_langs, dtype=np.int64)
        for j in range(n_langs):
            upd = hits[:, j] > best_hits
            best_idx[upd] = j
            best_hits[upd] = hits[upd, j]
        lang_lut = np.asarray(self.langs + ["unknown"], dtype=object)
        preds = lang_lut[best_idx]
        return batch.append_column(
            self.out_col, pa.array(preds.tolist(), type=pa.string()))


def lang_id(ds, text_col: str = "text", *, concurrency=None,
            batch_size: int = 4096):
    from kettleray.context import auto_pool
    return ds.map_batches(LangId, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=batch_size,
                          concurrency=concurrency or auto_pool(),
                          fn_constructor_args=(text_col,))


def doc_word_pairs(docs, id_col: str, text_col: str):
    """Partial (doc, word, tf) posting rows per batch: Arrow tokenize ->
    dictionary-encode -> np.unique over doc x word codes — the map-side
    combiner shared by tfidf and the inverted index (one row per
    distinct pair per block, never one per token)."""
    import numpy as np

    def _pairs(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(pc.utf8_trim_whitespace(texts), "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        counts = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        widx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        keep = pc.not_equal(vocab, "").to_numpy(zero_copy_only=False)
        mask = keep[widx] if len(widx) else np.zeros(0, bool)
        codes = doc_of[mask] * len(vocab) + widx[mask]
        uniq, cnt = np.unique(codes, return_counts=True)
        di = (uniq // max(len(vocab), 1)).astype(np.int64)
        wi = (uniq % max(len(vocab), 1)).astype(np.int64)
        return pa.table({
            id_col: t[id_col].combine_chunks().take(pa.array(di)),
            "word": vocab.take(pa.array(wi)),
            "tf": pa.array(cnt.astype(np.int64)),
        })

    return docs.map_batches(_pairs, batch_format="pyarrow",
                            zero_copy_batch=True)


def tfidf(docs, id_col: str, text_col: str, *, num_partitions: int = 16,
          round_digits: int = 6):
    """Distributed TF-IDF: (doc, word, tf, df, tfidf) rows for every
    distinct (doc, word) — the scoring core of quality filtering /
    keyword extraction over a training corpus.

    Scale shape: per-batch tokenization emits PARTIAL (doc, word, tf)
    rows (map-side combine via np.unique over doc x word codes — one
    row per distinct pair per block, never one per token); df is a
    word-keyed groupby over those rows; tf joins df with a hash join on
    word. Two word-keyed shuffles total, both over pair rows (bounded
    by distinct pairs, not token count). N (corpus size) is a metadata
    count. tfidf = tf * ln(N / df), rounded so a SQL oracle can
    value-compare."""
    import numpy as np

    n_docs = float(docs.count())

    # materialize once: BOTH the df groupby and the tf join consume the
    # pair table; without this the tokenize stage runs twice (Ray Data
    # re-executes shared lazy upstreams per consumer). Size is bounded
    # by distinct (doc, word) pairs — far below the token stream.
    pairs = doc_word_pairs(docs, id_col, text_col).materialize()
    df = pairs.groupby("word", num_partitions=num_partitions).count()
    df = df.map_batches(
        lambda t: pa.table({"word": t["word"],
                            "df": pc.cast(t["count()"], pa.int64())}),
        batch_format="pyarrow")
    joined = pairs.join(df, join_type="inner", on=("word",),
                        num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tfv * np.log(n_docs / dfv), round_digits)
        return t.append_column("tfidf", pa.array(score))

    return joined.map_batches(_score, batch_format="pyarrow",
                              zero_copy_batch=True)


def unigram_logprob(docs, id_col: str, text_col: str, *,
                    vocab_size: int = 65536, oov_count: int = 1,
                    num_partitions: int = 16, round_digits: int = 6):
    """CCNet-style unigram language-model quality score: per doc the
    mean negative log-probability of its tokens under the corpus's own
    unigram distribution (high = rare/garbled text, the classic
    perplexity-filtering signal; CCNet uses a 5-gram KenLM, the unigram
    variant is the model-free version of the same gate).

    p(w) = count(w) / total_tokens for the ``vocab_size`` most frequent
    words (ties broken by word — deterministic, SQL-matchable); any
    other token scores with count ``oov_count``.

    Scale shape: ONE word-keyed shuffle of map-side-combined (doc, word,
    tf) pair rows builds the counts; top-K vocab via per-block partial
    top-k then a sort over the k x blocks candidate set (never a full
    vocab sort); the K-row logprob table is driver-bounded by
    construction and broadcast ONCE via ``ray.put``; scoring is an
    ``index_in`` gather per batch; per-doc totals are one doc-keyed
    native sum. Nothing corpus-sized touches the driver."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    pairs = doc_word_pairs(docs, id_col, text_col).materialize()

    shuffled = pairs.repartition(num_partitions, keys=["word"])

    def _sum_word(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"word": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, ["word"])
        n = _col_np(t, "tf")
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        run_start = np.empty(len(sk), dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        starts = np.nonzero(run_start)[0]
        sums = np.add.reduceat(n[order], starts)
        reps = t.take(pa.array(order[starts], type=pa.int64()))
        return pa.table({"word": reps["word"],
                         "n": pa.array(sums, type=pa.int64())})

    wc = shuffled.map_batches(_sum_word, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)

    def _partial_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= vocab_size:
            return t
        n = t["n"].to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(t["word"].combine_chunks()
                                   if isinstance(t["word"],
                                                 pa.ChunkedArray)
                                   else t["word"])
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        # (n desc, word asc): dictionary codes are in first-appearance
        # order, not lexicographic — rank the vocab alphabetically first
        widx = enc.indices.to_numpy(zero_copy_only=False)
        rank = np.empty(len(enc.dictionary), dtype=np.int64)
        rank[np.array(pc.sort_indices(enc.dictionary))] = \
            np.arange(len(enc.dictionary))
        order = np.lexsort((rank[widx], -n))[:vocab_size]
        return t.take(pa.array(np.sort(order), type=pa.int64()))

    cands = wc.map_batches(_partial_topk, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
    vocab_t = pa.concat_tables(
        [t for t in ray.get(
            cands.sort(["n", "word"], descending=[True, False])
            .limit(vocab_size).to_arrow_refs()) if t.num_columns])
    total = float(pairs.sum("tf"))
    vocab_words = vocab_t["word"].combine_chunks()
    vocab_counts = vocab_t["n"].to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    vref = ray.put((vocab_words, vocab_counts))
    log_total = np.log(total)

    def _score(t: pa.Table) -> pa.Table:
        vw, vc = ray.get(vref)
        idx = pc.index_in(t["word"], value_set=vw) \
            .to_numpy(zero_copy_only=False)
        miss = np.isnan(idx) if idx.dtype.kind == "f" else (idx < 0)
        idx = np.where(miss, 0, idx).astype(np.int64)
        c = np.where(miss, float(oov_count), vc[idx])
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        wneg = tf * (log_total - np.log(c))
        return pa.table({id_col: t[id_col], "tf": t["tf"],
                         "wneg": pa.array(wneg, type=pa.float64())})

    scored = pairs.map_batches(_score, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = scored.groupby(id_col).aggregate(
        Sum("tf", alias_name="n_tokens"),
        Sum("wneg", alias_name="wsum"))

    def _fin(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "avg_neg_logprob": pa.array([], type=pa.float64())})
        nt = t["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ws = t["wsum"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "avg_neg_logprob": pa.array(
                np.round(ws / nt, round_digits), type=pa.float64())})

    return agg.map_batches(_fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def _doc_bigram_triples(docs, id_col: str, text_col: str):
    """Map-side-combined position rows for the bigram LM: one row per
    distinct (doc, prev, w) transition per block with its occurrence
    count ``k``. First-token positions carry ``prev=''`` (the sentinel
    can never be a token — empty tokens are dropped), so the downstream
    hash joins never see null keys. Fully vectorized: one Arrow split +
    dictionary-encode per block, transitions combined via np.unique
    over (doc, prev_code, w_code) composite codes."""

    def _fn(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(pc.utf8_trim_whitespace(texts), "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        counts0 = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ndocs = len(counts0)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(ndocs), counts0)[nonempty]
        enc = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        # vocab code 0 is reserved for the '' sentinel -> shift by 1
        w = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64) + 1
        n = len(w)
        prev = np.zeros(n, dtype=np.int64)
        if n > 1:
            same = doc_of[1:] == doc_of[:-1]
            prev[1:][same] = w[:-1][same]
        V = len(vocab) + 1
        codes = (doc_of * V + prev) * V + w
        uniq, k = np.unique(codes, return_counts=True)
        wi = uniq % V
        pi = (uniq // V) % V
        di = (uniq // V // V).astype(np.int64)
        sent = pa.concat_arrays([pa.array([""], type=vocab.type), vocab])
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.table({
            id_col: ids.take(pa.array(di)),
            "prev": sent.take(pa.array(pi)),
            "w": sent.take(pa.array(wi)),
            "k": pa.array(k, type=pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        _fn, batch_format="pyarrow", zero_copy_batch=True)


def _score_broadcast(triples, uni, bi, *, id_col, idt, total, alpha,
                     round_digits):
    """Small-model scoring path for :func:`bigram_backoff_logprob`:
    the unigram/bigram model tables (already reduced by their two
    count shuffles) are ``ray.put`` once and probed per batch with
    ``pc.index_in`` inside an actor pool — same arithmetic as the
    join path's ``_nlp``, same output schema, minus three joins and
    their solidify stages. Callers gate this on total model rows."""
    import ray
    from ray.data.aggregate import Sum
    from kettleray.context import auto_pool

    def _concat(ds, schema: pa.Schema) -> pa.Table:
        # Ray's hash shuffle emits schema-LESS empty blocks in the tiny
        # regime (same repair _solidify_small does for the join path)
        tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        if not tabs:
            return schema.empty_table()
        return pa.concat_tables([t.cast(schema) for t in tabs]) \
            .combine_chunks()

    uni_t = _concat(uni, pa.schema(
        [("w", pa.string()), ("c_w", pa.int64())]))
    bi_t = _concat(bi.materialize(), pa.schema(
        [("pw", pa.string()), ("c_pw", pa.int64())]))
    ref = ray.put((uni_t, bi_t))

    class _Score:
        def __init__(self):
            u, b = ray.get(ref)
            self.uw = u["w"].combine_chunks() \
                if isinstance(u["w"], pa.ChunkedArray) else u["w"]
            self.ucw = u["c_w"].to_numpy(
                zero_copy_only=False).astype(np.float64)
            self.bpw = b["pw"].combine_chunks() \
                if isinstance(b["pw"], pa.ChunkedArray) else b["pw"]
            self.bcp = b["c_pw"].to_numpy(
                zero_copy_only=False).astype(np.float64)

        @staticmethod
        def _lookup(keys, dict_arr, vals: "np.ndarray") -> "np.ndarray":
            idx = pc.index_in(keys, value_set=dict_arr)
            miss = pc.is_null(idx).to_numpy(zero_copy_only=False)
            ii = pc.fill_null(idx, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
            out = vals[ii]
            out[miss] = np.nan
            return out

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({
                    id_col: pa.array([], type=idt),
                    "k": pa.array([], type=pa.float64()),
                    "knlp": pa.array([], type=pa.float64())})
            k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
            cw = self._lookup(t["w"], self.uw, self.ucw)
            pw = pc.binary_join_element_wise(t["prev"], t["w"], "\x1f")
            cpw = self._lookup(pw, self.bpw, self.bcp)
            cprev = self._lookup(t["prev"], self.uw, self.ucw)
            first = pc.equal(t["prev"], "").to_numpy(
                zero_copy_only=False)
            seen = ~np.isnan(cpw) & ~first
            nlp = np.empty(len(k), dtype=np.float64)
            nlp[:] = np.log(total) - np.log(cw)
            nlp[~first & ~seen] -= np.log(alpha)
            if seen.any():
                nlp[seen] = np.log(cprev[seen]) - np.log(cpw[seen])
            return pa.table({
                id_col: t[id_col],
                "k": pa.array(k, type=pa.float64()),
                "knlp": pa.array(k * nlp, type=pa.float64())})

    parts = triples.map_batches(_Score, batch_format="pyarrow",
                                zero_copy_batch=True,
                                concurrency=auto_pool())
    agg = parts.groupby(id_col).aggregate(
        Sum("k", alias_name="n_tokens_f"),
        Sum("knlp", alias_name="sum_nlp"))

    def _fin(t: pa.Table) -> pa.Table:
        nt = t["n_tokens_f"].to_numpy(zero_copy_only=False)
        s = t["sum_nlp"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(nt.astype(np.int64)),
            "avg_neg_logprob": pa.array(
                np.round(s / nt, round_digits), type=pa.float64())})

    return agg.map_batches(_fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def bigram_backoff_logprob(docs, id_col: str, text_col: str, *,
                           alpha: float = 0.4,
                           num_partitions: int = 16,
                           round_digits: int = 6,
                           broadcast_limit: int = 4_000_000):
    """CCNet/DataComp-style language-model perplexity filter, bigram
    Stupid Backoff (Brants et al. 2007) trained on the corpus itself:

    - first token of a doc:      p = c(w) / T
    - bigram seen in corpus:     p = c(prev, w) / c(prev)
    - unseen bigram (backoff):   p = alpha * c(w) / T

    Returns (doc_id, n_tokens, avg_neg_logprob) — the per-doc mean
    negative natural log-probability (high = improbable/garbled text,
    the classic quality-filtering signal; exp() of it is the
    perplexity). Empty docs are excluded.

    Scale shape: position rows are map-side combined to distinct
    (doc, prev, w) transitions with counts; unigram and bigram model
    tables are built with ONE word-keyed and ONE pair-keyed shuffle of
    combined partials; scoring attaches the three needed counts with
    three hash-partitioned joins (model tables are corpus-vocabulary
    sized and NEVER broadcast or driver-materialized above
    ``broadcast_limit`` rows — only the scalar total T crosses the
    driver); per-doc reduction is one native doc-keyed aggregate.

    Below ``broadcast_limit`` total model rows (unigrams + distinct
    transitions) the three scoring joins collapse into one actor-pool
    lookup pass against ``ray.put`` model tables — the same documented
    small-side gate as incdedup's 200k-band-row commit bypass (at bench
    scale the join path is pure per-stage spawn overhead; at lake scale
    the gate keeps the shuffle-join path in charge)."""
    import ray
    from ray.data.aggregate import Sum

    triples = _doc_bigram_triples(docs, id_col, text_col).materialize()

    uni = triples.groupby("w").aggregate(Sum("k", alias_name="c_w"))
    uni = uni.materialize()
    total = float(uni.aggregate(Sum("c_w", alias_name="t"))["t"])

    def _pair_key(t: pa.Table) -> pa.Table:
        return t.append_column(
            "pw", pc.binary_join_element_wise(t["prev"], t["w"], "\x1f"))

    def _bi_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["prev"], ""))
        return _pair_key(t).select(["pw", "k"])

    bi = triples.map_batches(_bi_rows, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("pw").aggregate(Sum("k", alias_name="c_pw"))

    # tiny-regime repair: Ray's hash shuffle emits schema-less empty
    # blocks that acero joins reject; _solidify_small rebuilds small
    # datasets as one schema'd block INSIDE a Ray task and is a no-op
    # pass-through above its row threshold (see incdedup)
    from kettleray.ops.incdedup import _solidify_small
    idt = pa.schema(triples.schema().base_schema).field(id_col).type \
        if hasattr(triples.schema(), "base_schema") else pa.int64()
    s_str, s_i64 = pa.string(), pa.int64()

    n_transitions = triples.count()
    uni_rows = uni.count()
    if uni_rows + n_transitions <= broadcast_limit:
        return _score_broadcast(triples, uni, bi, id_col=id_col,
                                idt=idt, total=total, alpha=alpha,
                                round_digits=round_digits)

    uni = _solidify_small(uni, schema=pa.schema(
        [("w", s_str), ("c_w", s_i64)]),
        num_partitions=num_partitions)
    bi = _solidify_small(bi, schema=pa.schema(
        [("pw", s_str), ("c_pw", s_i64)]),
        num_partitions=num_partitions)

    base_fields = [(id_col, idt), ("prev", s_str), ("w", s_str),
                   ("k", s_i64), ("pw", s_str)]
    scored = triples.map_batches(_pair_key, batch_format="pyarrow",
                                 zero_copy_batch=True)
    scored = scored.join(bi, join_type="left_outer", on=("pw",),
                         num_partitions=num_partitions)
    scored = _solidify_small(scored, schema=pa.schema(
        base_fields + [("c_pw", s_i64)]),
        num_partitions=num_partitions)
    scored = scored.join(
        uni.rename_columns({"w": "prev", "c_w": "c_prev"}),
        join_type="left_outer", on=("prev",),
        num_partitions=num_partitions)
    scored = _solidify_small(scored, schema=pa.schema(
        base_fields + [("c_pw", s_i64), ("c_prev", s_i64)]),
        num_partitions=num_partitions)
    scored = scored.join(uni, join_type="inner", on=("w",),
                         num_partitions=num_partitions)

    def _nlp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            # schema of empty blocks must agree with non-empty ones at
            # the downstream groupby — use the REAL id type, not int64
            return pa.table({
                id_col: pa.array([], type=idt),
                "k": pa.array([], type=pa.float64()),
                "knlp": pa.array([], type=pa.float64())})
        k = t["k"].to_numpy(zero_copy_only=False).astype(np.float64)
        cw = t["c_w"].to_numpy(zero_copy_only=False).astype(np.float64)
        cpw = t["c_pw"].to_numpy(zero_copy_only=False)
        cprev = t["c_prev"].to_numpy(zero_copy_only=False)
        first = pc.equal(t["prev"], "").to_numpy(zero_copy_only=False)
        seen = ~np.isnan(cpw.astype(np.float64)) & ~first
        nlp = np.empty(len(k), dtype=np.float64)
        # first token AND backoff share the unigram term
        nlp[:] = np.log(total) - np.log(cw)
        nlp[~first & ~seen] -= np.log(alpha)
        if seen.any():
            nlp[seen] = (np.log(cprev.astype(np.float64)[seen])
                         - np.log(cpw.astype(np.float64)[seen]))
        return pa.table({
            id_col: t[id_col],
            "k": pa.array(k, type=pa.float64()),
            "knlp": pa.array(k * nlp, type=pa.float64())})

    parts = scored.map_batches(_nlp, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = parts.groupby(id_col).aggregate(
        Sum("k", alias_name="n_tokens_f"),
        Sum("knlp", alias_name="sum_nlp"))

    def _fin(t: pa.Table) -> pa.Table:
        nt = t["n_tokens_f"].to_numpy(zero_copy_only=False)
        s = t["sum_nlp"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(nt.astype(np.int64)),
            "avg_neg_logprob": pa.array(
                np.round(s / nt, round_digits), type=pa.float64())})

    return agg.map_batches(_fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def bm25_scores(docs, query: str, id_col: str, text_col: str, *,
                k1: float = 1.2, b: float = 0.75,
                round_digits: int = 6):
    """BM25 relevance of every document against ONE query string
    (Robertson/Lucene idf variant: ln((N - df + .5)/(df + .5) + 1)) —
    the retrieval-scoring primitive for data curation (query-targeted
    corpus slicing) and RAG-style selection.

    Scale shape: tf AND doc length come out of the same vectorized
    per-block kernel (a doc is one row — no shuffle to compute dl);
    only rows matching the query's terms survive the block (output ∝
    matching docs x query terms, never corpus tokens); df per term is a
    |query|-sized aggregate; N and avgdl are two scalars. The final
    per-doc sum is the ONLY shuffle, keyed on doc_id over the filtered
    rows. The query-term table is broadcast by contract (queries are
    human-sized)."""
    import ray
    from ray.data.aggregate import Sum

    terms = sorted({w for w in query.lower().split() if w})
    if not terms:
        raise ValueError("bm25_scores: empty query")
    term_arr = pa.array(terms, type=pa.string())

    def _tf_dl(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(pc.utf8_trim_whitespace(texts), "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        counts0 = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ndocs = len(counts0)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(ndocs), counts0)[nonempty]
        dl = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        enc = pc.dictionary_encode(flat.filter(pa.array(nonempty)))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary
        is_q = pc.is_in(vocab, value_set=term_arr).to_numpy(
            zero_copy_only=False)
        widx = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        mask = is_q[widx] if len(widx) else np.zeros(0, bool)
        codes = doc_of[mask] * len(vocab) + widx[mask]
        uniq, tf = np.unique(codes, return_counts=True)
        di = (uniq // max(len(vocab), 1)).astype(np.int64)
        wi = (uniq % max(len(vocab), 1)).astype(np.int64)
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        return pa.table({
            id_col: ids.take(pa.array(di)),
            "word": vocab.take(pa.array(wi)),
            "tf": pa.array(tf, type=pa.int64()),
            "dl": pa.array(dl[di], type=pa.int64())})

    def _stats(t: pa.Table) -> pa.Table:
        # N and avgdl: per-block scalar partials (token counting only —
        # no dictionary encode), summed in one scalar-sized aggregate
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(pc.utf8_trim_whitespace(texts), "")
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = pc.list_flatten(toks)
        ntok = int(pc.sum(pc.cast(pc.not_equal(flat, ""),
                                  pa.int64())).as_py() or 0)
        # trimmed != "" <=> the doc has >= 1 non-empty token; avgdl must
        # average dl over THESE docs only (the oracle's avg(dl) never
        # sees a zero-token doc — dl rows exist only for tok2 hits)
        nne = int(pc.sum(pc.cast(pc.not_equal(texts, ""),
                                 pa.int64())).as_py() or 0)
        return pa.table({"n_docs": pa.array([t.num_rows],
                                            type=pa.int64()),
                         "n_tokens": pa.array([ntok], type=pa.int64()),
                         "n_nonempty": pa.array([nne],
                                                type=pa.int64())})

    sel = docs.select_columns([id_col, text_col])
    idt = pa.schema(sel.schema().base_schema).field(id_col).type \
        if hasattr(sel.schema(), "base_schema") else pa.int64()
    rows = sel.map_batches(_tf_dl, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    st = sel.map_batches(_stats, batch_format="pyarrow",
                         zero_copy_batch=True).aggregate(
        Sum("n_docs", alias_name="n"),
        Sum("n_tokens", alias_name="tok"),
        Sum("n_nonempty", alias_name="ne"))
    n_docs = float(st["n"])
    avgdl = float(st["tok"]) / max(float(st["ne"]), 1.0)

    df_rows = rows.groupby("word").aggregate(
        ray.data.aggregate.Count(alias_name="df")).take_all()
    idf = {r["word"]: float(np.log(
        (n_docs - r["df"] + 0.5) / (r["df"] + 0.5) + 1.0))
        for r in df_rows}

    def _score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], type=idt),
                             "part": pa.array([], type=pa.float64())})
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t["word"].to_pylist()
        iv = np.array([idf[x] for x in w], dtype=np.float64)
        part = iv * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: t[id_col],
                         "part": pa.array(part, type=pa.float64())})

    parts = rows.map_batches(_score, batch_format="pyarrow",
                             zero_copy_batch=True)
    agg = parts.groupby(id_col).aggregate(
        Sum("part", alias_name="s"))

    def _fin(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: t[id_col],
                         "bm25": pa.array(np.round(s, round_digits),
                                          type=pa.float64())})

    return agg.map_batches(_fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def _hashed_bucket_counts(docs, id_col: str, text_col: str,
                          num_buckets: int):
    """Dense token counts over ``num_buckets`` md5-hashed feature
    buckets (the DSIR fixed-size feature space): per block, tokens are
    dictionary-encoded, md5 is taken ONCE PER UNIQUE vocab word, and a
    weighted bincount folds the block to <= num_buckets sparse partial
    rows; one bucket-keyed groupby reduces to the final <= num_buckets
    rows. Returns (dense float64 vector, total_tokens) — bounded by
    construction, never corpus-sized."""
    import hashlib

    import numpy as np
    from ray.data.aggregate import Sum

    pairs = doc_word_pairs(docs, id_col, text_col)

    def _partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int64()),
                             "n": pa.array([], type=pa.int64())})
        enc = t["word"].combine_chunks() if isinstance(
            t["word"], pa.ChunkedArray) else t["word"]
        enc = pc.dictionary_encode(enc)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vb = np.array([int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
                       % num_buckets for w in enc.dictionary.to_pylist()],
                      dtype=np.int64)
        b = vb[enc.indices.to_numpy(zero_copy_only=False)]
        tf = t["tf"].to_numpy(zero_copy_only=False)
        dense = np.bincount(b, weights=tf, minlength=num_buckets)
        nz = np.nonzero(dense)[0]
        return pa.table({"bucket": pa.array(nz, type=pa.int64()),
                         "n": pa.array(dense[nz].astype(np.int64))})

    partials = pairs.map_batches(_partial, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
    rows = partials.groupby("bucket").aggregate(
        Sum("n", alias_name="n")).take_all()
    dense = np.zeros(num_buckets, dtype=np.float64)
    for r in rows:
        if r.get("bucket") is not None:
            dense[int(r["bucket"])] = float(r["n"])
    return dense, float(dense.sum())


def dsir_score(docs, target, id_col: str, text_col: str, *,
               num_buckets: int = 4096, round_digits: int = 6):
    """DSIR importance weight (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per doc the mean
    log-likelihood ratio of its tokens under the TARGET domain's hashed
    unigram model vs the raw corpus's — the score you resample by to
    tilt a 100-TB crawl toward a small high-quality target set.

    Features are md5-hashed into ``num_buckets`` buckets (the paper's
    fixed-size hashed n-gram trick: count vectors are O(num_buckets)
    regardless of corpus size), Laplace +1 smoothed:
    ``llr(w) = ln((c_t[b]+1)/(T_t+B)) - ln((c_c[b]+1)/(T_c+B))``.

    Scale shape: both count vectors reduce through a bucket-keyed
    groupby to <= ``num_buckets`` rows (driver-bounded by construction);
    the dense llr vector broadcasts once via ``ray.put``; scoring is a
    bincount-gather per block + one doc-keyed native sum."""
    import hashlib

    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    cc, tot_c = _hashed_bucket_counts(docs, id_col, text_col, num_buckets)
    ct, tot_t = _hashed_bucket_counts(target, id_col, text_col,
                                      num_buckets)
    llr = (np.log(ct + 1.0) - np.log(tot_t + num_buckets)) \
        - (np.log(cc + 1.0) - np.log(tot_c + num_buckets))
    lref = ray.put(llr)

    pairs = doc_word_pairs(docs, id_col, text_col)

    def _score(t: pa.Table) -> pa.Table:
        lv = ray.get(lref)
        enc = t["word"].combine_chunks() if isinstance(
            t["word"], pa.ChunkedArray) else t["word"]
        enc = pc.dictionary_encode(enc)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vb = np.array([int(hashlib.md5(w.encode()).hexdigest()[:16], 16)
                       % num_buckets for w in enc.dictionary.to_pylist()],
                      dtype=np.int64) if len(enc.dictionary) else \
            np.zeros(0, dtype=np.int64)
        b = vb[enc.indices.to_numpy(zero_copy_only=False)] \
            if t.num_rows else np.zeros(0, dtype=np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({id_col: t[id_col], "tf": t["tf"],
                         "w": pa.array(tf * lv[b], type=pa.float64())})

    scored = pairs.map_batches(_score, batch_format="pyarrow",
                               zero_copy_batch=True)
    agg = scored.groupby(id_col).aggregate(
        Sum("tf", alias_name="n_tokens"), Sum("w", alias_name="wsum"))

    def _fin(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "dsir_logratio": pa.array([], type=pa.float64())})
        nt = t["n_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ws = t["wsum"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "dsir_logratio": pa.array(
                np.round(ws / nt, round_digits), type=pa.float64())})

    return agg.map_batches(_fin, batch_format="pyarrow",
                           zero_copy_batch=True)


def ngram_counts(ds, text_col: str, n: int = 2, *, lowercase: bool = True,
                 sep: str = " ", num_partitions: int = 16):
    """Distributed word n-gram counting (LM/data-quality staple).

    Same scale shape as ``word_counts``: per-batch PARTIAL n-gram counts
    (rolling join over the flat token stream — Arrow slices +
    binary_join_element_wise, a same-document mask kills grams that
    span documents; then value_counts as the map-side combiner), then
    ONE n-gram-hash shuffle summing partials. Shuffle volume is bounded
    by distinct n-grams per block, never by token count."""
    import numpy as np
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return word_counts(ds, text_col, lowercase=lowercase,
                           num_partitions=num_partitions) \
            .map_batches(lambda t: t.rename_columns(["ngram", "n"]),
                         batch_format="pyarrow", zero_copy_batch=True)

    def _partial(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if lowercase:
            col = pc.utf8_lower(col)
        toks = pc.utf8_split_whitespace(
            pc.fill_null(pc.utf8_trim_whitespace(col), ""))
        counts = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        m = len(flat) - n + 1
        empty = pa.table({"ngram": pa.array([], type=pa.string()),
                          "n": pa.array([], type=pa.int64())})
        if m <= 0:
            return empty
        parts = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, sep)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        same_doc = doc_of[:m] == doc_of[n - 1:]
        grams = grams.filter(pa.array(same_doc))
        if len(grams) == 0:
            return empty
        vc = grams.value_counts()
        return pa.table({"ngram": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    shuffled = partials.repartition(num_partitions, keys=["ngram"])

    def _sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        import numpy as np
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, ["ngram"])
        cnt = _col_np(t, "n")
        order = np.argsort(codes, kind="stable")
        sk = codes[order]
        run_start = np.empty(len(sk), dtype=bool)
        run_start[0] = True
        run_start[1:] = sk[1:] != sk[:-1]
        starts = np.nonzero(run_start)[0]
        sums = np.add.reduceat(cnt[order], starts)
        reps = t.take(pa.array(order[starts], type=pa.int64()))
        return pa.table({"ngram": reps["ngram"],
                         "n": pa.array(sums, type=pa.int64())})

    return shuffled.map_batches(_sum, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
