"""Sequence packing: lay a document corpus end-to-end into fixed-length
token windows — the final pre-training data-prep step (every LLM trainer
consumes packed sequences, not raggedy documents; cf. GPT-2/T5-style
"concatenate then chunk" packing).

No Kettle analog (this is LLM-ops scope beyond the reference, like
kettleray.ops.dedup); the nearest reference concept is the
single-threaded row counter of `Add sequence`
(engine/steps/addsequence/AddSequence.java), generalised here to a
distributed weighted prefix sum.

Scale shape: ONE sort by doc id (packing is order-defined — the
documented exception to pure streaming, SURVEY.md §7.4), then the
per-block offset trick shared with rowops.add_sequence: the driver sees
ONE integer per block (the block's token sum), computes exclusive block
offsets, and per-block remote tasks do the in-block cumsum — no
corpus-sized bytes ever transit the driver, and the token counting is a
vectorized Arrow kernel.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def pack_sequences(docs, id_col: str, text_col: str, *, seq_len: int,
                   mode: str = "whitespace"):
    """Assign each document its token span in the packed stream: docs are
    concatenated in ascending ``id_col`` order and chunked into windows
    of ``seq_len`` tokens; a document may straddle windows. Returns one
    row per INPUT doc: ``(id_col, n_tokens, start_token, seq_first,
    seq_last)`` — ``seq_first``/``seq_last`` are the first/last window
    ids the doc's tokens land in (a zero-token doc sits at its boundary:
    ``seq_last = seq_first - 1``, i.e. it occupies no window).

    Tokens = whitespace words (``mode='whitespace'``, matches
    textstats.token_count) or the BPE-ish regex (``mode='bpe'``).
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    from kettleray.ops.textstats import BPE_TOKEN_PATTERN

    def _count(t: pa.Table) -> pa.Table:
        if mode == "bpe":
            n = pc.count_substring_regex(t[text_col],
                                         pattern=BPE_TOKEN_PATTERN)
        else:
            trimmed = pc.utf8_trim_whitespace(
                pc.fill_null(t[text_col], ""))
            parts = pc.split_pattern_regex(trimmed, pattern=r"\s+")
            n = pc.list_value_length(parts)
            # Arrow splits "" into [""] (one empty token) just like
            # DuckDB's regexp_split_to_array — both count 1; a truly
            # whitespace-only doc also counts 1. Consistent, documented.
        return pa.table({id_col: t[id_col],
                         "n_tokens": pc.cast(n, pa.int64())})

    counts = docs.map_batches(_count, batch_format="pyarrow",
                              zero_copy_batch=True)
    # Sort fixes the global order; materialize fixes block boundaries so
    # the sum pass and the numbering pass see identical blocks. The
    # materialized set is (id, n_tokens) — per-doc METADATA, ~16 B/doc,
    # not corpus text.
    srt = counts.sort([id_col]).materialize()
    blocks = []
    for b in srt.iter_internal_ref_bundles():
        for ref, _meta in b.blocks:
            blocks.append(ref)

    @ray.remote
    def _block_sum(t: pa.Table) -> int:
        return int(pc.sum(t["n_tokens"]).as_py() or 0)

    sums = ray.get([_block_sum.remote(r) for r in blocks])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]) \
        if sums else np.zeros(0, dtype=np.int64)

    @ray.remote
    def _number(t: pa.Table, offset: int) -> pa.Table:
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        start = offset + np.concatenate([[0], np.cumsum(n)[:-1]]) \
            if len(n) else np.zeros(0, dtype=np.int64)
        start = start.astype(np.int64)
        seq_first = start // seq_len
        seq_last = (start + np.maximum(n, 1) - 1) // seq_len
        # zero-token docs occupy no window: seq_last = seq_first - 1
        seq_last = np.where(n == 0, seq_first - 1, seq_last)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "start_token": pa.array(start, type=pa.int64()),
            "seq_first": pa.array(seq_first, type=pa.int64()),
            "seq_last": pa.array(seq_last, type=pa.int64())})

    out = [_number.remote(r, int(o)) for r, o in zip(blocks, offsets)]
    return ray.data.from_arrow_refs(out)


def pack_stats(packed, *, seq_len: int) -> pa.Table:
    """Corpus-level packing report from a ``pack_sequences`` result:
    total tokens, window count, boundary-straddling docs and the fill
    ratio of the final window — the sanity row a data-prep run logs.
    Driver gets one row (aggregates computed Dataset-side)."""
    def _flags(t: pa.Table) -> pa.Table:
        s = pc.sum(pc.cast(pc.greater(t["seq_last"], t["seq_first"]),
                           pa.int64())).as_py() or 0
        return pa.table({"straddle": pa.array([s], type=pa.int64())})

    total = int(packed.sum("n_tokens") or 0)
    n_seqs = (total + seq_len - 1) // seq_len
    straddle = int(packed.map_batches(
        _flags, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None).sum("straddle") or 0)
    tail = total - (n_seqs - 1) * seq_len if n_seqs else 0
    return pa.table({
        "total_tokens": pa.array([total], type=pa.int64()),
        "n_sequences": pa.array([n_seqs], type=pa.int64()),
        "straddling_docs": pa.array([straddle], type=pa.int64()),
        "tail_fill": pa.array([float(tail) / seq_len if n_seqs else 0.0],
                              type=pa.float64())})
