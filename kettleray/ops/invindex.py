"""Persisted inverted text index over a document corpus.

Same storage idea as the ANN index (similarity.write_ann_index): posting
rows (word, doc_id, tf) written as Parquet PARTITIONED BY a word-hash
shard, so a term query reads ONLY its terms' shard directories —
partition pruning at the storage layer, scan fraction ≈ terms/shards.
At 100 TB the index build is one tokenize pass + one shard-keyed
shuffle-free partitioned write; queries never touch the corpus.
"""

from __future__ import annotations

import glob
import json
import os
import zlib
from typing import Sequence

import pyarrow as pa

import ray.data


def _word_shard(words, num_shards: int):
    """Stable shard id per word (crc32, process-independent), computed
    once per UNIQUE word via dictionary encoding."""
    import numpy as np
    import pyarrow.compute as pc
    enc = pc.dictionary_encode(
        words.combine_chunks() if isinstance(words, pa.ChunkedArray)
        else words)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    vocab = enc.dictionary.to_pylist()
    sh = np.fromiter((zlib.crc32(w.encode("utf-8")) % num_shards
                      for w in vocab),
                     dtype=np.int64, count=len(vocab))
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return sh[idx] if len(vocab) else sh[:0]


def write_inverted_index(docs, root: str, id_col: str, text_col: str, *,
                         num_shards: int = 64) -> dict:
    """Build and persist the index: tokenize -> (word, doc, tf) posting
    rows -> shard by crc32(word) -> partitioned Parquet + index.json."""
    from kettleray.ops.textstats import doc_word_pairs

    def _shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "shard", pa.array(_word_shard(t["word"], num_shards)))

    pairs = doc_word_pairs(docs, id_col, text_col) \
        .map_batches(_shard, batch_format="pyarrow", zero_copy_batch=True)
    os.makedirs(root, exist_ok=True)
    pairs.write_parquet(root, partition_cols=["shard"])
    meta = {"num_shards": num_shards, "id_col": id_col,
            "text_col": text_col}
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump(meta, f)
    return meta


def query_inverted_index(root: str, terms: Sequence[str], *,
                         mode: str = "and"):
    """Docs matching the terms (``mode='and'``: all terms; ``'or'``: any),
    with summed tf. Reads ONLY the terms' shard directories (returns
    (result_dataset, n_files_read, n_files_total)); the matched posting
    subset is then a distinct-count groupby over doc_id."""
    import pyarrow.compute as pc
    with open(os.path.join(root, "index.json")) as f:
        meta = json.load(f)
    id_col = meta["id_col"]
    terms = sorted({t.lower() for t in terms})
    shards = sorted({zlib.crc32(w.encode("utf-8")) % meta["num_shards"]
                     for w in terms})
    files = []
    for s in shards:
        files.extend(sorted(glob.glob(
            os.path.join(root, f"shard={s}", "*.parquet"))))
    total = len(glob.glob(os.path.join(root, "shard=*", "*.parquet")))
    if not files:
        empty = ray.data.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "n_terms": pa.array([], pa.int64()),
            "sum_tf": pa.array([], pa.int64())}))
        return empty, 0, total

    term_set = pa.array(terms)

    def _match(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["word"], value_set=term_set))

    matched = ray.data.read_parquet(files, columns=[id_col, "word", "tf"]) \
        .map_batches(_match, batch_format="pyarrow", zero_copy_batch=True)
    from ray.data.aggregate import Count, Sum
    agg = matched.groupby(id_col).aggregate(
        Count(alias_name="n_terms"), Sum("tf", alias_name="sum_tf"))
    if mode == "and":
        need = len(terms)
        agg = agg.map_batches(
            lambda t: t.filter(pc.equal(t["n_terms"], need)),
            batch_format="pyarrow", zero_copy_batch=True)
    return agg, len(files), total
