"""Derive a CDC change-event stream deterministically from the driver's
``documents`` test table — in a way DuckDB SQL can reproduce EXACTLY.

This powers the correctness gate: the same derivation exists twice,
(1) here, vectorized over Arrow batches for the Ray pipelines, and
(2) as the ``DERIVED_EVENTS_SQL`` CTE for the DuckDB oracle. Any drift
between the two fails the driver's value-hash compare, so keep them in
lockstep.

Derivation rule (pure function of doc_id / lang / text):
  n_extra   = doc_id % 3                  -> 1..3 events per document
  versions  v = 0 .. n_extra
  repo      = 'repo_' + str(doc_id % 20)
  path      = 'src/doc_' + str(doc_id) + '.txt'
  commit    = md5(repo + '/' + path + '@' + str(v))
  commit_seq= v * 1000000 + doc_id        -> interleaved global order
  delete?   = (v == n_extra) and (n_extra > 0) and (doc_id % 7 == 0)
  op        = 'delete' | 'insert' (v==0) | 'update'
  content   = '' if delete else text + ' [v' + str(v) + ']'
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

N_REPOS = 20
SEQ_STRIDE = 1_000_000


def _derive_batch(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    text = batch["text"].to_pylist()
    lang = batch["lang"].to_pylist()
    n_extra = doc_id % 3

    parts = []
    for v in range(3):
        mask = n_extra >= v
        ids = doc_id[mask]
        if len(ids) == 0:
            continue
        txts = [t for t, m in zip(text, mask) if m]
        lngs = [l for l, m in zip(lang, mask) if m]
        ne = n_extra[mask]
        repo = [f"repo_{i % N_REPOS}" for i in ids]
        path = [f"src/doc_{i}.txt" for i in ids]
        commit = [hashlib.md5(f"{r}/{p}@{v}".encode()).hexdigest()
                  for r, p in zip(repo, path)]
        is_del = (ne == v) & (ne > 0) & (ids % 7 == 0)
        op = ["delete" if d else ("insert" if v == 0 else "update")
              for d in is_del]
        content = ["" if d else f"{t} [v{v}]"
                   for t, d in zip(txts, is_del)]
        seq = v * SEQ_STRIDE + ids
        parts.append(pa.table({
            "repo": pa.array(repo, type=pa.string()),
            "path": pa.array(path, type=pa.string()),
            "commit": pa.array(commit, type=pa.string()),
            "lang": pa.array(lngs, type=pa.string()),
            "content": pa.array(content, type=pa.string()),
            "op": pa.array(op, type=pa.string()),
            "commit_seq": pa.array(seq, type=pa.int64()),
        }))
    if not parts:
        return pa.table({c: pa.array([], type=pa.int64() if c == "commit_seq"
                                     else pa.string())
                         for c in ("repo", "path", "commit", "lang",
                                   "content", "op", "commit_seq")})
    return pa.concat_tables(parts)


def derive_events(sf_dir: str) -> "ray.data.Dataset":
    """documents.parquet -> deterministic change-event Dataset."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text", "lang"])
    return docs.map_batches(_derive_batch, batch_format="pyarrow",
                            zero_copy_batch=True, batch_size=None)


# The EXACT same derivation as ANSI SQL (DuckDB), used as a CTE prefix by
# every CDC oracle query. NB: "commit" is quoted (reserved word).
DERIVED_EVENTS_SQL = """
ev AS (
  SELECT
    'repo_' || CAST(doc_id % 20 AS VARCHAR) AS repo,
    'src/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
    md5('repo_' || CAST(doc_id % 20 AS VARCHAR) || '/src/doc_'
        || CAST(doc_id AS VARCHAR) || '.txt@' || CAST(g.v AS VARCHAR))
      AS "commit",
    lang,
    CASE WHEN g.v = doc_id % 3 AND doc_id % 3 > 0 AND doc_id % 7 = 0
         THEN ''
         ELSE text || ' [v' || CAST(g.v AS VARCHAR) || ']' END AS content,
    CASE WHEN g.v = doc_id % 3 AND doc_id % 3 > 0 AND doc_id % 7 = 0
         THEN 'delete'
         WHEN g.v = 0 THEN 'insert'
         ELSE 'update' END AS op,
    g.v * 1000000 + doc_id AS commit_seq
  FROM documents CROSS JOIN generate_series(0, 2) g(v)
  WHERE g.v <= doc_id % 3
)
"""
