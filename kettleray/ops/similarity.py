"""Similarity search over embedding columns (list<float>).

Baseline: brute-force cosine top-k — query matrix broadcast once
(``ray.put``), per-batch numpy matmul, per-block partial top-k, driver
merge of k·num_blocks candidates (tiny).

Scale path: LSH bucketing (random hyperplane signs) so each query only
scans its bucket — the bucket column also serves as the partition key for
an IVF-style layout on disk.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_matrix(tbl_col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float>/fixed_size_list column
    — zero-copy flat-values reshape when row lengths are uniform (the
    embedding-table invariant), falling back to to_pylist otherwise."""
    col = tbl_col.combine_chunks() if isinstance(tbl_col,
                                                 __import__("pyarrow")
                                                 .ChunkedArray) else tbl_col
    import pyarrow as pa
    if isinstance(col, pa.FixedSizeListArray):
        dim = col.type.list_size
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(len(col), dim).astype(np.float64, copy=False)
    if isinstance(col, (pa.ListArray, pa.LargeListArray)) and len(col):
        offs = col.offsets.to_numpy(zero_copy_only=False)
        lens = np.diff(offs)
        if col.null_count == 0 and len(lens) and (lens == lens[0]).all():
            # flatten() already compensates slice offsets — do NOT
            # re-slice by offs (that double-compensates on sliced
            # arrays and crashes/corrupts)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), int(lens[0])) \
                .astype(np.float64, copy=False)
    return np.asarray(col.to_pylist(), dtype=np.float64)


def cosine_scores(ds, id_col: str, vec_col: str, query: np.ndarray, *,
                  round_to: int = 4):
    """Cosine similarity of every row against ONE query vector (broadcast);
    returns (id, cosine) for all rows — the oracle-checkable core."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    qref = ray.put(q)

    class _Score:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _to_matrix(t[vec_col])
            norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
            sims = (m @ self.q) / norms
            return pa.table({
                id_col: t[id_col],
                "cosine": pa.array(np.round(sims, round_to),
                                   type=pa.float64()),
            })

    from kettleray.context import auto_pool
    return ds.map_batches(_Score, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=auto_pool())


def brute_force_topk(ds, id_col: str, vec_col: str, query: np.ndarray,
                     k: int = 10):
    """Top-k by cosine: per-block partial top-k (numpy argpartition) then a
    driver merge of the tiny candidate set — never a global sort."""
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    qref = ray.put(q)

    def _partial(t: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _to_matrix(t[vec_col])
        if len(m) == 0:
            return pa.table({id_col: pa.array([], type=pa.int64()),
                             "cosine": pa.array([], type=pa.float64())})
        norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
        sims = (m @ qv) / norms
        kk = min(k, len(sims))
        top = np.argpartition(-sims, kk - 1)[:kk]
        ids = np.asarray(t[id_col].to_pylist())
        return pa.table({id_col: pa.array(ids[top], type=pa.int64()),
                         "cosine": pa.array(sims[top], type=pa.float64())})

    cands = ds.map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=None).take_all()
    cands.sort(key=lambda r: (-r["cosine"], r[id_col]))
    return pa.Table.from_pylist(cands[:k])


def lsh_buckets(ds, id_col: str, vec_col: str, *, n_planes: int = 8,
                seed: int = 42, dim: int | None = None,
                out_col: str = "bucket"):
    """Random-hyperplane LSH bucket id per row (IVF-style coarse
    quantization): rows in the same bucket are cosine-close candidates.
    Partitioning the table by this column gives the scale-path ANN layout
    (query → hash → scan one bucket)."""
    if dim is None:
        first = ds.take(1)[0][vec_col]
        dim = len(first)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))
    pref = ray.put(planes)

    class _Bucket:
        def __init__(self):
            self.planes = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _to_matrix(t[vec_col])
            signs = (m @ self.planes) > 0
            bucket = signs @ (1 << np.arange(signs.shape[1]))
            return t.append_column(out_col,
                                   pa.array(bucket.astype(np.int64)))

    from kettleray.context import auto_pool
    return ds.map_batches(_Bucket, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=auto_pool())


def write_ann_index(ds, root: str, id_col: str, vec_col: str, *,
                    n_planes: int = 8, seed: int = 42,
                    dim: int | None = None) -> dict:
    """Persist an IVF-style ANN layout: rows bucketed by random-
    hyperplane LSH and written as Parquet PARTITIONED BY bucket, plus an
    index.json recording (n_planes, seed, dim). A query then reads ONLY
    its probe buckets' files — the scan fraction at query time is
    probes/2^n_planes of the corpus, enforced by partition pruning at
    the storage layer (not a post-read filter)."""
    import json
    import os
    if dim is None:
        dim = len(ds.take(1)[0][vec_col])
    bucketed = lsh_buckets(ds, id_col, vec_col, n_planes=n_planes,
                           seed=seed, dim=dim)
    os.makedirs(root, exist_ok=True)
    bucketed.write_parquet(root, partition_cols=["bucket"])
    meta = {"n_planes": n_planes, "seed": seed, "dim": dim,
            "id_col": id_col, "vec_col": vec_col}
    with open(os.path.join(root, "index.json"), "w") as f:
        json.dump(meta, f)
    return meta


def probe_buckets(query: np.ndarray, *, n_planes: int, seed: int,
                  probe_hamming: int = 1) -> list[int]:
    """Multi-probe bucket ids for a query vector (own bucket + all ids
    within ``probe_hamming`` bit flips)."""
    import itertools
    q = np.asarray(query, dtype=np.float64)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((len(q), n_planes))
    qb = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = {qb}
    for r in range(1, probe_hamming + 1):
        for comb in itertools.combinations(range(n_planes), r):
            b = qb
            for c in comb:
                b ^= 1 << c
            probes.add(b)
    return sorted(probes)


def query_ann_index(root: str, query: np.ndarray, k: int = 10, *,
                    probe_hamming: int = 1):
    """ANN top-k against a written index: partition-pruned read of the
    probe buckets only, then exact cosine re-scoring. Returns
    (result_table, n_files_read, n_files_total)."""
    import glob
    import json
    import os
    with open(os.path.join(root, "index.json")) as f:
        meta = json.load(f)
    probes = probe_buckets(query, n_planes=meta["n_planes"],
                           seed=meta["seed"],
                           probe_hamming=probe_hamming)
    files = []
    for b in probes:
        files.extend(sorted(glob.glob(
            os.path.join(root, f"bucket={b}", "*.parquet"))))
    total = len(glob.glob(os.path.join(root, "bucket=*", "*.parquet")))
    if not files:
        import pyarrow as _pa
        empty = _pa.table({meta["id_col"]: _pa.array([], _pa.int64()),
                           "cosine": _pa.array([], _pa.float64())})
        return empty, 0, total
    subset = ray.data.read_parquet(files)
    res = brute_force_topk(subset, meta["id_col"], meta["vec_col"],
                           query, k=k)
    return res, len(files), total


def lsh_topk(ds, id_col: str, vec_col: str, query: np.ndarray,
             k: int = 10, *, n_planes: int = 8, seed: int = 42,
             probe_hamming: int = 1):
    """ANN top-k: scan only buckets within ``probe_hamming`` bit flips of
    the query's bucket (multi-probe LSH), then exact cosine on the
    scanned subset."""
    q = np.asarray(query, dtype=np.float64)
    dim = len(q)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))
    qb = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = {qb}
    if probe_hamming >= 1:
        for b in range(n_planes):
            probes.add(qb ^ (1 << b))
    bucketed = lsh_buckets(ds, id_col, vec_col, n_planes=n_planes,
                           seed=seed, dim=dim)
    import pyarrow.compute as pc
    probe_arr = pa.array(sorted(probes), type=pa.int64())
    subset = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=probe_arr)),
        batch_format="pyarrow", zero_copy_batch=True)
    return brute_force_topk(subset, id_col, vec_col, query, k=k)
