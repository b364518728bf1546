"""Distributed clustering over embedding columns (training-data
curation: SemDeDup-style cluster-then-prune, domain balancing).

Ray-Data-first k-means: the DATA never leaves the Dataset — each Lloyd's
iteration is one streaming pass of ``map_batches`` producing per-block
partial sums (k x d + counts, a few KB per block); only those partials
and the k x d centroid matrix ever touch the driver. Centroids are
broadcast via ``ray.put`` once per iteration and fetched once per actor
(``__init__``), not re-shipped per batch. At 10^8 vectors x 1k dims the
per-iteration driver traffic is k*d*blocks floats — independent of N.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from kettleray.ops.similarity import _to_matrix


def _assign_ids(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c ||x - c||^2 per row, float64, ties -> lowest cluster id
    (numpy argmin takes the first minimum)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
    d2 = -2.0 * (m @ cents.T) + (cents * cents).sum(axis=1)[None, :]
    return np.argmin(d2, axis=1).astype(np.int32)


class _Assigner:
    """Actor-pool stage: centroid matrix fetched from the object store
    ONCE per actor, batches assigned vectorized."""

    def __init__(self, cents_ref, vec_col: str, out_col: str):
        self.cents = ray.get(cents_ref)
        self.vec_col, self.out_col = vec_col, out_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(self.out_col,
                                   pa.array([], type=pa.int32()))
        ids = _assign_ids(_to_matrix(t[self.vec_col]), self.cents)
        return t.append_column(self.out_col, pa.array(ids))


def kmeans_assign(ds: "ray.data.Dataset", vec_col: str,
                  centroids: np.ndarray, *, out_col: str = "cluster",
                  concurrency=None) -> "ray.data.Dataset":
    """Assign every vector to its nearest centroid (squared L2,
    deterministic lowest-id tie-break). Centroids broadcast once."""
    cents = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(cents)
    from kettleray.context import auto_pool
    return ds.map_batches(_Assigner, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=concurrency or auto_pool(),
                          fn_constructor_args=(ref, vec_col, out_col))


def kmeans_fit(ds: "ray.data.Dataset", vec_col: str, k: int, *,
               n_iter: int = 10, id_col: str | None = None,
               init_ids: Sequence[int] | None = None,
               tol: float = 0.0) -> np.ndarray:
    """Lloyd's k-means over a Dataset; returns the (k, d) centroid
    matrix. Deterministic init: the k rows with the smallest ``id_col``
    values (or ``init_ids``) — reproducible under any partitioning,
    unlike sampling. Each iteration = ONE streaming pass emitting
    per-block (k x d) partial sums; no shuffle at all."""
    if id_col is None:
        raise ValueError("id_col required for deterministic init")
    want = list(init_ids) if init_ids is not None else None

    def _seed(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if want is not None:
            m = pc.is_in(t[id_col], value_set=pa.array(want))
            return t.filter(m).select([id_col, vec_col])
        return t.select([id_col, vec_col])

    if want is not None:
        seed_t = pa.Table.from_pylist(
            ds.map_batches(_seed, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
        ).sort_by(id_col)
        cents = _to_matrix(seed_t[vec_col])[:k]
    else:
        # k smallest ids: per-block partial top-k (ascending), tiny merge
        from kettleray.ops.aggregates import top_k
        small = top_k(ds.select_columns([id_col, vec_col]), id_col, k,
                      descending=False)
        seed_t = pa.Table.from_pylist(small.take_all()).sort_by(id_col)
        cents = _to_matrix(seed_t[vec_col])[:k]
    if cents.shape[0] < k:
        raise ValueError(f"need >= {k} seed rows, got {cents.shape[0]}")

    d = cents.shape[1]

    for _ in range(n_iter):
        ref = ray.put(cents)

        def _partial(t: pa.Table) -> pa.Table:
            c = ray.get(ref)
            m = _to_matrix(t[vec_col])
            if m.size == 0:
                return pa.table({"cluster": pa.array([], type=pa.int32()),
                                 "n": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.list_(
                                     pa.float64()))})
            ids = _assign_ids(m, c)
            sums = np.zeros((c.shape[0], m.shape[1]))
            np.add.at(sums, ids, m)
            counts = np.bincount(ids, minlength=c.shape[0])
            return pa.table({
                "cluster": pa.array(np.arange(c.shape[0]),
                                    type=pa.int32()),
                "n": pa.array(counts.astype(np.int64)),
                "s": pa.array(list(sums)),
            })

        parts = ds.map_batches(_partial, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        new = cents.copy()                 # empty cluster keeps centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        shift = float(np.abs(new - cents).max())
        cents = new
        if shift <= tol:
            break
    return cents
