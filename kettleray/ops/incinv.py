"""Incrementally maintained inverted text index — the CDC x text-search
crossover, completing the incremental-index family (near-dup LSH:
``incdedup``; embedding ANN: ``incann``; term search: this module).

``invindex.write_inverted_index`` is batch-build only: a growing lake
means a full re-tokenize per refresh. This module keeps the word-hash
sharded posting layout as a versioned, hash-bucketed table (the same
COW + hardlink-forward idiom as ``kettleray.io.sink`` / ``incdedup`` /
``incann``), so a commit of B new/updated docs costs O(B postings) —
never O(corpus):

  root/vNNNN/postings/bucket=K/  (word, id, tf, v) rows,
                                 K = crc32(word) % num_shards
  root/vNNNN/lastv/bucket=H/     (id, v) latest-version log, H=hash(id)
  root/vNNNN/deleted/            (id, v) tombstone log
  root/vNNNN/manifest.json, root/CURRENT

Per commit only the posting shards the batch's WORDS hash into receive
new fragment files; everything else hardlinks forward (O(1) per file).
CDC semantics (same contract as incann):

- UPDATE = re-arrival of a doc id: the new text's words land in
  (generally) different shards than the old text's, so staleness can't
  be resolved inside one shard. The ``lastv`` store (id -> max
  committed version, hash-partitioned by id) is the supersede
  authority: a posting row is live iff its v equals the id's latest
  version. Query tasks resolve it with id-bucket-pruned ``is_in``
  reads bounded by the CANDIDATE set (their shard's matched ids),
  never the corpus.
- DELETE = one tombstone row; filtered at read (live iff del_v(id) <
  row v), folded into the data and cleared by ``compact_inverted``.

Query cost = term-shard fragment reads (terms/num_shards of the index,
enforced by partition pruning at the storage layer) + lastv lookups
bounded by the matched posting lists; per-shard tasks return per-doc
PARTIAL (n_terms, sum_tf) aggregates (a word lives in exactly one
shard, so partials never double-count), merged on the driver —
driver work ∝ the queried terms' posting lists, the classic IR bound.

Tokenization is ``textstats.doc_word_pairs`` bit-for-bit (lowercase +
whitespace split), so incremental query results equal the batch
index's and the SQL oracle's.

No Kettle equivalent (reference scope is row-stream transforms).
"""
from __future__ import annotations

import json
import os
import shutil
import time
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from kettleray.ops.incann import (_commit_rename as _ann_commit_rename,
                                  _hardlink_forward, _write_current,
                                  _write_tbl_bucketed)
from kettleray.ops.incdedup import (_bucket_dirs, _del_versions,
                                    _id_bucket, _move_fragments,
                                    _np_col)

POSTING_COLS = ["word", "id", "tf", "v"]


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
    (same rationale as sink/incdedup/incann)."""
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


def _word_shards(words, num_shards: int) -> np.ndarray:
    """Stable shard per word (crc32 of utf-8, process-independent),
    computed once per UNIQUE word via dictionary encoding — identical
    to invindex._word_shard so batch and incremental layouts agree."""
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


def _deleted_map(root: str, v: int | None) -> dict[int, int]:
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
                f"inverted index at {root}: version v{v} was committed "
                f"by a concurrent writer (the index is single-writer) — "
                f"retry the batch; re-upserting is value-idempotent")
        raise


# ------------------------------------------------------------- commit

def apply_incremental_inverted(root: str, docs, *,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               num_shards: int = 64,
                               num_id_buckets: int = 32,
                               num_partitions: int = 8,
                               deletes=None,
                               small_max_rows: int = 200_000) -> dict:
    """One CDC commit against the inverted index: upsert ``docs``
    (inserts AND updates — re-arrival of an id supersedes its old
    postings, across shards), record tombstones for ``deletes``.
    Returns the new manifest. ``docs=None`` commits deletes only.

    Commit cost ∝ the batch's postings: fresh fragments land only in
    the shards the batch's words hash into, fresh lastv fragments only
    in the id-buckets of the batch's doc ids, everything else
    hardlinks forward. Small commits (the trickle case) bypass Dataset
    shuffles entirely (driver-bounded by ``small_max_rows`` posting
    rows); large backfills repartition by shard first so fragments per
    commit stay <= num_shards. Single-writer per root; crash-safe via
    ``_next_version``."""
    from kettleray.ops.textstats import doc_word_pairs

    man = read_manifest(root)
    if man:
        params = man["params"]
        if params["num_shards"] != num_shards or \
                params["num_id_buckets"] != num_id_buckets:
            raise ValueError(f"index at {root} was built with {params}, "
                             f"got num_shards={num_shards} "
                             f"num_id_buckets={num_id_buckets}")
    prev_v = man["version"] if man else None
    v = _next_version(root)
    t0 = time.time()

    del_ids = np.unique(np.asarray(list(deletes), dtype=np.int64)) \
        if deletes is not None else np.empty(0, np.int64)

    bucketed = None
    n_fresh = 0
    n_docs = 0
    if docs is not None:
        if del_ids.size:
            docs = docs.map_batches(
                lambda t: t.filter(pa.array(~np.isin(
                    _np_col(t, id_col), del_ids))),
                batch_format="pyarrow",
                zero_copy_batch=True)   # delete wins same-commit tie

        def _postings(t: pa.Table) -> pa.Table:
            return pa.table({
                "word": t["word"],
                "id": pc.cast(t[id_col], pa.int64()),
                "tf": pc.cast(t["tf"], pa.int64()),
                "v": pa.array(np.full(t.num_rows, v), type=pa.int64()),
                "bucket": pa.array(_word_shards(t["word"], num_shards),
                                   type=pa.int64())})

        bucketed = doc_word_pairs(docs, id_col, text_col).map_batches(
            _postings, batch_format="pyarrow",
            zero_copy_batch=True).materialize()
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
            _write_tbl_bucketed(stage, "postings", v, fresh_t, bnp,
                                POSTING_COLS)
            ids_np = np.unique(_np_col(fresh_t, "id"))
            n_docs = int(ids_np.size)
            lv = pa.table({"id": pa.array(ids_np, type=pa.int64()),
                           "v": pa.array(np.full(ids_np.size, v),
                                         type=pa.int64())})
            _write_tbl_bucketed(stage, "lastv", v, lv,
                                _id_bucket(ids_np, num_id_buckets),
                                ["id", "v"])
        else:
            for bt in bucketed.select_columns(["bucket"]).iter_batches(
                    batch_size=65536, batch_format="pyarrow"):
                touched.update(np.unique(
                    bt["bucket"].to_numpy(zero_copy_only=False))
                    .tolist())
            tmp = os.path.join(stage, "_fresh_postings")
            parts = max(1, min(num_partitions, len(touched)))
            bucketed.repartition(parts, keys=["bucket"]).write_parquet(
                tmp, partition_cols=["bucket"])
            _move_fragments(tmp, stage, "postings", v)
            # per-BLOCK distinct doc ids -> lastv. No global dedup
            # groupby: a doc spanning blocks just writes duplicate
            # (id, v) rows with the SAME v — max-v resolution is
            # unaffected and compaction folds them (and a groupby here
            # would emit zero-column empty blocks that poison the
            # keyed repartition below). n_docs is then an upper bound.
            def _lv(t: pa.Table) -> pa.Table:
                u = np.unique(_np_col(t, "id"))
                return pa.table({
                    "id": pa.array(u, type=pa.int64()),
                    "v": pa.array(np.full(u.size, v), type=pa.int64()),
                    "bucket": pa.array(_id_bucket(u, num_id_buckets),
                                       type=pa.int64())})

            lv = bucketed.map_batches(_lv, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
            n_docs = lv.count()
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
            "params": {"num_shards": num_shards,
                       "num_id_buckets": num_id_buckets,
                       "id_col": id_col, "text_col": text_col},
            "counts": {"new_postings": int(n_fresh),
                       "new_docs": int(n_docs),
                       "deletes": int(del_ids.size)},
            "touched_shards": sorted(touched),
            "write_sec": round(time.time() - t0, 3)}
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        json.dump(man2, f)
    _commit_rename(root, stage, v)
    _write_current(root, v)
    return man2


# -------------------------------------------------------------- query

def _resolve_live(t: pa.Table, vdir: str, dd: dict,
                  num_id_buckets: int) -> pa.Table:
    """Filter posting rows to LIVE ones: not tombstoned, and at the
    doc's latest committed version (lastv reads pruned to the candidate
    ids' buckets — bounded by this shard's matches, never the corpus)."""
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
                li, lvv = _np_col(lt, "id"), _np_col(lt, "v")
                order = np.lexsort((lvv, li))
                li, lvv = li[order], lvv[order]
                last = np.ones(len(li), dtype=bool)
                last[:-1] = li[1:] != li[:-1]
                li, lvv = li[last], lvv[last]
                pos = np.clip(np.searchsorted(li, ids), 0, len(li) - 1)
                latest = np.where(li[pos] == ids, lvv[pos], -1)
                keep &= vs >= latest
    return t.filter(pa.array(keep))


@ray.remote
def _query_shard_task(files: list, vdir: str, terms: list, dd: dict,
                      num_id_buckets: int) -> pa.Table:
    """Per-doc PARTIAL (n_terms, sum_tf) over ONE shard's live matched
    postings. A word lives in exactly one shard, so shard partials
    never double-count a term; duplicate live rows for the same
    (id, word) — redelivered commits — collapse to one term hit with
    summed tf, matching the batch index and the SQL oracle."""
    t = pa.concat_tables([pq.read_table(f) for f in files])
    t = t.filter(pc.is_in(t["word"], value_set=pa.array(terms)))
    if t.num_rows:
        t = _resolve_live(t, vdir, dd, num_id_buckets)
    if t.num_rows == 0:
        return pa.table({"id": pa.array([], type=pa.int64()),
                         "n_terms": pa.array([], type=pa.int64()),
                         "sum_tf": pa.array([], type=pa.int64())})
    ids = _np_col(t, "id")
    enc = pc.dictionary_encode(t["word"].combine_chunks() if isinstance(
        t["word"], pa.ChunkedArray) else t["word"])
    widx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nw = max(len(enc.dictionary), 1)
    tf = _np_col(t, "tf")
    # collapse duplicate (id, word) rows, then count distinct words/doc
    codes = ids * nw + widx
    order = np.argsort(codes, kind="stable")
    sc = codes[order]
    first = np.ones(len(sc), dtype=bool)
    first[1:] = sc[1:] != sc[:-1]
    seg = np.cumsum(first) - 1
    pair_tf = np.bincount(seg, weights=tf[order]).astype(np.int64)
    pair_id = ids[order][first]
    uid, uidx = np.unique(pair_id, return_inverse=True)
    n_terms = np.bincount(uidx, minlength=len(uid)).astype(np.int64)
    sum_tf = np.bincount(uidx, weights=pair_tf,
                         minlength=len(uid)).astype(np.int64)
    return pa.table({"id": pa.array(uid, type=pa.int64()),
                     "n_terms": pa.array(n_terms, type=pa.int64()),
                     "sum_tf": pa.array(sum_tf, type=pa.int64())})


def query_incremental_inverted(root: str, terms, *, mode: str = "and",
                               version: int | None = None):
    """Docs matching ``terms`` against the incremental index
    (``mode='and'``: all terms; ``'or'``: any), with distinct-term count
    and summed tf. Reads ONLY the terms' shard directories (one Ray
    task each). Returns (table(id, n_terms, sum_tf), files_read,
    files_total). Driver merge is ∝ the terms' posting lists."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed inverted index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    terms = sorted({t.lower() for t in terms})
    vdir = _vdir(root, v)
    dd = _deleted_map(root, v)
    by_shard: dict[int, list[str]] = {}
    for w in terms:
        by_shard.setdefault(
            zlib.crc32(w.encode("utf-8")) % p["num_shards"], []).append(w)
    total = len(_bucket_dirs(vdir, "postings"))
    futs, n_read = [], 0
    for s, ws in sorted(by_shard.items()):
        files = _bucket_dirs(vdir, "postings", {s})
        if files:
            n_read += len(files)
            futs.append(_query_shard_task.remote(
                files, vdir, ws, dd, p["num_id_buckets"]))
    empty = pa.table({p["id_col"]: pa.array([], type=pa.int64()),
                      "n_terms": pa.array([], type=pa.int64()),
                      "sum_tf": pa.array([], type=pa.int64())})
    if not futs:
        return empty, 0, total
    parts = [t for t in ray.get(futs) if t.num_rows]
    if not parts:
        return empty, n_read, total
    cand = pa.concat_tables(parts)
    ids = _np_col(cand, "id")
    uid, uidx = np.unique(ids, return_inverse=True)
    n_terms = np.bincount(uidx, weights=_np_col(cand, "n_terms"),
                          minlength=len(uid)).astype(np.int64)
    sum_tf = np.bincount(uidx, weights=_np_col(cand, "sum_tf"),
                         minlength=len(uid)).astype(np.int64)
    if mode == "and":
        m = n_terms == len(terms)
        uid, n_terms, sum_tf = uid[m], n_terms[m], sum_tf[m]
    return pa.table({p["id_col"]: pa.array(uid, type=pa.int64()),
                     "n_terms": pa.array(n_terms, type=pa.int64()),
                     "sum_tf": pa.array(sum_tf, type=pa.int64())}), \
        n_read, total


# --------------------------------------------------- maintenance

@ray.remote
def _compact_shard_task(files: list, vdir: str, nv: int, dst: str,
                        dd: dict, num_id_buckets: int) -> dict:
    """Fold ONE posting shard: live latest-version rows only, (id, word)
    partials SUMMED into one row (a doc spanning input blocks emits
    per-block partial tf rows at the same v — exactly what the query
    task sums at read time; folding bakes the sum in), one fragment
    out."""
    t = pa.concat_tables([pq.read_table(f) for f in files])
    rows_in = t.num_rows
    if rows_in:
        t = _resolve_live(t, vdir, dd, num_id_buckets)
    if t.num_rows:
        ids = _np_col(t, "id")
        vs = _np_col(t, "v")
        enc = pc.dictionary_encode(t["word"].combine_chunks()
                                   if isinstance(t["word"],
                                                 pa.ChunkedArray)
                                   else t["word"])
        enc = enc.combine_chunks() if isinstance(
            enc, pa.ChunkedArray) else enc
        widx = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = ids * max(len(enc.dictionary), 1) + widx
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        first = np.ones(len(sc), dtype=bool)
        first[1:] = sc[1:] != sc[:-1]
        seg = np.cumsum(first) - 1
        tf = np.bincount(seg, weights=_np_col(t, "tf")[order]) \
            .astype(np.int64)
        sel = order[first]
        t = pa.table({
            "word": enc.dictionary.take(pa.array(widx[sel])),
            "id": pa.array(ids[sel], type=pa.int64()),
            "tf": pa.array(tf, type=pa.int64()),
            "v": pa.array(vs[sel], type=pa.int64())})
    rows = t.num_rows
    if rows:
        os.makedirs(dst, exist_ok=True)
        pq.write_table(t.select(POSTING_COLS), os.path.join(
            dst, f"frag-v{nv:04d}-0.{uuid.uuid4().hex[:6]}.parquet"))
    return {"rows_in": rows_in, "rows_out": rows}


def compact_inverted(root: str) -> dict:
    """Fold supersede + tombstones into the data: every posting shard
    rewritten to its live latest rows in one fragment, lastv folded to
    one fragment per id-bucket, tombstone log cleared. Out-of-band,
    commits as a new version (readers switch atomically)."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed inverted index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    nv = _next_version(root)
    vdir = _vdir(root, v)
    dd = _deleted_map(root, v)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    futs = []
    base = os.path.join(vdir, "postings")
    for name in (sorted(os.listdir(base)) if os.path.isdir(base) else []):
        if not name.startswith("bucket="):
            continue
        k = int(name.split("=", 1)[1])
        futs.append(_compact_shard_task.remote(
            _bucket_dirs(vdir, "postings", {k}), vdir, nv,
            os.path.join(stage, "postings", name), dd,
            p["num_id_buckets"]))
    stats = ray.get(futs)
    lbase = os.path.join(vdir, "lastv")
    for name in (sorted(os.listdir(lbase)) if os.path.isdir(lbase)
                 else []):
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
            "counts": {"new_postings": 0, "new_docs": 0, "deletes": 0,
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


def inverted_fragment_stats(root: str, version: int | None = None
                            ) -> dict:
    """Compaction-policy inputs: directory listings + tombstone log
    only, no data reads."""
    v = version if version is not None else current_version(root)
    if v is None:
        return {"shards": 0, "fragments": 0, "max_fragments": 0,
                "live_tombstones": 0}
    vdir = _vdir(root, v)
    per: dict[int, int] = {}
    base = os.path.join(vdir, "postings")
    if os.path.isdir(base):
        for name in os.listdir(base):
            if name.startswith("bucket="):
                k = int(name.split("=", 1)[1])
                per[k] = len([f for f in os.listdir(
                    os.path.join(base, name)) if f.endswith(".parquet")])
    return {"shards": len(per), "fragments": sum(per.values()),
            "max_fragments": max(per.values(), default=0),
            "live_tombstones": len(_deleted_map(root, v))}


def maybe_compact_inverted(root: str, *, max_fragments: int = 16,
                           max_tombstones: int = 100_000) -> dict | None:
    s = inverted_fragment_stats(root)
    if s["max_fragments"] > max_fragments or \
            s["live_tombstones"] > max_tombstones:
        return compact_inverted(root)
    return None


def gc_inverted(root: str, *, keep_last: int = 2,
                stage_min_age_s: float = 3600.0) -> list[int]:
    """Expire old index versions + aged crash orphans above CURRENT +
    stale stage dirs (same vacuum contract as gc_lsh/gc_ann)."""
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


def fsck_inverted(root: str, version: int | None = None) -> dict:
    """Audit one index version: fragments open and match the store
    schema, shard dirs in range, every word row sits in its crc32
    shard, every posting id resolves in the lastv store."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed inverted index at {root}")
    man = read_manifest(root, v)
    p = man["params"]
    vdir = _vdir(root, v)
    errors: list[str] = []
    post_rows = 0
    post_ids: set[int] = set()
    base = os.path.join(vdir, "postings")
    if os.path.isdir(base):
        for name in os.listdir(base):
            if not name.startswith("bucket="):
                continue
            k = int(name.split("=", 1)[1])
            if not 0 <= k < p["num_shards"]:
                errors.append(f"shard {k} out of range")
                continue
            for f in _bucket_dirs(vdir, "postings", {k}):
                t = pq.read_table(f)
                if t.column_names != POSTING_COLS:
                    errors.append(f"bad posting schema in {f}: "
                                  f"{t.column_names}")
                    continue
                post_rows += t.num_rows
                post_ids.update(t["id"].to_pylist())
                for w in set(t["word"].to_pylist()):
                    if zlib.crc32(w.encode("utf-8")) \
                            % p["num_shards"] != k:
                        errors.append(f"word {w!r} misfiled in "
                                      f"shard {k}")
                        break
    lv_ids: set[int] = set()
    for f in _bucket_dirs(vdir, "lastv"):
        t = pq.read_table(f)
        if t.column_names != ["id", "v"]:
            errors.append(f"bad lastv schema in {f}: {t.column_names}")
            continue
        lv_ids.update(t["id"].to_pylist())
    missing = post_ids - lv_ids
    if missing:
        errors.append(f"{len(missing)} posting ids missing from lastv "
                      f"(e.g. {sorted(missing)[:5]})")
    return {"version": v, "posting_rows": post_rows,
            "distinct_ids": len(post_ids), "errors": errors,
            "ok": not errors}


# ------------------------------------------------------- feed sync

def sync_inverted_from_feed(src_root: str, index_root: str, *,
                            text_col: str = "content",
                            num_shards: int = 64,
                            num_id_buckets: int = 32,
                            num_partitions: int = 8) -> dict:
    """Keep the inverted index in sync with a kettleray CDC sink (the
    lake -> text-search leg): first call bootstraps from the sink's
    full state, later calls consume ONLY the change feed between the
    applied and current sink version — new/changed keys re-tokenized
    and upserted, deleted keys tombstoned. Exactly-once via the same
    post-commit durable cursor contract as sync_lsh_from_feed /
    sync_ann_from_feed (re-tokenizing redelivered content is
    value-idempotent under the supersede rule)."""
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

    def _to_docs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        if "change_type" in t.column_names:
            t = t.filter(pc.not_equal(t["change_type"], "deleted"))
        ids = stable_doc_id(t["repo"].to_pylist(),
                            t["path"].to_pylist())
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": pc.cast(t[text_col], pa.string())})

    docs = feed.map_batches(_to_docs, batch_format="pyarrow",
                            zero_copy_batch=True)
    if applied is not None:
        docs = _solidify_small(docs, num_partitions=num_partitions,
                               schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]))
    man = apply_incremental_inverted(
        index_root, docs, id_col="doc_id", text_col="text",
        num_shards=num_shards, num_id_buckets=num_id_buckets,
        num_partitions=num_partitions,
        deletes=del_ids if del_ids else None)
    tmpc = cursor + f".{uuid.uuid4().hex[:6]}"
    with open(tmpc, "w") as f:
        json.dump({"src_version": src_v,
                   "index_version": man["version"]}, f)
    os.replace(tmpc, cursor)
    return man
