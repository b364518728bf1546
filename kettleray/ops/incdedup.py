"""Incrementally maintained MinHash-LSH near-duplicate index — the
CDC x training-data crossover.

Batch near-dup dedup (``dedup.minhash_lsh_pairs``) re-signs and re-bands
the ENTIRE corpus per run: at 100 TB that is a full-corpus scan for
every nightly increment. This module keeps the LSH state itself as a
versioned, hash-bucketed table (the same COW + hardlink-forward idiom as
``kettleray.io.sink``), so a commit of B new/updated docs costs
O(B x bands) — never O(corpus):

  root/vNNNN/bands/bucket=K/   (doc_id, band_id, band_hash, v) rows,
                               hash-bucketed by (band_id, band_hash)
  root/vNNNN/sketch/bucket=K/  (doc_id, sh BINARY sorted-distinct-u64
                               shingle hashes, n_sh, v), by hash(doc_id)
  root/vNNNN/pairs/            (doc_a, doc_b, jaccard, v) append log
  root/vNNNN/deleted/          (doc_id, v) tombstone log

Per commit, only the band buckets the new docs hash into are READ
(candidate generation against history), only those bucket dirs receive
new fragment files, and every other file is hardlinked forward (O(1)
per file). Verification never touches corpus text: exact word-k-gram
Jaccard is computed from the stored shingle sketches via two
hash-partitioned ``Dataset.join``s (only bucket NUMBERS ever cross the
driver). CDC semantics:

- UPDATE = re-arrival of a doc_id: it is re-signed and re-verified
  against the whole index; a pair row is live iff its emission version
  >= the latest sketch version of BOTH its docs, so pairs against the
  superseded text vanish at read time without any rewrite.
- DELETE = one tombstone row; filtered at read, garbage-collected by
  ``compact_lsh``. Delete wins a same-commit tie with an insert.
- Redelivery of identical content is idempotent in the pair VIEW (the
  re-emitted pair replaces the superseded one 1:1).

Scale notes: sketches store the full distinct gram-hash set (exact
verify, what the value-hash oracle checks); at web scale the documented
knob is a bottom-k truncation of the same sorted array (approximate
verify) — the layout does not change. The live tombstone set is kept
small by folding it into the data at every compaction, so the
read/candidate-side delete filter stays a broadcast of live tombstones
only, not of all deletes ever.

No Kettle equivalent (reference scope is row-stream transforms); the
LSH construction follows Broder's MinHash and the standard banding
scheme, shared with ``dedup.minhash_lsh_pairs`` bit-for-bit so
incremental candidate recall equals the batch pipeline's.
"""
from __future__ import annotations

import hashlib
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

from kettleray.context import auto_pool
from kettleray.ops.cdc import _composite_key_codes
from kettleray.ops.dedup import MinHasher

_LOG = logging.getLogger("kettleray.incdedup")

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)

def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * _C1
        x = (x ^ (x >> np.uint64(27))) * _C2
        return x ^ (x >> np.uint64(31))


def _band_bucket(band_id: np.ndarray, band_hash: np.ndarray,
                 num_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = _mix64(band_hash.astype(np.uint64)
                   + (band_id.astype(np.uint64) + np.uint64(1)) * _C2)
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _id_bucket(ids: np.ndarray, num_buckets: int) -> np.ndarray:
    return (_mix64(ids.astype(np.uint64))
            % np.uint64(num_buckets)).astype(np.int64)


# ---------------------------------------------------------------- layout

def _vdir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def current_version(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(f.read().strip().lstrip("v"))


def _next_version(root: str) -> int:
    """Next version number = max(existing version dirs, CURRENT) + 1.

    Allocating from CURRENT alone bricks the index after a crash
    BETWEEN the stage->vN rename and the CURRENT pointer write: vN
    exists but CURRENT still names vN-1, so every retry recomputes N
    and the rename fails forever. Scanning the dirs skips the orphan
    (readers only trust CURRENT, so the orphan is invisible; gc_lsh
    reaps it once it ages past the stage window) and the caller's
    retry commits cleanly as vN+1."""
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


def _np_col(t: pa.Table, name: str) -> np.ndarray:
    c = t[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------- signer

class _SketchSigner:
    """Per-actor signer (actor-pool stage): ONE pass over a batch yields

    - the MinHash band hashes, bit-identical to ``dedup.MinHasher``
      (so incremental candidate recall == the batch pipeline's), and
    - the exact-verify sketch: the doc's DISTINCT word-k-gram hash set,
      case-SENSITIVE and empty-token-free to match
      ``dedup._word_shingles`` / the SQL oracle's gram semantics
      (``regexp_split_to_array(trim(text), '\\s+')``). Docs shorter
      than k tokens fall back to the single whole-doc gram, hashed
      order-sensitively (blake2b of the joined string), again matching
      ``_word_shingles``.

    Gram hash = rolling FNV-multiplier combine of per-token blake2b
    hashes — different VALUES from ``_word_shingles`` but the same SET
    semantics (injective per gram w.p. 1 - ~2^-64), which is all
    Jaccard needs."""

    def __init__(self, id_col: str, text_col: str, num_perm: int,
                 shingle_k: int, bands: int, seed: int = 42,
                 with_bands: bool = True):
        self.mh = MinHasher(id_col, text_col, num_perm, shingle_k,
                            bands, seed)
        self.id_col, self.text_col, self.k = id_col, text_col, shingle_k
        # with_bands=False -> sketch-only signing for verify-only
        # callers (jaccard_verify method='sketch'): the 64-perm
        # signature matrix + band fold are skipped entirely
        self.with_bands = with_bands

    def _sketches(self, texts) -> tuple[np.ndarray, np.ndarray]:
        """(values, counts): per-doc sorted-distinct u64 gram hashes,
        concatenated in doc order."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(texts)
        counts0 = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ndocs = len(counts0)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nonempty = pc.not_equal(flat, "")
        keep_np = nonempty.to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(ndocs), counts0)[keep_np]
        flat_k = flat.filter(nonempty)
        counts = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        enc = pc.dictionary_encode(flat_k)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vocab = enc.dictionary.to_pylist()
        vh = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode("utf-8"),
                                            digest_size=8).digest(),
                            "little") for w in vocab),
            dtype=np.uint64, count=len(vocab))
        tok_h = vh[enc.indices.to_numpy(zero_copy_only=False)] \
            if len(vocab) else np.empty(0, np.uint64)
        k, n = self.k, len(tok_h)
        m = max(n - k + 1, 0)
        with np.errstate(over="ignore"):
            sh = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                sh += tok_h[j:n - k + 1 + j] * self.mh.roll[j]
        valid = (doc_of[:m] == doc_of[k - 1:]) if n >= k else \
            np.zeros(m, dtype=bool)
        sh_doc, sh_v = (doc_of[:m][valid], sh[valid])
        # fallback: docs with < k non-empty tokens -> one whole-doc gram
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(
            np.int64)
        fb = np.nonzero(counts < k)[0]
        fb_vals = np.empty(len(fb), dtype=np.uint64)
        for i, d in enumerate(fb):
            g = " ".join(flat_k.slice(starts[d], counts[d]).to_pylist())
            fb_vals[i] = int.from_bytes(
                hashlib.blake2b(g.encode("utf-8"),
                                digest_size=8).digest(), "little")
        all_doc = np.concatenate([sh_doc, fb])
        all_sh = np.concatenate([sh_v, fb_vals])
        order = np.lexsort((all_sh, all_doc))
        ad, ash = all_doc[order], all_sh[order]
        first = np.ones(len(ad), dtype=bool)
        first[1:] = (ad[1:] != ad[:-1]) | (ash[1:] != ash[:-1])
        ad, ash = ad[first], ash[first]
        return ash, np.bincount(ad, minlength=ndocs).astype(np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = _np_col(t, self.id_col).astype(np.int64)
        sk_vals, sk_counts = self._sketches(t[self.text_col])
        total = int(sk_counts.sum()) * 8
        if total >= (1 << 31):
            # pa.binary offsets are int32; a silent wrap would corrupt
            # every sketch in the block undetected
            raise ValueError(
                f"_SketchSigner: {total} gram-hash bytes in one block "
                f"exceeds the 2 GiB binary-offset limit — lower the "
                f"signing batch_size / block size for this corpus")
        offsets = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(sk_counts * 8, out=offsets[1:])
        offsets = offsets.astype(np.int32)
        blob = pa.Array.from_buffers(
            pa.binary(), len(ids),
            [None, pa.py_buffer(offsets.tobytes()),
             pa.py_buffer(sk_vals.astype("<u8").tobytes())])
        if not self.with_bands:
            return pa.table({
                "doc_id": pa.array(ids, type=pa.int64()), "sh": blob,
                "n_sh": pa.array(sk_counts, type=pa.int64())})
        sig = self.mh.signatures(t)
        bh = self.mh.band_hashes(sig)                   # (n, bands) i64
        bh_col = pa.FixedSizeListArray.from_arrays(
            pa.array(bh.ravel(), type=pa.int64()), self.mh.bands)
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "bh": bh_col, "sh": blob,
                         "n_sh": pa.array(sk_counts, type=pa.int64())})


# ------------------------------------------------------------- kernels

def _flatten_bands(t: pa.Table, bands: int, num_buckets: int,
                   v: int) -> pa.Table:
    ids = _np_col(t, "doc_id")
    col = t["bh"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    band_hash = col.values.to_numpy(zero_copy_only=False)
    n = len(ids)
    doc_id = np.repeat(ids, bands)
    band_id = np.tile(np.arange(bands, dtype=np.int32), n)
    bucket = _band_bucket(band_id, band_hash, num_buckets)
    return pa.table({
        "doc_id": pa.array(doc_id, type=pa.int64()),
        "band_id": pa.array(band_id, type=pa.int32()),
        "band_hash": pa.array(band_hash, type=pa.int64()),
        "v": pa.array(np.full(n * bands, v), type=pa.int64()),
        "bucket": pa.array(bucket, type=pa.int64()),
    })


# candidate sets at or below this verify via bounded broadcast reads;
# above it the fully-distributed sketch-join verify runs
_BROADCAST_VERIFY_MAX = 20_000

_EMPTY_PAIRS = pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64())})


def _solidify_small(ds, *, schema: pa.Schema, num_partitions: int = 16,
                    rows_per_part: int = 100, limit: int | None = None):
    """Work around schema-less empty shuffle blocks ahead of a join.

    Ray's hash shuffle/groupby emit zero-column empty blocks;
    map_batches is SKIPPED on them, so they cannot be repaired
    in-stream, and a join partition made only of them concatenates to a
    zero-column table that acero rejects ('No match ... FieldRef').
    That failure mode only exists in the small regime: with >=
    ``rows_per_part`` distinct-keyed rows per downstream join partition
    the probability of an all-empty partition is ~P*e^-rows_per_part —
    so below that the dataset is rebuilt as one schema'd block (merged
    INSIDE one Ray task — block bytes never cross the driver, bounded
    by the threshold, never by the corpus); above it the stream is
    returned untouched."""
    ds = ds.materialize()
    if limit is None:
        limit = rows_per_part * max(num_partitions, 1)
    if ds.count() > limit:
        return ds
    refs = [blk for bundle in ds.iter_internal_ref_bundles()
            for blk in bundle.block_refs]
    merged = _solidify_merge_task.remote(
        schema.serialize().to_pybytes(), *refs)
    return ray.data.from_arrow_refs([merged])


@ray.remote
def _solidify_merge_task(schema_ser: bytes, *tables) -> pa.Table:
    """Merge small shuffle blocks into one schema'd table in a WORKER
    (see _solidify_small — schema-less empties are dropped, survivors
    cast to the target schema)."""
    schema = pa.ipc.read_schema(pa.py_buffer(schema_ser))
    tabs = [t.select(schema.names).cast(schema)
            for t in tables if t.num_columns]
    return pa.concat_tables(tabs) if tabs else schema.empty_table()


def _pairs_vs_new(t: pa.Table, max_bucket: int) -> pa.Table:
    """Within-block candidate pairs over (band_id, band_hash) runs where
    AT LEAST ONE side is new (old x old pairs were emitted when the
    younger of the two was itself new — re-emitting them would be pure
    duplicate work). Same triangular-template vectorization and
    oversized-bucket cap as ``dedup._bucket_pairs_table``."""
    if t.num_rows < 2:
        return _EMPTY_PAIRS
    codes = _composite_key_codes(t, ["band_id", "band_hash"])
    ids = _np_col(t, "doc_id")
    isnew = _np_col(t, "is_new").astype(bool)
    # dedupe (band, hash, doc): keep the is_new=max row (a stale version
    # of a doc sharing the band hash with its own re-sign must not pair
    # with itself)
    order = np.lexsort((isnew, ids, codes))
    sk, sid, snew = codes[order], ids[order], isnew[order]
    last = np.ones(len(sk), dtype=bool)
    last[:-1] = (sk[1:] != sk[:-1]) | (sid[1:] != sid[:-1])
    sk, sid, snew = sk[last], sid[last], snew[last]
    n = len(sk)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    begins = np.nonzero(run_start)[0]
    lens = np.diff(np.append(begins, n))
    over = lens > max_bucket
    if over.any():
        _LOG.warning(
            "incdedup: dropped %d oversized band buckets (> %d docs)",
            int(over.sum()), max_bucket)
    out_a, out_b = [], []
    lens_ok, begins_ok = lens[~over], begins[~over]
    for m in np.unique(lens_ok):
        if m < 2:
            continue
        ti, tj = np.triu_indices(int(m), k=1)
        b_m = begins_ok[lens_ok == m]
        ia = (b_m[:, None] + ti[None, :]).ravel()
        ib = (b_m[:, None] + tj[None, :]).ravel()
        mask = snew[ia] | snew[ib]
        out_a.append(sid[ia][mask])
        out_b.append(sid[ib][mask])
    if not out_a:
        return _EMPTY_PAIRS
    return pa.table({
        "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b), type=pa.int64())})


def _pairs_probe_vs_index(t: pa.Table, max_bucket: int) -> pa.Table:
    """Probe variant of ``_pairs_vs_new``: keep pairs where EXACTLY ONE
    side is new (probes are never compared to each other), normalized to
    (doc_a=probe, doc_b=index doc). Same triangular-template
    vectorization and oversized-bucket cap."""
    if t.num_rows < 2:
        return _EMPTY_PAIRS
    codes = _composite_key_codes(t, ["band_id", "band_hash"])
    ids = _np_col(t, "doc_id")
    isnew = _np_col(t, "is_new").astype(bool)
    order = np.lexsort((isnew, ids, codes))
    sk, sid, snew = codes[order], ids[order], isnew[order]
    last = np.ones(len(sk), dtype=bool)
    last[:-1] = (sk[1:] != sk[:-1]) | (sid[1:] != sid[:-1])
    sk, sid, snew = sk[last], sid[last], snew[last]
    n = len(sk)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    begins = np.nonzero(run_start)[0]
    lens = np.diff(np.append(begins, n))
    over = lens > max_bucket
    if over.any():
        _LOG.warning(
            "incdedup: dropped %d oversized band buckets (> %d docs)",
            int(over.sum()), max_bucket)
    out_a, out_b = [], []
    lens_ok, begins_ok = lens[~over], begins[~over]
    for m in np.unique(lens_ok):
        if m < 2:
            continue
        ti, tj = np.triu_indices(int(m), k=1)
        b_m = begins_ok[lens_ok == m]
        ia = (b_m[:, None] + ti[None, :]).ravel()
        ib = (b_m[:, None] + tj[None, :]).ravel()
        na, nb = snew[ia], snew[ib]
        mask = na ^ nb                       # exactly one probe side
        pa_ids = np.where(na[mask], sid[ia][mask], sid[ib][mask])
        pb_ids = np.where(na[mask], sid[ib][mask], sid[ia][mask])
        out_a.append(pa_ids)
        out_b.append(pb_ids)
    if not out_a:
        return _EMPTY_PAIRS
    return pa.table({
        "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b), type=pa.int64())})


def _latest_per_doc(t: pa.Table) -> pa.Table:
    """Keep the max-v row per doc_id (block is doc_id-partitioned)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return t
    ids = _np_col(t, "doc_id")
    vs = _np_col(t, "v")
    order = np.lexsort((vs, ids))
    sid = ids[order]
    last = np.ones(len(sid), dtype=bool)
    last[:-1] = sid[1:] != sid[:-1]
    return t.take(pa.array(order[last], type=pa.int64()))


def _verify_from_sketches(pairs, sketches, *, threshold: float,
                          num_partitions: int):
    """pairs (doc_a, doc_b) x stored sketches -> exact-Jaccard-verified
    (doc_a, doc_b, jaccard). Two hash-partitioned Dataset.joins (sketch
    payload is a binary blob of sorted distinct u64 gram hashes — acero
    joins reject list columns, binary passes through zero-copy)."""
    pairs = pairs.materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"doc_a": pa.array([], type=pa.int64()),
             "doc_b": pa.array([], type=pa.int64()),
             "jaccard": pa.array([], type=pa.float64())}))
    sk = sketches.select_columns(["doc_id", "sh", "n_sh"])
    sa = sk.rename_columns({"doc_id": "doc_a", "sh": "__sh_a",
                            "n_sh": "__n_a"})
    sb = sk.rename_columns({"doc_id": "doc_b", "sh": "__sh_b",
                            "n_sh": "__n_b"})
    j = pairs.join(sa, join_type="inner", on=("doc_a",),
                   num_partitions=num_partitions)
    # join output partitions can themselves be schema-less empties —
    # re-solidify before chaining the second join (see _solidify_small)
    j = _solidify_small(j, num_partitions=num_partitions,
                        schema=pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("__sh_a", pa.binary()), ("__n_a", pa.int64())]))
    j = j.join(sb, join_type="inner", on=("doc_b",),
               num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        from kettleray.ops.dedup import score_sketch_pairs
        return score_sketch_pairs(t, threshold)

    # bounded batches: a scoring batch holds both sketches per pair, so
    # cap rows (16k pairs x ~2x200 grams x 8 B ≈ 50 MB flat) instead of
    # scoring a whole join partition in one numpy allocation
    return j.map_batches(_score, batch_format="pyarrow",
                         batch_size=16384, zero_copy_batch=True)


@ray.remote
def _read_sketch_filtered_task(files: list, need: np.ndarray) -> pa.Table:
    """Read sketch fragment files, keeping only the needed doc ids."""
    na = pa.array(need, type=pa.int64())
    tabs = []
    for f in files:
        t = pq.read_table(f, columns=["doc_id", "sh", "n_sh", "v"])
        t = t.filter(pc.is_in(t["doc_id"], value_set=na))
        if t.num_rows:
            tabs.append(t)
    return pa.concat_tables(tabs) if tabs else pa.table(
        {"doc_id": pa.array([], type=pa.int64()),
         "sh": pa.array([], type=pa.binary()),
         "n_sh": pa.array([], type=pa.int64()),
         "v": pa.array([], type=pa.int64())})


@ray.remote
def _filter_signed_task(t: pa.Table, need: np.ndarray,
                        v: int) -> pa.Table:
    if t.num_columns == 0:
        return pa.table({"doc_id": pa.array([], type=pa.int64()),
                         "sh": pa.array([], type=pa.binary()),
                         "n_sh": pa.array([], type=pa.int64()),
                         "v": pa.array([], type=pa.int64())})
    na = pa.array(need, type=pa.int64())
    f = t.select(["doc_id", "sh", "n_sh"]).filter(
        pc.is_in(t["doc_id"], value_set=na))
    return f.append_column("v", pa.array([v] * f.num_rows,
                                         type=pa.int64()))


@ray.remote
def _bucket_cands_task(files: list, new_tbl: pa.Table, bucket: int,
                       dd: dict, max_bucket: int) -> pa.Table:
    """Candidate pairs for ONE band bucket: read that bucket's history
    fragments (co-partitioned by layout — zero shuffle), union the
    commit's rows for the bucket (broadcast once via ray.put), run the
    pairs-vs-new kernel."""
    cols = ["doc_id", "band_id", "band_hash"]
    new_b = new_tbl.filter(pc.equal(new_tbl["bucket"], bucket))
    parts = [new_b.select(cols).append_column(
        "is_new", pa.array(np.ones(new_b.num_rows, bool)))]
    for f in files:
        t = pq.read_table(f, columns=cols + ["v"])
        if dd:
            keep = _del_versions(_np_col(t, "doc_id"), dd) \
                < _np_col(t, "v")
            t = t.filter(pa.array(keep))
        if t.num_rows:
            parts.append(t.select(cols).append_column(
                "is_new", pa.array(np.zeros(t.num_rows, bool))))
    return _pairs_vs_new(pa.concat_tables(parts), max_bucket)


def _verify_broadcast_tbl(pairs_tbl: pa.Table, signed, root: str,
                          prev_v, v: int, num_buckets: int,
                          threshold: float) -> pa.Table:
    """Exact-Jaccard verify for SMALL candidate sets: the candidate
    doc ids are known on the driver, so the needed sketch rows are
    fetched with id-bucket-pruned, is_in-filtered parallel reads
    (<= 2 x pairs rows cross the driver — bounded by the broadcast
    guard, never the corpus) and scored in one vectorized pass,
    skipping the join operators (and their per-run actor-spawn cost)
    entirely."""
    da = _np_col(pairs_tbl, "doc_a")
    db = _np_col(pairs_tbl, "doc_b")
    need = np.unique(np.concatenate([da, db])) if len(da) else \
        np.empty(0, np.int64)
    need_ref = ray.put(need)
    futs = []
    sk_files = _bucket_dirs(
        _vdir(root, prev_v), "sketch",
        set(_id_bucket(need, num_buckets).tolist())) if prev_v else []
    if sk_files:
        chunk = max(1, len(sk_files) // 32)
        for i in range(0, len(sk_files), chunk):
            futs.append(_read_sketch_filtered_task.remote(
                sk_files[i:i + chunk], need_ref))
    for ref in signed.to_arrow_refs():
        futs.append(_filter_signed_task.remote(ref, need_ref, v))
    tabs = [t for t in ray.get(futs) if t.num_rows]
    sk = pa.concat_tables(tabs) if tabs else None
    jac = np.full(len(da), -1.0, dtype=np.float64)
    if sk is not None and sk.num_rows and len(da):
        # winner sketch per doc id = highest version; then one
        # searchsorted gather per side + the shared flat Jaccard
        # kernel (no per-pair Python loop — this runs on EVERY
        # trickle commit)
        ids_ = _np_col(sk, "doc_id")
        vs_ = _np_col(sk, "v")
        order = np.lexsort((vs_, ids_))   # latest version last per id
        ids_o = ids_[order]
        last = np.ones(len(ids_o), dtype=bool)
        last[:-1] = ids_o[1:] != ids_o[:-1]
        win_idx = order[last]
        win_ids = ids_[win_idx]           # sorted ascending
        sh_col = sk["sh"].combine_chunks() if isinstance(
            sk["sh"], pa.ChunkedArray) else sk["sh"]
        winners = sh_col.take(pa.array(win_idx, type=pa.int64()))

        def _locate(keys):
            pos = np.searchsorted(win_ids, keys)
            pos_c = np.minimum(pos, len(win_ids) - 1)
            return pos_c, win_ids[pos_c] == keys

        pa_pos, a_ok = _locate(da)
        pb_pos, b_ok = _locate(db)
        ok = a_ok & b_ok
        if ok.any():
            from kettleray.ops.dedup import pairwise_sketch_jaccard
            sh_a = winners.take(pa.array(pa_pos[ok], type=pa.int64()))
            sh_b = winners.take(pa.array(pb_pos[ok], type=pa.int64()))
            jac[ok] = pairwise_sketch_jaccard(sh_a, sh_b)
    out = pa.table({"doc_a": pa.array(da, type=pa.int64()),
                    "doc_b": pa.array(db, type=pa.int64()),
                    "jaccard": pa.array(jac, type=pa.float64())})
    return out.filter(pc.greater_equal(out["jaccard"], threshold))


def _verify_broadcast(cand, signed, root: str, prev_v, v: int,
                      num_buckets: int, threshold: float):
    pt = pa.concat_tables(
        [t.select(["doc_a", "doc_b"])
         for t in ray.get(cand.to_arrow_refs()) if t.num_columns])
    out = _verify_broadcast_tbl(pt, signed, root, prev_v, v,
                                num_buckets, threshold)
    return ray.data.from_arrow(out).materialize()



# ---------------------------------------------------------------- apply

def _params_dict(**kw) -> dict:
    return {k: kw[k] for k in sorted(kw)}


def _fix_bucket_col(ds, *, drop: bool = False):
    """write_parquet(partition_cols=...) strips the bucket column from
    files and read_parquet re-infers it from the hive path as STRING —
    normalize it back to int64 (or drop it)."""
    def _fn(t: pa.Table) -> pa.Table:
        if "bucket" not in t.column_names:
            return t
        if drop:
            return t.drop_columns(["bucket"])
        i = t.column_names.index("bucket")
        return t.set_column(i, "bucket",
                            pc.cast(t["bucket"], pa.int64()))
    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def _del_versions(ids: np.ndarray, dmap: dict[int, int]) -> np.ndarray:
    """Vectorized doc_id -> tombstone version (-1 when never deleted):
    binary search over the (small, live-only) sorted tombstone set."""
    if not dmap:
        return np.full(len(ids), -1, dtype=np.int64)
    dk = np.fromiter(dmap.keys(), dtype=np.int64, count=len(dmap))
    dv = np.fromiter(dmap.values(), dtype=np.int64, count=len(dmap))
    o = np.argsort(dk)
    dk, dv = dk[o], dv[o]
    pos = np.minimum(np.searchsorted(dk, ids), len(dk) - 1)
    hit = dk[pos] == ids
    return np.where(hit, dv[pos], np.int64(-1))


def _deleted_map(root: str, v: int | None) -> dict[int, int]:
    """doc_id -> max tombstone version, from the LIVE tombstone log
    (compaction folds tombstones into the data and clears the log, so
    this stays small — it is the only delete state ever broadcast)."""
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
        for i, dv in zip(t["doc_id"].to_pylist(), t["v"].to_pylist()):
            out[i] = max(out.get(i, -1), dv)
    return out


def _move_fragments(tmp: str, stage: str, sub: str, v: int) -> int:
    """Move bucket-partitioned write output under stage/sub with
    version-stamped fragment names; returns files moved."""
    files = 0
    if not os.path.isdir(tmp):
        return 0
    for name in sorted(os.listdir(tmp)):
        if not name.startswith("bucket="):
            continue
        dst = os.path.join(stage, sub, name)
        os.makedirs(dst, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(
                os.path.join(tmp, name)))):
            src = os.path.join(tmp, name, f)
            files += 1
            os.rename(src, os.path.join(
                dst, f"frag-v{v:04d}-{i}.{uuid.uuid4().hex[:6]}"
                     f".parquet"))
    shutil.rmtree(tmp)
    return files


def _write_tbl_bucketed(stage: str, sub: str, v: int, tbl: pa.Table,
                        bucket_np: np.ndarray, cols: list) -> int:
    """Driver-side bucketed write for SMALL commits (table already on
    the driver, bounded by the small-commit threshold): one fragment
    per touched bucket, no Dataset write/shuffle."""
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


def _write_bucketed(ds, tmp: str, stage: str, sub: str, v: int,
                    num_buckets: int, num_partitions: int) -> int:
    """Repartition by bucket THEN write: without the repartition,
    write_parquet(partition_cols) emits one file per (block x bucket) —
    a 45k-doc backfill left 74k tiny band fragments, and every later
    candidate read drowned in file metadata (82 s for a 5k-doc commit).
    The extra exchange costs one shuffle of the COMMIT's rows only;
    fragments per commit are now <= num_buckets."""
    parts = max(1, min(num_partitions, num_buckets))
    ds.repartition(parts, keys=["bucket"]).write_parquet(
        tmp, partition_cols=["bucket"])
    return _move_fragments(tmp, stage, sub, v)


def _bucket_dirs(vdir: str, sub: str, only: set[int] | None = None
                 ) -> list[str]:
    """Parquet FILE paths under vdir/sub, optionally pruned to the
    bucket numbers in ``only`` (ray.data.read_parquet wants files when
    given a list)."""
    base = os.path.join(vdir, sub)
    if not os.path.isdir(base):
        return []
    out = []
    for name in sorted(os.listdir(base)):
        if not name.startswith("bucket="):
            continue
        k = int(name.split("=", 1)[1])
        if only is None or k in only:
            d = os.path.join(base, name)
            out.extend(os.path.join(d, f) for f in sorted(os.listdir(d))
                       if f.endswith(".parquet"))
    return out


def apply_incremental_lsh(root: str, docs, *,
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          num_perm: int = 64, bands: int = 16,
                          shingle_k: int = 3, threshold: float = 0.5,
                          num_buckets: int = 32,
                          num_partitions: int = 8,
                          max_bucket: int = 64, seed: int = 42,
                          deletes=None) -> dict:
    """One CDC commit against the index: sign ``docs`` (inserts AND
    updates — re-arrival of a doc_id supersedes its old text), detect
    near-dups of the new docs against the ENTIRE history by reading only
    the touched band buckets, record tombstones for ``deletes``.
    Returns the new manifest. ``docs=None`` commits deletes only.

    Single-writer per root (the streaming shard -> index handoff is
    serialized upstream). Crash-safe: versions are allocated past any
    orphan dir a crashed commit left behind (see _next_version), so a
    retry of the failed batch commits cleanly; the supersede rule makes
    re-signing redelivered docs value-idempotent in the pair view."""
    params = _params_dict(num_perm=num_perm, bands=bands,
                          shingle_k=shingle_k, threshold=threshold,
                          num_buckets=num_buckets, seed=seed)
    man = read_manifest(root)
    if man and man["params"] != params:
        raise ValueError(f"index at {root} was built with "
                         f"{man['params']}, got {params}")
    prev_v = man["version"] if man else None
    v = _next_version(root)
    t0 = time.time()

    timings: dict[str, float] = {}
    del_ids = np.unique(np.asarray(list(deletes), dtype=np.int64)) \
        if deletes is not None else np.empty(0, np.int64)
    del_map = _deleted_map(root, prev_v)
    # live tombstones from history + this commit's (delete wins ties)
    cand_del = dict(del_map)
    for i in del_ids.tolist():
        cand_del[i] = v

    signed = bands_new = None
    new_docs = 0
    if docs is not None:
        signed = docs.select_columns([id_col, text_col]).map_batches(
            _SketchSigner, batch_format="pyarrow", zero_copy_batch=True,
            concurrency=auto_pool(),
            fn_constructor_args=(id_col, text_col, num_perm, shingle_k,
                                 bands, seed))
        if del_ids.size:
            darr = pa.array(del_ids, type=pa.int64())
            signed = signed.map_batches(
                lambda t: t.filter(pc.invert(pc.is_in(
                    t["doc_id"], value_set=darr))),
                batch_format="pyarrow", zero_copy_batch=True)
        signed = signed.materialize()
        new_docs = signed.count()
        timings["sign"] = round(time.time() - t0, 2)

    pairs_rows = band_rows = 0
    verified = None
    verified_tbl = None
    small = False
    touched: set[int] = set()
    if new_docs:
        bands_new = signed.map_batches(
            lambda t: _flatten_bands(t, bands, num_buckets, v),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        band_rows = bands_new.count()
        timings["bands"] = round(time.time() - t0 -
                                 timings.get("sign", 0), 2)
        t_cand = time.time()
        for b in bands_new.select_columns(["bucket"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"):
            touched.update(np.unique(
                b["bucket"].to_numpy(zero_copy_only=False)).tolist())

        # ---- small commits (the normal trickle case) stay OFF the
        # Dataset shuffle machinery entirely: the commit's band rows
        # are broadcast once, each touched bucket's history reads in
        # one plain Ray task (co-partitioned by layout), and the
        # driver dedupes/verifies — every Dataset shuffle at this size
        # is pure operator-spawn overhead (~4 s each, measured).
        small = band_rows <= 200_000
        verified_tbl = None
        if small:
            new_bt = pa.concat_tables(
                [t for t in ray.get(bands_new.to_arrow_refs())
                 if t.num_columns])
            new_ref = ray.put(new_bt)
            futs = [
                _bucket_cands_task.remote(
                    _bucket_dirs(_vdir(root, prev_v), "bands", {k})
                    if prev_v else [],
                    new_ref, k, cand_del, max_bucket)
                for k in sorted(touched)]
            pts = [t for t in ray.get(futs) if t.num_rows]
            if pts:
                cat = pa.concat_tables(pts)
                a = _np_col(cat, "doc_a")
                b = _np_col(cat, "doc_b")
                order = np.lexsort((b, a))
                a, b = a[order], b[order]
                first = np.ones(len(a), dtype=bool)
                first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                cand_tbl = pa.table(
                    {"doc_a": pa.array(a[first], type=pa.int64()),
                     "doc_b": pa.array(b[first], type=pa.int64())})
            else:
                cand_tbl = _EMPTY_PAIRS
            timings["candidates"] = round(time.time() - t_cand, 2)
            t_ver = time.time()
            if cand_tbl.num_rows:
                verified_tbl = _verify_broadcast_tbl(
                    cand_tbl, signed, root, prev_v, v, num_buckets,
                    threshold)
            else:
                verified_tbl = pa.table(
                    {"doc_a": pa.array([], type=pa.int64()),
                     "doc_b": pa.array([], type=pa.int64()),
                     "jaccard": pa.array([], type=pa.float64())})
            pairs_rows = verified_tbl.num_rows
            timings["verify"] = round(time.time() - t_ver, 2)
    if new_docs and not small:
        # ---- candidate generation: ONLY touched band buckets are read
        old_dirs = _bucket_dirs(_vdir(root, prev_v), "bands", touched) \
            if prev_v else []
        new_flag = bands_new.map_batches(
            lambda t: t.append_column(
                "is_new", pa.array(np.ones(t.num_rows, bool))),
            batch_format="pyarrow", zero_copy_batch=True)
        sides = [new_flag]
        if old_dirs:
            old = _fix_bucket_col(ray.data.read_parquet(old_dirs))
            if cand_del:
                dd = cand_del   # tiny: live tombstones only

                def _drop_deleted(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0:
                        return t
                    keep = _del_versions(_np_col(t, "doc_id"), dd) \
                        < _np_col(t, "v")
                    return t.filter(pa.array(keep))
                old = old.map_batches(_drop_deleted,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)
            old = old.map_batches(
                lambda t: t.append_column(
                    "is_new", pa.array(np.zeros(t.num_rows, bool))),
                batch_format="pyarrow", zero_copy_batch=True)
            sides.append(old)
        combined = sides[0].union(*sides[1:]) if len(sides) > 1 \
            else sides[0]
        parts = max(1, min(num_partitions, len(touched)))
        cand = combined.repartition(parts, keys=["bucket"]).map_batches(
            lambda t: _pairs_vs_new(t, max_bucket),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
        from kettleray.ops.aggregates import unique_rows
        cand = _solidify_small(
            unique_rows(cand, ["doc_a", "doc_b"],
                        num_partitions=parts),
            num_partitions=num_partitions,
            schema=pa.schema([("doc_a", pa.int64()),
                              ("doc_b", pa.int64())]))

        # ---- verify against stored sketches (never corpus text).
        # Small candidate sets (the normal trickle-commit case) verify
        # via BROADCAST: only the candidate docs' sketch rows are pulled
        # (bounded by 2 x pairs, never the corpus) — two chained
        # Dataset.joins cost ~20 s of operator spawn alone. Large sets
        # keep the fully-distributed join path.
        n_cand = cand.count()
        timings["candidates"] = round(time.time() - t_cand, 2)
        t_ver = time.time()
        if n_cand <= _BROADCAST_VERIFY_MAX:
            verified = _verify_broadcast(
                cand, signed, root, prev_v, v, num_buckets, threshold)
        else:
            cand_buckets: set[int] = set()
            for b in cand.iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
                for col in ("doc_a", "doc_b"):
                    ids_ = b[col].to_numpy(zero_copy_only=False)
                    cand_buckets.update(np.unique(
                        _id_bucket(ids_, num_buckets)).tolist())
            sk_sides = [signed.select_columns(["doc_id", "sh", "n_sh"])
                        .map_batches(
                            lambda t: t.append_column(
                                "v", pa.array(np.full(t.num_rows, v),
                                              type=pa.int64())),
                            batch_format="pyarrow",
                            zero_copy_batch=True)]
            sk_dirs = _bucket_dirs(_vdir(root, prev_v), "sketch",
                                   cand_buckets) if prev_v else []
            if sk_dirs:
                sk_sides.append(ray.data.read_parquet(
                    sk_dirs, columns=["doc_id", "sh", "n_sh", "v"]))
            sk_all = sk_sides[0].union(*sk_sides[1:]) \
                if len(sk_sides) > 1 else sk_sides[0]
            sk_latest = _solidify_small(
                sk_all.repartition(
                    max(1, min(num_partitions,
                               max(len(cand_buckets), 1))),
                    keys=["doc_id"]).map_batches(
                    _latest_per_doc, batch_format="pyarrow",
                    batch_size=None, zero_copy_batch=True),
                num_partitions=num_partitions,
                schema=pa.schema([("doc_id", pa.int64()),
                                  ("sh", pa.binary()),
                                  ("n_sh", pa.int64()),
                                  ("v", pa.int64())]))
            verified = _verify_from_sketches(
                cand, sk_latest, threshold=threshold,
                num_partitions=num_partitions).materialize()
        pairs_rows = verified.count()
        timings["verify"] = round(time.time() - t_ver, 2)
    t_write = time.time()

    # ------------------------------------------------------- commit
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    if prev_v is not None:
        prev_dir = _vdir(root, prev_v)
        for base, _, names in os.walk(prev_dir):
            rel = os.path.relpath(base, prev_dir)
            for n in names:
                if not n.endswith(".parquet"):
                    continue
                dst = os.path.join(stage, rel) if rel != "." else stage
                os.makedirs(dst, exist_ok=True)
                os.link(os.path.join(base, n), os.path.join(dst, n))
    if new_docs and small:
        _write_tbl_bucketed(
            stage, "bands", v, new_bt, _np_col(new_bt, "bucket"),
            ["doc_id", "band_id", "band_hash", "v"])
        sk_tbl = pa.concat_tables(
            [t.select(["doc_id", "sh", "n_sh"])
             for t in ray.get(signed.to_arrow_refs())
             if t.num_columns])
        sk_tbl = sk_tbl.append_column(
            "v", pa.array(np.full(sk_tbl.num_rows, v),
                          type=pa.int64()))
        _write_tbl_bucketed(
            stage, "sketch", v, sk_tbl,
            _id_bucket(_np_col(sk_tbl, "doc_id"), num_buckets),
            ["doc_id", "sh", "n_sh", "v"])
    elif new_docs:
        tmp = os.path.join(stage, "_fresh_bands")
        _write_bucketed(bands_new, tmp, stage, "bands", v,
                        num_buckets, num_partitions)
        sk_out = signed.map_batches(
            lambda t: pa.table({
                "doc_id": t["doc_id"], "sh": t["sh"], "n_sh": t["n_sh"],
                "v": pa.array(np.full(t.num_rows, v), type=pa.int64()),
                "bucket": pa.array(_id_bucket(
                    _np_col(t, "doc_id"), num_buckets),
                    type=pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True)
        tmp = os.path.join(stage, "_fresh_sk")
        _write_bucketed(sk_out, tmp, stage, "sketch", v,
                        num_buckets, num_partitions)
    if pairs_rows and verified_tbl is not None:
        pdir = os.path.join(stage, "pairs")
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(
            verified_tbl.append_column(
                "v", pa.array(np.full(verified_tbl.num_rows, v),
                              type=pa.int64())),
            os.path.join(pdir, f"pairs-v{v:04d}-0.parquet"))
    elif verified is not None and pairs_rows:
        tmp = os.path.join(stage, "_fresh_pairs")
        with_v = verified.map_batches(
            lambda t: t.append_column(
                "v", pa.array(np.full(t.num_rows, v), type=pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
        with_v.write_parquet(tmp)
        pdir = os.path.join(stage, "pairs")
        os.makedirs(pdir, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if f.endswith(".parquet"):
                os.rename(os.path.join(tmp, f), os.path.join(
                    pdir, f"pairs-v{v:04d}-{i}.parquet"))
        shutil.rmtree(tmp)
    if del_ids.size:
        ddir = os.path.join(stage, "deleted")
        os.makedirs(ddir, exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(del_ids, type=pa.int64()),
                      "v": pa.array(np.full(del_ids.size, v),
                                    type=pa.int64())}),
            os.path.join(ddir, f"del-v{v:04d}.parquet"))

    man2 = {"version": v, "params": params,
            "counts": {"new_docs": int(new_docs),
                       "band_rows": int(band_rows),
                       "new_pairs": int(pairs_rows),
                       "deletes": int(del_ids.size)},
            "touched_buckets": sorted(touched),
            "timings": {**timings,
                        "write": round(time.time() - t_write, 2)},
            "write_sec": round(time.time() - t0, 3)}
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        json.dump(man2, f)
    _commit_rename(root, stage, v)
    tmpc = os.path.join(root, f"CURRENT.{uuid.uuid4().hex[:6]}")
    with open(tmpc, "w") as f:
        f.write(f"v{v:04d}")
    os.replace(tmpc, os.path.join(root, "CURRENT"))
    return man2


def _commit_rename(root: str, stage: str, v: int) -> None:
    """Atomic stage -> version rename. A collision means another
    writer committed this version number concurrently — the index is
    SINGLE-writer by contract, so fail loudly with retry guidance (a
    batch retry through apply_incremental_lsh is value-idempotent)
    instead of leaking a bare OSError."""
    try:
        os.rename(stage, _vdir(root, v))
    except OSError:
        if os.path.isdir(_vdir(root, v)):
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"lsh index at {root}: version v{v} was committed by a "
                f"concurrent writer (the index is single-writer) — "
                f"retry the batch; re-signing is value-idempotent")
        raise


# ----------------------------------------------------------------- read

def _empty_pairs_ds():
    return ray.data.from_arrow(pa.table(
        {"doc_a": pa.array([], type=pa.int64()),
         "doc_b": pa.array([], type=pa.int64()),
         "jaccard": pa.array([], type=pa.float64())}))


def _lastv_ds(root: str, v: int):
    """(doc_id, __lv) latest sketch version per doc — a
    column-pruned metadata scan of the sketch store (doc_id + v only;
    the blob column never leaves storage)."""
    dirs = _bucket_dirs(_vdir(root, v), "sketch")
    if not dirs:
        return None
    meta = ray.data.read_parquet(dirs, columns=["doc_id", "v"])
    lv = meta.groupby("doc_id").max("v").map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "__lv": t["max(v)"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return _solidify_small(lv, schema=pa.schema(
        [("doc_id", pa.int64()), ("__lv", pa.int64())]))


def read_pairs(root: str, *, num_partitions: int = 8):
    """The LIVE verified near-dup pair set at the current version:
    (doc_a, doc_b, jaccard). A logged pair is live iff it was emitted at
    >= the latest sketch version of both docs (supersede-on-update) and
    neither doc is tombstoned."""
    v = current_version(root)
    if v is None:
        return _empty_pairs_ds()
    pdir = os.path.join(_vdir(root, v), "pairs")
    if not os.path.isdir(pdir) or not any(
            f.endswith(".parquet") for f in os.listdir(pdir)):
        return _empty_pairs_ds()
    pairs = ray.data.read_parquet(pdir)
    lastv = _lastv_ds(root, v)
    la = lastv.rename_columns({"doc_id": "doc_a", "__lv": "__lv_a"})
    lb = lastv.rename_columns({"doc_id": "doc_b", "__lv": "__lv_b"})
    j = pairs.join(la, join_type="inner", on=("doc_a",),
                   num_partitions=num_partitions)
    j = _solidify_small(j, num_partitions=num_partitions,
                        schema=pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("jaccard", pa.float64()), ("v", pa.int64()),
         ("__lv_a", pa.int64())]))
    j = j.join(lb, join_type="inner", on=("doc_b",),
               num_partitions=num_partitions)
    dmap = _deleted_map(root, v)

    def _live(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        vs = _np_col(t, "v")
        lva = _np_col(t, "__lv_a")
        lvb = _np_col(t, "__lv_b")
        keep = (vs >= lva) & (vs >= lvb)
        if dmap:
            keep &= _del_versions(_np_col(t, "doc_a"), dmap) < lva
            keep &= _del_versions(_np_col(t, "doc_b"), dmap) < lvb
        return t.filter(pa.array(keep)).select(
            ["doc_a", "doc_b", "jaccard"])

    return j.map_batches(_live, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)


# ----------------------------------------------------- probe (read-only)

def probe_lsh(root: str, docs, *, id_col: str = "doc_id",
              text_col: str = "text",
              threshold: float | None = None,
              max_bucket: int = 64,
              num_partitions: int = 8,
              small_max_band_rows: int = 200_000) -> "ray.data.Dataset":
    """Dedup-before-ingest gate: check incoming docs against the index
    WITHOUT committing them. Signs the probe batch, reads ONLY the band
    buckets the probes hash into, exact-verifies against the stored
    sketches, and returns (doc_a=probe id, doc_b=index doc, jaccard) —
    probes are never compared to each other and the index is untouched,
    so a rejected doc leaves no trace. ``threshold`` defaults to the
    index's own. Cost per probe batch = sign(batch) + touched-bucket
    reads, same as a small commit minus the writes.

    Scale gate (same threshold as the commit path): batches at or below
    ``small_max_band_rows`` band rows run the driver-bounded broadcast
    path (every Dataset shuffle at trickle size is ~4 s of pure
    operator spawn); larger batches — an incoming crawl shard of
    millions of docs — stay distributed end-to-end: bucket-keyed
    candidate exchange + sketch-join verify, no driver concat of the
    probe batch anywhere.

    A probe whose doc_id already EXISTS in the index supersedes the
    stored rows for that id (same rule as a commit), and — because
    probes are never matched against each other — the id is then
    entirely absent from the matchable index for THIS call: other
    probes report neither its old nor its probed text. Probe with
    fresh ids (or commit the update first) when that id's content
    should stay matchable."""
    man = read_manifest(root)
    if man is None:
        raise FileNotFoundError(f"no index at {root}")
    p = man["params"]
    if threshold is None:
        threshold = p["threshold"]
    v = man["version"] + 1          # pseudo-version: probes always win
    num_buckets = p["num_buckets"]

    signed = docs.select_columns([id_col, text_col]).map_batches(
        _SketchSigner, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=auto_pool(),
        fn_constructor_args=(id_col, text_col, p["num_perm"],
                             p["shingle_k"], p["bands"],
                             p["seed"])).materialize()
    bands_new = signed.map_batches(
        lambda t: _flatten_bands(t, p["bands"], num_buckets, v),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    dmap = _deleted_map(root, man["version"])
    band_rows = bands_new.count()

    # ---- small probe batches (the normal gate-at-ingest case) stay
    # off the Dataset shuffle machinery, same rationale and threshold
    # as apply_incremental_lsh's small-commit bypass
    if band_rows <= small_max_band_rows:
        new_bt = pa.concat_tables(
            [t for t in ray.get(bands_new.to_arrow_refs())
             if t.num_columns])
        probe_ids = np.unique(_np_col(new_bt, "doc_id")) \
            if new_bt.num_rows else np.empty(0, np.int64)
        touched = set(np.unique(_np_col(new_bt, "bucket")).tolist()) \
            if new_bt.num_rows else set()
        new_ref = ray.put(new_bt)
        futs = [_bucket_cands_task.remote(
            _bucket_dirs(_vdir(root, man["version"]), "bands", {k}),
            new_ref, k, dmap, max_bucket)
            for k in sorted(touched)]
        pts = [t for t in ray.get(futs) if t.num_rows]
        if not pts:
            return _empty_pairs_ds()
        cat = pa.concat_tables(pts)
        a = _np_col(cat, "doc_a")
        b = _np_col(cat, "doc_b")
        # keep probe-vs-index pairs only, normalized (probe, index doc)
        a_is_probe = np.isin(a, probe_ids)
        b_is_probe = np.isin(b, probe_ids)
        keep = a_is_probe ^ b_is_probe
        a, b = a[keep], b[keep]
        swap = np.isin(b, probe_ids)
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        order = np.lexsort((b2, a2))
        a2, b2 = a2[order], b2[order]
        first = np.ones(len(a2), dtype=bool)
        first[1:] = (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])
        cand_tbl = pa.table(
            {"doc_a": pa.array(a2[first], type=pa.int64()),
             "doc_b": pa.array(b2[first], type=pa.int64())})
        if cand_tbl.num_rows == 0:
            return _empty_pairs_ds()
        out = _verify_broadcast_tbl(cand_tbl, signed, root,
                                    man["version"], v, num_buckets,
                                    threshold)
        return ray.data.from_arrow(out)

    # ---- large probe batches (an incoming crawl shard of millions of
    # docs) run fully distributed: probing must never concat the batch
    # on the driver. Candidate gen mirrors the commit path — probe band
    # rows union the touched index buckets, ONE bucket-keyed exchange,
    # per-bucket pairs kernel — except the kernel emits only
    # probe-vs-index pairs and index rows superseded by a probe's own
    # doc_id are dropped up front (same semantics as the small path's
    # XOR mask).
    from kettleray.ops.aggregates import unique_rows

    probe_ids_parts = []
    touched = set()
    for bt in bands_new.select_columns(["doc_id", "bucket"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"):
        probe_ids_parts.append(np.unique(
            bt["doc_id"].to_numpy(zero_copy_only=False)))
        touched.update(np.unique(
            bt["bucket"].to_numpy(zero_copy_only=False)).tolist())
    probe_ids = np.unique(np.concatenate(probe_ids_parts)) \
        if probe_ids_parts else np.empty(0, np.int64)

    new_flag = bands_new.map_batches(
        lambda t: t.append_column(
            "is_new", pa.array(np.ones(t.num_rows, bool))),
        batch_format="pyarrow", zero_copy_batch=True)
    sides = [new_flag]
    old_dirs = _bucket_dirs(_vdir(root, man["version"]), "bands",
                            touched)
    if old_dirs:
        pid_ref = ray.put(probe_ids)   # broadcast ONCE, read per block
        dd = dmap

        def _drop_superseded(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t
            ids_ = _np_col(t, "doc_id")
            keep = ~np.isin(ids_, ray.get(pid_ref))
            if dd:
                keep &= _del_versions(ids_, dd) < _np_col(t, "v")
            return t.filter(pa.array(keep))

        old = _fix_bucket_col(ray.data.read_parquet(old_dirs))
        old = old.map_batches(_drop_superseded, batch_format="pyarrow",
                              zero_copy_batch=True)
        old = old.map_batches(
            lambda t: t.append_column(
                "is_new", pa.array(np.zeros(t.num_rows, bool))),
            batch_format="pyarrow", zero_copy_batch=True)
        sides.append(old)
    combined = sides[0].union(*sides[1:]) if len(sides) > 1 \
        else sides[0]
    parts = max(1, min(num_partitions, len(touched)))
    cand = combined.repartition(parts, keys=["bucket"]).map_batches(
        lambda t: _pairs_probe_vs_index(t, max_bucket),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    cand = _solidify_small(
        unique_rows(cand, ["doc_a", "doc_b"], num_partitions=parts),
        num_partitions=num_partitions,
        schema=pa.schema([("doc_a", pa.int64()),
                          ("doc_b", pa.int64())]))
    n_cand = cand.count()
    if n_cand == 0:
        return _empty_pairs_ds()
    if n_cand <= _BROADCAST_VERIFY_MAX:
        # few candidates from a big batch: broadcast-verify is bounded
        # by 2 x pairs sketch rows, never the probe batch
        return _verify_broadcast(cand, signed, root, man["version"], v,
                                 num_buckets, threshold)
    # distributed verify vs stored sketches (never corpus text) — the
    # same two hash-partitioned joins the commit path uses
    cand_buckets: set[int] = set()
    for bt in cand.iter_batches(batch_size=65536,
                                batch_format="pyarrow"):
        for col in ("doc_a", "doc_b"):
            ids_ = bt[col].to_numpy(zero_copy_only=False)
            cand_buckets.update(np.unique(
                _id_bucket(ids_, num_buckets)).tolist())
    sk_sides = [signed.select_columns(["doc_id", "sh", "n_sh"])
                .map_batches(
                    lambda t: t.append_column(
                        "v", pa.array(np.full(t.num_rows, v),
                                      type=pa.int64())),
                    batch_format="pyarrow", zero_copy_batch=True)]
    sk_dirs = _bucket_dirs(_vdir(root, man["version"]), "sketch",
                           cand_buckets)
    if sk_dirs:
        sk_sides.append(ray.data.read_parquet(
            sk_dirs, columns=["doc_id", "sh", "n_sh", "v"]))
    sk_all = sk_sides[0].union(*sk_sides[1:]) \
        if len(sk_sides) > 1 else sk_sides[0]
    sk_latest = _solidify_small(
        sk_all.repartition(
            max(1, min(num_partitions, max(len(cand_buckets), 1))),
            keys=["doc_id"]).map_batches(
            _latest_per_doc, batch_format="pyarrow",
            batch_size=None, zero_copy_batch=True),
        num_partitions=num_partitions,
        schema=pa.schema([("doc_id", pa.int64()),
                          ("sh", pa.binary()),
                          ("n_sh", pa.int64()),
                          ("v", pa.int64())]))
    return _verify_from_sketches(cand, sk_latest, threshold=threshold,
                                 num_partitions=num_partitions)


# ------------------------------------------------ compaction policy

def lsh_fragment_stats(root: str, version: int | None = None) -> dict:
    """Fragment/staleness stats for the compaction policy — decision
    inputs only, no data reads (directory listings + the tombstone
    log)."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no index at {root}")
    out = {"version": v, "max_fragments_per_bucket": 0,
           "band_files": 0, "sketch_files": 0, "pair_files": 0,
           "live_tombstones": len(_deleted_map(root, v))}
    for sub, key in (("bands", "band_files"), ("sketch",
                                               "sketch_files")):
        base = os.path.join(_vdir(root, v), sub)
        if not os.path.isdir(base):
            continue
        for name in os.listdir(base):
            if not name.startswith("bucket="):
                continue
            n = len([f for f in os.listdir(os.path.join(base, name))
                     if f.endswith(".parquet")])
            out[key] += n
            out["max_fragments_per_bucket"] = max(
                out["max_fragments_per_bucket"], n)
    pdir = os.path.join(_vdir(root, v), "pairs")
    if os.path.isdir(pdir):
        out["pair_files"] = len([f for f in os.listdir(pdir)
                                 if f.endswith(".parquet")])
    return out


def maybe_compact_lsh(root: str, *,
                      max_fragments_per_bucket: int = 8,
                      max_tombstones: int = 100_000,
                      num_partitions: int = 8) -> dict | None:
    """Compaction POLICY for the index (mirror of
    ``sink.maybe_compact_mor``): fold when any bucket accumulates more
    than ``max_fragments_per_bucket`` fragment files (per-file open
    cost dominates trickle commits long before row counts do) or the
    live tombstone set — which is broadcast to every candidate
    read — grows past ``max_tombstones``. Returns the compaction
    manifest, or None when below both bounds. Cheap to call after
    every commit: the decision reads directory listings only."""
    s = lsh_fragment_stats(root)
    if (s["max_fragments_per_bucket"] <= max_fragments_per_bucket and
            s["live_tombstones"] <= max_tombstones):
        return None
    return compact_lsh(root, num_partitions=num_partitions)


# ----------------------------------------------------- gc / fsck

def gc_lsh(root: str, *, keep_last: int = 2,
           stage_min_age_s: float = 3600.0) -> list[int]:
    """Expire old index versions (same vacuum contract as
    ``sink.gc_versions``): delete version dirs older than the newest
    ``keep_last``, never CURRENT. Hardlink-safe — dropping an old
    version only decrements link counts on fragments still shared with
    survivors. Stale ``_stage_*`` dirs from crashed writers are removed
    once older than ``stage_min_age_s``. Returns deleted versions."""
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
        # orphan: committed dir past CURRENT (crash between rename and
        # pointer write) — invisible to readers, safe to reap once
        # older than the stage window
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


def fsck_lsh(root: str, version: int | None = None) -> dict:
    """Audit one index version: every fragment opens and matches the
    store's schema, bucket dir names are in range, band/sketch/pairs
    row counts are tallied, and the pair log's doc ids all resolve to a
    sketch row (a pair referencing a doc the sketch store never saw
    means a corrupted or hand-edited store). Returns the audit dict;
    raises ValueError on a hard violation."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no index at {root}")
    man = read_manifest(root, v)
    nb = man["params"]["num_buckets"]
    out = {"version": v, "band_rows": 0, "sketch_rows": 0,
           "pair_rows": 0, "band_files": 0, "sketch_files": 0,
           "problems": []}
    sk_ids: set[int] = set()
    for sub, rows_key, files_key in (("bands", "band_rows",
                                      "band_files"),
                                     ("sketch", "sketch_rows",
                                      "sketch_files")):
        base = os.path.join(_vdir(root, v), sub)
        if not os.path.isdir(base):
            continue
        for name in sorted(os.listdir(base)):
            if not name.startswith("bucket="):
                out["problems"].append(f"{sub}: stray entry {name}")
                continue
            k = int(name.split("=", 1)[1])
            if not (0 <= k < nb):
                out["problems"].append(
                    f"{sub}: bucket {k} out of range 0..{nb - 1}")
            for f in sorted(os.listdir(os.path.join(base, name))):
                p = os.path.join(base, name, f)
                try:
                    t = pq.read_table(p)
                except Exception as e:     # noqa: BLE001
                    out["problems"].append(f"unreadable {p}: {e}")
                    continue
                out[rows_key] += t.num_rows
                out[files_key] += 1
                if sub == "sketch":
                    sk_ids.update(t["doc_id"].to_pylist())
    pdir = os.path.join(_vdir(root, v), "pairs")
    if os.path.isdir(pdir):
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(pdir, f))
            out["pair_rows"] += t.num_rows
            for col in ("doc_a", "doc_b"):
                missing = [i for i in t[col].to_pylist()
                           if i not in sk_ids]
                if missing:
                    out["problems"].append(
                        f"pairs {f}: {len(missing)} {col} ids with no "
                        f"sketch row (e.g. {missing[0]})")
    if out["problems"]:
        raise ValueError(f"fsck_lsh({root}, v{v}): "
                         + "; ".join(out["problems"][:5]))
    return out


# ------------------------------------------------- feed-driven sync

def stable_doc_id(repo, path) -> np.ndarray:
    """Deterministic int64 doc id from the CDC key (repo, path):
    first 8 bytes of blake2b(repo NUL path). Collisions ~2^-64 — a
    collision would merge two docs' dedup identities, detected (and
    harmless) at the exact-verify stage."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(
            f"{r}\x00{p}".encode("utf-8"), digest_size=8).digest(),
            "little", signed=True) for r, p in zip(repo, path)),
        dtype=np.int64, count=len(repo))


def sync_lsh_from_feed(src_root: str, index_root: str, *,
                       text_col: str = "content",
                       num_perm: int = 64, bands: int = 16,
                       shingle_k: int = 3, threshold: float = 0.5,
                       num_buckets: int = 32, num_partitions: int = 8,
                       max_bucket: int = 64, seed: int = 42) -> dict:
    """Keep the near-dup index in sync with a kettleray CDC sink: the
    lake -> dedup-index leg of a training-data pipeline. First call
    bootstraps from the sink's full state; later calls consume ONLY the
    change data feed between the applied and current sink version —
    new/changed keys are (re-)signed and verified against history,
    deleted keys are tombstoned — so index maintenance cost tracks the
    upstream commit, not the corpus. Exactly-once via the same
    post-commit durable cursor contract as ``derived.sync_derived_view``
    (a replayed window re-signs identical content: the pair view is
    value-idempotent under re-delivery by the supersede rule)."""
    from kettleray.io import sink

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
        # materialize ONCE: the window is consumed twice (tombstones +
        # docs) and re-running the per-bucket merge+diff tasks would
        # double the I/O on exactly the trickle-sync path this exists
        # to optimize
        feed = sink.read_changes(src_root, applied, src_v,
                                 num_partitions=num_partitions
                                 ).materialize()

        def _del_ids(t: pa.Table) -> pa.Table:
            if "change_type" not in t.column_names:
                return pa.table({"doc_id": pa.array([],
                                                    type=pa.int64())})
            d = t.filter(pc.equal(t["change_type"], "deleted"))
            ids = stable_doc_id(d["repo"].to_pylist(),
                                d["path"].to_pylist())
            return pa.table({"doc_id": pa.array(ids, type=pa.int64())})

        dels = feed.map_batches(_del_ids, batch_format="pyarrow",
                                zero_copy_batch=True)
        # tombstones are driver-collected: bounded by DELETES PER
        # COMMIT (the feed window), never by the corpus
        del_ids = [r["doc_id"] for r in dels.take_all()]

    def _to_docs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "text": pa.array([], type=pa.string())})
        if "change_type" in t.column_names:
            t = t.filter(pc.not_equal(t["change_type"], "deleted"))
        ids = stable_doc_id(t["repo"].to_pylist(),
                            t["path"].to_pylist())
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "text": t[text_col]})

    docs = feed.map_batches(_to_docs, batch_format="pyarrow",
                            zero_copy_batch=True)
    if applied is not None:
        # the feed can contain zero-column empty blocks (pruned-bucket
        # items) that map_batches cannot repair — the window is
        # commit-bounded, so solidifying is safe here
        docs = _solidify_small(docs, limit=2_000_000, schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string())]))
    man = apply_incremental_lsh(
        index_root, docs, id_col="doc_id", text_col="text",
        num_perm=num_perm, bands=bands, shingle_k=shingle_k,
        threshold=threshold, num_buckets=num_buckets,
        num_partitions=num_partitions, max_bucket=max_bucket,
        seed=seed, deletes=del_ids or None)
    tmpc = cursor + "." + uuid.uuid4().hex[:6]
    with open(tmpc, "w") as f:
        json.dump({"src_version": src_v}, f)
    os.replace(tmpc, cursor)
    return man


# ------------------------------------------------------------- compact

def compact_lsh(root: str, *, num_partitions: int = 8) -> dict:
    """Fold the index: drop superseded band/sketch rows and dead pairs,
    rewrite one base fragment set per bucket, clear the tombstone log
    (deletes are now folded into the data). One doc_id-keyed shuffle for
    the band store (band rows are bucketed by hash, not id, so staleness
    needs the per-doc latest version); the sketch store compacts with a
    doc_id repartition only."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no index at {root}")
    man = read_manifest(root, v)
    params = man["params"]
    num_buckets = params["num_buckets"]
    dmap = _deleted_map(root, v)
    v2 = _next_version(root)
    t0 = time.time()
    lastv = _lastv_ds(root, v)

    def _live_latest(t: pa.Table) -> pa.Table:
        """rows joined with __lv: keep v == __lv and not tombstoned."""
        if t.num_rows == 0:
            return t
        vs = _np_col(t, "v")
        lv = _np_col(t, "__lv")
        keep = vs == lv
        if dmap:
            keep &= _del_versions(_np_col(t, "doc_id"), dmap) < lv
        return t.filter(pa.array(keep)).drop_columns(["__lv"])

    stage = os.path.join(root, f"_stage_v{v2:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)

    band_dirs = _bucket_dirs(_vdir(root, v), "bands")
    if band_dirs:
        b = _fix_bucket_col(ray.data.read_parquet(band_dirs), drop=True)
        b = b.join(lastv, join_type="inner", on=("doc_id",),
                   num_partitions=num_partitions)
        b = b.map_batches(_live_latest, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)
        b = b.map_batches(
            lambda t: t.append_column("bucket", pa.array(_band_bucket(
                _np_col(t, "band_id"), _np_col(t, "band_hash"),
                num_buckets), type=pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
        tmp = os.path.join(stage, "_b")
        _write_bucketed(b, tmp, stage, "bands", v2, num_buckets,
                        num_partitions)

    sk_dirs = _bucket_dirs(_vdir(root, v), "sketch")
    if sk_dirs:
        s = _fix_bucket_col(ray.data.read_parquet(sk_dirs), drop=True)
        s = s.repartition(num_partitions, keys=["doc_id"]).map_batches(
            _latest_per_doc, batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)
        if dmap:
            def _drop_dead(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return t
                keep = _del_versions(_np_col(t, "doc_id"), dmap) \
                    < _np_col(t, "v")
                return t.filter(pa.array(keep))
            s = s.map_batches(_drop_dead, batch_format="pyarrow",
                              zero_copy_batch=True)
        s = s.map_batches(
            lambda t: (t.drop_columns(["bucket"])
                       if "bucket" in t.column_names else t)
            .append_column("bucket", pa.array(_id_bucket(
                _np_col(t, "doc_id"), num_buckets), type=pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
        tmp = os.path.join(stage, "_s")
        _write_bucketed(s, tmp, stage, "sketch", v2, num_buckets,
                        num_partitions)

    live = read_pairs(root, num_partitions=num_partitions)
    live = live.materialize()
    if live.count():
        tmp = os.path.join(stage, "_p")
        live.map_batches(
            lambda t: t.append_column(
                "v", pa.array(np.full(t.num_rows, v2), type=pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True
        ).write_parquet(tmp)
        pdir = os.path.join(stage, "pairs")
        os.makedirs(pdir, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(tmp))):
            if f.endswith(".parquet"):
                os.rename(os.path.join(tmp, f), os.path.join(
                    pdir, f"pairs-v{v2:04d}-{i}.parquet"))
        shutil.rmtree(tmp)

    man2 = {"version": v2, "params": params,
            "counts": {"compacted_from": v,
                       "live_pairs": int(live.count()),
                       "deletes": 0},
            "touched_buckets": [],
            "write_sec": round(time.time() - t0, 3)}
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        json.dump(man2, f)
    _commit_rename(root, stage, v2)
    tmpc = os.path.join(root, f"CURRENT.{uuid.uuid4().hex[:6]}")
    with open(tmpc, "w") as f:
        f.write(f"v{v2:04d}")
    os.replace(tmpc, os.path.join(root, "CURRENT"))
    return man2
