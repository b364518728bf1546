"""Deduplication family for large-scale training-data pipelines.

Beyond Kettle's Unique Rows: exact hash dedup, MinHash+LSH near-dup,
SimHash fingerprints, n-gram Jaccard verification, embedding-cosine
near-dup. All designed as Dataset pipelines:

  shingle/minhash per batch (vectorized numpy)
    -> explode to (band_id, band_hash, doc_id)
    -> hash-partition groupby on the band bucket
    -> candidate pairs within bucket
    -> exact-Jaccard verify
    -> min-label propagation for connected components.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(text: str, k: int) -> np.ndarray:
    """k-character shingle hashes (uint64) of one document."""
    n = max(len(text) - k + 1, 1)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        h = hashlib.blake2b(text[i:i + k].encode("utf-8"),
                            digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def _word_shingles(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = np.empty(len(grams), dtype=np.uint64)
    for i, g in enumerate(grams):
        out[i] = int.from_bytes(
            hashlib.blake2b(g.encode("utf-8"), digest_size=8).digest(),
            "little")
    return out


class MinHasher:
    """Stateful per-actor minhash signer: permutation coefficients built
    once in __init__ (the actor-pool pattern for stateful stages).

    Vectorized batch path: Arrow whitespace split -> dictionary-encoded
    token vocabulary (hash each UNIQUE token once) -> rolling k-gram
    shingle hashes over the flat token stream (numpy) -> per-doc
    signature minima via np.minimum.reduceat. No per-document Python
    loop in the hot path."""

    def __init__(self, id_col: str, text_col: str, num_perm: int,
                 shingle_k: int, bands: int, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, num_perm).astype(np.uint64)
        self.id_col, self.text_col = id_col, text_col
        self.num_perm, self.k, self.bands = num_perm, shingle_k, bands
        self.rows_per_band = num_perm // bands
        # rolling-combine multipliers for k consecutive token hashes
        self.roll = (np.uint64(0x100000001B3) **
                     np.arange(shingle_k, dtype=np.uint64))

    def signatures(self, batch: pa.Table) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix, vectorized."""
        import pyarrow.compute as pc
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        flat = pc.list_flatten(toks)
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ndocs = len(counts)
        enc = pc.dictionary_encode(flat)
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

        n = len(tok_h)
        k = self.k
        doc_of = np.repeat(np.arange(ndocs), counts)
        with np.errstate(over="ignore"):
            # shingle hash at token position i combines tok_h[i..i+k-1]
            sh = np.zeros(max(n - k + 1, 0), dtype=np.uint64)
            for j in range(k):
                sh += tok_h[j:n - k + 1 + j] * self.roll[j]
            valid = np.zeros(max(n - k + 1, 0), dtype=bool)
            if n >= k:
                valid = doc_of[:n - k + 1] == doc_of[k - 1:]
            # fallback single shingle for docs shorter than k tokens
            doc_sum = np.zeros(ndocs, dtype=np.uint64)
            if n:
                starts = np.concatenate(
                    [[0], np.cumsum(counts)[:-1]]).astype(np.int64)
                nz = counts > 0
                if nz.any():
                    doc_sum[nz] = np.add.reduceat(tok_h, starts[nz])
            sh_doc = doc_of[:n - k + 1][valid] if n >= k else \
                np.empty(0, np.int64)
            sh_valid = sh[valid]
            n_valid = np.bincount(sh_doc, minlength=ndocs) \
                if len(sh_doc) else np.zeros(ndocs, np.int64)
            need_fallback = n_valid == 0
            fb_docs = np.nonzero(need_fallback)[0]
            all_sh = np.concatenate([sh_valid, doc_sum[fb_docs]])
            all_doc = np.concatenate([sh_doc, fb_docs])
            order = np.argsort(all_doc, kind="stable")
            all_sh, all_doc = all_sh[order], all_doc[order]
            # per-doc minima over num_perm permutations; Mersenne-prime
            # reduction via shift-add (no u64 division in the hot loop).
            # The (grams x num_perm) matrix is materialized in ~64 MB
            # gram slices aligned by doc run, with partial minima merged
            # per slice — an unbounded V was ~1.6 GB for a 40k-doc
            # block, and at 32 concurrent signer actors that ~50 GB in
            # flight thrashed the node (measured: sign barely scaled
            # 8 -> 32 cpus until this cap)
            sig = np.full((ndocs, self.num_perm),
                          np.iinfo(np.uint64).max, dtype=np.uint64)
            ngr = len(all_sh)
            # grams repeat across documents (near-dup corpora, shared
            # vocabulary): permute each UNIQUE gram once and gather,
            # when the dedup pays and the unique matrix stays small
            uniq, inv = np.unique(all_sh, return_inverse=True)
            use_uniq = (len(uniq) * self.num_perm * 8 <= (128 << 20)
                        and len(uniq) * 3 <= ngr)
            VU = self._permute(uniq) if use_uniq else None
            chunk = max(1, (64 << 20) // (8 * self.num_perm))
            for s in range(0, ngr, chunk):
                e = min(s + chunk, ngr)
                V = VU[inv[s:e]] if use_uniq else \
                    self._permute(all_sh[s:e])
                d0, d1 = int(all_doc[s]), int(all_doc[e - 1])
                # every doc in (d0, d1) has its full gram run inside the
                # slice (all_doc is sorted); d0/d1 may be partial, which
                # the minimum-merge makes harmless
                local = np.searchsorted(all_doc[s:e],
                                        np.arange(d0, d1 + 1))
                part = np.minimum.reduceat(V, local, axis=0)
                np.minimum(sig[d0:d1 + 1], part, out=sig[d0:d1 + 1])
        return sig

    def _permute(self, sh: np.ndarray) -> np.ndarray:
        """(len(sh), num_perm) permuted values — in-place arithmetic
        (one matrix + one shift temp instead of five temporaries; the
        signer is memory-bandwidth-bound when many actors share a
        node's bus, so every avoided pass is wall time)."""
        with np.errstate(over="ignore"):
            V = sh[:, None] * self.a[None, :]
            V += self.b
            hi = V >> np.uint64(61)
            V &= _MERSENNE
            V += hi
            np.subtract(V, _MERSENNE, out=V, where=V >= _MERSENNE)
        return V

    def band_hashes(self, sig: np.ndarray) -> np.ndarray:
        """(ndocs, bands) int64 band hashes from a signature matrix.

        Band hash = splitmix-style fold of the band's signature columns
        — fully vectorized ((ndocs, bands) in a handful of numpy ops;
        the per-(doc, band) blake2b loop was the signing bottleneck).
        Cross-signature collisions are ~2^-64: harmless false
        candidates, removed by the exact-Jaccard verify."""
        ndocs = sig.shape[0]
        rpb = self.rows_per_band
        C1 = np.uint64(0x9E3779B97F4A7C15)
        C2 = np.uint64(0xBF58476D1CE4E5B9)
        with np.errstate(over="ignore"):
            h = np.zeros((ndocs, self.bands), dtype=np.uint64)
            for j in range(rpb):
                col = sig[:, [b * rpb + j for b in range(self.bands)]]
                h = (h ^ (col * C1)) * C2
                h ^= h >> np.uint64(29)
        return h.astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sig = self.signatures(batch)
        ndocs = len(ids)
        out_id = np.repeat(np.asarray(ids), self.bands)
        out_band = np.tile(np.arange(self.bands, dtype=np.int32), ndocs)
        band_hash = self.band_hashes(sig).ravel()
        return pa.table({
            "doc_id": pa.array(out_id),
            "band_id": pa.array(out_band, type=pa.int32()),
            "band_hash": pa.array(band_hash, type=pa.int64()),
        })


def exact_dedup(ds, text_col: str, id_col: str, *,
                num_partitions: int = 32, keep: str = "min"):
    """Exact dedup by content hash: hash-partition on the digest +
    per-group min-id representative. Returns the surviving rows."""
    from kettleray.ops.cdc import sha256_hex_array

    def _hash(t: pa.Table) -> pa.Table:
        return t.append_column("__h", sha256_hex_array(t[text_col]))

    hashed = ds.map_batches(_hash, batch_format="pyarrow",
                            zero_copy_batch=True)
    shuffled = hashed.repartition(num_partitions, keys=["__h"])

    def _first(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.drop_columns(["__h"])
        import numpy as _np
        from kettleray.ops.cdc import _composite_key_codes
        codes = _composite_key_codes(t, ["__h"])
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(t[id_col], pa.ChunkedArray) else \
            t[id_col].to_numpy(zero_copy_only=False)
        order = _np.lexsort((ids, codes))
        sk = codes[order]
        first = _np.empty(len(sk), dtype=bool)
        first[0] = True
        first[1:] = sk[1:] != sk[:-1]
        return t.take(pa.array(order[first], type=pa.int64())) \
            .drop_columns(["__h"])

    return shuffled.map_batches(_first, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def _bucket_pairs_table(t: pa.Table, group_cols, id_col: str,
                        max_bucket: int) -> pa.Table:
    """Vectorized within-bucket all-pairs over one key-partitioned block.

    Arrow-native (no pandas): composite bucket codes -> lexsort ->
    run-length detection, then pairs emitted via precomputed triangular
    index templates applied to ALL buckets of the same size at once (one
    numpy gather per distinct bucket size, <= max_bucket iterations).

    Buckets larger than ``max_bucket`` are DROPPED and counted: an LSH
    band bucket with thousands of members is boilerplate/near-empty text,
    and its O(k^2) pairs would dominate the whole job at web scale
    (standard MinHash-LSH practice). The drop count is logged."""
    import logging
    from kettleray.ops.cdc import _composite_key_codes
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64())})
    if t.num_rows < 2:
        return empty
    codes = _composite_key_codes(t, group_cols)
    ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(t[id_col], pa.ChunkedArray) else \
        t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, codes))
    sk, sid = codes[order], ids[order]
    n = len(sk)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    begins = np.nonzero(run_start)[0]
    lens = np.diff(np.append(begins, n))
    over = lens > max_bucket
    if over.any():
        logging.getLogger("kettleray.dedup").warning(
            "minhash_lsh_pairs: dropped %d oversized band buckets "
            "(> %d docs; %d member rows) — boilerplate-heavy buckets "
            "are excluded by design", int(over.sum()), max_bucket,
            int(lens[over].sum()))
    out_a, out_b = [], []
    lens_ok = lens[~over]
    begins_ok = begins[~over]
    for m in np.unique(lens_ok):
        if m < 2:
            continue
        tmpl_i, tmpl_j = np.triu_indices(int(m), k=1)
        b_m = begins_ok[lens_ok == m]
        idx_a = (b_m[:, None] + tmpl_i[None, :]).ravel()
        idx_b = (b_m[:, None] + tmpl_j[None, :]).ravel()
        out_a.append(sid[idx_a])
        out_b.append(sid[idx_b])
    if not out_a:
        return empty
    return pa.table({
        "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
    })


def minhash_lsh_pairs(ds, id_col: str, text_col: str, *,
                      num_perm: int = 64, bands: int = 16,
                      shingle_k: int = 3, num_partitions: int = 16,
                      max_bucket: int = 64,
                      concurrency=None):
    """Candidate near-dup pairs via MinHash banding: docs sharing any
    (band_id, band_hash) bucket. Returns distinct (doc_a, doc_b) pairs,
    doc_a < doc_b. Buckets above ``max_bucket`` are dropped (logged) —
    the O(k^2) pair explosion of one hot boilerplate bucket must not
    dominate the job (see _bucket_pairs_table)."""
    from kettleray.context import auto_pool
    sigs = ds.map_batches(
        MinHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or auto_pool(),
        fn_constructor_args=(id_col, text_col, num_perm, shingle_k, bands))
    buckets = sigs.repartition(num_partitions,
                               keys=["band_id", "band_hash"])

    def _pairs(t: pa.Table) -> pa.Table:
        return _bucket_pairs_table(t, ["band_id", "band_hash"], "doc_id",
                                   max_bucket)

    pairs = buckets.map_batches(_pairs, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)
    # distinct pairs (a doc pair can collide in several bands)
    from kettleray.ops.aggregates import unique_rows
    return unique_rows(pairs, ["doc_a", "doc_b"],
                       num_partitions=num_partitions)


def jaccard_verify(pairs, docs, id_col: str, text_col: str, *,
                   shingle_k: int = 3, threshold: float = 0.7,
                   method: str = "auto", num_partitions: int = 16,
                   broadcast_limit: int = 100_000):
    """Exact n-gram Jaccard on candidate pairs.

    ``method='broadcast'`` (small candidate sets): only the
    texts of docs that APPEAR in a candidate pair are broadcast (the
    pair set, not the corpus, bounds memory) and shingled lazily per
    actor.

    ``method='join'`` (scale path, unbounded candidate sets): two
    hash-partitioned ``Dataset.join``s attach text_a / text_b to each
    pair — nothing is ever materialized on the driver; memory per task
    is one partition of pairs + texts.

    ``method='sketch'`` (preferred scale path): shingles every doc ONCE
    corpus-wide via the vectorized sketch signer (cost ∝ docs, never
    pairs), then joins 8-byte-per-gram hash sketches instead of full
    texts and scores with the flat numpy intersection kernel — no
    per-pair Python set ops, no per-batch re-shingling of documents
    that appear in many pairs.

    ``method='auto'`` (default): counts the (materialized) pair set and
    picks broadcast below ``broadcast_limit`` pairs, sketch-join above
    it — a web-scale candidate stream can never silently fall into the
    driver-materializing path."""
    import ray
    if method == "auto":
        pairs = pairs.materialize()
        method = ("broadcast" if pairs.count() <= broadcast_limit
                  else "sketch")
    if method == "sketch" and not _int_id_col(docs, id_col):
        method = "join"   # sketch signer packs int64 ids; strings take
        # the text-join path (same results, heavier wire format)
    if method == "sketch":
        sketches = sign_sketches(docs, id_col, text_col,
                                 shingle_k=shingle_k, with_bands=False)
        return _verify_sketch_join(pairs, sketches, threshold=threshold,
                                   num_partitions=num_partitions)
    if method == "join":
        return _jaccard_verify_join(pairs, docs, id_col, text_col,
                                    shingle_k=shingle_k,
                                    threshold=threshold,
                                    num_partitions=num_partitions)
    pairs = pairs.materialize()
    cand_ids = set()
    for b in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        cand_ids.update(b["doc_a"].to_pylist())
        cand_ids.update(b["doc_b"].to_pylist())
    id_arr = pa.array(sorted(cand_ids))

    def _only_candidates(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=id_arr))

    needed = docs.select_columns([id_col, text_col]).map_batches(
        _only_candidates, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    doc_table = pa.concat_tables(ray.get(needed.to_arrow_refs()))
    ref = ray.put(doc_table)

    class _Verify:
        def __init__(self):
            t = ray.get(ref)
            self.texts = dict(zip(t[id_col].to_pylist(),
                                  t[text_col].to_pylist()))
            self.cache: dict = {}   # shingles computed lazily: only docs
            # that actually appear in candidate pairs pay the cost

        def _sh(self, i):
            s = self.cache.get(i)
            if s is None:
                s = set(_word_shingles(self.texts.get(i) or "",
                                       shingle_k).tolist())
                self.cache[i] = s
            return s

        def __call__(self, t: pa.Table) -> pa.Table:
            a = t["doc_a"].to_pylist()
            b = t["doc_b"].to_pylist()
            jac = []
            for x, y in zip(a, b):
                sa, sb = self._sh(x), self._sh(y)
                inter = len(sa & sb)
                union = len(sa | sb) or 1
                jac.append(inter / union)
            out = t.append_column("jaccard",
                                  pa.array(jac, type=pa.float64()))
            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    from kettleray.context import auto_pool
    return pairs.map_batches(_Verify, batch_format="pyarrow",
                             concurrency=auto_pool())


def _jaccard_verify_join(pairs, docs, id_col: str, text_col: str, *,
                         shingle_k: int, threshold: float,
                         num_partitions: int):
    """Distributed verify: pairs ⋈ texts twice (hash-partitioned), then
    a per-batch vectorized-shingle Jaccard. No driver materialization."""
    pairs = pairs.materialize()
    if pairs.count() == 0:
        # guard: Ray 2.49's hash-shuffle join drops the schema of a
        # fully-empty side; an empty candidate set verifies to nothing
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
    texts = docs.select_columns([id_col, text_col])
    ta = texts.rename_columns({id_col: "doc_a", text_col: "__text_a"})
    tb = texts.rename_columns({id_col: "doc_b", text_col: "__text_b"})
    j = pairs.join(ta, join_type="inner", on=("doc_a",),
                   num_partitions=num_partitions)
    j = j.join(tb, join_type="inner", on=("doc_b",),
               num_partitions=num_partitions)

    def _score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "jaccard": pa.array([], type=pa.float64())})
        a_txt = t["__text_a"].to_pylist()
        b_txt = t["__text_b"].to_pylist()
        # shingle each DISTINCT text once per batch (pairs share docs)
        cache: dict = {}

        def sh(txt):
            s = cache.get(txt)
            if s is None:
                s = set(_word_shingles(txt or "", shingle_k).tolist())
                cache[txt] = s
            return s

        jac = []
        for x, y in zip(a_txt, b_txt):
            sa, sb = sh(x), sh(y)
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            jac.append(inter / union)
        out = t.drop_columns(["__text_a", "__text_b"])
        out = out.append_column("jaccard",
                                pa.array(jac, type=pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return j.map_batches(_score, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)


def _int_id_col(ds, id_col: str) -> bool:
    """True when ``id_col`` is an integer column (the sketch signer's
    wire format packs ids as int64)."""
    try:
        sch = ds.schema()
        sch = getattr(sch, "base_schema", sch)
        return pa.types.is_integer(pa.schema(sch).field(id_col).type)
    except Exception:
        return False


def _sketch_flat_u64(col) -> tuple[np.ndarray, np.ndarray]:
    """pa.Binary(Chunked)Array of 8-byte-packed sorted u64 gram hashes
    -> (flat values, per-row gram counts). Zero-copy off the Arrow value
    buffer (one view, no per-row frombuffer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    if col.type == pa.large_binary():
        off_dt = np.int64
    else:
        off_dt = np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dt)[
        col.offset: col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    flat = data[offs[0]:offs[-1]]
    vals = flat.view(np.uint64) if flat.size else \
        np.empty(0, np.uint64)
    counts = (offs[1:] - offs[:-1]) // 8
    return vals, counts


def pairwise_sketch_jaccard(sh_a, sh_b) -> np.ndarray:
    """Exact Jaccard for a batch of pairs of distinct-gram-hash sketches
    — fully vectorized, no per-pair Python loop: flatten both sides with
    a pair index, one lexsort of (pair, value), duplicates across the
    a/b boundary ARE the intersection (each side is internally
    distinct), per-pair counts via bincount."""
    va, ca = _sketch_flat_u64(sh_a)
    vb, cb = _sketch_flat_u64(sh_b)
    n = len(ca)
    if n == 0:
        return np.empty(0, np.float64)
    ia = np.repeat(np.arange(n, dtype=np.int64), ca)
    ib = np.repeat(np.arange(n, dtype=np.int64), cb)
    vals = np.concatenate([va, vb])
    idx = np.concatenate([ia, ib])
    order = np.lexsort((vals, idx))
    v, i = vals[order], idx[order]
    if len(v) > 1:
        dup = (i[1:] == i[:-1]) & (v[1:] == v[:-1])
        inter = np.bincount(i[1:][dup], minlength=n).astype(np.float64)
    else:
        inter = np.zeros(n, np.float64)
    union = ca.astype(np.float64) + cb.astype(np.float64) - inter
    return inter / np.maximum(union, 1.0)


def score_sketch_pairs(t: pa.Table, threshold: float) -> pa.Table:
    """(doc_a, doc_b, __sh_a, __sh_b, ...) -> threshold-filtered
    (doc_a, doc_b, jaccard). The shared scoring kernel for every
    sketch-join verify (batch dedup_corpus AND the incremental index)."""
    if t.num_rows == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    jac = pairwise_sketch_jaccard(t["__sh_a"], t["__sh_b"])
    out = t.select(["doc_a", "doc_b"]).append_column(
        "jaccard", pa.array(jac, type=pa.float64()))
    return out.filter(pc.greater_equal(out["jaccard"], threshold))


def sign_sketches(docs, id_col: str, text_col: str, *,
                  num_perm: int = 64, shingle_k: int = 3,
                  bands: int = 16, concurrency=None,
                  with_bands: bool = True):
    """One vectorized actor-pool pass over the corpus producing BOTH the
    LSH band hashes and the exact-verify gram sketch per doc:
    (doc_id:int64, bh:fixed_size_list<int64>[bands], sh:binary sorted
    distinct u64 gram hashes, n_sh:int64). Reuses the incremental
    index's oracle-proven signer so batch and incremental dedup share
    bit-identical candidate recall and verify semantics.

    ``with_bands=False`` skips the MinHash signature matrix + band fold
    and emits (doc_id, sh, n_sh) only — the cheap mode for verify-only
    callers that already have a candidate pair stream."""
    from kettleray.context import auto_pool
    from kettleray.ops.incdedup import _SketchSigner
    return docs.select_columns([id_col, text_col]).map_batches(
        _SketchSigner, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency or auto_pool(),
        fn_constructor_args=(id_col, text_col, num_perm, shingle_k,
                             bands),
        fn_constructor_kwargs={"with_bands": with_bands})


def _verify_sketch_join(pairs, sketches, *, threshold: float,
                        num_partitions: int):
    """Distributed verify against precomputed sketches: pairs ⋈ sketch
    twice (hash-partitioned; sketch payload is a binary blob — acero
    passes it through zero-copy), then the flat vectorized Jaccard
    kernel. Shingling cost was paid once per DOC at sign time, never
    per pair."""
    from kettleray.ops.incdedup import _verify_from_sketches
    return _verify_from_sketches(pairs, sketches, threshold=threshold,
                                 num_partitions=num_partitions)


def connected_components(pairs, *, max_iters: int = 10,
                         num_partitions: int = 8):
    """Min-label propagation over (doc_a, doc_b) edges -> (doc_id, component).
    Iterative groupby rounds (no driver union-find) so it scales with the
    edge set; converges in O(diameter) rounds."""
    edges = pairs.select_columns(["doc_a", "doc_b"]).materialize()
    if edges.count() == 0:
        # Ray's hash-shuffle groupby chokes on fully-empty inputs; an
        # empty edge set trivially has no components.
        import ray.data as _rd
        return _rd.from_arrow(pa.table({
            "node": pa.array([], type=pa.int64()),
            "component": pa.array([], type=pa.int64())}))

    def _sym(t: pa.Table) -> pa.Table:
        fwd = pa.table({"node": t["doc_a"], "nbr": t["doc_b"]})
        bwd = pa.table({"node": t["doc_b"], "nbr": t["doc_a"]})
        self_a = pa.table({"node": t["doc_a"], "nbr": t["doc_a"]})
        self_b = pa.table({"node": t["doc_b"], "nbr": t["doc_b"]})
        return pa.concat_tables([fwd, bwd, self_a, self_b])

    adj = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    id_type = edges.schema().base_schema.field("doc_a").type

    def _tag_adj(t: pa.Table) -> pa.Table:
        # side-0 rows: (key=nbr, node, lab=null) — lab validity is the
        # side marker (labels are node ids, never null)
        return pa.table({"key": t["nbr"], "node": t["node"],
                         "lab": pa.nulls(t.num_rows, id_type)})

    def _tag_labels(t: pa.Table) -> pa.Table:
        # side-1 rows: (key=node, node=null, lab=label)
        return pa.table({"key": t["node"],
                         "node": pa.nulls(t.num_rows, id_type),
                         "lab": t["label"]})

    def _join_block(t: pa.Table) -> pa.Table:
        # per-partition hash join (each key's rows co-located by the
        # repartition): node rows pick up their neighbor's label
        m1 = pc.is_valid(t["lab"])
        s1 = t.filter(m1)
        s0 = t.filter(pc.invert(m1))
        if s0.num_rows == 0 or s1.num_rows == 0:
            return pa.table({"node": pa.array([], id_type),
                             "cand": pa.array([], id_type)})
        idx = pc.index_in(s0["key"], value_set=s1["key"].combine_chunks())
        ok = pc.is_valid(idx)
        s0 = s0.filter(ok)
        cand = pc.take(s1["lab"].combine_chunks(), idx.filter(ok))
        return pa.table({"node": s0["node"], "cand": cand})

    labels = None
    prev_sum = None
    for _ in range(max_iters):
        # label(node) = min(label(neighbor)) over neighbors incl. self
        if labels is None:
            src = adj.map_batches(
                lambda t: pa.table({"node": t["node"], "cand": t["nbr"]}),
                batch_format="pyarrow")
        else:
            # label lookup as ONE co-partitioned exchange + a per-block
            # vectorized hash join (tag sides -> union -> repartition on
            # the key -> index_in within the block; the same pattern as
            # diff_snapshots). Deliberately NOT Dataset.join: acero
            # rejects join partitions made only of the zero-column
            # empty blocks the aggregate's hash shuffle can emit — a
            # runtime-block-layout-dependent (i.e. flaky) failure —
            # and the fix must not pull blocks to the driver (the
            # dedup_corpus tail is poison-tested against that).
            a = adj.map_batches(_tag_adj, batch_format="pyarrow",
                                zero_copy_batch=True)
            b = labels.map_batches(_tag_labels, batch_format="pyarrow",
                                   zero_copy_batch=True)
            src = a.union(b) \
                .repartition(num_partitions, keys=["key"]) \
                .map_batches(_join_block, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)
        from ray.data.aggregate import Min
        labels = src.groupby("node").aggregate(
            Min("cand", alias_name="label")).materialize()
        # labels are monotonically non-increasing under min-propagation,
        # so an unchanged label SUM means convergence — one distributed
        # aggregate, no driver-side label pull.
        cur_sum = labels.sum("label")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.rename_columns({"label": "component"})


def dedup_corpus(docs, id_col: str, text_col: str, *,
                 num_perm: int = 64, bands: int = 16, shingle_k: int = 3,
                 threshold: float = 0.7, num_partitions: int = 16,
                 max_bucket: int = 64, cc_iters: int = 10,
                 verify_method: str = "sketch"):
    """End-to-end near-dup corpus dedup — THE flagship LLM-training-data
    pipeline: MinHash sign -> LSH band buckets -> capped candidate pairs
    -> exact-Jaccard verify -> distributed connected components ->
    keep the min-id representative per component, drop other members.

    Every stage is a Dataset transform with NO driver materialization:
    the verify default is the hash-partitioned SKETCH join path (docs
    are signed ONCE — the same vectorized pass emits both the LSH band
    hashes and the exact-verify gram sketch, so verify never touches
    corpus text and never re-shingles) and the final representative
    filter is Ray's native ``left_anti`` join — the dropped-id set
    (which scales with corpus size, not near-dup rate) never leaves the
    object store. Returns the SURVIVING documents with their original
    columns."""
    if not _int_id_col(docs, id_col):
        # the whole MinHash-LSH family packs pair ids as int64
        # (_bucket_pairs_table) — fail at the API edge, not inside a
        # shuffle task three stages in
        raise ValueError(
            f"dedup_corpus: id column {id_col!r} must be integer "
            f"(int64 pair wire format); map string ids first, e.g. "
            f"rowops.add_sequence or a stable hash")
    if verify_method == "sketch":
        signed = sign_sketches(docs, id_col, text_col,
                               num_perm=num_perm, shingle_k=shingle_k,
                               bands=bands).materialize()

        def _explode(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].combine_chunks().to_numpy(
                zero_copy_only=False) if isinstance(
                    t["doc_id"], pa.ChunkedArray) else \
                t["doc_id"].to_numpy(zero_copy_only=False)
            col = t["bh"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            nb = col.type.list_size
            bh = col.values.to_numpy(zero_copy_only=False)
            n = len(ids)
            return pa.table({
                "doc_id": pa.array(np.repeat(ids, nb), type=pa.int64()),
                "band_id": pa.array(np.tile(
                    np.arange(nb, dtype=np.int32), n)),
                "band_hash": pa.array(bh, type=pa.int64())})

        band_rows = signed.select_columns(["doc_id", "bh"]).map_batches(
            _explode, batch_format="pyarrow", zero_copy_batch=True)
        buckets = band_rows.repartition(num_partitions,
                                        keys=["band_id", "band_hash"])

        def _pairs(t: pa.Table) -> pa.Table:
            return _bucket_pairs_table(t, ["band_id", "band_hash"],
                                       "doc_id", max_bucket)

        from kettleray.ops.aggregates import unique_rows
        pairs = unique_rows(
            buckets.map_batches(_pairs, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True),
            ["doc_a", "doc_b"], num_partitions=num_partitions)
        verified = _verify_sketch_join(
            pairs, signed.select_columns(["doc_id", "sh", "n_sh"]),
            threshold=threshold, num_partitions=num_partitions)
    else:
        pairs = minhash_lsh_pairs(docs, id_col, text_col,
                                  num_perm=num_perm,
                                  bands=bands, shingle_k=shingle_k,
                                  num_partitions=num_partitions,
                                  max_bucket=max_bucket)
        verified = jaccard_verify(pairs, docs, id_col, text_col,
                                  shingle_k=shingle_k,
                                  threshold=threshold,
                                  method=verify_method,
                                  num_partitions=num_partitions)
    comps = connected_components(verified, max_iters=cc_iters,
                                 num_partitions=max(4,
                                                    num_partitions // 2))
    # min-label propagation labels each node with its component's MIN id,
    # so the representative is exactly the node whose label == itself;
    # every other member is a drop.
    def _drops(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["component"])
        return pa.table({id_col: t.filter(keep)["node"]})

    dropped = comps.map_batches(_drops, batch_format="pyarrow",
                                zero_copy_batch=True)
    from kettleray.ops.joins import semi_join
    return semi_join(docs, dropped, [id_col], anti=True, method="join",
                     num_partitions=num_partitions)


def split_paragraphs(ds, text_col: str, id_col: str = "doc_id", *,
                     sep: str = "\n\n", tokens_per_para: int | None = None):
    """Explode documents into (id, para_idx, para) rows — the unit for
    paragraph-level dedup (the RefinedWeb-style pass below exact/fuzzy
    doc dedup). Split on ``sep``, or chunk the whitespace token stream
    into ``tokens_per_para``-token paragraphs when the corpus has no
    separator convention. Vectorized: one Arrow split + a ListArray
    re-offsetting — no per-doc Python loop."""

    def _fn(t: pa.Table) -> pa.Table:
        texts = pc.fill_null(t[text_col], "")
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        if tokens_per_para is None:
            parts = pc.split_pattern(texts, pattern=sep)
            counts = pc.list_value_length(parts) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            paras = pc.list_flatten(parts)
        else:
            trimmed = pc.utf8_trim_whitespace(texts)
            toks = pc.utf8_split_whitespace(trimmed)
            ntok = pc.list_value_length(toks) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = pc.list_flatten(toks)
            if isinstance(flat, pa.ChunkedArray):
                flat = flat.combine_chunks()
            # empty docs split to [''] — zero tokens, zero paragraphs
            is_empty = pc.equal(trimmed, "") \
                .to_numpy(zero_copy_only=False)
            if is_empty.any():
                ntok = np.where(is_empty, 0, ntok)
                flat = flat.filter(pc.not_equal(flat, ""))
            counts = -(-ntok // tokens_per_para)       # ceil div
            offs = np.concatenate([[0], np.cumsum(ntok)])
            # paragraph boundaries: off_d + j*tokens_per_para, plus the
            # doc end — built vectorized with repeat/cumsum arithmetic
            m = counts
            starts_within = (np.arange(int(m.sum())) - np.repeat(
                np.concatenate([[0], np.cumsum(m)[:-1]]), m)) \
                * tokens_per_para
            bounds = np.repeat(offs[:-1], m) + starts_within
            ends = np.minimum(bounds + tokens_per_para,
                              np.repeat(offs[1:], m))
            # paragraphs tile each doc's token range contiguously, so the
            # flat token stream IS the paragraph-value stream — only the
            # list offsets (para lengths) need computing
            lens = ends - bounds
            offs2 = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
            la = pa.ListArray.from_arrays(pa.array(offs2), flat)
            paras = pc.binary_join(la, " ")
        ndocs = len(counts)
        doc_rep = np.repeat(np.arange(ndocs), counts)
        idx_within = np.arange(int(counts.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        out_ids = ids.take(pa.array(doc_rep, type=pa.int64()))
        if isinstance(paras, pa.ChunkedArray):
            paras = paras.combine_chunks()
        return pa.table({
            id_col: out_ids,
            "para_idx": pa.array(idx_within, type=pa.int64()),
            "para": paras,
        })

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def paragraph_dedup(ds, text_col: str, id_col: str = "doc_id", *,
                    sep: str = "\n\n", tokens_per_para: int | None = None,
                    joiner: str = "\n", num_partitions: int = 16):
    """Corpus-wide paragraph-level dedup (RefinedWeb-style): explode to
    paragraphs, keep only the FIRST occurrence of each distinct
    paragraph (ordered by (doc_id, para_idx)), reassemble documents from
    their surviving paragraphs in order. Docs whose every paragraph was
    seen earlier disappear.

    Scale shape: one hash exchange on the paragraph text to pick
    winners, one doc-keyed exchange to reassemble — paragraphs never
    touch the driver."""
    paras = split_paragraphs(ds, text_col, id_col, sep=sep,
                             tokens_per_para=tokens_per_para)
    shuffled = paras.repartition(num_partitions, keys=["para"])

    def _winners(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, ["para"])
        d = _col_np(t, id_col)
        i = _col_np(t, "para_idx")
        order = np.lexsort((i, d, codes))
        sk = codes[order]
        first = np.empty(len(sk), dtype=bool)
        first[0] = True
        first[1:] = sk[1:] != sk[:-1]
        return t.take(pa.array(order[first], type=pa.int64()))

    winners = shuffled.map_batches(_winners, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True)
    from kettleray.ops.aggregates import Agg, _holistic_group_by
    out = _holistic_group_by(
        winners, [id_col],
        [Agg("para", "concat_string", text_col, order_col="para_idx",
             sep=joiner)],
        num_partitions=max(4, num_partitions // 2))
    return out


def doc_ngrams_distinct(ds, text_col: str, id_col: str = "doc_id", *,
                        n: int = 8, lowercase: bool = True):
    """Per-doc DISTINCT word n-grams as (id, gram) rows — the unit for
    train/eval contamination checks. Vectorized flat-stream build (Arrow
    slices + binary_join_element_wise, doc-boundary mask) + in-batch
    (doc, gram) dedup; docs shorter than n tokens emit nothing."""

    def _fn(t: pa.Table) -> pa.Table:
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
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        empty = pa.table({id_col: pa.array([], type=ids.type),
                          "gram": pa.array([], type=pa.string())})
        if m <= 0:
            return empty
        parts = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        doc_of = np.repeat(np.arange(len(counts)), counts)
        same_doc = doc_of[:m] == doc_of[n - 1:]
        grams = grams.filter(pa.array(same_doc))
        gdoc = doc_of[:m][same_doc]
        if len(grams) == 0:
            return empty
        enc = pc.dictionary_encode(grams)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        gc = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        perm = np.lexsort((gc, gdoc))
        sd, sg = gdoc[perm], gc[perm]
        first = np.empty(len(sd), dtype=bool)
        first[0] = True
        first[1:] = (sd[1:] != sd[:-1]) | (sg[1:] != sg[:-1])
        sel = pa.array(perm[first], type=pa.int64())
        return pa.table({
            id_col: ids.take(pa.array(sd[first], type=pa.int64())),
            "gram": grams.take(sel),
        })

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def decontaminate(train, eval_ds, text_col: str, id_col: str = "doc_id",
                  *, n: int = 8, threshold: float = 0.5,
                  lowercase: bool = True, num_partitions: int = 16,
                  method: str = "join", bits_per_key: int = 12):
    """Train/eval contamination check (the decontamination pass every
    LLM data pipeline needs): for each eval doc, the fraction of its
    DISTINCT word n-grams that occur anywhere in the train corpus, plus
    a contaminated flag at ``threshold``.

    Scale shape: eval and train gram sets meet in ONE hash-partitioned
    ``left_semi`` join on the gram (train-side duplicates are free —
    semi join semantics); per-doc totals/hits are native partial+merge
    counts; nothing touches the driver. Eval docs shorter than n tokens
    emit no grams and are absent from the output (no grams — nothing to
    check).

    ``method='bloom'`` inserts a broadcast Bloom prefilter of the EVAL
    grams on the train side (``ops.bloom``): each train batch drops
    ~everything locally, so the join's exchange volume tracks the eval
    set (true matches + an fp trickle ~0.61^bits_per_key), not the
    corpus — the shape you want when train is the 100-TB lake. The
    exact semi join downstream eliminates false positives, so the
    result is bit-identical to ``method='join'``."""
    from kettleray.ops.joins import semi_join
    ev = doc_ngrams_distinct(eval_ds, text_col, id_col, n=n,
                             lowercase=lowercase)
    tr = doc_ngrams_distinct(train, text_col, id_col, n=n,
                             lowercase=lowercase) \
        .select_columns(["gram"])
    if method == "bloom":
        from kettleray.ops import bloom as _bloom
        ev = ev.materialize()
        flt = _bloom.build_bloom(ev.select_columns(["gram"]), "gram",
                                 bits_per_key=bits_per_key)
        tr = _bloom.bloom_filter_hits(tr, "gram", flt)
    elif method != "join":
        raise ValueError(f"unknown decontaminate method {method!r}")
    matched = semi_join(ev, tr, ["gram"], method="join",
                        num_partitions=num_partitions)
    from ray.data.aggregate import Count
    from kettleray.ops.incdedup import _solidify_small
    totals = ev.groupby(id_col).aggregate(Count(alias_name="n_grams"))
    hits = matched.groupby(id_col).aggregate(Count(alias_name="n_matched"))
    # per-doc count sets can be SMALL (an uncontaminated eval set has
    # zero hits): solidify below the empty-partition regime so acero
    # never sees a zero-column join side (schema-less empty shuffle
    # blocks; see incdedup._solidify_small). Above the threshold both
    # sides stream through the native join untouched.
    nj = max(4, num_partitions // 2)
    id_type = dict(zip(ev.schema().names, ev.schema().types))[id_col]
    totals = _solidify_small(totals, schema=pa.schema(
        [(id_col, id_type), ("n_grams", pa.int64())]), num_partitions=nj)
    hits = _solidify_small(hits, schema=pa.schema(
        [(id_col, id_type), ("n_matched", pa.int64())]), num_partitions=nj)
    if hits.count() == 0:
        # zero hits anywhere (clean eval set): joining an EMPTY side
        # re-emits zero-column shuffle blocks no matter how the input
        # was solidified — append the null column directly instead
        j = totals.map_batches(
            lambda t: t.append_column(
                "n_matched", pa.nulls(t.num_rows, pa.int64())),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        j = totals.join(hits, join_type="left_outer", on=(id_col,),
                        num_partitions=nj)

    def _score(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "n_grams": pa.array([], type=pa.int64()),
                "n_matched": pa.array([], type=pa.int64()),
                "contamination": pa.array([], type=pa.float64()),
                "contaminated": pa.array([], type=pa.bool_())})
        tot = t["n_grams"].combine_chunks() if isinstance(
            t["n_grams"], pa.ChunkedArray) else t["n_grams"]
        hit = pc.fill_null(t["n_matched"], 0)
        score = pc.divide(pc.cast(hit, pa.float64()),
                          pc.cast(tot, pa.float64()))
        out = t.set_column(t.column_names.index("n_matched"), "n_matched",
                           pc.cast(hit, pa.int64()))
        out = out.append_column(
            "contamination",
            pc.round(score, ndigits=6,
                     round_mode="half_towards_infinity"))
        return out.append_column("contaminated",
                                 pc.greater_equal(score, threshold))

    return j.map_batches(_score, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True)


def simhash(ds, id_col: str, text_col: str, *, seed: int = 42,
            hash_name: str = "blake2b",
            concurrency=None):
    """64-bit SimHash per document + 4 16-bit band keys (hamming<=3
    near-dup candidates share >=1 band by pigeonhole).

    ``hash_name``: per-token 64-bit hash. "blake2b" (default, fastest
    mixing) or "md5" (high 8 bytes big-endian — reproducible in DuckDB
    SQL as ``('0x'||substr(md5(w),1,16))::UBIGINT``, which is what the
    driver oracle for ``simhash_fingerprints`` uses)."""

    class _SimHash:
        """Vectorized signer (the MinHasher vocab-dedup trick): Arrow
        whitespace tokenize -> dictionary-encode -> blake2b each UNIQUE
        token once -> unpack its 64 bits to a ±1 row -> per-doc column
        sums via np.add.reduceat over the flat token stream. No
        per-document / per-token Python loop."""

        def __init__(self):
            self.shifts = np.arange(64, dtype=np.uint64)

        def __call__(self, t: pa.Table) -> pa.Table:
            texts = t[text_col]
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            # trim + fill_null so Arrow's split matches str.split() (no
            # boundary empty tokens; null/empty doc -> fingerprint 0)
            texts = pc.fill_null(pc.utf8_trim_whitespace(texts), "")
            toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
            counts = pc.list_value_length(toks) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            ndocs = len(counts)
            enc = pc.dictionary_encode(pc.list_flatten(toks))
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            vocab = enc.dictionary.to_pylist()
            if hash_name == "md5":
                vh = np.fromiter(
                    (int.from_bytes(hashlib.md5(
                        w.encode("utf-8")).digest()[:8], "big")
                     for w in vocab),
                    dtype=np.uint64, count=len(vocab))
            else:
                vh = np.fromiter(
                    (int.from_bytes(hashlib.blake2b(w.encode("utf-8"),
                                                    digest_size=8).digest(),
                                    "little") for w in vocab),
                    dtype=np.uint64, count=len(vocab))
            # ±1 contribution matrix per UNIQUE token: (n_vocab, 64)
            pm = (((vh[:, None] >> self.shifts[None, :]) & 1)
                  .astype(np.int32) * 2 - 1).astype(np.int32)
            for vi, w in enumerate(vocab):   # whitespace-only doc => ['']
                if w == "":
                    pm[vi, :] = 0
            acc = np.zeros((ndocs, 64), dtype=np.int64)
            idx = enc.indices.to_numpy(zero_copy_only=False)
            if len(idx):
                contrib = pm[idx]                     # (n_tokens, 64)
                starts = np.concatenate(
                    [[0], np.cumsum(counts)[:-1]]).astype(np.int64)
                nz = counts > 0
                if nz.any():
                    acc[nz] = np.add.reduceat(contrib, starts[nz], axis=0)
            fp = ((acc > 0).astype(np.uint64) <<
                  self.shifts[None, :]).sum(axis=1, dtype=np.uint64)
            return pa.table({
                id_col: t[id_col],
                "simhash": pa.array([f"{int(f):016x}" for f in fp],
                                    type=pa.string()),
                "band0": pa.array((fp & np.uint64(0xFFFF))
                                  .astype(np.int32)),
                "band1": pa.array(((fp >> np.uint64(16))
                                   & np.uint64(0xFFFF)).astype(np.int32)),
                "band2": pa.array(((fp >> np.uint64(32))
                                   & np.uint64(0xFFFF)).astype(np.int32)),
                "band3": pa.array(((fp >> np.uint64(48))
                                   & np.uint64(0xFFFF)).astype(np.int32)),
            })

    from kettleray.context import auto_pool
    return ds.map_batches(_SimHash, batch_format="pyarrow",
                          zero_copy_batch=True,
                          concurrency=concurrency or auto_pool())


def embedding_cosine_dups(ds, id_col: str, vec_col: str, *,
                          threshold: float = 0.95,
                          method: str = "lsh",
                          n_planes: int = 8, seed: int = 42,
                          num_partitions: int = 16,
                          max_bucket: int = 8192,
                          brute_force_max_rows: int = 100_000,
                          block_rows: int = 2048):
    """Embedding near-dup pairs (id_a < id_b, cosine >= threshold).

    Default ``method='lsh'`` is the SCALE path: random-hyperplane bucket
    per row (similarity.lsh_buckets), ONE hash shuffle on the bucket id,
    then a per-bucket numpy matmul inside each key-partitioned block —
    work is O(sum bucket_size^2), never O(N^2), and nothing is
    materialized on the driver. Caveat (documented LSH semantics):
    near-threshold pairs split across buckets are missed — exact
    duplicates always co-bucket; raise recall with more probes/bands.
    Buckets above ``max_bucket`` are processed in matmul chunks, not
    dropped (a dup-heavy bucket is signal here, unlike LSH text bands).

    ``method='brute'`` is the small-N exact path (guarded at
    ``brute_force_max_rows``): broadcast the whole normalized matrix
    once, per-batch matmul against it."""
    import ray
    if method == "lsh":
        from kettleray.ops import similarity
        bucketed = similarity.lsh_buckets(ds, id_col, vec_col,
                                          n_planes=n_planes, seed=seed)
        return grouped_cosine_pairs(bucketed, id_col, vec_col, "bucket",
                                    threshold=threshold,
                                    num_partitions=num_partitions,
                                    chunk_rows=max_bucket)

    return _embedding_brute_pairs(ds, id_col, vec_col,
                                  threshold=threshold,
                                  brute_force_max_rows=brute_force_max_rows,
                                  block_rows=block_rows)


def grouped_cosine_pairs(assigned, id_col: str, vec_col: str,
                         group_col: str, *, threshold: float,
                         num_partitions: int = 16,
                         chunk_rows: int = 8192):
    """Within-group cosine pairs (id_a < id_b, cosine >= threshold):
    ONE hash shuffle on ``group_col``, then a per-group numpy matmul
    inside each key-partitioned block — work is O(sum group_size^2),
    never O(N^2); groups above ``chunk_rows`` are matmul-chunked, not
    dropped. The shared kernel behind embedding_cosine_dups (LSH
    buckets) and semantic_dedup (k-means clusters)."""
    shuffled = assigned.repartition(num_partitions, keys=[group_col])
    max_bucket = chunk_rows

    def _bucket_pairs(t: pa.Table) -> pa.Table:
        from kettleray.ops.cdc import _col_np
        empty = pa.table({
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64())})
        if t.num_rows < 2:
            return empty
        from kettleray.ops.similarity import _to_matrix
        bkt = _col_np(t, group_col)
        ids = _col_np(t, id_col)
        order = np.argsort(bkt, kind="stable")
        mat = _to_matrix(t[vec_col])
        mat = mat[order]
        mat = mat / np.maximum(        # out-of-place: _to_matrix
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        # may return a read-only zero-copy view
        ids = ids[order]
        sb = bkt[order]
        begins = np.nonzero(np.concatenate(
            [[True], sb[1:] != sb[:-1]]))[0]
        ends = np.append(begins[1:], len(sb))
        out_a, out_b, out_c = [], [], []
        for lo, hi in zip(begins, ends):
            m = hi - lo
            if m < 2:
                continue
            sub = mat[lo:hi]
            sub_ids = ids[lo:hi]
            for c0 in range(0, m, max_bucket):
                c1 = min(c0 + max_bucket, m)
                sims = sub[c0:c1] @ sub.T
                ai, bj = np.nonzero(sims >= threshold)
                a = sub_ids[c0 + ai]
                b = sub_ids[bj]
                keep = a < b
                out_a.append(a[keep])
                out_b.append(b[keep])
                out_c.append(np.round(sims[ai, bj][keep], 6))
        if not out_a:
            return empty
        return pa.table({
            "id_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "id_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "cosine": pa.array(np.concatenate(out_c),
                               type=pa.float64())})

    return shuffled.map_batches(_bucket_pairs, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def _embedding_brute_pairs(ds, id_col: str, vec_col: str, *,
                           threshold: float, brute_force_max_rows: int,
                           block_rows: int):
    """Exact all-pairs cosine (small-N only, guarded): broadcast the
    whole normalized matrix once, per-batch matmul against it."""
    import ray
    t = pa.concat_tables(
        ray.get(ds.select_columns([id_col, vec_col]).to_arrow_refs()))
    if t.num_rows > brute_force_max_rows:
        raise ValueError(
            f"embedding_cosine_dups(method='brute') on {t.num_rows} rows "
            f"exceeds the {brute_force_max_rows}-row guard — use the "
            "default method='lsh' (O(N^2) all-pairs is a design error at "
            "scale)")
    from kettleray.ops.similarity import _to_matrix
    ids_all = np.asarray(t[id_col].to_pylist())
    mat = _to_matrix(t[vec_col])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_all, mat))

    class _Cos:
        def __init__(self):
            self.ids_all, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from kettleray.ops.similarity import _to_matrix
            ids = np.asarray(batch[id_col].to_pylist())
            vecs = _to_matrix(batch[vec_col])
            vecs = vecs / np.maximum(
                np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = vecs @ self.mat.T
            ai, bj = np.nonzero(sims >= threshold)
            a = ids[ai]
            b = self.ids_all[bj]
            keep = a < b
            return pa.table({
                "id_a": pa.array(a[keep], type=pa.int64()),
                "id_b": pa.array(b[keep], type=pa.int64()),
                "cosine": pa.array(np.round(sims[ai, bj][keep], 6),
                                   type=pa.float64()),
            })

    from kettleray.context import auto_pool
    return ds.map_batches(_Cos, batch_format="pyarrow",
                          batch_size=block_rows,
                          concurrency=auto_pool())


def semantic_dedup(emb, id_col: str, vec_col: str, centroids, *,
                   threshold: float = 0.95, num_partitions: int = 8,
                   cc_iters: int = 10, chunk_rows: int = 8192):
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): k-means-cluster the
    embedding space, find near-identical pairs WITHIN each cluster
    (cosine >= threshold), keep one representative per duplicate group.

    Returns the SURVIVING ``(id_col, cluster)`` rows — ids only, never
    the vectors (acero joins reject list<> payloads, and survivors'
    vectors are a cheap semi-join away when needed).

    Scale shape: centroids broadcast once (clustering.kmeans_assign);
    pairwise work is O(sum cluster_size^2) inside one cluster-keyed
    shuffle (grouped_cosine_pairs — the same kernel as the LSH path,
    clusters chunk-matmul'd above ``chunk_rows``); duplicate groups
    resolve via distributed min-label propagation; the final
    representative filter is a Ray-native anti join. Nothing
    corpus-sized touches the driver."""
    from kettleray.ops import clustering
    from kettleray.ops.joins import semi_join

    assigned = clustering.kmeans_assign(
        emb.select_columns([id_col, vec_col]), vec_col, centroids) \
        .materialize()
    pairs = grouped_cosine_pairs(assigned, id_col, vec_col, "cluster",
                                 threshold=threshold,
                                 num_partitions=num_partitions,
                                 chunk_rows=chunk_rows)
    edges = pairs.map_batches(
        lambda t: pa.table({"doc_a": t["id_a"], "doc_b": t["id_b"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    # the cluster-keyed shuffle leaves zero-column empty blocks that
    # map_batches skips; CC's label join would die on an all-empty
    # partition in the small regime — rebuild it schema'd there
    from kettleray.ops.incdedup import _solidify_small
    edges = _solidify_small(edges, num_partitions=num_partitions,
                            schema=pa.schema([("doc_a", pa.int64()),
                                              ("doc_b", pa.int64())]))
    comps = connected_components(edges, max_iters=cc_iters,
                                 num_partitions=max(4,
                                                    num_partitions // 2))

    def _drops(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["component"])
        return pa.table({id_col: t.filter(keep)["node"]})

    dropped = comps.map_batches(_drops, batch_format="pyarrow",
                                zero_copy_batch=True)
    ids = assigned.map_batches(
        lambda t: pa.table({id_col: t[id_col], "cluster": t["cluster"]}),
        batch_format="pyarrow", zero_copy_batch=True)
    return semi_join(ids, dropped, [id_col], anti=True, method="join",
                     num_partitions=num_partitions)


def winnowing_neardup(ds, text_col: str, id_col: str = "doc_id", *,
                      k: int = 8, w: int = 4, min_shared: int = 40,
                      max_bucket: int = 64, num_partitions: int = 16):
    """Rolling-hash near-dup detection via winnowing fingerprints
    (≙ MOSS): sign each doc with window-min k-gram hashes, hash-partition
    on fingerprint, emit within-bucket pairs (hot fingerprints above
    ``max_bucket`` docs dropped — boilerplate), then count shared
    fingerprints per pair with a map-side combine + ONE pair-keyed
    shuffle. Pairs sharing >= ``min_shared`` prints are near-dups.

    Scale shape: two narrow shuffles (8 B fingerprint rows; pair rows),
    no doc text ever moves after signing; bucket cap bounds the pair
    explosion exactly like minhash_lsh_pairs."""
    from kettleray.ops.textstats import winnowing_fingerprints

    fps = winnowing_fingerprints(ds, text_col, id_col, k=k, w=w)
    part = fps.repartition(num_partitions, keys=["fingerprint"])

    def _pairs(t: pa.Table) -> pa.Table:
        return _bucket_pairs_table(t, ["fingerprint"], id_col, max_bucket)

    pairs = part.map_batches(_pairs, batch_format="pyarrow",
                             batch_size=None, zero_copy_batch=True)

    def _local_count(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("doc_a", "count")])
        return g.rename_columns(["doc_a", "doc_b", "shared"])

    pre = pairs.map_batches(_local_count, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)
    shuf = pre.repartition(max(8, num_partitions // 2),
                           keys=["doc_a", "doc_b"])

    def _final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64())})
        g = t.group_by(["doc_a", "doc_b"]).aggregate([("shared", "sum")])
        g = g.rename_columns(["doc_a", "doc_b", "shared"])
        g = g.set_column(2, "shared", g["shared"].cast(pa.int64()))
        return g.filter(pc.greater_equal(g["shared"], min_shared))

    return shuf.map_batches(_final, batch_format="pyarrow",
                            batch_size=None, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Cross-document substring dedup: duplicated k-gram spans (Lee et al. 2022
# "Deduplicating Training Data Makes Language Models Better" — same goal as
# the suffix-array ExactSubstr pass, re-expressed as hash-partitioned k-gram
# matching so it runs as two Ray Data exchanges instead of a monolithic
# suffix array).
# ---------------------------------------------------------------------------

def kgram_occurrences(ds, text_col: str, id_col: str = "doc_id", *,
                      k: int = 8, lowercase: bool = True,
                      hashed: bool = False):
    """Every word k-gram occurrence as (id, pos, gram) rows — pos is
    1-BASED (SQL-oracle parity). Vectorized flat-stream build: one
    whitespace split per batch, k shifted Arrow slices joined
    element-wise, doc-boundary mask — no per-doc Python loop.

    ``hashed=True`` replaces the gram string with a 64-bit splitmix
    combine of per-word hashes (computed once per DISTINCT word via
    dictionary encoding): the production mode — the downstream exchange
    ships 8 bytes per occurrence instead of the k-word string. Collision
    odds at 10^12 grams are ~3·10^-8 per pair (64-bit birthday), and a
    collision only ever OVER-marks a span as duplicated."""

    def _fn(t: pa.Table) -> pa.Table:
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
        ids = t[id_col].combine_chunks() if isinstance(
            t[id_col], pa.ChunkedArray) else t[id_col]
        gtype = pa.uint64() if hashed else pa.string()
        empty = pa.table({id_col: pa.array([], type=ids.type),
                          "pos": pa.array([], type=pa.int64()),
                          "gram": pa.array([], type=gtype)})
        m = len(flat) - k + 1
        if m <= 0:
            return empty
        doc_of = np.repeat(np.arange(len(counts)), counts)
        same_doc = doc_of[:m] == doc_of[k - 1:]
        if hashed:
            enc = pc.dictionary_encode(flat)
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            import zlib
            dwords = enc.dictionary.to_pylist()
            wh = np.fromiter(
                (zlib.crc32(w.encode()) for w in dwords),
                dtype=np.uint64, count=len(dwords))
            # spread the 32-bit crc to 64 bits (splitmix finalizer)
            from kettleray.gen.synthetic import _mix64
            wh = _mix64(wh, 17)
            codes = wh[enc.indices.to_numpy(zero_copy_only=False)]
            with np.errstate(over="ignore"):
                acc = np.zeros(m, dtype=np.uint64)
                B = np.uint64(0x100000001B3)      # FNV-ish odd multiplier
                for j in range(k):
                    acc = acc * B + codes[j:j + m]
            grams = pa.array(acc, type=pa.uint64())
        else:
            parts = [flat.slice(j, m) for j in range(k)]
            grams = pc.binary_join_element_wise(*parts, " ")
        sel = pa.array(same_doc)
        grams = grams.filter(sel)
        gdoc = doc_of[:m][same_doc]
        # 1-based position within the doc
        doc_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        pos = (np.arange(m)[same_doc] - doc_start[gdoc] + 1)
        return pa.table({
            id_col: ids.take(pa.array(gdoc, type=pa.int64())),
            "pos": pa.array(pos, type=pa.int64()),
            "gram": grams,
        })

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def _mark_duplicated(occ, id_col: str, *, min_docs: int,
                     num_partitions: int, keep_winner_flag: bool):
    """ONE gram-hash exchange: co-locate each gram's occurrences, keep
    the occurrences of grams appearing in >= min_docs distinct docs.
    With ``keep_winner_flag`` each kept row also carries is_first —
    whether it is the gram's global first occurrence by (doc, pos)
    lexicographic order (the occurrence span-cutting preserves)."""
    sh = occ.repartition(num_partitions, keys=["gram"])

    def _filter(t: pa.Table) -> pa.Table:
        cols = [id_col, "pos"] + (["is_first"] if keep_winner_flag
                                  else [])
        if t.num_rows == 0 or t.num_columns == 0:
            arrs = {id_col: pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int64())}
            if keep_winner_flag:
                arrs["is_first"] = pa.array([], type=pa.bool_())
            return pa.table(arrs).select(cols)
        from kettleray.ops.cdc import _col_np, _composite_key_codes
        codes = _composite_key_codes(t, ["gram"])
        d = _col_np(t, id_col)
        p = _col_np(t, "pos")
        order = np.lexsort((p, d, codes))
        sg, sd = codes[order], d[order]
        n = len(sg)
        start = np.empty(n, dtype=bool)
        start[0] = True
        start[1:] = sg[1:] != sg[:-1]
        gid = np.cumsum(start) - 1
        # distinct docs per gram: doc changes within a run (rows are
        # sorted by (gram, doc, pos))
        doc_change = np.empty(n, dtype=bool)
        doc_change[0] = True
        doc_change[1:] = start[1:] | (sd[1:] != sd[:-1])
        ndocs = np.bincount(gid, weights=doc_change.astype(np.int64))
        keep = ndocs[gid] >= min_docs
        out = t.take(pa.array(order[keep], type=pa.int64()))
        if keep_winner_flag:
            out = out.append_column(
                "is_first", pa.array(start[keep]))
        return out.select([c for c in ([id_col, "pos", "is_first"]
                                       if keep_winner_flag
                                       else [id_col, "pos"])])

    return sh.map_batches(_filter, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def _merge_islands(sd: np.ndarray, sp: np.ndarray, k: int):
    """Island detection over (doc, pos)-sorted dup occurrences: a new
    span starts when the doc changes or the gap exceeds k (intervals
    [p, p+k) overlap or touch iff next_p <= p + k)."""
    n = len(sd)
    brk = np.empty(n, dtype=bool)
    brk[0] = True
    brk[1:] = (sd[1:] != sd[:-1]) | (sp[1:] - sp[:-1] > k)
    return brk


def duplicate_span_stats(docs, id_col: str = "doc_id",
                         text_col: str = "text", *,
                         k: int = 8, min_docs: int = 2,
                         lowercase: bool = True, hashed: bool = False,
                         num_partitions: int = 16):
    """Per-doc duplicated-substring statistics: which spans of each
    document also appear (verbatim, at k-word granularity) in at least
    ``min_docs - 1`` other documents. Returns one row per affected doc:
    ``dup_kgrams`` (duplicated k-gram occurrences), ``dup_spans``
    (maximal merged spans), ``dup_tokens`` (tokens covered by them).

    Scale shape: occurrence build is map-only; ONE gram exchange finds
    cross-doc grams and filters occurrences in the same pass (each
    gram's occurrences are co-located — no separate count + join);
    ONE doc exchange merges islands. No pair emission anywhere, so a
    gram occurring in a million docs costs a million rows, never a
    million-squared."""
    occ = kgram_occurrences(docs, text_col, id_col, k=k,
                            lowercase=lowercase, hashed=hashed)
    marked = _mark_duplicated(occ, id_col, min_docs=min_docs,
                              num_partitions=num_partitions,
                              keep_winner_flag=False)
    byd = marked.repartition(max(4, num_partitions // 2),
                             keys=[id_col])

    def _stats(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "dup_kgrams": pa.array([], type=pa.int64()),
                "dup_spans": pa.array([], type=pa.int64()),
                "dup_tokens": pa.array([], type=pa.int64())})
        from kettleray.ops.cdc import _col_np
        d = _col_np(t, id_col)
        p = _col_np(t, "pos")
        order = np.lexsort((p, d))
        sd, sp = d[order], p[order]
        brk = _merge_islands(sd, sp, k)
        sid = np.cumsum(brk) - 1
        nspan = int(sid[-1]) + 1
        first_pos = sp[brk]
        last_pos = np.zeros(nspan, dtype=np.int64)
        np.maximum.at(last_pos, sid, sp)
        span_doc = sd[brk]
        span_tokens = last_pos - first_pos + k
        doc_change = np.empty(nspan, dtype=bool)
        doc_change[0] = True
        doc_change[1:] = span_doc[1:] != span_doc[:-1]
        did = np.cumsum(doc_change) - 1
        out_doc = span_doc[doc_change]
        dup_spans = np.bincount(did)
        dup_tokens = np.bincount(did, weights=span_tokens.astype(
            np.int64)).astype(np.int64)
        kcnt = np.bincount(sid)
        dup_kgrams = np.bincount(did, weights=kcnt.astype(
            np.int64)).astype(np.int64)
        return pa.table({
            id_col: pa.array(out_doc).cast(t[id_col].type),
            "dup_kgrams": pa.array(dup_kgrams, type=pa.int64()),
            "dup_spans": pa.array(dup_spans, type=pa.int64()),
            "dup_tokens": pa.array(dup_tokens, type=pa.int64())})

    return byd.map_batches(_stats, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)


def cut_duplicate_spans(docs, id_col: str = "doc_id",
                        text_col: str = "text", *,
                        k: int = 8, min_docs: int = 2,
                        lowercase: bool = True, hashed: bool = True,
                        num_partitions: int = 16):
    """Rewrite the corpus with duplicated substrings CUT (the ExactSubstr
    removal pass): every token covered by a duplicated k-gram occurrence
    that is NOT its gram's global first occurrence (min (doc, pos)) is
    removed; the first occurrence survives its own gram's cut (though an
    overlapping OTHER duplicated gram may still cut its tokens — same
    behavior as removing each repeated span independently).

    Returns (id, text) with the rewritten text; docs losing every token
    come back with empty text (filter downstream if desired). Three
    exchanges total: gram-hash (mark + winner flag), doc-hash (interval
    build), doc-hash merge join against the original text. The rebuild
    is vectorized: flat token stream + boolean keep-mask + ListArray
    re-offsetting + one binary_join."""
    occ = kgram_occurrences(docs, text_col, id_col, k=k,
                            lowercase=lowercase, hashed=hashed)
    marked = _mark_duplicated(occ, id_col, min_docs=min_docs,
                              num_partitions=num_partitions,
                              keep_winner_flag=True)
    losers = marked.map_batches(
        lambda t: t.filter(pc.invert(t["is_first"])).select(
            [id_col, "pos"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)

    def _intervals(t: pa.Table) -> pa.Table:
        # Intervals ride the join as PACKED BINARY blobs (little-endian
        # int64 pairs), not list<int64>: Arrow's acero hash join rejects
        # nested types in non-key payload columns, and a fixed-width
        # blob decodes zero-copy on the other side.
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "cut_blob": pa.array([], type=pa.binary())})
        from kettleray.ops.cdc import _col_np
        d = _col_np(t, id_col)
        p = _col_np(t, "pos")
        order = np.lexsort((p, d))
        sd, sp = d[order], p[order]
        brk = _merge_islands(sd, sp, k)
        sid = np.cumsum(brk) - 1
        nspan = int(sid[-1]) + 1
        first_pos = sp[brk]
        last_pos = np.zeros(nspan, dtype=np.int64)
        np.maximum.at(last_pos, sid, sp)
        span_doc = sd[brk]
        doc_change = np.empty(nspan, dtype=bool)
        doc_change[0] = True
        doc_change[1:] = span_doc[1:] != span_doc[:-1]
        per_doc = np.bincount(np.cumsum(doc_change) - 1)
        # interleave (start, end_inclusive) pairs per span, then pack
        pairs = np.empty(nspan * 2, dtype="<i8")
        pairs[0::2] = first_pos
        pairs[1::2] = last_pos + k - 1
        byte_offs = (np.concatenate([[0], np.cumsum(per_doc)])
                     * 16).astype(np.int32)
        blob = pa.Array.from_buffers(
            pa.binary(), len(per_doc),
            [None, pa.py_buffer(byte_offs.tobytes()),
             pa.py_buffer(pairs.tobytes())])
        return pa.table({
            id_col: pa.array(span_doc[doc_change]).cast(t[id_col].type),
            "cut_blob": blob})

    p2 = max(4, num_partitions // 2)
    intervals = losers.repartition(p2, keys=[id_col]).map_batches(
        _intervals, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)

    # the interval set can be SMALL or empty (a mostly-unique corpus):
    # solidify below the empty-partition regime so acero never sees a
    # zero-column join side (see incdedup._solidify_small), and skip
    # the join entirely at zero cuts — every doc still goes through
    # _rebuild so output text normalization is cut-count-independent.
    from kettleray.ops.incdedup import _solidify_small
    id_type = dict(zip(docs.schema().names,
                       docs.schema().types))[id_col]
    intervals = _solidify_small(intervals, schema=pa.schema(
        [(id_col, id_type), ("cut_blob", pa.binary())]),
        num_partitions=p2)
    base_docs = docs.select_columns([id_col, text_col])
    if intervals.count() == 0:
        joined = base_docs.map_batches(
            lambda t: t.append_column(
                "cut_blob", pa.nulls(t.num_rows, pa.binary())),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        from kettleray.ops.joins import merge_join
        joined = merge_join(base_docs, intervals, on=[id_col],
                            how="left", num_partitions=p2)

    def _rebuild(t: pa.Table) -> pa.Table:
        # split the ORIGINAL text: the keep-mask is position-based, so
        # matching may be case-folded while the output keeps its case
        toks = pc.utf8_split_whitespace(
            pc.fill_null(pc.utf8_trim_whitespace(t[text_col]), ""))
        counts = pc.list_value_length(toks) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_start = np.concatenate([[0], np.cumsum(counts)])[:-1]
        nflat = len(flat)
        # decode the packed interval blobs (one concatenation — the
        # binary values buffer is contiguous in row order) and build the
        # keep-mask with a difference array: +1 at each cut start, -1
        # past each cut end, covered = running sum > 0. No per-row loop.
        blob = pc.fill_null(t["cut_blob"], b"")
        if isinstance(blob, pa.ChunkedArray):
            blob = blob.combine_chunks()
        boffs = np.frombuffer(blob.buffers()[1], dtype=np.int32)[
            blob.offset: blob.offset + len(blob) + 1].astype(np.int64)
        data = np.frombuffer(blob.buffers()[2] or b"", dtype=np.uint8)
        pairs = data[boffs[0]:boffs[-1]]
        pairs = pairs.view("<i8") if len(pairs) else \
            np.empty(0, dtype=np.int64)
        nspans_per_doc = (np.diff(boffs) // 16)
        span_doc = np.repeat(np.arange(t.num_rows), nspans_per_doc)
        base = doc_start[span_doc]
        # token positions are 1-based; intervals inclusive
        s_flat = base + pairs[0::2] - 1
        e_flat = np.minimum(base + pairs[1::2],
                            doc_start[span_doc] + counts[span_doc])
        delta = np.zeros(nflat + 1, dtype=np.int64)
        np.add.at(delta, s_flat, 1)
        np.add.at(delta, e_flat, -1)
        keep = np.cumsum(delta[:-1]) == 0
        kept_per_doc = np.zeros(len(counts), dtype=np.int64)
        np.add.at(kept_per_doc,
                  np.repeat(np.arange(len(counts)), counts), keep)
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)]) \
            .astype(np.int64)
        la = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            flat.filter(pa.array(keep)))
        rebuilt = pc.binary_join(la, " ")
        return pa.table({id_col: t[id_col], text_col: rebuilt})

    return joined.map_batches(_rebuild, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
