"""CDC core operators: parse/validate, LWW replay, diff, SCD2.

Reimagines the four Kettle CDC steps (SURVEY.md §2.1) Ray-Data-first:

- Merge Rows (diff)          -> :func:`diff_snapshots`
  (ref: engine/.../steps/mergerows/MergeRows.java — flag field semantics)
- Insert/Update + Synchronize After Merge -> :func:`replay_lww`
  (ref: engine/.../steps/insertupdate/InsertUpdate.java,
   engine/.../steps/synchronizeaftermerge/SynchronizeAfterMerge.java —
   keyed upsert + delete routing; here: commit-ordered last-writer-wins
   replay with tombstones)
- Dimension Lookup/Update (SCD2) -> :func:`scd2_history`
  (ref: engine/.../steps/dimensionlookup/DimensionLookup.java — type-2
   version chains with validity intervals)

Execution shape (scale-first):

1. ``map_batches`` combiner: per-batch, per-key argmax(commit_seq) —
   shrinks the shuffle volume before any exchange (like a map-side combine).
2. ``repartition(P, keys=(repo, path))`` — ONE hash shuffle co-locating
   each key's surviving events (requires HASH_SHUFFLE strategy; Ray's hash
   shuffle finalizes each partition as a single block).
3. per-block vectorized reduce (Arrow + numpy, no per-group Python calls,
   no pandas conversion of wide ``content`` strings).

Commit order is explicit data (``commit_seq``); nothing relies on arrival
order (SURVEY.md §2.10).
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

KEY_COLS = ("repo", "path")
SEQ_COL = "commit_seq"

# Merge Rows flag values (MergeRowsMeta.VALUE_IDENTICAL/CHANGED/NEW/DELETED).
FLAG_IDENTICAL = "identical"
FLAG_CHANGED = "changed"
FLAG_NEW = "new"
FLAG_DELETED = "deleted"

OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"


# ---------------------------------------------------------------------------
# parse / validate (≙ Select values + Checksum: the per-row invariant column)
# ---------------------------------------------------------------------------

def hash_hex_array(arr: pa.ChunkedArray | pa.Array,
                   algo: str = "sha256") -> pa.Array:
    """Hex digest (md5/sha1/sha256) of a string column, hashing straight
    from the Arrow data buffer (no per-row Python string materialization
    — that allocation churn anti-scales across a full node of workers).
    Null -> null."""
    import binascii
    hex_len = {"md5": 32, "sha1": 40, "sha256": 64}[algo]
    hfn = getattr(hashlib, algo)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.string())
    if arr.null_count > 0:
        out = [None if v is None else
               hfn(v.encode("utf-8")).hexdigest()
               for v in arr.to_pylist()]
        return pa.array(out, type=pa.string())
    bufs = arr.buffers()
    width = np.int64(4) if pa.types.is_string(arr.type) else np.int64(8)
    dt = np.int32 if width == 4 else np.int64
    off = np.frombuffer(bufs[1], dtype=dt)[arr.offset:arr.offset + n + 1]
    data = memoryview(bufs[2])
    out = bytearray(n * hex_len)
    mv = memoryview(out)
    hexl = binascii.hexlify
    for i in range(n):
        mv[i * hex_len:(i + 1) * hex_len] = \
            hexl(hfn(data[off[i]:off[i + 1]]).digest())
    out_offsets = np.arange(0, (n + 1) * hex_len, hex_len, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.utf8(), n,
        [None, pa.py_buffer(out_offsets.tobytes()), pa.py_buffer(bytes(out))])


def sha256_hex_array(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
    return hash_hex_array(arr, "sha256")


def add_content_sha256(batch: pa.Table, content_col: str = "content",
                       out_col: str = "content_sha256") -> pa.Table:
    """≙ Checksum step (checksum/CheckSum.java): per-row SHA-256 over the
    content field — the invariant column required by BASELINE input_hint."""
    return batch.append_column(out_col, sha256_hex_array(batch[content_col]))


def fill_missing_sha(t: pa.Table, content_col: str = "content",
                     out_col: str = "content_sha256") -> pa.Table:
    """Hash ONLY the rows whose ``content_sha256`` is null (rows whose
    stored digest was carried through a merge) — avoids re-hashing a
    whole table's content when most digests are already known."""
    if out_col not in t.column_names:
        return add_content_sha256(t, content_col, out_col)
    col = t[out_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count == 0:
        return t
    nulls = np.asarray(col.is_null())
    idx = np.nonzero(nulls)[0]
    sub = t.take(pa.array(idx, type=pa.int64()))
    hashed = sha256_hex_array(sub[content_col])
    vals = np.array(col.to_pylist(), dtype=object)
    vals[idx] = hashed.to_pylist()
    return t.set_column(t.column_names.index(out_col), out_col,
                        pa.array(vals, type=pa.string()))


REQUIRED_EVENT_COLS = ("repo", "path", "commit", "lang", "content", "op",
                       SEQ_COL)


def widen_strings(t: pa.Table, cols: Sequence[str] = ("content",)
                  ) -> pa.Table:
    """Cast ``cols`` string -> large_string (64-bit offsets). The wide-
    payload guard rail (SURVEY §7.4 #4): with multi-KB payloads a later
    concat/combine_chunks (sink bucket rewrites, driver merges) can push
    one Arrow array past the 2 GB int32-offset ceiling — int64 offsets
    remove the ceiling for one extra byte-per-row-per-4. Must be applied
    GLOBALLY (every block), never per-batch-conditionally: mixed
    string/large_string blocks break unions and hash shuffles."""
    for c in cols:
        if c in t.column_names and pa.types.is_string(t.schema.field(c).type):
            i = t.column_names.index(c)
            t = t.set_column(i, c, pc.cast(t[c], pa.large_string()))
    return t


def parse_validate(ds: "ray.data.Dataset", *, batch_size: int | None = None,
                   with_sha: bool = True,
                   wide_payload: bool = False) -> "ray.data.Dataset":
    """Validate schema (+ optionally derive ``content_sha256``). Zero-copy
    Arrow in/out. For replay pipelines pass ``with_sha=False``: the LWW
    finalize stage hashes only the surviving rows (≈the live-key count
    instead of every event) — same final-state invariant, far less work.
    ``wide_payload=True`` widens ``content`` to large_string in the same
    pass (see widen_strings) — use it when payloads are multi-KB."""

    def _fn(batch: pa.Table) -> pa.Table:
        missing = [c for c in REQUIRED_EVENT_COLS if c not in batch.column_names]
        if missing:
            raise ValueError(f"change-event batch missing columns: {missing}")
        if wide_payload:
            batch = widen_strings(batch)
        if with_sha and "content_sha256" not in batch.column_names:
            batch = add_content_sha256(batch)
        return batch

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# vectorized per-block kernels
# ---------------------------------------------------------------------------

def _composite_key_codes(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """int64 group codes for the composite key.

    Allocation-lean: per-column dictionary encode (int codes) combined by
    mixed-radix arithmetic — no composite key strings are materialized
    (string concat + hash of millions of rows was the dominant allocation
    in the merge finalize, and heavy concurrent allocation anti-scales
    across a full node). Falls back to string-join when the radix product
    could overflow int64."""
    total: np.ndarray | None = None
    radix = 1
    for k in keys:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        card = len(enc.dictionary) + 1
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        if total is None:
            total, radix = idx, card
        else:
            if radix * card > (1 << 62):
                return _composite_key_codes_strjoin(t, keys)
            total = total * card + idx
            radix *= card
    return total


def _composite_key_codes_strjoin(t: pa.Table, keys: Sequence[str]
                                 ) -> np.ndarray:
    cols = [t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray)
            else t[k] for k in keys]
    key = pc.binary_join_element_wise(*cols, "\x00")
    codes = pc.dictionary_encode(key)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    return codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)


def key_crc32(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Per-row crc32 of the \\x00-joined composite key (uint64 array).
    crc32, NOT hash(): Python's str hash is per-process salted, which
    would route the same key differently from different workers.

    Vectorization: dictionary-encode the composite key and crc32 each
    UNIQUE key once, then scatter via the dictionary indices — per-row
    Python cost collapses to per-unique-key cost (keys repeat heavily in
    event streams). Null key parts are folded to a sentinel (a null key
    is still a routable key, never a dropped row)."""
    import zlib
    cols = [t[k].combine_chunks() if isinstance(t[k], pa.ChunkedArray)
            else t[k] for k in keys]
    key = pc.binary_join_element_wise(*cols, "\x00")
    key = pc.fill_null(key, "\x00<null-key>")
    enc = pc.dictionary_encode(key)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uniq = enc.dictionary.to_pylist()
    if not uniq:
        return np.empty(0, dtype=np.uint64)
    uh = np.fromiter((zlib.crc32(u.encode()) for u in uniq),
                     dtype=np.uint64, count=len(uniq))
    return uh[enc.indices.to_numpy(zero_copy_only=False)]


def stable_key_buckets(t: pa.Table, keys: Sequence[str],
                       num_buckets: int) -> np.ndarray:
    """Process-stable bucket id per row: key_crc32 % num_buckets."""
    return (key_crc32(t, keys) % np.uint64(num_buckets)) \
        .astype(np.int64)


def _col_np(t: pa.Table, name: str) -> np.ndarray:
    col = t[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def lww_reduce_table(t: pa.Table, keys: Sequence[str] = KEY_COLS,
                     seq_col: str = SEQ_COL) -> pa.Table:
    """Keep, per key, the single row with max commit_seq.

    Associative + commutative, so it serves both as the map-side combiner
    and (after key-hash repartition) the final reduce. commit_seq is
    unique per logical event (FIXTURES.md) and redelivered duplicates are
    byte-identical, so no further tiebreak is needed for deterministic
    OUTPUT VALUES; np.lexsort is stable, making even the row choice
    deterministic. Pure numpy + one Arrow take — allocation-lean on
    purpose (see _composite_key_codes)."""
    if t.num_rows <= 1:
        return t
    codes = _composite_key_codes(t, keys)
    seq = _col_np(t, seq_col)
    order = np.lexsort((seq, codes))
    sk = codes[order]
    last = np.empty(len(sk), dtype=bool)
    last[:-1] = sk[1:] != sk[:-1]
    last[-1] = True
    return t.take(pa.array(order[last], type=pa.int64()))


def dedup_events_table(t: pa.Table, keys: Sequence[str] = KEY_COLS,
                       seq_col: str = SEQ_COL) -> pa.Table:
    """Exactly-once guard: drop redelivered events (same key + commit_seq),
    keeping one deterministic representative."""
    if t.num_rows <= 1:
        return t
    codes = _composite_key_codes(t, keys)
    seq = _col_np(t, seq_col)
    order = np.lexsort((seq, codes))
    sk = codes[order]
    ss = seq[order]
    first = np.empty(len(sk), dtype=bool)
    first[0] = True
    first[1:] = (sk[1:] != sk[:-1]) | (ss[1:] != ss[:-1])
    return t.take(pa.array(order[first], type=pa.int64()))


# ---------------------------------------------------------------------------
# replay (Insert/Update + Synchronize After Merge): events -> final state
# ---------------------------------------------------------------------------

FINAL_STATE_COLS = ["repo", "path", "commit", "lang", "content",
                    "content_sha256", "last_commit_seq"]


def finalize_state_table(t: pa.Table, *, keep_tombstones: bool = False,
                         with_sha: bool = True) -> pa.Table:
    """Format per-key winner rows as final-state rows (drop tombstones,
    derive content_sha256, rename commit_seq -> last_commit_seq).
    Extra (schema-evolved) columns ride along after the core columns."""
    if not keep_tombstones:
        t = t.filter(pc.not_equal(t["op"], OP_DELETE))
    if with_sha and "content_sha256" not in t.column_names:
        t = add_content_sha256(t)
    t = t.append_column("last_commit_seq", t[SEQ_COL])
    cols = list(FINAL_STATE_COLS)
    if keep_tombstones:
        cols.append("op")
    skip = set(cols) | {"op", SEQ_COL}
    extras = [c for c in t.column_names if c not in skip]
    return t.select([c for c in cols if c in t.column_names] + extras)


def replay_lww(events: "ray.data.Dataset", *,
               num_partitions: int = 64,
               keep_tombstones: bool = False,
               combine_batch_size: int | None = None,
               with_sha: bool = True) -> "ray.data.Dataset":
    """Replay a change-event log into final table state (LWW by commit_seq).

    events columns: repo, path, commit, lang, content, op, commit_seq
    result columns: FINAL_STATE_COLS (tombstoned keys absent unless
    ``keep_tombstones``).
    """

    def _combine(batch: pa.Table) -> pa.Table:
        return lww_reduce_table(batch)

    def _finalize(batch: pa.Table) -> pa.Table:
        t = lww_reduce_table(batch)  # one row per key now (key-partitioned)
        return finalize_state_table(t, keep_tombstones=keep_tombstones,
                                    with_sha=with_sha)

    combined = events.map_batches(_combine, batch_format="pyarrow",
                                  batch_size=combine_batch_size,
                                  zero_copy_batch=True)
    shuffled = combined.repartition(num_partitions, keys=list(KEY_COLS))
    return shuffled.map_batches(_finalize, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def patch_merge_table(t: pa.Table, patch_col: str = "content",
                      keys: Sequence[str] = KEY_COLS,
                      seq_col: str = SEQ_COL) -> pa.Table:
    """Partial-update reduce over a KEY-COMPLETE block: one row per key —
    the latest event's row, with ``patch_col`` inherited from the latest
    event that carried a NON-NULL value (null = 'unchanged', ≙ Kettle
    Update with selected fields / a partial-payload CDC image). Keys
    whose every event patched the column end with null."""
    if t.num_rows <= 1:
        return t
    codes = _composite_key_codes(t, keys)
    seq = _col_np(t, seq_col)
    col = t[patch_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    valid = np.asarray(col.is_valid())
    n = t.num_rows
    order = np.lexsort((seq, codes))
    sk = codes[order]
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    run_id = np.cumsum(run_start) - 1
    # latest value-bearing position per prefix, segmented by run: encode
    # (run_id, donor_pos) so np.maximum.accumulate cannot leak a donor
    # across key boundaries
    donor = np.where(valid[order], np.arange(n), -1)
    key_scaled = run_id.astype(np.int64) * np.int64(n + 1)
    seg = np.maximum.accumulate(key_scaled + donor + 1) - key_scaled
    donor_idx = seg - 1                       # -1 = no value seen yet
    last_of_run = np.empty(n, dtype=bool)
    last_of_run[:-1] = run_start[1:]
    last_of_run[-1] = True
    win_pos = np.nonzero(last_of_run)[0]
    out = t.take(pa.array(order[win_pos], type=pa.int64()))
    d = donor_idx[win_pos]
    vals = col.take(pa.array(order[np.maximum(d, 0)], type=pa.int64()))
    patched = pc.if_else(pa.array(d >= 0), vals,
                         pa.scalar(None, type=col.type))
    return out.set_column(out.column_names.index(patch_col), patch_col,
                          patched)


def replay_lww_patch(events: "ray.data.Dataset", *,
                     num_partitions: int = 64,
                     patch_col: str = "content",
                     with_sha: bool = True) -> "ray.data.Dataset":
    """LWW replay with PARTIAL updates: events may carry null in
    ``patch_col`` meaning 'unchanged' — the final state inherits the
    latest non-null value while every other column comes from the
    latest event (≙ Update step writing selected fields; Debezium
    partial images / Hudi partial-update payloads).

    Map-side combine stays associative by keeping ≤2 rows per key per
    block: the latest row AND the latest value-bearing row — so the
    shuffle is still batch-bounded, never table-bounded."""

    def _combine(t: pa.Table) -> pa.Table:
        win = lww_reduce_table(t)
        cw = lww_reduce_table(t.filter(pc.is_valid(t[patch_col])))
        return dedup_events_table(
            pa.concat_tables([win, cw], promote_options="permissive"))

    def _finalize(t: pa.Table) -> pa.Table:
        return finalize_state_table(patch_merge_table(t, patch_col),
                                    with_sha=with_sha)

    combined = events.map_batches(_combine, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
    shuffled = combined.repartition(num_partitions, keys=list(KEY_COLS))
    return shuffled.map_batches(_finalize, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def _winner_hash64(t: pa.Table, seq_col: str) -> np.ndarray:
    """64-bit mixed hash of the (repo, path, seq) winner identity.

    crc32 of the \\x00-joined key is computed once per UNIQUE key
    (dictionary encode) and mixed with the full-entropy commit_seq via a
    murmur-style finalizer — vectorized, process-stable, 8 B per key.
    Collisions only admit FALSE POSITIVES into the pass-2 filter (the
    true winner's exact hash is always present — INCLUDING tombstone
    winners, see replay_lww_twopass) and the final per-key LWW reduce
    removes them, so the compaction is correctness-free."""
    kc = key_crc32(t, KEY_COLS)
    if len(kc) == 0:
        return kc
    seq = _col_np(t, seq_col).astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (kc * np.uint64(0x9E3779B97F4A7C15)) ^ \
            (seq * np.uint64(0xC2B2AE3D27D4EB4F))
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(33)
    return x


def replay_lww_twopass(events_factory, *, num_partitions: int = 64,
                       keep_tombstones: bool = False,
                       with_sha: bool = True,
                       driver_set_limit: int = 50_000_000) -> "ray.data.Dataset":
    """Shuffle-light LWW replay for wide payloads.

    ``replay_lww`` shuffles every surviving event's full row (content
    included). At 10^10 events with multi-KB contents the shuffle IS the
    job. This variant shuffles only (repo, path, commit_seq) — ~24 B per
    event — to decide each key's winning commit_seq, broadcasts the
    winner identities as a COMPACTED sorted uint64 hash set (8 B per
    live key — see _winner_hash64; the driver never materializes winner
    strings, only the per-block hash columns), and filters a SECOND scan
    of the source down to the winner rows (2-5x faster than one-pass on
    ~1.5 KB contents in back-to-back measurements; the gap grows with
    payload width). Hash false positives and redelivered duplicates are
    both removed by the final per-key LWW reduce after the (winner-rows-
    only) output shuffle.

    Trade-off: two scans of the source vs payload-free shuffle — a win
    whenever scan bandwidth > shuffle bandwidth x payload ratio (true for
    columnar storage, where pass 1 reads only 3 narrow columns) AND the
    overwrite ratio is high (winners << events). At overwrite ratio near
    1 (almost every event is its key's only event) pass 2 re-reads and
    re-shuffles nearly the whole stream and one-pass replay dominates —
    measured: 4M events / 1M keys x 1.5 KB: two-pass 10.1 s vs ~90 s
    one-pass; 5M events / 5M keys x 450 B: two-pass 14.4 s vs 5.5 s
    one-pass. Rule of thumb: use two-pass when live_keys / n_events
    < ~0.3 and payloads are wide.

    ``events_factory``: zero-arg callable returning the events Dataset
    (called twice — Datasets re-execute per consumption, so a factory
    makes the two-scan structure explicit). The winner set costs 8 B x
    live keys (e.g. 0.8 GB at 100M live keys). Up to ``driver_set_limit``
    live keys it is driver-sorted and broadcast as one object; above the
    limit it is built distributed (scatter by top hash bits -> per-shard
    sort/dedup tasks) so the driver holds only refs and no single object
    exceeds ~driver_set_limit/2 keys — per NODE the probe still
    materializes one full 8 B/key copy in plasma (shared, spillable),
    which is the same bound as the broadcast path without the driver
    ceiling.
    """
    import inspect
    slim_cols = list(KEY_COLS) + [SEQ_COL, "op"]
    # projection pushdown for pass 1: a factory that accepts `columns`
    # (like a parquet reader, or generate_events) never materializes the
    # wide payload at all on the winner-deciding scan
    takes_columns = "columns" in inspect.signature(
        events_factory).parameters

    def _slim(t: pa.Table) -> pa.Table:
        return t.select(slim_cols)

    src1 = events_factory(columns=slim_cols) if takes_columns \
        else events_factory()
    slim = src1.map_batches(_slim, batch_format="pyarrow",
                            zero_copy_batch=True,
                            batch_size=None)
    # pass 1 ALWAYS keeps tombstones internally: a deleted key's true
    # winner (the delete) must be in the hash set, otherwise a hash
    # false positive for that key could pass the pass-2 filter with no
    # true winner to beat it in the final reduce — resurrecting stale
    # content. Tombstones are dropped (or kept) at _finish instead.
    winners = replay_lww(slim, num_partitions=num_partitions,
                         keep_tombstones=True, with_sha=False)

    def _hash_only(t: pa.Table) -> pa.Table:
        return pa.table({"__wh": pa.array(
            _winner_hash64(t, "last_commit_seq"), type=pa.uint64())})

    hashed = winners.map_batches(_hash_only, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True)
    # Materialize the compact hash column (8 B/key — tiny next to the
    # source) so the live-key count is free metadata and the blocks can
    # be consumed by refs without re-executing the winner shuffle.
    hashed = hashed.materialize()
    n_live = hashed.count()

    if n_live <= driver_set_limit:
        # Small/medium sets: driver-sorted single broadcast object.
        # Pull ONLY the 8-byte hash column of each block; keep the
        # transient at ~2x of the final set (free the per-block parts
        # before the in-place sort, dedup via a boolean slice).
        parts = [p["__wh"].combine_chunks().to_numpy(zero_copy_only=False)
                 for p in ray.get(hashed.to_arrow_refs())]
        wh = np.concatenate(parts) if parts else np.empty(0, np.uint64)
        del parts
        wh.sort()
        if len(wh):
            keep_mask = np.empty(len(wh), dtype=bool)
            keep_mask[0] = True
            np.not_equal(wh[1:], wh[:-1], out=keep_mask[1:])
            wh = wh[keep_mask]
        win_ref = ray.put(wh)

        def _filter_winners(t: pa.Table) -> pa.Table:
            ws = ray.get(win_ref)
            if len(ws) == 0 or t.num_rows == 0:
                return t.slice(0, 0)
            h = _winner_hash64(t, SEQ_COL)
            pos = np.searchsorted(ws, h)
            pos[pos == len(ws)] = 0
            return t.filter(pa.array(ws[pos] == h))
    else:
        # Sharded fallback: beyond driver_set_limit live keys the winner
        # set is built DISTRIBUTED — the driver never concatenates, never
        # sorts, and holds only object refs. Hash blocks are scattered by
        # the top bits of the winner hash (power-of-two shard count, so
        # shard id == h >> shift), then one gather task per shard sorts
        # and dedups its slice. Probe tasks searchsorted per shard; each
        # node materializes each shard once in plasma (zero-copy reads),
        # so per-node memory is one copy of the 8 B/key set — same bound
        # as the broadcast path but with no single giant object and no
        # driver-heap 2x sort transient.
        per_shard = max(1, driver_set_limit // 2)
        shard_bits = min(10, max(3, int(np.ceil(np.log2(
            max(1.0, n_live / per_shard))))))
        n_shards = 1 << shard_bits
        shift = np.uint64(64 - shard_bits)

        @ray.remote
        def _scatter(block: pa.Table, n_shards: int, shift: np.uint64):
            h = block["__wh"].combine_chunks().to_numpy(
                zero_copy_only=False)
            sid = h >> shift
            order = np.argsort(sid, kind="stable")
            h, sid = h[order], sid[order]
            bounds = np.searchsorted(sid, np.arange(n_shards + 1),
                                     side="left")
            return tuple(h[bounds[s]:bounds[s + 1]]
                         for s in range(n_shards))

        @ray.remote
        def _gather(*parts: np.ndarray) -> np.ndarray:
            a = np.concatenate(parts) if parts else np.empty(0, np.uint64)
            a.sort()
            if len(a):
                keep = np.empty(len(a), dtype=bool)
                keep[0] = True
                np.not_equal(a[1:], a[:-1], out=keep[1:])
                a = a[keep]
            return a

        block_refs = hashed.to_arrow_refs()
        scat = [_scatter.options(num_returns=n_shards).remote(
            r, n_shards, shift) for r in block_refs]
        shard_refs = [_gather.remote(*[s[i] for s in scat])
                      for i in range(n_shards)]

        def _filter_winners(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return t.slice(0, 0)
            shards = ray.get(shard_refs)  # plasma-cached per node
            h = _winner_hash64(t, SEQ_COL)
            sid = h >> shift
            order = np.argsort(sid, kind="stable")
            keep = np.zeros(len(h), dtype=bool)
            bounds = np.searchsorted(sid[order],
                                     np.arange(n_shards + 1), side="left")
            for s in range(n_shards):
                lo, hi = bounds[s], bounds[s + 1]
                if lo == hi:
                    continue
                arr = shards[s]
                if len(arr) == 0:
                    continue
                idx = order[lo:hi]
                hs = h[idx]
                pos = np.searchsorted(arr, hs)
                pos[pos == len(arr)] = 0
                keep[idx] = arr[pos] == hs
            return t.filter(pa.array(keep))

    picked = events_factory().map_batches(_filter_winners,
                                          batch_format="pyarrow",
                                          zero_copy_batch=True,
                                          batch_size=None)

    # A redelivered winner row can appear in two different input blocks,
    # so one output-sized shuffle dedups the picked rows exactly once —
    # still payload-light: it moves only final-state rows, never events.
    deduped = picked.repartition(max(8, num_partitions // 4),
                                 keys=list(KEY_COLS))

    def _finish(t: pa.Table) -> pa.Table:
        # per-key LWW reduce: drops hash false positives AND collapses
        # redelivered winner copies in one deterministic pass
        return finalize_state_table(lww_reduce_table(t),
                                    keep_tombstones=keep_tombstones,
                                    with_sha=with_sha)

    return deduped.map_batches(_finish, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Changelog compaction + watermark routing (streaming-lake housekeeping)
# ---------------------------------------------------------------------------

def compact_changelog(events: "ray.data.Dataset", *,
                      keys: Sequence[str] = KEY_COLS,
                      seq_col: str = SEQ_COL,
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """Kafka-style log compaction: collapse a change-event log to the
    single LATEST event per key, tombstones INCLUDED (a consumer replaying
    the compacted log reaches the same final state as replaying the full
    log, but a delete must survive compaction so downstream copies drop
    the key too).

    Unlike :func:`replay_lww` the output keeps the EVENT shape (op +
    commit_seq ride through unchanged) — it is a changelog, not a state
    table. Same scale shape: map-side per-key argmax combiner, ONE key
    hash exchange, per-block vectorized reduce.
    """

    def _reduce(batch: pa.Table) -> pa.Table:
        return lww_reduce_table(batch, keys, seq_col)

    combined = events.map_batches(_reduce, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
    shuffled = combined.repartition(num_partitions, keys=list(keys))
    return shuffled.map_batches(_reduce, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def split_on_watermark(events: "ray.data.Dataset", watermark: int, *,
                       seq_col: str = SEQ_COL, route_col: str = "route",
                       ) -> "ray.data.Dataset":
    """Tag each event against a committed watermark: ``fresh`` (seq above
    the watermark — eligible for the next apply) vs ``late`` (at/below —
    already covered by committed state; replaying it could resurrect
    overwritten rows, so the sink quarantines it for audit instead).

    Map-only (zero shuffle): the watermark is a scalar broadcast in the
    closure. Pair with ``quarantine_late`` or filter on ``route``.
    Beyond the reference (Kettle has no event-time watermarks); the
    semantics match the `_above` guard in io.sink.apply_incremental*.
    """

    def _tag(t: pa.Table) -> pa.Table:
        fresh = pc.greater(t[seq_col], watermark)
        return t.append_column(
            route_col, pc.if_else(fresh, "fresh", "late"))

    return events.map_batches(_tag, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)


def quarantine_late(events: "ray.data.Dataset", watermark: int, *,
                    seq_col: str = SEQ_COL,
                    quarantine_dir: str | None = None,
                    ) -> "ray.data.Dataset":
    """Split an incoming batch on the watermark, optionally persisting the
    late/stale stream as partitioned Parquet for audit, and return the
    fresh stream (what the sink should apply)."""
    tagged = split_on_watermark(events, watermark, seq_col=seq_col)
    late = tagged.filter(expr="route == 'late'").drop_columns(["route"])
    if quarantine_dir is not None:
        late.write_parquet(quarantine_dir)
    return tagged.filter(expr="route == 'fresh'").drop_columns(["route"])


# ---------------------------------------------------------------------------
# Merge Rows (diff): two snapshots -> flagged stream
# ---------------------------------------------------------------------------

def diff_snapshots(reference: "ray.data.Dataset", compare: "ray.data.Dataset",
                   *, keys: Sequence[str] = KEY_COLS,
                   value_col: str = "content_sha256",
                   num_partitions: int = 64,
                   flag_col: str = "change_type") -> "ray.data.Dataset":
    """≙ Merge Rows (diff): compare 'reference' (old) vs 'compare' (new)
    keyed snapshots; emit one row per key with flag ∈ {identical, changed,
    new, deleted}. For deleted keys the reference row is emitted (Kettle
    semantics); otherwise the compare row.

    Implementation: tag each side, union, ONE hash repartition on the key,
    then a vectorized per-block classifier (each key's ≤2 rows co-located).
    """

    def _tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__side", pa.array(np.full(batch.num_rows, side, np.int8)))
        return fn

    ref = reference.map_batches(_tag(0), batch_format="pyarrow",
                                zero_copy_batch=True, batch_size=None)
    cmp_ = compare.map_batches(_tag(1), batch_format="pyarrow",
                               zero_copy_batch=True, batch_size=None)
    unioned = ref.union(cmp_).repartition(num_partitions, keys=list(keys))

    def _classify(t: pa.Table) -> pa.Table:
        return classify_tagged_diff(t, keys=keys, value_col=value_col,
                                    flag_col=flag_col)

    return unioned.map_batches(_classify, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)


def classify_tagged_diff(t: pa.Table, *, keys: Sequence[str] = KEY_COLS,
                         value_col: str = "content_sha256",
                         flag_col: str = "change_type") -> pa.Table:
    """Vectorized diff classifier over a KEY-COMPLETE block of tagged
    rows (``__side`` 0 = reference, 1 = compare; each key's ≤2 rows must
    be co-located — after a key shuffle, or per co-partitioned bucket).
    Emits one row per key flagged identical/changed/new/deleted (the
    reference row for deletions, the compare row otherwise)."""
    if t.num_rows == 0:
        return (t.drop_columns(["__side"])
                 .append_column(flag_col, pa.array([], type=pa.string())))
    codes = _composite_key_codes(t, keys)
    side = t["__side"].combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(t["__side"], pa.ChunkedArray) else \
        t["__side"].to_numpy(zero_copy_only=False)
    order = np.lexsort((side, codes))
    sk = codes[order]
    n = len(sk)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    run_id = np.cumsum(run_start) - 1
    run_len = np.bincount(run_id)
    sha = t[value_col].combine_chunks() if isinstance(
        t[value_col], pa.ChunkedArray) else t[value_col]
    sha_np = sha.to_numpy(zero_copy_only=False)[order]
    side_sorted = side[order]

    flags = np.empty(n, dtype=object)
    keep = np.zeros(n, dtype=bool)
    lens = run_len[run_id]
    # singletons: side 0 -> deleted (emit ref row); side 1 -> new.
    single = lens == 1
    keep |= single
    flags[single & (side_sorted == 0)] = FLAG_DELETED
    flags[single & (side_sorted == 1)] = FLAG_NEW
    # pairs: compare value col; emit the compare-side (2nd) row.
    pair_second = (lens == 2) & ~run_start  # second member of each pair
    pair_first_idx = np.nonzero((lens == 2) & run_start)[0]
    if len(pair_first_idx):
        same = sha_np[pair_first_idx] == sha_np[pair_first_idx + 1]
        keep[pair_first_idx + 1] = True
        flags[pair_first_idx + 1] = np.where(same, FLAG_IDENTICAL,
                                             FLAG_CHANGED)
    sel = order[keep]
    out = t.take(pa.array(sel, type=pa.int64()))
    out = out.append_column(flag_col,
                            pa.array(flags[keep], type=pa.string()))
    return out.drop_columns(["__side"])


def sync_after_merge(state: "ray.data.Dataset", flagged: "ray.data.Dataset",
                     *, num_partitions: int = 64,
                     flag_col: str = "change_type") -> "ray.data.Dataset":
    """≙ Synchronize After Merge consuming Merge Rows output
    (synchronizeaftermerge/SynchronizeAfterMerge.java): apply a flagged
    diff stream to a base state — 'new'/'changed' upsert the compare-side
    row, 'deleted' removes the key, 'identical' is a no-op.

    Ray-native: both sides become change events (base rows at their own
    last_commit_seq, deletes nudged +1 so they deterministically beat
    the base row they remove) and flow through the standard LWW replay —
    one shuffle, exactly the invariant ``sync(old, diff(old, new)) ==
    new``."""

    def _base(t: pa.Table) -> pa.Table:
        t = t.append_column("op", pa.array([OP_INSERT] * t.num_rows))
        t = t.append_column(SEQ_COL, t["last_commit_seq"])
        return t.drop_columns(["last_commit_seq"])

    def _changes(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t[flag_col], FLAG_IDENTICAL))
        is_del = pc.equal(t[flag_col], FLAG_DELETED)
        op = pc.if_else(is_del, OP_DELETE, OP_INSERT)
        seq = pc.add(t["last_commit_seq"],
                     pc.cast(is_del, pa.int64()))
        t = t.append_column("op", op)
        t = t.append_column(SEQ_COL, seq)
        return t.drop_columns(["last_commit_seq", flag_col])

    base = state.map_batches(_base, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    ch = flagged.map_batches(_changes, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=None)
    return replay_lww(base.union(ch), num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# Dimension Lookup/Update (SCD2): events -> version-history table
# ---------------------------------------------------------------------------

SCD2_COLS = ["repo", "path", "version", "valid_from_seq", "valid_to_seq",
             "is_current", "commit", "lang", "content_sha256"]


def scd2_history(events: "ray.data.Dataset", *,
                 num_partitions: int = 64) -> "ray.data.Dataset":
    """Build the type-2 history: one row per non-delete event, with
    validity interval [valid_from_seq, valid_to_seq) closed by the NEXT
    event on the key (update or delete); is_current = open interval.
    version = 1-based index among the key's non-delete events in commit
    order. Surrogate-key-free: (repo, path, version) is the natural PK;
    a deterministic hash surrogate can be added by the caller.

    Needs every event of a key (not just the last), so there is no
    combiner — but the payload still never enters the exchange: the
    history only needs content_sha256, so content is hashed and dropped
    BEFORE the shuffle (~3x less exchanged data at ~450 B contents,
    far more on real repositories).
    """
    def _slim(t: pa.Table) -> pa.Table:
        if "content" in t.column_names:
            if "content_sha256" not in t.column_names:
                t = add_content_sha256(t)
            t = t.drop_columns(["content"])
        return t

    slim = events.map_batches(_slim, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    shuffled = slim.repartition(num_partitions, keys=list(KEY_COLS))
    return shuffled.map_batches(scd2_history_table, batch_format="pyarrow",
                                batch_size=None, zero_copy_batch=True)


def scd2_history_table(t: pa.Table) -> pa.Table:
    """Per-block SCD2 kernel (every event of a key must be in ``t``)."""
    t = dedup_events_table(t)  # exactly-once: drop redeliveries
    if t.num_rows == 0:
        return pa.table({c: pa.array([], type=_scd2_type(c))
                         for c in SCD2_COLS})
    codes = _composite_key_codes(t, KEY_COLS)
    seq = t[SEQ_COL].combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(t[SEQ_COL], pa.ChunkedArray) else \
        t[SEQ_COL].to_numpy(zero_copy_only=False)
    order = np.lexsort((seq, codes))
    sk, ss = codes[order], seq[order]
    n = len(sk)
    same_next = np.empty(n, dtype=bool)          # next row is same key
    same_next[:-1] = sk[1:] == sk[:-1]
    same_next[-1] = False
    # int64 throughout + explicit has-next mask: commit_seq must NOT
    # round-trip through float64 (a NaN sentinel silently loses precision
    # above 2^53 — e.g. nanosecond-epoch sequence numbers).
    next_seq = np.zeros(n, dtype=np.int64)
    next_seq[:-1] = ss[1:]
    has_next = same_next                          # closing event exists

    if "content_sha256" in t.column_names:
        tt = t
    else:
        tt = add_content_sha256(t)
    op = tt["op"].combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(tt["op"], pa.ChunkedArray) else \
        tt["op"].to_numpy(zero_copy_only=False)
    op_sorted = op[order]
    live = op_sorted != OP_DELETE

    # version numbering among live events per key (vectorized cumcount)
    run_start = np.empty(n, dtype=bool)
    run_start[0] = True
    run_start[1:] = sk[1:] != sk[:-1]
    live_cum = np.cumsum(live)
    base = np.zeros(n, dtype=np.int64)
    starts = np.nonzero(run_start)[0]
    base[starts] = live_cum[starts] - live[starts]
    np.maximum.accumulate(base, out=base)  # broadcast run base forward
    version = live_cum - base

    keep_idx = np.nonzero(live)[0]
    sel = order[keep_idx]
    out = tt.take(pa.array(sel, type=pa.int64()))
    vt = next_seq[keep_idx]
    open_tail = ~has_next[keep_idx]
    valid_to = pa.array(vt, type=pa.int64(), mask=open_tail)
    out = out.append_column("version",
                            pa.array(version[keep_idx], type=pa.int64()))
    out = out.append_column("valid_from_seq", out[SEQ_COL])
    out = out.append_column("valid_to_seq", valid_to)
    out = out.append_column("is_current",
                            pa.array(open_tail, type=pa.bool_()))
    return out.select(SCD2_COLS)


def scd2_events_from_history(hist: pa.Table) -> pa.Table:
    """Reconstruct the event skeleton an SCD2 history encodes, so fresh
    events can be APPENDED and the standard kernel re-run on the union:

    - every history row becomes an insert event at its valid_from_seq
      (content is gone — content_sha256 rides along so re-hashing is
      never needed for old rows),
    - a DELETE event is re-materialized wherever the validity chain
      shows one: a row closed at a seq that is NOT the next version's
      valid_from (mid-chain delete), or a closed final version (trailing
      delete).

    ``scd2_history_table(scd2_events_from_history(H)) == H`` — version
    numbering, windows and is_current all round-trip."""
    cols = {"repo": hist["repo"], "path": hist["path"],
            "commit": hist["commit"], "lang": hist["lang"],
            "content_sha256": hist["content_sha256"],
            "op": pa.array([OP_INSERT] * hist.num_rows),
            SEQ_COL: hist["valid_from_seq"]}
    ev = pa.table(cols)
    if hist.num_rows == 0:
        return ev
    codes = _composite_key_codes(hist, KEY_COLS)
    vf = _col_np(hist, "valid_from_seq")
    order = np.lexsort((vf, codes))
    sk, svf = codes[order], vf[order]
    vt_arr = hist["valid_to_seq"].combine_chunks() if isinstance(
        hist["valid_to_seq"], pa.ChunkedArray) else hist["valid_to_seq"]
    closed = ~np.asarray(vt_arr.is_null())[order]
    svt = vt_arr.fill_null(0).to_numpy(zero_copy_only=False)[order]
    same_next = np.empty(len(sk), dtype=bool)
    same_next[:-1] = sk[1:] == sk[:-1]
    same_next[-1] = False
    next_vf = np.zeros(len(sk), dtype=np.int64)
    next_vf[:-1] = svf[1:]
    # a delete hides wherever the close seq is not the next version's
    # open seq (or the chain ends closed)
    del_here = closed & (~same_next | (svt != next_vf))
    if del_here.any():
        n_del = int(del_here.sum())
        sel = hist.take(pa.array(order[del_here], type=pa.int64()))
        dels = pa.table({
            "repo": sel["repo"], "path": sel["path"],
            "commit": pa.array([""] * n_del),
            "lang": pa.array([""] * n_del),
            "content_sha256": pa.array([None] * n_del, type=pa.string()),
            "op": pa.array([OP_DELETE] * n_del),
            SEQ_COL: pa.array(svt[del_here], type=pa.int64())})
        ev = pa.concat_tables([ev, dels])
    return ev


def scd2_append_table(hist: pa.Table | None,
                      fresh: pa.Table) -> pa.Table:
    """Incremental Dimension Lookup/Update: append a micro-batch of
    change events to an existing SCD2 history (all rows/events of each
    key co-located — per bucket). Fresh events must all be ABOVE the
    history's last seq (the sink's watermark filter guarantees it)."""
    if "content_sha256" not in fresh.column_names:
        fresh = add_content_sha256(fresh)
    parts = [fresh]
    if hist is not None and hist.num_rows:
        parts.insert(0, scd2_events_from_history(hist))
    merged = pa.concat_tables(parts, promote_options="permissive")
    return scd2_history_table(merged)


def _scd2_type(col: str) -> pa.DataType:
    if col in ("version", "valid_from_seq", "valid_to_seq"):
        return pa.int64()
    if col == "is_current":
        return pa.bool_()
    return pa.string()


# ---------------------------------------------------------------------------
# SCD type 3: previous-value columns
# ---------------------------------------------------------------------------

_SCD3_SENTINEL = "\x00__scd3_null__"


def scd3_state(events: "ray.data.Dataset",
               tracked: Sequence[str] = ("lang", "content_sha256"), *,
               num_partitions: int = 64) -> "ray.data.Dataset":
    """Type-3 slowly changing dimension (≙ the 'previous value' mode of
    Kettle's Dimension Lookup/Update family, dimensionlookup/
    DimensionLookup.java; SCD2/SCD1 live in scd2_history/replay_lww):
    one row per LIVE key carrying the current state plus, per tracked
    column, the value it held before its most recent change
    (``<col>_prev``, null if the column never changed) and the change
    count (``<col>_nchanges``).

    Semantics: change history = the key's non-delete events in commit
    order with consecutive equal values collapsed; interleaved deletes
    do not reset history; a key whose final event is a delete is absent.

    Scale shape follows scd2_history: content is hashed and dropped
    BEFORE the single key-hash shuffle, then a vectorized per-block
    kernel (lexsort + run-boundary masks) — no per-row Python."""
    def _slim(t: pa.Table) -> pa.Table:
        if "content" in t.column_names:
            if "content_sha256" not in t.column_names:
                t = add_content_sha256(t)
            t = t.drop_columns(["content"])
        return t

    slim = events.map_batches(_slim, batch_format="pyarrow",
                              batch_size=None, zero_copy_batch=True)
    shuffled = slim.repartition(num_partitions, keys=list(KEY_COLS))
    return shuffled.map_batches(
        lambda t: scd3_state_table(t, tracked),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def _scd3_empty(tracked: Sequence[str]) -> pa.Table:
    cols: dict = {
        "repo": pa.array([], type=pa.string()),
        "path": pa.array([], type=pa.string()),
        "commit": pa.array([], type=pa.string()),
        "lang": pa.array([], type=pa.string()),
        "content_sha256": pa.array([], type=pa.string()),
        "last_commit_seq": pa.array([], type=pa.int64())}
    for c in tracked:
        cols[f"{c}_prev"] = pa.array([], type=pa.string())
        cols[f"{c}_nchanges"] = pa.array([], type=pa.int64())
    return pa.table(cols)


def scd3_state_table(t: pa.Table,
                     tracked: Sequence[str] = ("lang", "content_sha256")
                     ) -> pa.Table:
    """Per-block SCD3 kernel (every event of a key must be in ``t``)."""
    t = dedup_events_table(t)
    if t.num_rows == 0:
        return _scd3_empty(tracked)
    if "content_sha256" not in t.column_names:
        t = add_content_sha256(t)
    codes = _composite_key_codes(t, KEY_COLS)
    seq = _col_np(t, SEQ_COL)
    order = np.lexsort((seq, codes))
    sk = codes[order]
    n = len(sk)
    new_key = np.empty(n, dtype=bool)
    new_key[0] = True
    new_key[1:] = sk[1:] != sk[:-1]
    key_id = np.cumsum(new_key) - 1          # 0..K-1 in sorted order
    K = int(key_id[-1]) + 1
    op = _col_np(t, "op")[order]
    last_idx = np.append(np.nonzero(new_key)[0][1:], n) - 1
    live = op[last_idx] != OP_DELETE         # per key (sorted key order)
    live_keys = np.nonzero(live)[0]
    state_rows = order[last_idx[live_keys]]
    st = t.take(pa.array(state_rows, type=pa.int64()))
    out = pa.table({
        "repo": st["repo"], "path": st["path"], "commit": st["commit"],
        "lang": st["lang"], "content_sha256": st["content_sha256"],
        "last_commit_seq": pc.cast(st[SEQ_COL], pa.int64())})

    nd = op != OP_DELETE                     # mask over sorted rows
    sub_key = key_id[nd]
    sub_new_key = np.empty(len(sub_key), dtype=bool)
    if len(sub_key):
        sub_new_key[0] = True
        sub_new_key[1:] = sub_key[1:] != sub_key[:-1]
    for c in tracked:
        col = t[c].combine_chunks() if isinstance(t[c], pa.ChunkedArray) \
            else t[c]
        col = pc.fill_null(col, _SCD3_SENTINEL)
        enc = pc.dictionary_encode(col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vc = enc.indices.to_numpy(zero_copy_only=False) \
            .astype(np.int64)[order][nd]
        chg = sub_new_key.copy()
        if len(vc) > 1:
            chg[1:] |= vc[1:] != vc[:-1]
        run_idx = np.nonzero(chg)[0]         # run starts, grouped by key
        run_key = sub_key[run_idx]
        run_val = vc[run_idx]
        runs_per_key = np.bincount(run_key, minlength=K)
        offsets = np.cumsum(runs_per_key)
        prev_code = np.full(K, -1, dtype=np.int64)
        has_prev = runs_per_key >= 2
        prev_code[has_prev] = run_val[offsets[has_prev] - 2]
        nchanges = np.maximum(runs_per_key - 1, 0)
        pv = prev_code[live_keys]
        vocab = enc.dictionary
        taken = vocab.take(pa.array(np.where(pv < 0, 0, pv),
                                    type=pa.int64())) \
            if len(vocab) else pa.array([], type=pa.string())
        mask = pv < 0
        if len(vocab):
            sent = pc.equal(taken, _SCD3_SENTINEL) \
                .to_numpy(zero_copy_only=False)
            mask = mask | np.asarray(sent, dtype=bool)
        prev_arr = pc.if_else(pa.array(mask),
                              pa.scalar(None, type=pa.string()),
                              pc.cast(taken, pa.string()))
        out = out.append_column(f"{c}_prev", prev_arr)
        out = out.append_column(
            f"{c}_nchanges", pa.array(nchanges[live_keys],
                                      type=pa.int64()))
    return out


# ---------------------------------------------------------------------------
# schema evolution (additive columns + type widening)
# ---------------------------------------------------------------------------

_WIDENINGS = {
    (pa.int32(), pa.int64()), (pa.int32(), pa.float64()),
    (pa.int64(), pa.float64()), (pa.float32(), pa.float64()),
    (pa.string(), pa.large_string()),
}


def conform_table(batch: pa.Table, target: pa.Schema) -> pa.Table:
    """Table-level schema conform: missing columns backfilled null
    (additive evolution), widening casts applied (int→float,
    string→large_string…). Narrowing or incompatible casts raise."""
    arrays = []
    for field in target:
        if field.name in batch.column_names:
            col = batch[field.name]
            if col.type != field.type:
                if (col.type, field.type) not in _WIDENINGS and not (
                        pa.types.is_integer(col.type)
                        and pa.types.is_floating(field.type)):
                    raise pa.ArrowInvalid(
                        f"non-widening cast {col.type} -> {field.type} "
                        f"for column {field.name}")
                col = pc.cast(col, field.type)
            arrays.append(col)
        else:
            arrays.append(pa.nulls(batch.num_rows, type=field.type))
    return pa.Table.from_arrays(arrays, schema=target)


def evolve_to_schema(ds: "ray.data.Dataset", target: pa.Schema,
                     ) -> "ray.data.Dataset":
    """≙ SelectValues metadata casts + getFields() recomputation: conform
    batches to ``target`` (see ``conform_table``)."""
    return ds.map_batches(lambda b: conform_table(b, target),
                          batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)


def unify_event_schemas(schemas: Iterable[pa.Schema]) -> pa.Schema:
    """Compute the widened union schema across event-log generations."""
    return pa.unify_schemas(list(schemas), promote_options="permissive")
