"""Broadcast Bloom-filter primitives — the shuffle-killer for
"does this row's key appear in that SMALL set?" questions at 100 TB.

The canonical use is decontamination (``dedup.decontaminate(
method='bloom')``): the eval side's n-grams are tiny (benchmark
suites), the train side is the lake. A hash-partitioned semi join
moves EVERY train gram through an all-to-all exchange; a Bloom filter
of the eval grams, built once and broadcast via ``ray.put``, lets each
train batch drop ~everything locally — only bloom HITS (true matches +
a controlled false-positive trickle) reach the exact join, so the
exchange volume tracks the eval set, not the corpus. False negatives
are impossible, so an exact downstream verify makes the end result
bit-identical to the unfiltered plan.

Kernels are fully vectorized:

- ``hash_strings_u64``: one polynomial hash per string computed over
  the Arrow column's FLAT byte buffer (position-power table +
  ``np.add.reduceat`` at string starts, splitmix64 finalize) — no
  per-row Python, same buffer-walking style as cdc.hash_hex_array.
- bit positions via double hashing (Kirsch-Mitzenmacher: ``h1 + i*h2``,
  the standard trick so k probes cost two hashes);
- build = per-block set-bit indices -> driver ORs them into one bitmap
  (driver traffic <= k x small-side rows of u64, never the bitmap per
  block); probe = two gathers + a bit test per key.

No Kettle analog (closest is stream lookup's broadcast hash probe,
steps/streamlookup/StreamLookup.java — this is its sketch-sized
cousin for membership-only probes).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)
_FNV_PRIME = np.uint64(0x100000001B3)


def _splitmix64(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (z + _C1)
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def hash_strings_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """One 64-bit hash per string, vectorized over the flat byte
    buffer: ``h = splitmix64(sum_j byte_j * p^j  ^  len * c)``. Nulls
    hash as empty strings. Deterministic across processes (pure
    integer arithmetic, no PYTHONHASHSEED)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if arr.null_count:
        import pyarrow.compute as pc
        arr = pc.fill_null(arr, "")
    bufs = arr.buffers()
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    lens = np.diff(off)
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        out[:] = lens.astype(np.uint64) * _C1        # length mix
        nz = lens > 0
        if nz.any():
            flat = np.frombuffer(bufs[2], dtype=np.uint8)[
                off[0]:off[-1]].astype(np.uint64)
            starts = (off[:-1] - off[0])
            # p^(position within string): global position minus the
            # owning string's start, powers from one running table
            pos = np.arange(len(flat), dtype=np.int64) \
                - np.repeat(starts, lens)
            pows = np.empty(int(lens.max()), dtype=np.uint64)
            pows[0] = 1
            np.multiply.accumulate(
                np.full(len(pows) - 1, _FNV_PRIME, dtype=np.uint64),
                out=pows[1:])
            contrib = flat * pows[pos]
            # reduceat over nonempty starts only: empty strings add no
            # bytes, so consecutive nonempty starts delimit exact
            # per-string segments (same trick as dedup._minhash)
            out[nz] ^= np.add.reduceat(contrib, starts[nz])
    return _splitmix64(out)


def _bit_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit indices via double hashing; h2 forced odd so the k
    probes never collapse onto one slot."""
    with np.errstate(over="ignore"):
        h2 = _splitmix64(h ^ _C2) | np.uint64(1)
        ks = np.arange(k, dtype=np.uint64)
        return (h[:, None] + ks[None, :] * h2[:, None]) \
            % np.uint64(m_bits)


def bloom_params(n_keys: int, *, bits_per_key: int = 12,
                 max_bytes: int = 1 << 29) -> tuple[int, int]:
    """(m_bits, k) for ``n_keys``: k = ln2 * bits/key (optimal), fp ~
    0.61^(bits/key) (~3e-3 at 12). Raises if the bitmap would exceed
    ``max_bytes`` — a bloom side that big isn't "small" any more; use
    the exact join path instead of silently OOMing every worker."""
    m_bits = max(64, int(n_keys) * bits_per_key)
    if m_bits > max_bytes * 8:
        raise ValueError(
            f"bloom bitmap for {n_keys} keys x {bits_per_key} bits "
            f"= {m_bits // 8} bytes exceeds max_bytes={max_bytes}; "
            f"this side is not broadcast-sized — use the exact join")
    k = max(1, round(0.6931 * bits_per_key))
    return m_bits, k


def build_bloom(ds, col: str, *, bits_per_key: int = 12,
                max_bytes: int = 1 << 29) -> dict:
    """Build a Bloom filter over ``ds[col]`` (string) and ``ray.put``
    the bitmap. The dataset is the SMALL side by contract (guarded by
    ``max_bytes``); per-block tasks emit unique set-bit indices, the
    driver ORs them into one bitmap (driver traffic <= k x rows x 8
    bytes). Returns ``{"ref", "m_bits", "k", "n_keys"}`` for
    ``bloom_filter_hits``."""
    ds = ds.materialize()
    n_keys = ds.count()
    m_bits, k = bloom_params(max(n_keys, 1), bits_per_key=bits_per_key,
                             max_bytes=max_bytes)

    def _idx(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"idx": pa.array([], type=pa.uint64())})
        pos = _bit_positions(hash_strings_u64(t[col]), m_bits, k)
        return pa.table({"idx": pa.array(np.unique(pos.ravel()),
                                         type=pa.uint64())})

    bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    for b in ds.map_batches(_idx, batch_format="pyarrow",
                            zero_copy_batch=True).iter_batches(
                                batch_format="pyarrow"):
        idx = b["idx"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bitmap, idx >> np.uint64(3),
                         np.uint8(1) << (idx & np.uint64(7)).astype(
                             np.uint8))
    return {"ref": ray.put(bitmap), "m_bits": m_bits, "k": k,
            "n_keys": n_keys}


def bloom_probe(values: pa.Array | pa.ChunkedArray, bitmap: np.ndarray,
                m_bits: int, k: int) -> np.ndarray:
    """Boolean mask: which values MIGHT be in the built set (no false
    negatives). Two gathers + a bit test per (value, probe)."""
    h = hash_strings_u64(values)
    if h.size == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(h, m_bits, k)
    bits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)]
            >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
    return bits.all(axis=1)


def bloom_filter_hits(ds, col: str, bloom: dict):
    """Keep only rows whose ``col`` hits the broadcast bloom — the
    map-side prefilter. The bitmap travels as ONE object-store ref;
    per-batch ``ray.get`` is a zero-copy view, so no per-task reship."""
    ref, m_bits, k = bloom["ref"], bloom["m_bits"], bloom["k"]

    def _fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return t
        bm = ray.get(ref)
        return t.filter(pa.array(bloom_probe(t[col], bm, m_bits, k)))

    return ds.map_batches(_fn, batch_format="pyarrow",
                          zero_copy_batch=True)
