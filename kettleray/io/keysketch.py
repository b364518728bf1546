"""Per-file HyperLogLog key-sketch sidecars — metadata-only
approximate key cardinality for the bucketed state sink.

The manifest answers "how many ROWS does this table hold" for free
(per-file ``rows`` lineage), but "how many distinct KEYS" is a
different number the moment the layout has MOR deltas (one key may
appear in a base file AND several delta files) or un-compacted
redelivered events. Exactly counting keys is a full scan + a key-hash
exchange; at 100 TB that is the query you built the lake to avoid
answering by brute force.

A per-file HLL sketch of the combined (repo, path) key makes the count
a METADATA read: HLL registers merge by max, and the union of the
per-file sketches is exactly the sketch of the union of the files'
keys — double-counting across base/delta files is impossible by
construction. Cost: #files x 2^p bytes (4 KB at the default p=12),
read from sidecars, no parquet data pages touched.

Storage contract — identical to the Bloom sidecars
(:mod:`kettleray.io.blooms`), so every property proven there carries
over:

- sidecar ``<file>.parquet.hll`` sits NEXT TO its parquet file in the
  version dir; written tmp + rename, never mutated after;
- COW committers hardlink whole untouched bucket dirs, so sketches
  ride forward with their files for free; rewritten files simply lack
  a sidecar until the next ``build_key_sketches`` maintenance pass
  (a missing sidecar means "build me", never a wrong count);
- readers glob ``*.parquet`` only, so sidecars are invisible to scan /
  lookup / fsck / GC-nlink paths;
- the header records the key columns the sketch was built over — a
  merge across sidecars built on different keys raises instead of
  silently unioning apples with oranges.

Hashing is the shared vectorized splitmix64 kernel
(:func:`kettleray.ops.bloom.hash_strings_u64`), the same bytes the
Bloom sidecars hash — one flat-buffer pass per file covers both
maintenance jobs when run back to back (page-cache hit).

No Kettle analog (Kettle's Group By COUNT_DISTINCT holds every value,
engine/.../steps/groupby/GroupByMeta); the lake-side analog is
Iceberg's puffin theta-sketch blobs / Delta's tightBounds stats.
"""
from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pyarrow.parquet as pq
import ray

from kettleray.io.blooms import KEY_SEP, combined_key_array
from kettleray.ops.bloom import hash_strings_u64
from kettleray.ops.sketches import HLL

_MAGIC = b"KRHL"
_FMT_VERSION = 1
# magic, fmt_version, p, n_rows, key_cols_len; key-cols string
# (utf-8, KEY_SEP-joined) follows, then the 2^p uint8 registers.
_HDR = struct.Struct("<4sHHQH")


def sidecar_path(parquet_path: str) -> str:
    return parquet_path + ".hll"


def _build_sidecar(fp: str, key_cols: tuple, p: int) -> int:
    """Build + atomically publish ``fp``'s key sketch; returns sidecar
    bytes. Reads ONLY the key columns."""
    t = pq.read_table(fp, columns=list(key_cols))
    h = hash_strings_u64(combined_key_array(t, key_cols))
    sk = HLL(p).update_hashes(h)
    sp = sidecar_path(fp)
    tmp = f"{sp}.{uuid.uuid4().hex[:12]}.tmp"
    kc = KEY_SEP.join(key_cols).encode("utf-8")
    with open(tmp, "wb") as f:
        f.write(_HDR.pack(_MAGIC, _FMT_VERSION, p, t.num_rows, len(kc)))
        f.write(kc)
        f.write(sk.reg.tobytes())
    os.rename(tmp, sp)
    return _HDR.size + len(kc) + sk.m


@ray.remote
def _build_sidecar_task(fp: str, key_cols: tuple, p: int) -> int:
    return _build_sidecar(fp, key_cols, p)


def _resolve(root: str, version, key_cols):
    from kettleray.io import sink

    v = version if version is not None else sink.current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    if key_cols is None:
        man = sink.read_manifest(root, v)
        kc = man.metrics.get("bucket_cols") if man else None
        key_cols = tuple(kc) if kc else ("repo", "path")
    return v, tuple(key_cols)


def build_key_sketches(root: str, *, key_cols=None, p: int = 12,
                       version: int | None = None,
                       parallel: bool = True) -> dict:
    """Build missing key-sketch sidecars for a committed version — a
    maintenance op like ``build_key_blooms`` (incremental commits carry
    untouched buckets' sidecars forward via the hardlink loop, so only
    files this commit rewrote need work). Cost ∝ missing files x their
    key-column bytes; one Ray task per missing file."""
    from kettleray.io import sink

    v, key_cols = _resolve(root, version, key_cols)
    vdir = sink._version_dir(root, v)
    files = sink._parquet_files(vdir)
    missing = [f for f in files if not os.path.exists(sidecar_path(f))]
    built_bytes = 0
    if missing and parallel:
        built_bytes = sum(ray.get(
            [_build_sidecar_task.remote(f, key_cols, p)
             for f in missing]))
    elif missing:
        built_bytes = sum(_build_sidecar(f, key_cols, p)
                          for f in missing)
    return {"version": v, "key_cols": list(key_cols),
            "files_total": len(files), "built": len(missing),
            "existing": len(files) - len(missing),
            "built_bytes": built_bytes}


def load_sketch(parquet_path: str) -> "tuple[HLL, tuple, int] | None":
    """Load ``parquet_path``'s sidecar -> (HLL, key_cols, n_rows), or
    None when absent/foreign/truncated (callers treat that as 'build
    missing', never as a count)."""
    sp = sidecar_path(parquet_path)
    try:
        with open(sp, "rb") as f:
            hdr = f.read(_HDR.size)
            if len(hdr) < _HDR.size:
                return None
            magic, ver, p, n_rows, kl = _HDR.unpack(hdr)
            if magic != _MAGIC or ver != _FMT_VERSION:
                return None
            kc = tuple(f.read(kl).decode("utf-8").split(KEY_SEP))
            reg = np.frombuffer(f.read(1 << p), dtype=np.uint8)
            if reg.size != 1 << p:
                return None
            return HLL(p, reg.copy()), kc, n_rows
    except FileNotFoundError:
        return None


def approx_key_count(root: str, *, version: int | None = None,
                     key_cols=None, p: int = 12,
                     build_missing: bool = True) -> dict:
    """Approximate distinct-key count of a committed version from
    sidecar metadata alone: merge every file's HLL (register max —
    union semantics, so base/delta overlap never double-counts).

    With ``build_missing`` (default) files lacking a sidecar are
    sketched first (cost ∝ those files only); otherwise they are
    reported in ``files_unsketched`` and EXCLUDED, making the result a
    lower-ish bound the caller can see is partial. Returns
    ``approx_distinct_keys`` (float), ``rows_total`` (exact, from the
    sidecar headers), file counts, and the error ``rse``."""
    from kettleray.io import sink

    v, key_cols = _resolve(root, version, key_cols)
    if build_missing:
        build_key_sketches(root, key_cols=key_cols, p=p, version=v)
    vdir = sink._version_dir(root, v)
    files = sink._parquet_files(vdir)
    merged: HLL | None = None
    rows = 0
    unsketched = 0
    for fp in files:
        loaded = load_sketch(fp)
        if loaded is None:
            unsketched += 1
            continue
        sk, kc, n_rows = loaded
        if kc != key_cols:
            raise ValueError(
                f"sidecar {sidecar_path(fp)} built over key {kc}, "
                f"asked for {key_cols} — rebuild before merging")
        rows += n_rows
        merged = sk if merged is None else merged.merge(sk)
    est = merged.estimate() if merged is not None else 0.0
    return {"version": v, "key_cols": list(key_cols),
            "approx_distinct_keys": est,
            "rows_total": rows,
            "files_total": len(files),
            "files_unsketched": unsketched,
            "rse": 1.04 / (merged.m ** 0.5) if merged is not None
            else None}
