"""Per-file key-Bloom sidecars — point-lookup file skipping for the
bucketed state sink (the equality complement of the zone maps in
``sink.scan_state``).

Zone maps prune RANGE predicates but are useless for point lookups on
hash-distributed key columns: every file's [min, max] over ``repo`` /
``path`` spans the whole alphabet. A per-file Bloom filter over the
COMBINED key answers "might this (repo, path) be in this file?" with
no false negatives, so :func:`kettleray.io.sink.lookup_state` can skip
files whose bloom proves the key absent — base AND delta files alike
(a skip is a proof of absence, so MOR merge semantics are unaffected).

At 100 TB a serving bucket holds hundreds of clustered/compacted files;
bucket routing already makes a lookup O(one bucket), the sidecars make
it O(files that might hold the key) — typically one — with k one-byte
seeks per candidate file instead of a parquet footer + page read.

Storage contract (crash-safe, version-correct by construction):

- sidecar ``<file>.parquet.bloom`` sits NEXT TO its parquet file inside
  the version dir; written tmp + rename (atomic), never mutated after.
- the COW committers hardlink every name in an untouched bucket dir
  (sink.apply_incremental_bucketed), so sidecars ride forward with
  their files for free; rewritten buckets get fresh parquet files with
  NO sidecar — a missing sidecar means "unprunable", never "wrong".
- ``fsck_state`` / ``_stage_lineage`` / all readers glob ``*.parquet``
  only, so sidecars are invisible to every existing code path.
- version GC removes whole version dirs; hardlinked sidecars follow the
  same nlink discipline as their data files.

Hash kernels are shared with ops.bloom (flat-buffer polynomial hash +
splitmix64 finalize, Kirsch-Mitzenmacher double hashing) so the builder
is fully vectorized and build/probe agree across processes.

No Kettle analog (Kettle's lookups are in-memory hash probes,
steps/streamlookup/StreamLookup.java); the lake-side analog is
Iceberg/Delta bloom-filter data skipping.
"""
from __future__ import annotations

import os
import struct
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from kettleray.ops.bloom import (_bit_positions, bloom_params,
                                 hash_strings_u64)

_MAGIC = b"KRBF"
_FMT_VERSION = 1
# magic, fmt_version, k, m_bits, n_keys, key_cols_len; the key-cols
# string (utf-8, KEY_SEP-joined) follows the header, then the bitmap —
# self-describing so a probe NEVER tests a key built over different
# columns than the build used (that would be an unsound skip).
_HDR = struct.Struct("<4sHHQQH")

#: joins multi-column keys into the hashed string; \x1f (unit
#: separator) cannot appear in repo/path values produced by the
#: generators and makes ("a", "b\x1fc") != ("a\x1fb", "c") in practice
#: for real keys — and even a pathological collision only costs a
#: false positive (an extra file read), never a wrong answer.
KEY_SEP = "\x1f"


def sidecar_path(parquet_path: str) -> str:
    return parquet_path + ".bloom"


def combined_key_array(t: pa.Table, key_cols) -> pa.Array:
    """One string per row: key columns cast to string and joined with
    KEY_SEP (vectorized; nulls join as empty segments)."""
    cols = [pc.fill_null(pc.cast(t[c], pa.string()), "") for c in key_cols]
    if len(cols) == 1:
        arr = cols[0]
    else:
        arr = pc.binary_join_element_wise(*cols, KEY_SEP)
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def combined_key(values) -> str:
    return KEY_SEP.join("" if v is None else str(v) for v in values)


def _build_sidecar(fp: str, key_cols: tuple, bits_per_key: int) -> int:
    """Build + atomically publish ``fp``'s sidecar; returns its bytes.
    Reads ONLY the key columns (column-pruned parquet read)."""
    t = pq.read_table(fp, columns=list(key_cols))
    h = hash_strings_u64(combined_key_array(t, key_cols))
    m_bits, k = bloom_params(max(len(h), 1), bits_per_key=bits_per_key)
    bitmap = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
    if len(h):
        idx = _bit_positions(h, m_bits, k).ravel()
        np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(
                             np.uint8))
    sp = sidecar_path(fp)
    tmp = f"{sp}.{uuid.uuid4().hex[:12]}.tmp"
    kc = KEY_SEP.join(key_cols).encode("utf-8")
    with open(tmp, "wb") as f:
        f.write(_HDR.pack(_MAGIC, _FMT_VERSION, k, m_bits, len(h),
                          len(kc)))
        f.write(kc)
        f.write(bitmap.tobytes())
    os.rename(tmp, sp)
    return _HDR.size + len(kc) + bitmap.nbytes


@ray.remote
def _build_sidecar_task(fp: str, key_cols: tuple, bits_per_key: int) -> int:
    return _build_sidecar(fp, key_cols, bits_per_key)


def build_key_blooms(root: str, *, key_cols=None, bits_per_key: int = 10,
                     version: int | None = None,
                     parallel: bool = True) -> dict:
    """Build missing key-Bloom sidecars for a committed version — a
    maintenance op like ``cluster_state`` (run it after compaction /
    clustering; incremental commits carry untouched buckets' sidecars
    forward via the hardlink loop, so only rewritten files need work).

    ``key_cols`` defaults to the manifest's ``bucket_cols`` (the same
    key the lookup routes on). Cost ∝ files WITHOUT a sidecar × their
    key-column bytes; one Ray task per missing file."""
    from kettleray.io import sink

    v = version if version is not None else sink.current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = sink.read_manifest(root, v)
    if key_cols is None:
        kc = man.metrics.get("bucket_cols") if man else None
        key_cols = tuple(kc) if kc else ("repo", "path")
    key_cols = tuple(key_cols)
    vdir = sink._version_dir(root, v)
    files = sink._parquet_files(vdir)
    missing = [f for f in files if not os.path.exists(sidecar_path(f))]
    built_bytes = 0
    if missing and parallel:
        built_bytes = sum(ray.get(
            [_build_sidecar_task.remote(f, key_cols, bits_per_key)
             for f in missing]))
    elif missing:
        built_bytes = sum(_build_sidecar(f, key_cols, bits_per_key)
                          for f in missing)
    return {"version": v, "key_cols": list(key_cols),
            "files_total": len(files), "built": len(missing),
            "existing": len(files) - len(missing),
            "built_bytes": built_bytes}


class Sidecar:
    """A sidecar loaded into memory for repeated probes (the serving
    path: :class:`kettleray.io.sink.StateReader` caches one per file,
    turning each probe into a few numpy bit tests — no file IO)."""

    __slots__ = ("k", "m_bits", "key_cols", "bitmap")

    def __init__(self, k: int, m_bits: int, key_cols: list,
                 bitmap: np.ndarray):
        self.k = k
        self.m_bits = m_bits
        self.key_cols = key_cols
        self.bitmap = bitmap

    def might_contain(self, key_values: dict) -> bool:
        if any(c not in key_values for c in self.key_cols):
            return True
        key = combined_key(key_values[c] for c in self.key_cols)
        h = hash_strings_u64(pa.array([key], type=pa.string()))
        pos = _bit_positions(h, self.m_bits, self.k)[0]
        byte = self.bitmap[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return bool(bit.all())


def load_sidecar(parquet_path: str) -> "Sidecar | None":
    """Load ``parquet_path``'s sidecar into memory; None means missing
    or unreadable (= unprunable, same contract as probe_sidecar)."""
    sp = sidecar_path(parquet_path)
    try:
        with open(sp, "rb") as f:
            hdr = f.read(_HDR.size)
            if len(hdr) != _HDR.size:
                return None
            magic, fmt, k, m_bits, _n, kc_len = _HDR.unpack(hdr)
            if magic != _MAGIC or fmt != _FMT_VERSION or m_bits == 0:
                return None
            kc = f.read(kc_len).decode("utf-8").split(KEY_SEP)
            bitmap = np.frombuffer(f.read((m_bits + 7) // 8),
                                   dtype=np.uint8)
            if bitmap.nbytes != (m_bits + 7) // 8:
                return None
        return Sidecar(int(k), int(m_bits), kc, bitmap)
    except (FileNotFoundError, OSError):
        return None


def probe_sidecar(parquet_path: str, key_values: dict) -> bool:
    """True iff ``parquet_path`` MIGHT contain the key (no false
    negatives). ``key_values`` maps column name → value; the probe key
    is assembled in the SIDECAR's recorded column order, so a bloom
    built over different/extra columns than the caller knows about is
    simply unprunable (returns True) instead of unsound. Cost: header
    read + k one-byte seeks; the bitmap is never loaded whole."""
    sp = sidecar_path(parquet_path)
    try:
        with open(sp, "rb") as f:
            hdr = f.read(_HDR.size)
            if len(hdr) != _HDR.size:
                return True
            magic, fmt, k, m_bits, _n, kc_len = _HDR.unpack(hdr)
            if magic != _MAGIC or fmt != _FMT_VERSION or m_bits == 0:
                return True
            kc = f.read(kc_len).decode("utf-8").split(KEY_SEP)
            if any(c not in key_values for c in kc):
                return True
            key = combined_key(key_values[c] for c in kc)
            h = hash_strings_u64(pa.array([key], type=pa.string()))
            pos = _bit_positions(h, m_bits, int(k))[0]
            base = _HDR.size + kc_len
            for p in pos:
                f.seek(base + int(p >> np.uint64(3)))
                b = f.read(1)
                if not b or not (b[0] >> (int(p) & 7)) & 1:
                    return False
        return True
    except FileNotFoundError:
        return True


def filter_files_by_key(files: list, key_values: dict,
                        report: "dict | None" = None) -> list:
    """Drop files whose bloom PROVES the key absent; files without a
    sidecar are kept. Updates ``report['files_bloom_skipped' /
    'files_bloom_probed']`` cumulatively when given."""
    kept = [f for f in files if probe_sidecar(f, key_values)]
    if report is not None:
        report["files_bloom_probed"] = report.get(
            "files_bloom_probed", 0) + len(files)
        report["files_bloom_skipped"] = report.get(
            "files_bloom_skipped", 0) + len(files) - len(kept)
    return kept
