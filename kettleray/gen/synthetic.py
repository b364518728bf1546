"""Deterministic synthetic CDC change-event stream generator.

Every field of event ``i`` is a pure function of the global index ``i``
(splitmix64-style integer hashing), so generation is:

- deterministic regardless of batching / parallelism,
- embarrassingly parallel (``ray.data.range(n).map_batches(...)``),
- scalable to 10^10 events without a driver-side loop.

The index IS the total commit order (``commit_seq = i``): commit shas are
unordered strings, so replay order is explicit data (SURVEY.md §2.10).

Skew: repo choice follows a power-law over ``n_repos`` (exponent
``skew``), giving hot repos for the skew-handling tests/bench.
Redelivery: a ``p_redeliver`` fraction of indices additionally re-emit an
earlier event verbatim (same key + commit_seq) — exactly-once fodder.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data

_LANGS = np.array(["py", "java", "ts", "go", "rs"])

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 hash of (x, salt)."""
    with np.errstate(over="ignore"):
        z = (x.astype(np.uint64) + np.uint64(salt) * _C1)
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def _unit(x: np.ndarray, salt: int) -> np.ndarray:
    """uniform [0,1) floats from indices."""
    return _mix64(x, salt).astype(np.float64) / 2.0**64


@dataclass(frozen=True)
class EventGenConfig:
    n_events: int
    n_repos: int = 100
    n_paths_per_repo: int = 1000
    skew: float = 2.0           # power-law exponent for repo popularity
    p_delete: float = 0.05
    p_insert: float = 0.30
    p_redeliver: float = 0.0    # fraction of indices that re-emit an old event
    redeliver_window: int = 10_000
    content_repeat: int = 8     # ~32 bytes per repeat unit
    seed: int = 42
    hot_key_share: float = 0.0  # fraction of events hitting ONE (repo, path)


def _hex40(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized 40-hex-char commit shas from two uint64 hash columns."""
    import binascii
    n = len(h1)
    raw = np.empty((n, 20), dtype=np.uint8)
    raw[:, 0:8] = h1.astype(">u8").view(np.uint8).reshape(n, 8)
    raw[:, 8:16] = h2.astype(">u8").view(np.uint8).reshape(n, 8)
    raw[:, 16:20] = (h1 ^ h2).astype(">u8").view(np.uint8).reshape(n, 8)[:, :4]
    hexed = binascii.hexlify(raw.tobytes())
    return np.frombuffer(hexed, dtype="S40").astype("U40")


def events_for_indices(idx: np.ndarray, cfg: EventGenConfig,
                       columns: list[str] | None = None) -> pa.Table:
    """Materialize the event rows for a batch of global indices.

    Hot path for the bench: string building uses Arrow C++ kernels
    (binary_join_element_wise) and vectorized hex, no np.char / Python
    loops. ``columns`` emulates columnar projection pushdown: the
    expensive ``content`` build is skipped when not requested (a real
    Parquet scan would never read the column)."""
    import pyarrow.compute as pc
    s = cfg.seed
    u_repo = _unit(idx, s + 1)
    repo_id = np.minimum(
        (cfg.n_repos * np.power(u_repo, cfg.skew)).astype(np.int64),
        cfg.n_repos - 1)
    path_id = (_mix64(idx, s + 2)
               % np.uint64(cfg.n_paths_per_repo)).astype(np.int64)
    u_op = _unit(idx, s + 3)
    lang_id = (_mix64(repo_id.astype(np.uint64), s + 4)
               % np.uint64(len(_LANGS))).astype(np.int64)
    h1 = _mix64(idx, s + 5)
    h2 = _mix64(idx, s + 6)

    is_delete = u_op < cfg.p_delete
    op = np.where(is_delete, "delete",
                  np.where(u_op < cfg.p_delete + cfg.p_insert,
                           "insert", "update"))
    if cfg.hot_key_share > 0:   # skew-test mode: one pathological key
        hot = _unit(idx, s + 9) < cfg.hot_key_share
        repo_id = np.where(hot, 0, repo_id)
        path_id = np.where(hot, -1, path_id)
    repo = pc.binary_join_element_wise(
        "repo_", pc.cast(pa.array(repo_id), pa.string()), "")
    path = pc.binary_join_element_wise(
        "src/f_", pc.cast(pa.array(path_id), pa.string()), ".txt", "")
    lang = pa.array(_LANGS[lang_id], type=pa.string())
    commit = pa.array(_hex40(h1, h2), type=pa.string())
    if columns is None or "content" in columns:
        body = pc.binary_join_element_wise(
            lang, " code unit ", repo, "/", path, " #",
            pc.cast(pa.array((h1 % np.uint64(1_000_000)).astype(np.int64)),
                    pa.string()),
            "\n", "")
        content = pc.binary_join_element_wise(
            *([body] * cfg.content_repeat), "")
        content = pc.if_else(pa.array(is_delete), "", content)
    else:
        content = None

    cols = {
        "repo": repo,
        "path": path,
        "commit": commit,
        "lang": lang,
        "content": content,
        "op": pa.array(op.tolist(), type=pa.string()),
        "commit_seq": pa.array(idx, type=pa.int64()),
        "ts": pa.array(
            (np.int64(1_700_000_000_000_000) + idx * np.int64(1_000)),
            type=pa.timestamp("us")),
    }
    if columns is not None:
        return pa.table({k: cols[k] for k in columns})
    return pa.table({k: v for k, v in cols.items() if v is not None})


def _gen_batch(batch: dict, cfg: EventGenConfig,
               columns: list[str] | None = None) -> pa.Table:
    idx = batch["id"].astype(np.int64)
    t = events_for_indices(idx, cfg, columns)
    if cfg.p_redeliver > 0:
        u = _unit(idx, cfg.seed + 7)
        dup_src = idx[u < cfg.p_redeliver]
        if len(dup_src):
            back = (_mix64(dup_src, cfg.seed + 8)
                    % np.uint64(cfg.redeliver_window)).astype(np.int64)
            j = np.maximum(dup_src - back, 0)
            t = pa.concat_tables([t, events_for_indices(j, cfg, columns)])
    return t


def generate_events(cfg: EventGenConfig, *,
                    override_num_blocks: int | None = None,
                    columns: list[str] | None = None,
                    ) -> "ray.data.Dataset":
    """Distributed deterministic event stream as a Ray Dataset.
    ``columns`` = projection pushdown (skips building unrequested
    columns, notably the wide ``content``)."""
    ds = ray.data.range(cfg.n_events,
                        override_num_blocks=override_num_blocks)
    return ds.map_batches(_gen_batch, batch_format="numpy",
                          batch_size=None,
                          fn_kwargs={"cfg": cfg, "columns": columns})


def generate_events_local(cfg: EventGenConfig) -> pa.Table:
    """Driver-side small-scale generation (tests / oracle input)."""
    idx = np.arange(cfg.n_events, dtype=np.int64)
    if cfg.p_redeliver > 0:
        return _gen_batch({"id": idx}, cfg)
    return events_for_indices(idx, cfg)
