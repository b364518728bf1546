"""Exactly-once Parquet state sink: staged writes, manifests, checkpoints.

≙ Table Output's transactional commit (tableoutput/TableOutput.java batch
commit) re-expressed for a lake: there is no transactional layer over
plain Parquet, so exactly-once is built from

  1. staged directory writes  (write to ``_stage_vN``, fsync-free atomic
     ``rename`` to ``vN`` — a crashed writer leaves only garbage stages),
  2. a JSON manifest per committed version: high-watermark commit offset,
     schema, per-file lineage (rows/bytes), metrics,
  3. a CURRENT pointer file updated by atomic rename,
  4. idempotent replay: ``apply_incremental`` filters incoming events to
     ``commit_seq > watermark``, so re-applied batches are harmless.

Layout:
  root/
    CURRENT            -> {"version": N}
    v0001/ *.parquet
    v0001/manifest.json
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow.parquet as pq

import ray.data

from kettleray.ops import cdc


@dataclass
class Manifest:
    version: int
    watermark: int                      # max commit_seq applied (incl. deletes)
    schema: str
    files: list[dict] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


def _version_dir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def current_version(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def read_manifest(root: str, version: int | None = None) -> Manifest | None:
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    with open(os.path.join(_version_dir(root, v), "manifest.json")) as f:
        return Manifest.from_json(f.read())


def read_state(root: str) -> "ray.data.Dataset | None":
    v = current_version(root)
    if v is None:
        return None
    vdir = _version_dir(root, v)
    files = [os.path.join(vdir, f) for f in sorted(os.listdir(vdir))
             if f.endswith(".parquet")]
    return ray.data.read_parquet(files)


def commit_state(ds: "ray.data.Dataset", root: str, *, watermark: int,
                 metrics: dict | None = None) -> Manifest:
    """Stage-write ``ds`` as the next state version and atomically commit.

    Idempotent: if the target version dir already exists (a concurrent or
    prior identical commit), the stage is discarded and the existing
    manifest returned.
    """
    os.makedirs(root, exist_ok=True)
    prev = current_version(root)
    v = 1 if prev is None else prev + 1
    final_dir = _version_dir(root, v)
    if os.path.exists(final_dir):
        return read_manifest(root, v)
    stage = os.path.join(root, f"_stage_v{v:04d}")
    if os.path.exists(stage):       # leftover from a crashed writer
        shutil.rmtree(stage)
    t0 = time.time()
    ds.write_parquet(stage)
    try:                         # per-stage Ray execution stats -> lineage
        stats_tail = ds.stats()[-1800:]
    except Exception:
        stats_tail = ""
    files = []
    for name in sorted(os.listdir(stage)):
        fp = os.path.join(stage, name)
        md = pq.read_metadata(fp)
        files.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(fp)})
    schema = str(pq.read_schema(os.path.join(stage, files[0]["file"]))) \
        if files else ""
    man = Manifest(version=v, watermark=watermark, schema=schema,
                   files=files,
                   metrics={"write_sec": round(time.time() - t0, 3),
                            "total_rows": sum(f["rows"] for f in files),
                            "ray_stats_tail": stats_tail,
                            **(metrics or {})})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man.to_json())
    os.rename(stage, final_dir)             # atomic commit of the version
    tmp = os.path.join(root, "CURRENT.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": v}, f)
    os.rename(tmp, os.path.join(root, "CURRENT"))
    return man


def apply_incremental(root: str, events: "ray.data.Dataset", *,
                      num_partitions: int = 64) -> Manifest:
    """Apply a (micro-)batch of change events on top of the current state.

    Exactly-once: events at or below the committed watermark are filtered
    out (idempotent re-application); the new watermark is the max
    commit_seq across the incoming filtered events (deletes included).
    """
    import pyarrow.compute as pc

    man = read_manifest(root)
    wm = man.watermark if man else -1

    def _above(b):
        return b.filter(pc.greater(b["commit_seq"], wm))

    import pyarrow as pa

    from kettleray.ops.cdc import evolve_to_schema, unify_event_schemas

    fresh = events.map_batches(_above, batch_format="pyarrow",
                               zero_copy_batch=True)
    try:
        new_wm = int(fresh.max("commit_seq"))
    except (TypeError, ValueError):
        new_wm = wm
    if new_wm <= wm and man is not None:
        return man                      # nothing new — no-op commit

    state = read_state(root)
    if state is not None:
        def _state_as_events(b):
            b = b.drop_columns([c for c in ("content_sha256",)
                                if c in b.column_names])
            b = b.rename_columns(
                [c if c != "last_commit_seq" else "commit_seq"
                 for c in b.column_names])
            return b.append_column(
                "op", pa.array(["insert"] * b.num_rows))
        pseudo = state.map_batches(_state_as_events, batch_format="pyarrow")
        # schema evolution across generations: additive columns backfill
        # null, widening casts apply, on BOTH sides before the union
        target = unify_event_schemas(
            [pseudo.schema().base_schema, fresh.schema().base_schema])
        merged = evolve_to_schema(pseudo, target).union(
            evolve_to_schema(fresh, target))
    else:
        merged = fresh
    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    return commit_state(final, root, watermark=new_wm,
                        metrics={"prev_watermark": wm})
