"""Per-shard key-state store for streaming (micro-batch) CDC ingest.

≙ DimensionLookup's per-copy cache + Kettle's ModPartitioner key
affinity (SURVEY.md §2.7/§4): each shard actor owns hash-bucket
``hash(key) % P == shard_id`` and maintains last-writer-wins state with
tombstones, commit-ordered (LSM-flavored: hot state in a dict, cold
segments flushable to Parquet).

This is the raw-actor path (SURVEY.md §2 'custom operators' case c):
a shared mutable index across micro-batches is the one thing
``Dataset`` can't express. The batch replay path (ops.cdc.replay_lww)
remains the default for backfills.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray


class KeyStateStore:
    """In-process LWW state: (repo, path) -> (commit_seq, row-tuple).
    Deletes keep a tombstone (needed for correct late-event handling
    WITHIN the open window; events below the committed watermark are
    filtered upstream)."""

    def __init__(self, *, max_keys: int | None = None,
                 segment_dir: str | None = None):
        """Bounded-memory LSM mode: pass ``max_keys`` + ``segment_dir``
        and the memtable (dict) is flushed to a numbered Parquet segment
        whenever it exceeds ``max_keys`` (classic memtable -> SSTable);
        ``snapshot()`` LWW-merges all segments + the memtable (merge-on-
        read). Actor heap is then bounded by max_keys rows regardless of
        shard key cardinality (SURVEY.md §7.4 watch item 5). On
        construction, existing ``seg_*.parquet`` under segment_dir are
        re-registered (restart resumes from the flushed position without
        loading rows into memory)."""
        self.state: dict[tuple[str, str], tuple] = {}
        self.watermark = -1
        self.applied = 0
        self.max_keys = max_keys
        self.segment_dir = segment_dir
        self.segments: list[str] = []
        self._next_seg = 0
        if segment_dir:
            import glob
            os.makedirs(segment_dir, exist_ok=True)
            for p in sorted(glob.glob(
                    os.path.join(segment_dir, "seg_*.parquet"))):
                self._register_segment(p)

    def _register_segment(self, path: str) -> None:
        self.segments.append(path)
        try:
            idx = int(os.path.basename(path)[4:8])
            self._next_seg = max(self._next_seg, idx + 1)
        except ValueError:
            pass
        meta = pq.read_schema(path).metadata or {}
        if b"kettleray.watermark" in meta:
            self.watermark = max(self.watermark,
                                 int(meta[b"kettleray.watermark"]))
            self.applied = max(self.applied,
                               int(meta.get(b"kettleray.applied", b"0")))

    def flush_now(self) -> str | None:
        """Flush the memtable to the next numbered segment (no-op when
        empty). Atomic: staged .tmp + rename."""
        if self.segment_dir is None or not self.state:
            return None
        path = os.path.join(self.segment_dir,
                            f"seg_{self._next_seg:04d}.parquet")
        self._next_seg += 1
        self.flush_segment(path + ".tmp")
        os.rename(path + ".tmp", path)
        self.segments.append(path)
        return path

    def _maybe_flush(self) -> None:
        if self.max_keys is not None and self.segment_dir is not None \
                and len(self.state) >= self.max_keys:
            self.flush_now()

    def compact_segments(self) -> int:
        """Merge all segments + memtable into ONE segment (keeps
        merge-on-read cost flat for long-running ingest — the LSM
        compaction step, run out-of-band like the sink's). Tombstones
        are RETAINED (a compacted segment must still shadow older
        re-deliveries). Returns the number of segments replaced."""
        if self.segment_dir is None or not self.segments:
            return 0
        merged = self.snapshot(include_tombstones=True)
        n_old = len(self.segments)
        path = os.path.join(self.segment_dir,
                            f"seg_{self._next_seg:04d}.parquet")
        self._next_seg += 1
        meta = dict(merged.schema.metadata or {})
        meta[b"kettleray.watermark"] = str(self.watermark).encode()
        meta[b"kettleray.applied"] = str(self.applied).encode()
        pq.write_table(merged.replace_schema_metadata(meta),
                       path + ".tmp")
        os.rename(path + ".tmp", path)
        for p in self.segments:
            os.remove(p)
        self.segments = [path]
        self.state.clear()
        return n_old

    def apply_table(self, t: pa.Table) -> None:
        """Vectorized pre-reduce with cdc.lww_reduce_table (per-batch
        per-key max-seq winner — redelivered duplicates are byte-
        identical per the log contract, so no in-batch commit tiebreak
        is needed) BEFORE touching the dict: the Python loop runs once
        per unique key per batch, not once per event."""
        n = t.num_rows
        if n == 0:
            return
        from kettleray.ops.cdc import lww_reduce_table
        win = lww_reduce_table(t)
        repo = win["repo"].to_pylist()
        path = win["path"].to_pylist()
        seq = win["commit_seq"].to_pylist()
        op = win["op"].to_pylist()
        commit = win["commit"].to_pylist()
        lang = win["lang"].to_pylist()
        content = win["content"].to_pylist()
        st = self.state
        for i in range(win.num_rows):
            k = (repo[i], path[i])
            cur = st.get(k)
            # cross-batch LWW by (seq, commit); null-safe commit compare
            if cur is None or seq[i] > cur[0] or (
                    seq[i] == cur[0]
                    and (commit[i] or "") > (cur[1] or "")):
                st[k] = (seq[i], commit[i], op[i], lang[i], content[i])
        self.applied += n
        self.watermark = max(self.watermark, max(seq))
        self._maybe_flush()

    def snapshot(self, *, include_tombstones: bool = False) -> pa.Table:
        """Current LWW state. With flushed segments, merge-on-read:
        segments + memtable concatenated as event-shaped rows and
        reduced with the same vectorized LWW kernel the batch replay
        uses (cross-segment winners resolved by (seq, commit))."""
        import pyarrow.compute as pc
        mem = self._memtable_table(include_tombstones=True)
        if not self.segments:
            out = mem if include_tombstones else mem.filter(
                pc.not_equal(mem["op"], "delete"))
            return out if include_tombstones else out.drop_columns(["op"])
        from kettleray.ops.cdc import (finalize_state_table,
                                       lww_reduce_table)
        parts = []
        for t in [pq.read_table(p) for p in self.segments] + [mem]:
            if t.num_rows == 0:
                continue
            ops = t["op"] if "op" in t.column_names \
                else pa.array(["insert"] * t.num_rows)
            parts.append(pa.table({
                "repo": t["repo"], "path": t["path"],
                "commit": t["commit"], "lang": t["lang"],
                "content": t["content"], "op": ops,
                "commit_seq": t["last_commit_seq"]}))
        if not parts:
            out = mem if include_tombstones else mem.drop_columns(["op"])
            return out
        merged = lww_reduce_table(pa.concat_tables(parts))
        return finalize_state_table(merged,
                                    keep_tombstones=include_tombstones)

    def _memtable_table(self, *, include_tombstones: bool = False
                        ) -> pa.Table:
        import hashlib
        rows = {"repo": [], "path": [], "commit": [], "lang": [],
                "content": [], "content_sha256": [], "last_commit_seq": []}
        if include_tombstones:
            rows["op"] = []
        for (r, p), (seq, commit, op, lang, content) in self.state.items():
            if op == "delete" and not include_tombstones:
                continue
            rows["repo"].append(r)
            rows["path"].append(p)
            rows["commit"].append(commit)
            rows["lang"].append(lang)
            rows["content"].append(content)
            rows["content_sha256"].append(
                hashlib.sha256(content.encode()).hexdigest())
            rows["last_commit_seq"].append(seq)
            if include_tombstones:
                rows["op"].append(op)
        if rows["repo"]:
            return pa.table(rows)
        empty = {
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
            "content_sha256": pa.array([], pa.string()),
            "last_commit_seq": pa.array([], pa.int64()),
        }
        if include_tombstones:
            empty["op"] = pa.array([], pa.string())
        return pa.table(empty)

    def flush_segment(self, path: str) -> int:
        """LSM flush: persist current state as a Parquet segment and drop
        the in-memory dict (bounds actor heap for hot shards). Watermark
        and applied-count ride along as Parquet key-value metadata so a
        restarted shard restores its full position, not just its rows."""
        snap = self._memtable_table(include_tombstones=True)
        meta = dict(snap.schema.metadata or {})
        meta[b"kettleray.watermark"] = str(self.watermark).encode()
        meta[b"kettleray.applied"] = str(self.applied).encode()
        snap = snap.replace_schema_metadata(meta)
        pq.write_table(snap, path)
        n = len(self.state)
        self.state.clear()
        return n

    def load_segment(self, path: str) -> None:
        t = pq.read_table(path)
        ops = t["op"].to_pylist() if "op" in t.column_names \
            else ["insert"] * t.num_rows
        for i in range(t.num_rows):
            k = (t["repo"][i].as_py(), t["path"][i].as_py())
            self.state[k] = (t["last_commit_seq"][i].as_py(),
                             t["commit"][i].as_py(), ops[i],
                             t["lang"][i].as_py(), t["content"][i].as_py())
        meta = t.schema.metadata or {}
        if b"kettleray.watermark" in meta:
            self.watermark = max(self.watermark,
                                 int(meta[b"kettleray.watermark"]))
            self.applied = int(meta.get(b"kettleray.applied", b"0"))
        elif t.num_rows:
            # legacy segment without metadata: the max applied seq IS the
            # winner of its key (it is that key's latest), so the global
            # max over per-key winners equals the true watermark.
            self.watermark = max(self.watermark,
                                 max(r[0] for r in self.state.values()))


@ray.remote
class StateShardActor:
    """One hash shard of the streaming merge-apply stage."""

    def __init__(self, shard_id: int, spill_dir: str | None = None,
                 max_keys: int | None = None):
        self.shard_id = shard_id
        self.spill_dir = spill_dir
        if spill_dir and max_keys:
            # bounded-memory LSM mode: numbered segments under a per-
            # shard dir; restart re-registers them without loading rows
            self.store = KeyStateStore(
                max_keys=max_keys,
                segment_dir=os.path.join(spill_dir,
                                         f"shard_{shard_id}_segs"))
        else:
            self.store = KeyStateStore()
            if spill_dir:
                os.makedirs(spill_dir, exist_ok=True)
                seg = os.path.join(spill_dir,
                                   f"shard_{shard_id}.parquet")
                if os.path.exists(seg):
                    self.store.load_segment(seg)

    def apply(self, t: pa.Table) -> int:
        self.store.apply_table(t)
        return t.num_rows

    def snapshot(self, include_tombstones: bool = False) -> pa.Table:
        return self.store.snapshot(include_tombstones=include_tombstones)

    def checkpoint(self) -> tuple[int, int]:
        if self.store.segment_dir:           # bounded LSM mode
            self.store.flush_now()
        elif self.spill_dir:
            seg = os.path.join(self.spill_dir,
                               f"shard_{self.shard_id}.parquet")
            self.store.flush_segment(seg + ".tmp")
            os.rename(seg + ".tmp", seg)
            self.store.load_segment(seg)
        return self.shard_id, self.store.watermark

    def compact(self) -> int:
        return self.store.compact_segments()

    def dump_snapshot(self, dir_path: str) -> dict:
        """Write this shard's LWW state as one Parquet file (actor-side —
        snapshot bytes never transit the driver). Returns lineage info
        for the caller's manifest."""
        os.makedirs(dir_path, exist_ok=True)
        t = self.store.snapshot()
        f = os.path.join(dir_path, f"shard-{self.shard_id}.parquet")
        pq.write_table(t, f)
        return {"file": f, "rows": t.num_rows,
                "bytes": os.path.getsize(f),
                "watermark": self.store.watermark}

    def stats(self) -> dict:
        return {"shard": self.shard_id, "keys": len(self.store.state),
                "segments": len(self.store.segments),
                "watermark": self.store.watermark,
                "applied": self.store.applied}


class StreamingIngestor:
    """Micro-batch streaming ingest: P shard actors, events routed by
    hash(repo, path) % P inside a side-effecting map_batches pass (the
    data never flows through the driver)."""

    def __init__(self, num_shards: int = 8, spill_dir: str | None = None,
                 max_keys: int | None = None):
        self.num_shards = num_shards
        self.actors = [StateShardActor.remote(i, spill_dir, max_keys)
                       for i in range(num_shards)]

    def ingest(self, events) -> int:
        actors = self.actors
        P = self.num_shards

        def _route(t: pa.Table) -> pa.Table:
            import numpy as _np
            from kettleray.ops.cdc import stable_key_buckets
            h = stable_key_buckets(t, ("repo", "path"), P)
            futs = []
            for shard in range(P):
                mask = h == shard
                if mask.any():
                    sub = t.take(pa.array(_np.nonzero(mask)[0],
                                          type=pa.int64()))
                    futs.append(actors[shard].apply.remote(sub))
            n = sum(ray.get(futs)) if futs else 0
            return pa.table({"routed": pa.array([n], type=pa.int64())})

        counts = events.map_batches(_route, batch_format="pyarrow",
                                    zero_copy_batch=True).take_all()
        return sum(r["routed"] for r in counts)

    def snapshot(self, *, max_driver_rows: int = 2_000_000) -> pa.Table:
        """Driver-side merged snapshot — a DEBUG / small-state tool: it
        concatenates every shard's full state on the driver, so it is
        bounded by ``max_driver_rows`` (cheap per-shard key counts are
        checked first; no state bytes move on a refusal). The scale path
        is ``commit_to_lake(root)`` + ``sink.read_state(root)`` — shard
        actors write their buckets directly and the result streams as a
        Dataset."""
        keys = sum(s["keys"] for s in self.stats())
        if keys > max_driver_rows:
            raise ValueError(
                f"snapshot() would pull ~{keys} rows onto the driver "
                f"(> max_driver_rows={max_driver_rows}); use "
                f"commit_to_lake(root) + sink.read_state(root) for "
                f"large state, or raise max_driver_rows explicitly")
        return pa.concat_tables(
            ray.get([a.snapshot.remote() for a in self.actors]))

    def snapshot_dataset(self, root: str) -> "object":
        """Lake-backed snapshot: commit the shard state as a bucketed
        sink version (bytes written actor-side, never via the driver)
        and open it as a streaming Dataset — the any-size counterpart
        of ``snapshot()``."""
        from kettleray.io import sink as _sink
        self.commit_to_lake(root)
        return _sink.read_state(root)

    def checkpoint(self) -> dict[int, int]:
        return dict(ray.get([a.checkpoint.remote() for a in self.actors]))

    def compact(self) -> list[int]:
        return ray.get([a.compact.remote() for a in self.actors])

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def commit_to_lake(self, root: str):
        """Streaming → lake handoff: commit the shard actors' current
        state as a version of the bucketed sink layout. Shard routing and
        the sink's bucket function are the SAME crc32 keyspace (bucket ==
        shard), so the committed version is a valid bucketed table —
        read_state / lookup_state / read_changes / apply_incremental_*
        all compose on top. Each shard writes its own bucket file
        (snapshot bytes never transit the driver); the manifest watermark
        is the MIN shard watermark — the safe resume point (re-applied
        events are idempotent under LWW)."""
        import time as _time
        import uuid as _uuid

        from kettleray.io import sink as _sink

        man = _sink.read_manifest(root)
        _sink._check_layout_stable(man, self.num_shards, ("repo", "path"))
        os.makedirs(root, exist_ok=True)
        v = _sink._next_version(root)   # skips crash-orphaned versions
        stage = os.path.join(root,
                             f"_stage_v{v:04d}.{_uuid.uuid4().hex[:8]}")
        os.makedirs(stage)
        t0 = _time.time()
        infos = ray.get([
            a.dump_snapshot.remote(os.path.join(stage, f"bucket={i}"))
            for i, a in enumerate(self.actors)])
        files = [{"file": os.path.relpath(i["file"], stage),
                  "rows": i["rows"], "bytes": i["bytes"]} for i in infos]
        man2 = _sink.Manifest(
            version=v,
            watermark=min(i["watermark"] for i in infos),
            schema=str(pq.read_schema(infos[0]["file"])),
            files=files,
            metrics={"write_sec": round(_time.time() - t0, 3),
                     "mode": "streaming_checkpoint",
                     "num_buckets": self.num_shards,
                     "bucket_cols": ["repo", "path"],
                     "total_rows": sum(f["rows"] for f in files),
                     "shard_watermarks": [i["watermark"] for i in infos]})
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            f.write(man2.to_json())
        try:
            os.rename(stage, _sink._version_dir(root, v))
        except OSError:
            if os.path.isdir(_sink._version_dir(root, v)):
                # a concurrent committer took this slot between our
                # _next_version scan and the rename — the ingestor is a
                # single-writer by contract, so surface it loudly
                # instead of silently interleaving two state lineages
                shutil.rmtree(stage, ignore_errors=True)
                raise RuntimeError(
                    f"commit_to_lake: version v{v:04d} under {root} was "
                    f"committed concurrently; StreamingIngestor assumes "
                    f"a single committer per root — retry the commit "
                    f"(shard state is intact) or use a dedicated root")
            raise
        _sink._write_current(root, v)
        return man2

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)
        self.actors = []
