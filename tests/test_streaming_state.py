"""Streaming micro-batch ingest via shard actors vs batch replay."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.state.store import StreamingIngestor

CFG = EventGenConfig(n_events=2000, n_repos=6, n_paths_per_repo=30,
                     p_delete=0.1, seed=21)


def test_streaming_ingest_matches_oracle(tmp_path):
    events = generate_events_local(CFG)
    ing = StreamingIngestor(num_shards=4, spill_dir=str(tmp_path / "spill"))
    try:
        third = CFG.n_events // 3
        for lo, hi in ((0, third), (third, 2 * third),
                       (2 * third, CFG.n_events)):
            mb = events.filter(pc.and_(
                pc.greater_equal(events["commit_seq"], lo),
                pc.less(events["commit_seq"], hi)))
            ing.ingest(ray.data.from_arrow(mb))
        snap = ing.snapshot()
        got = {(r["repo"], r["path"]): r for r in snap.to_pylist()}
        want = replay_oracle(events)
        assert set(got) == set(want)
        for k in want:
            assert got[k]["content_sha256"] == want[k]["content_sha256"]
            assert got[k]["last_commit_seq"] == want[k]["last_commit_seq"]
        wm = ing.checkpoint()
        assert max(wm.values()) == CFG.n_events - 1
    finally:
        ing.shutdown()


def test_streaming_ingest_resumes_from_checkpoint(tmp_path):
    events = generate_events_local(CFG)
    spill = str(tmp_path / "spill")
    half = CFG.n_events // 2
    ing = StreamingIngestor(num_shards=3, spill_dir=spill)
    try:
        b1 = events.filter(pc.less(events["commit_seq"], half))
        ing.ingest(ray.data.from_arrow(b1))
        ing.checkpoint()
    finally:
        ing.shutdown()
    # new ingestor resumes from the spilled segments
    ing2 = StreamingIngestor(num_shards=3, spill_dir=spill)
    try:
        b2 = events.filter(pc.greater_equal(events["commit_seq"], half))
        ing2.ingest(ray.data.from_arrow(b2))
        got = {(r["repo"], r["path"]): r["content_sha256"]
               for r in ing2.snapshot().to_pylist()}
        want = {k: v["content_sha256"]
                for k, v in replay_oracle(events).items()}
        assert got == want
    finally:
        ing2.shutdown()


def test_restored_shard_reports_watermark(tmp_path):
    """A shard restarted from a spill segment must restore its committed
    watermark (not report -1 and trigger full re-ingest upstream)."""
    events = generate_events_local(CFG)
    spill = str(tmp_path / "spill_wm")
    ing = StreamingIngestor(num_shards=2, spill_dir=spill)
    try:
        ing.ingest(ray.data.from_arrow(events))
        wm = ing.checkpoint()
    finally:
        ing.shutdown()
    ing2 = StreamingIngestor(num_shards=2, spill_dir=spill)
    try:
        stats = ing2.stats()
        assert {s["shard"]: s["watermark"] for s in stats} == wm
        assert all(s["watermark"] >= 0 for s in stats)
    finally:
        ing2.shutdown()


def test_bounded_memory_lsm_mode_matches_oracle(tmp_path):
    """max_keys bounds each shard's memtable: overflow flushes to
    numbered Parquet segments, snapshot() LWW-merges segments +
    memtable, restart re-registers segments WITHOUT loading rows."""
    events = generate_events_local(CFG)
    spill = str(tmp_path / "spill_lsm")
    ing = StreamingIngestor(num_shards=3, spill_dir=spill, max_keys=20)
    try:
        third = CFG.n_events // 3
        for lo, hi in ((0, third), (third, 2 * third),
                       (2 * third, CFG.n_events)):
            mb = events.filter(pc.and_(
                pc.greater_equal(events["commit_seq"], lo),
                pc.less(events["commit_seq"], hi)))
            ing.ingest(ray.data.from_arrow(mb))
        stats = ing.stats()
        assert all(s["keys"] < 20 + 20 for s in stats)  # bounded
        assert any(s["segments"] > 0 for s in stats)    # actually spilled
        got = {(r["repo"], r["path"]): r["content_sha256"]
               for r in ing.snapshot().to_pylist()}
        want = {k: v["content_sha256"]
                for k, v in replay_oracle(events).items()}
        assert got == want
        ing.checkpoint()
    finally:
        ing.shutdown()
    # restart: segments re-registered, memtables empty, state intact
    ing2 = StreamingIngestor(num_shards=3, spill_dir=spill, max_keys=20)
    try:
        stats2 = ing2.stats()
        assert all(s["keys"] == 0 for s in stats2)
        assert max(s["watermark"] for s in stats2) == CFG.n_events - 1
        got2 = {(r["repo"], r["path"]): r["content_sha256"]
                for r in ing2.snapshot().to_pylist()}
        assert got2 == want
        # compaction: segments merge to one per shard, state unchanged
        ing2.compact()
        stats3 = ing2.stats()
        assert all(s["segments"] <= 1 for s in stats3)
        got3 = {(r["repo"], r["path"]): r["content_sha256"]
                for r in ing2.snapshot().to_pylist()}
        assert got3 == want
    finally:
        ing2.shutdown()


def test_streaming_commit_to_lake_composes_with_sink(tmp_path):
    """Streaming → lake handoff: shard snapshots land as a valid
    bucketed sink version (bucket == shard, same crc32 keyspace), so
    read_state / lookup_state / read_changes / incremental commits all
    compose on top."""
    from kettleray.io import sink
    events = generate_events_local(CFG)
    root = str(tmp_path / "lake")
    half = CFG.n_events // 2
    ing = StreamingIngestor(num_shards=4)
    try:
        ing.ingest(ray.data.from_arrow(events.filter(
            pc.less(events["commit_seq"], half))))
        m1 = ing.commit_to_lake(root)
        assert m1.version == 1
        assert m1.metrics["mode"] == "streaming_checkpoint"
        w1 = replay_oracle(events.filter(pc.less(events["commit_seq"],
                                                 half)))
        got1 = {(r["repo"], r["path"]): r["content_sha256"]
                for r in sink.read_state(root).take_all()}
        assert got1 == {k: v["content_sha256"] for k, v in w1.items()}

        ing.ingest(ray.data.from_arrow(events.filter(
            pc.greater_equal(events["commit_seq"], half))))
        m2 = ing.commit_to_lake(root)
        assert m2.version == 2
        # manifest watermark = MIN shard watermark (safe resume point);
        # the max shard saw the last event
        assert m2.watermark == min(m2.metrics["shard_watermarks"])
        assert max(m2.metrics["shard_watermarks"]) == CFG.n_events - 1
    finally:
        ing.shutdown()

    want = replay_oracle(events)
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in sink.read_state(root).take_all()}
    assert got == {k: v["content_sha256"] for k, v in want.items()}

    # point lookup routes by the same keyspace
    k = sorted(want)[0]
    hit = sink.lookup_state(root, *k)
    assert hit.num_rows == 1
    assert hit.column("content_sha256")[0].as_py() == \
        want[k]["content_sha256"]

    # change feed across the two streaming checkpoints
    from kettleray.gen.oracle import diff_oracle
    old_rows = pa.Table.from_pylist(list(w1.values()))
    new_rows = pa.Table.from_pylist(list(want.values()))
    expect = {k: v for k, v in diff_oracle(old_rows, new_rows).items()
              if v != "identical"}
    got_ch = {(r["repo"], r["path"]): r["change_type"]
              for r in sink.read_changes(root, 1, 2).take_all()}
    assert got_ch == expect

    # incremental sink commits continue on top (same layout)
    tomb = pa.table({
        "repo": [k[0]], "path": [k[1]], "commit": ["cz"], "lang": ["py"],
        "content": [""], "op": ["delete"],
        "commit_seq": pa.array([CFG.n_events + 5], type=pa.int64())})
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(tomb),
                                    num_buckets=4, num_partitions=2)
    assert sink.lookup_state(root, *k).num_rows == 0
