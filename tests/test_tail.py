"""WAL-directory tailer: discover → micro-batch apply → durable ack."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from kettleray import tail
from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=2000, n_repos=6, n_paths_per_repo=30,
                     p_delete=0.1, seed=23)


def _write_segments(events: pa.Table, wal: str, n: int,
                    start: int = 0) -> list[str]:
    os.makedirs(wal, exist_ok=True)
    base = pc.min(events["commit_seq"]).as_py()
    span = pc.max(events["commit_seq"]).as_py() - base + 1
    names = []
    for i in range(n):
        lo, hi = base + span * i // n, base + span * (i + 1) // n
        seg = events.filter(
            pc.and_(pc.greater_equal(events["commit_seq"], lo),
                    pc.less(events["commit_seq"], hi)))
        name = f"seg-{start + i:05d}.parquet"
        pq.write_table(seg, os.path.join(wal, name))
        names.append(name)
    return names


def _state_dict(ds):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in ds.take_all()}


def test_tail_consumes_all_segments_and_matches_oracle(tmp_path):
    wal, root = str(tmp_path / "wal"), str(tmp_path / "state")
    events = generate_events_local(CFG)
    _write_segments(events, wal, 4)

    r = tail.tail_once(wal, root, layout="mor", num_buckets=8,
                       num_partitions=4)
    assert len(r.segments) == 4 and len(r.manifests) == 1
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert _state_dict(sink.read_state(root)) == want
    assert tail.consumed_segments(root) == set(r.segments)

    # nothing pending -> nothing applied, no new version
    r2 = tail.tail_once(wal, root, layout="mor", num_buckets=8,
                        num_partitions=4)
    assert r2.segments == [] and sink.current_version(root) == r.versions[-1]


def test_micro_batching_one_commit_per_segment(tmp_path):
    wal, root = str(tmp_path / "wal"), str(tmp_path / "state")
    events = generate_events_local(CFG)
    _write_segments(events, wal, 3)
    r = tail.tail_once(wal, root, layout="cow", num_buckets=8,
                       num_partitions=4, max_segments_per_batch=1)
    assert len(r.manifests) == 3
    assert r.versions == sorted(r.versions)
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert _state_dict(sink.read_state(root)) == want


def test_crash_between_commit_and_ack_is_exactly_once(tmp_path):
    wal, root = str(tmp_path / "wal"), str(tmp_path / "state")
    events = generate_events_local(CFG)
    _write_segments(events, wal, 2)
    r = tail.tail_once(wal, root, layout="mor", num_buckets=8,
                       num_partitions=4)
    before = _state_dict(sink.read_state(root))
    v_before = sink.current_version(root)

    # simulate the crash window: commit landed, ack lost
    os.remove(os.path.join(root, "wal_cursor.json"))
    r2 = tail.tail_once(wal, root, layout="mor", num_buckets=8,
                        num_partitions=4)
    assert set(r2.segments) == set(r.segments)   # redelivered
    # watermark filter made the re-apply a no-op: same state, no version
    assert sink.current_version(root) == v_before
    assert _state_dict(sink.read_state(root)) == before
    assert tail.consumed_segments(root) == set(r.segments)


def test_late_segments_consumed_on_next_poll(tmp_path):
    wal, root = str(tmp_path / "wal"), str(tmp_path / "state")
    events = generate_events_local(CFG)
    half = CFG.n_events // 2
    early = events.filter(pc.less(events["commit_seq"], half))
    late = events.filter(pc.greater_equal(events["commit_seq"], half))
    _write_segments(early, wal, 2)
    tail.tail_once(wal, root, layout="mor", num_buckets=8,
                   num_partitions=4)
    _write_segments(late, wal, 2, start=2)
    r = tail.tail_until_idle(wal, root, layout="mor", num_buckets=8,
                             num_partitions=4, poll_s=0.01, idle_rounds=2)
    assert len(r.segments) == 2
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert _state_dict(sink.read_state(root)) == want


def test_envelope_segments(tmp_path):
    from kettleray.io.source import write_cdc_envelope
    wal, root = str(tmp_path / "wal"), str(tmp_path / "state")
    events = generate_events_local(CFG)
    write_cdc_envelope(ray.data.from_arrow(events), wal)
    r = tail.tail_once(wal, root, layout="flat", fmt="envelope",
                       num_partitions=4)
    assert r.segments
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert _state_dict(sink.read_state(root)) == want


def test_compact_cursor_bounds_the_ack_file(tmp_path):
    root = str(tmp_path / "state")
    os.makedirs(root)
    tail._ack(root, [f"seg-{i:05d}.parquet" for i in range(50)])
    folded = tail.compact_cursor(root, keep=10)
    assert folded == 40
    cur = tail.consumed_segments(root)
    assert len(cur) == 10 and "seg-00049.parquet" in cur
    # folded names are remembered as a count, not re-discoverable names
    import json
    with open(os.path.join(root, "wal_cursor.json")) as f:
        assert json.load(f)["folded_count"] == 40
