"""Cross-lake replication: feed-driven mirror, lag probe, parity
audit, crash-safe re-sync, failover fencing."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import lease, sink
from kettleray.ops import replicate

CFG = EventGenConfig(n_events=2400, n_repos=8, n_paths_per_repo=25,
                     p_delete=0.10, seed=45)


def _thirds():
    ev = generate_events_local(CFG)
    n = CFG.n_events
    cuts = [0, n // 3, 2 * n // 3, n]
    return ev, [ev.filter(pc.and_(
        pc.greater_equal(ev["commit_seq"], cuts[i]),
        pc.less(ev["commit_seq"], cuts[i + 1]))) for i in range(3)]


def _apply(root, tbl, nb=8):
    return sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(tbl), num_buckets=nb, num_partitions=2)


def _state(root):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root).take_all()}


def test_replica_tracks_source_across_commits(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    applied = []
    for b in batches:
        _apply(src, b)
        applied.append(b)
        replicate.replicate_sink(src, dst, num_partitions=2)
        # replica state == oracle replay of everything applied so far
        want = {k: v["content_sha256"] for k, v in
                replay_oracle(pa.concat_tables(applied)).items()}
        assert _state(dst) == want
    lag = replicate.replication_lag(src, dst)
    assert lag["in_sync"] and lag["versions_behind"] == 0
    assert lag["src_version"] == 3 and lag["applied_src_version"] == 3


def test_mor_replica_tracks_source(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    applied = []
    for b in batches:
        _apply(src, b)
        applied.append(b)
        replicate.replicate_sink(src, dst, mode="mor", num_partitions=2)
    want = {k: v["content_sha256"] for k, v in
            replay_oracle(pa.concat_tables(applied)).items()}
    assert _state(dst) == want
    # the replica is genuinely merge-on-read: later versions carry
    # delta dirs, and compaction folds them without changing state
    vdir = os.path.join(dst, f"v{sink.current_version(dst):04d}")
    assert os.path.isdir(os.path.join(vdir, "delta"))
    rep = replicate.verify_replica(src, dst, num_partitions=2)
    assert rep["missing"] == rep["extra"] == rep["mismatched"] == 0
    sink.compact_mor(dst, num_partitions=2)
    assert _state(dst) == want


def test_lag_probe_and_catchup(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    _apply(src, batches[0])
    replicate.replicate_sink(src, dst, num_partitions=2)
    _apply(src, batches[1])
    _apply(src, batches[2])
    lag = replicate.replication_lag(src, dst)
    assert lag["versions_behind"] == 2 and not lag["in_sync"]
    assert lag["src_watermark"] > lag["dst_watermark"]
    replicate.replicate_sink(src, dst, num_partitions=2)
    assert replicate.replication_lag(src, dst)["in_sync"]


def test_verify_replica_detects_divergence(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    _apply(src, pa.concat_tables(batches))
    replicate.replicate_sink(src, dst, num_partitions=2)
    rep = replicate.verify_replica(src, dst, num_partitions=2)
    assert rep["src_rows"] == rep["dst_rows"] > 0
    assert rep["missing"] == rep["extra"] == rep["mismatched"] == 0

    # poison the replica: delete one key, corrupt another via a direct
    # out-of-band commit (bypassing replication)
    rows = sink.read_state(dst).take_all()
    k_del, k_mut = rows[0], rows[1]
    wm = sink.read_manifest(dst).watermark
    poison = pa.table({
        "repo": [k_del["repo"], k_mut["repo"]],
        "path": [k_del["path"], k_mut["path"]],
        "commit": ["zzz", "zzz"],
        "lang": ["en", "en"],
        "content": [None, "CORRUPTED"],
        "op": ["delete", "update"],
        "commit_seq": [wm + 1, wm + 2]})
    _apply(dst, poison)
    rep = replicate.verify_replica(src, dst, num_partitions=2)
    assert rep["missing"] == 1          # deleted key absent in replica
    assert rep["mismatched"] == 1       # corrupted key content differs
    assert rep["extra"] == 0


def test_resync_is_idempotent_when_caught_up(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    _apply(src, batches[0])
    m1 = replicate.replicate_sink(src, dst, num_partitions=2)
    m2 = replicate.replicate_sink(src, dst, num_partitions=2)
    assert m2.version == m1.version     # caught up: no new commit


def test_failover_fences_both_sides(tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    ev, batches = _thirds()
    old_primary = lease.acquire_lease(src, "primary-a")
    _apply(src, batches[0])
    replicate.replicate_sink(src, dst, num_partitions=2)

    info = replicate.failover(src, dst, writer_id="primary-b")
    assert info["resume_watermark"] == sink.read_manifest(dst).watermark

    # the old primary is a zombie now: its next publish on src raises
    old_primary.activate()
    with pytest.raises(lease.FencedWriterError):
        _apply(src, batches[1])
    for le in list(lease._ACTIVE.values()):
        lease.release_lease(le)

    # new ingest continues on the promoted replica from the watermark
    nb = int(sink.read_manifest(dst).metrics["num_buckets"])
    _apply(dst, batches[1], nb=nb)
    _apply(dst, batches[2], nb=nb)
    want = {k: v["content_sha256"] for k, v in
            replay_oracle(pa.concat_tables(batches)).items()}
    assert _state(dst) == want
