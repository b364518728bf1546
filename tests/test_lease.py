"""Writer-lease fencing: a superseded (zombie) writer can stage but
never PUBLISH; handover is monotone and crash-orphans stay reapable."""

import os
import threading

import pyarrow as pa
import pytest
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import lease, sink

CFG = EventGenConfig(n_events=600, n_repos=5, n_paths_per_repo=12,
                     p_delete=0.05, seed=44)


def _halves():
    ev = generate_events_local(CFG)
    half = CFG.n_events // 2
    b1 = ev.filter(pa.compute.less(ev["commit_seq"], half))
    b2 = ev.filter(pa.compute.greater_equal(ev["commit_seq"], half))
    return b1, b2


def _apply(root, tbl):
    return sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(tbl), num_buckets=8, num_partitions=2)


def test_fenced_writer_cannot_publish(tmp_path):
    root = str(tmp_path / "state")
    b1, b2 = _halves()
    a = lease.acquire_lease(root, "driver-a")
    m1 = _apply(root, b1)
    assert m1.version == 1

    # a replacement driver takes over (e.g. another node); simulate by
    # acquiring under a different id, then putting driver-a's lease
    # back as THIS process's guard — exactly a zombie's view.
    lease.acquire_lease(root, "driver-b")
    a.activate()
    with pytest.raises(lease.FencedWriterError):
        _apply(root, b2)
    # nothing published: CURRENT still names driver-a's last commit
    assert sink.current_version(root) == 1
    lease.release_lease(a)


def test_handover_resumes_and_orphan_is_skipped_then_reaped(tmp_path):
    root = str(tmp_path / "state")
    b1, b2 = _halves()
    a = lease.acquire_lease(root, "driver-a")
    _apply(root, b1)
    b = lease.acquire_lease(root, "driver-b")
    a.activate()
    with pytest.raises(lease.FencedWriterError):
        _apply(root, b2)           # zombie stages v2 but cannot publish
    orphan = os.path.join(root, "v0002")
    assert os.path.isdir(orphan)   # staged rename landed...
    assert sink.current_version(root) == 1  # ...but was never published

    # the new holder's commit skips the orphan slot and lands at v3
    b.activate()
    m = _apply(root, b2)
    assert m.version == 3
    assert sink.current_version(root) == 3

    # state equals a clean single-writer replay (the zombie's staged
    # work held the same b2 suffix; exactly-once is preserved)
    want_root = str(tmp_path / "clean")
    _apply(want_root, pa.concat_tables([b1, b2]))
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in sink.read_state(root).take_all()}
    want = {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(want_root).take_all()}
    assert got == want

    # gc reaps the unpublished orphan (now just an old version below
    # CURRENT, expired by keep_last like any other)
    sink.gc_versions(root, keep_last=1, stage_min_age_s=0.0)
    assert not os.path.isdir(orphan)
    lease.release_lease(b)


def test_acquire_cas_assigns_distinct_epochs(tmp_path):
    root = str(tmp_path / "state")
    got = []
    lk = threading.Lock()

    def grab(i):
        le = lease.acquire_lease(root, f"w{i}")
        with lk:
            got.append(le.epoch)

    ts = [threading.Thread(target=grab, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert sorted(got) == list(range(1, 9))      # no epoch lost or reused
    assert lease.current_epoch(root) == 8
    lease.release_lease(lease._ACTIVE[os.path.abspath(root)])


def test_unleased_root_commits_unguarded(tmp_path):
    root = str(tmp_path / "state")
    b1, _ = _halves()
    m = _apply(root, b1)            # no lease ever taken: opt-in
    assert m.version == 1


def test_torn_claim_file_still_fences(tmp_path):
    root = str(tmp_path / "state")
    a = lease.acquire_lease(root, "driver-a")
    # a half-written claim from a crashed acquirer at a higher epoch
    # must still fence (epoch number comes from the filename)
    p = lease._epoch_path(root, a.epoch + 1)
    with open(p, "w") as f:
        f.write("{not json")
    with pytest.raises(lease.FencedWriterError):
        a.check()
    lease.release_lease(a)


def test_release_does_not_unfence(tmp_path):
    root = str(tmp_path / "state")
    a = lease.acquire_lease(root, "driver-a")
    lease.release_lease(a)
    assert lease.current_epoch(root) == 1
    # a later acquirer still gets a HIGHER epoch (release left the
    # claim inert, not removed)
    b = lease.acquire_lease(root, "driver-b")
    assert b.epoch == 2
    lease.release_lease(b)
