"""Crash-orphan recovery across every committer (round-4 ADVICE fixes).

The crash mode under test: a writer dies BETWEEN the atomic stage->vN
rename and the CURRENT pointer write. The orphan vN is complete on disk
but invisible to readers. Before the fixes, apply_incremental_* retried
the SAME version number forever (RecursionError, full stage rewrite per
level), catalog committers busy-spun on FileExistsError, and gc never
reaped orphans above CURRENT.
"""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import catalog, sink

CFG = EventGenConfig(n_events=1500, n_repos=6, n_paths_per_repo=25,
                     p_delete=0.1, seed=41)


def _batches(events, n=3):
    step = CFG.n_events // n
    out = []
    for i in range(n):
        lo, hi = i * step, (i + 1) * step if i < n - 1 else CFG.n_events
        out.append(events.filter(pc.and_(
            pc.greater_equal(events["commit_seq"], lo),
            pc.less(events["commit_seq"], hi))))
    return out


def _state_dict(ds):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in ds.take_all()}


def _regress_current(root, v):
    """Simulate the crash: CURRENT points below an existing version."""
    sink.atomic_write_json(os.path.join(root, "CURRENT"), {"version": v})


@pytest.mark.parametrize("apply_fn", [
    sink.apply_incremental_bucketed,
    sink.apply_incremental_scd2,
    sink.apply_incremental_mor,
])
def test_orphan_version_does_not_brick_committer(tmp_path, apply_fn):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    b1, b2, b3 = _batches(events)
    apply_fn(root, ray.data.from_arrow(b1), num_buckets=8,
             num_partitions=2)
    apply_fn(root, ray.data.from_arrow(b2), num_buckets=8,
             num_partitions=2)
    assert sink.current_version(root) == 2
    _regress_current(root, 1)       # v2 is now a crash orphan

    # redelivery of the unacked suffix must commit as v3 (skipping the
    # orphan slot), not recurse on the v2 rename collision forever
    redelivered = pa.concat_tables([b2, b3])
    m = apply_fn(root, ray.data.from_arrow(redelivered), num_buckets=8,
                 num_partitions=2)
    assert m.version == 3
    assert sink.current_version(root) == 3

    if apply_fn is sink.apply_incremental_bucketed or \
            apply_fn is sink.apply_incremental_mor:
        got = _state_dict(sink.read_state(root))
        want = {k: v["content_sha256"]
                for k, v in replay_oracle(events).items()}
        assert got == want


def test_gc_reaps_aged_orphans_above_current(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    b1, b2, _ = _batches(events)
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(b1),
                                    num_buckets=8, num_partitions=2)
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(b2),
                                    num_buckets=8, num_partitions=2)
    _regress_current(root, 1)
    # young orphan: kept (may be a commit mid-flight)
    assert sink.gc_versions(root, keep_last=1,
                            stage_min_age_s=3600.0) == []
    assert os.path.isdir(os.path.join(root, "v0002"))
    # aged orphan: reaped
    deleted = sink.gc_versions(root, keep_last=1, stage_min_age_s=0.0)
    assert 2 in deleted
    assert not os.path.isdir(os.path.join(root, "v0002"))
    # CURRENT version survives
    assert os.path.isdir(os.path.join(root, "v0001"))


def test_commit_state_adoption_repairs_current(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    sink.commit_state(ray.data.from_arrow(events), root, watermark=10)
    os.unlink(os.path.join(root, "CURRENT"))   # crash before pointer
    m = sink.commit_state(ray.data.from_arrow(events), root, watermark=10)
    assert m.version == 1
    assert sink.current_version(root) == 1     # pointer repaired
    assert sink.read_state(root).count() == events.num_rows


def test_lookup_state_empty_bucket_keeps_schema(tmp_path):
    from kettleray.ops.cdc import stable_key_buckets
    root = str(tmp_path / "state")
    events = generate_events_local(
        EventGenConfig(n_events=60, n_repos=2, n_paths_per_repo=3,
                       p_delete=0.0, seed=7))
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(events),
                                    num_buckets=64, num_partitions=2)
    vdir = os.path.join(root, "v0001")
    present = {int(n.split("=", 1)[1]) for n in os.listdir(vdir)
               if n.startswith("bucket=")}
    # find a key routed to a bucket with NO dir (empty-bucket miss)
    probe = None
    for i in range(1000):
        key = ("ghost-repo", f"ghost/path-{i}.txt")
        t = pa.table({"repo": pa.array([key[0]]),
                      "path": pa.array([key[1]])})
        if int(stable_key_buckets(t, ("repo", "path"), 64)[0]) \
                not in present:
            probe = key
            break
    assert probe is not None
    miss = sink.lookup_state(root, *probe)
    hit_key = events.to_pylist()[0]
    hit = sink.lookup_state(root, hit_key["repo"], hit_key["path"])
    assert miss.num_rows == 0
    assert miss.column_names == hit.column_names   # same typed schema
    assert miss.schema == hit.schema


def test_catalog_orphan_snapshot_rolls_forward(tmp_path):
    croot = str(tmp_path / "cat")
    n1 = catalog.commit_snapshot(croot, {"t1": ("/x/t1", 3)})
    assert n1 == 1
    # simulate a winner that linked snap_00002 but died before CURRENT
    # a real orphan merges its parent's pins (commit_snapshot semantics)
    orphan = {"snapshot": 2, "parent": 1,
              "tables": {"t1": {"root": "/x/t1", "version": 3},
                         "t2": {"root": "/x/t2", "version": 9}},
              "note": "orphan", "ts": 0.0}
    with open(os.path.join(croot, "snap_00002.json"), "w") as f:
        json.dump(orphan, f)
    assert catalog.current_snapshot_id(croot) == 1
    # next committer must rebase ON the orphan (snap 3), not spin at 2
    n3 = catalog.commit_snapshot(croot, {"t3": ("/x/t3", 1)})
    assert n3 == 3
    assert catalog.current_snapshot_id(croot) == 3
    tabs = catalog.read_snapshot(croot)["tables"]
    assert set(tabs) == {"t1", "t2", "t3"}     # orphan pins carried


def test_catalog_current_never_regresses(tmp_path):
    croot = str(tmp_path / "cat")
    for i in range(3):
        catalog.commit_snapshot(croot, {"t": ("/x/t", i)})
    assert catalog.current_snapshot_id(croot) == 3
    # a stale writer rewrites CURRENT backwards; _advance_current must
    # converge back to the on-disk max
    sink.atomic_write_json(os.path.join(croot, "CURRENT"),
                           {"snapshot": 1})
    assert catalog._advance_current(croot) == 3
    assert catalog.current_snapshot_id(croot) == 3


def test_streaming_snapshot_guard_and_lake_path(tmp_path):
    from kettleray.state.store import StreamingIngestor
    events = generate_events_local(CFG)
    ing = StreamingIngestor(num_shards=4,
                            spill_dir=str(tmp_path / "spill"))
    try:
        ing.ingest(ray.data.from_arrow(events))
        with pytest.raises(ValueError, match="commit_to_lake"):
            ing.snapshot(max_driver_rows=1)
        root = str(tmp_path / "lake")
        ds = ing.snapshot_dataset(root)
        got = _state_dict(ds)
        want = {k: v["content_sha256"]
                for k, v in replay_oracle(events).items()}
        assert got == want
        # commit_to_lake over a crash orphan: next slot, no bare OSError
        os.unlink(os.path.join(root, "CURRENT"))
        m = ing.commit_to_lake(root)
        assert m.version == 2
        assert sink.current_version(root) == 2
    finally:
        ing.shutdown()
