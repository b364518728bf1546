"""Exactly-once sink: staged commits, manifests, incremental apply, resume."""

import os

import pyarrow as pa
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink
from kettleray.ops import cdc

CFG = EventGenConfig(n_events=3000, n_repos=8, n_paths_per_repo=40,
                     p_delete=0.1, seed=11)


def _state_dict(ds):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in ds.take_all()}


def test_incremental_apply_equals_full_replay(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    half = CFG.n_events // 2
    b1 = events.filter(pa.compute.less(events["commit_seq"], half))
    b2 = events.filter(pa.compute.greater_equal(events["commit_seq"], half))

    m1 = sink.apply_incremental(root, ray.data.from_arrow(b1),
                                num_partitions=4)
    assert m1.version == 1 and m1.watermark == half - 1
    m2 = sink.apply_incremental(root, ray.data.from_arrow(b2),
                                num_partitions=4)
    assert m2.version == 2 and m2.watermark == CFG.n_events - 1

    got = _state_dict(sink.read_state(root))
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert got == want


def test_reapply_below_watermark_is_noop(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    sink.apply_incremental(root, ray.data.from_arrow(events),
                           num_partitions=4)
    before = _state_dict(sink.read_state(root))
    # redeliver the whole log — watermark filter must make it a no-op
    m = sink.apply_incremental(root, ray.data.from_arrow(events),
                               num_partitions=4)
    assert m.version == 1                    # no new version committed
    assert _state_dict(sink.read_state(root)) == before


def test_crashed_stage_dir_is_invisible_and_gc_cleaned(tmp_path):
    """A crashed writer's stage (stages are writer-unique, so a live
    commit never touches it) must not affect commits or reads, and
    gc_versions removes it once old enough."""
    root = str(tmp_path / "state")
    crash = os.path.join(root, "_stage_v0001.deadbeef")
    os.makedirs(crash)
    with open(os.path.join(crash, "junk.parquet"), "w") as f:
        f.write("partial garbage")
    events = generate_events_local(CFG)
    m = sink.apply_incremental(root, ray.data.from_arrow(events),
                               num_partitions=4)
    assert m.version == 1
    assert os.path.exists(crash)          # untouched by the live commit
    want = {k: v["content_sha256"] for k, v in replay_oracle(events).items()}
    assert _state_dict(sink.read_state(root)) == want
    sink.gc_versions(root, keep_last=2, stage_min_age_s=0.0)
    assert not os.path.exists(crash)


def test_manifest_lineage_totals(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    m = sink.apply_incremental(root, ray.data.from_arrow(events),
                               num_partitions=4)
    assert m.metrics["total_rows"] == sum(f["rows"] for f in m.files)
    assert m.metrics["total_rows"] == sink.read_state(root).count()
    assert "schema" in m.__dict__ and "content_sha256" in m.schema


def test_commit_state_rename_race_discards_stage(tmp_path, monkeypatch):
    """Two writers computing the same next version: the loser's rename
    fails (target exists) and it must discard its stage and return the
    WINNER's manifest instead of raising."""
    import os
    import pyarrow as pa
    import ray.data
    from kettleray.io import sink
    root = str(tmp_path / "race")
    t = pa.table({"repo": ["r"], "path": ["p"], "commit": ["c"],
                  "lang": ["py"], "content": ["x"],
                  "content_sha256": ["s"],
                  "last_commit_seq": pa.array([1], pa.int64())})
    real_rename = os.rename
    state = {"fired": False}

    def racing_rename(src, dst):
        # first version-dir rename: simulate the concurrent winner
        # landing v0001 right before our rename
        if dst.endswith("v0001") and not state["fired"]:
            state["fired"] = True
            winner_stage = dst + ".winner"
            os.makedirs(winner_stage, exist_ok=True)
            with open(os.path.join(winner_stage, "manifest.json"),
                      "w") as f:
                f.write(sink.Manifest(version=1, watermark=7, schema="",
                                      files=[], metrics={}).to_json())
            real_rename(winner_stage, dst)
            return real_rename(src, dst)     # raises ENOTEMPTY
        return real_rename(src, dst)

    monkeypatch.setattr(sink.os, "rename", racing_rename)
    man = sink.commit_state(ray.data.from_arrow(t), root, watermark=99)
    assert man.version == 1 and man.watermark == 7   # the winner's
    assert not any(n.startswith("_stage_") for n in os.listdir(root))
