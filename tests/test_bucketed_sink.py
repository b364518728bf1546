"""Bucketed copy-on-write state: only touched buckets rewritten,
untouched bucket files hardlinked across versions."""

import os

import pyarrow as pa
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=3000, n_repos=10, n_paths_per_repo=40,
                     p_delete=0.08, seed=31)


def _state(root):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root).take_all()}


def test_bucketed_incremental_correct_and_links(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    half = CFG.n_events // 2
    b1 = events.filter(pa.compute.less(events["commit_seq"], half))
    m1 = sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(b1), num_buckets=16, num_partitions=4)
    assert m1.version == 1 and m1.watermark == half - 1

    # second batch touching only ONE key
    one = events.filter(pa.compute.greater_equal(events["commit_seq"],
                                                 half)).slice(0, 1)
    m2 = sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(one), num_buckets=16, num_partitions=4)
    assert m2.version == 2
    assert m2.metrics["touched_buckets"] == 1

    # untouched bucket files must be hardlinks (nlink >= 2)
    v2 = os.path.join(root, "v0002")
    linked = rewritten = 0
    for name in os.listdir(v2):
        if not name.startswith("bucket="):
            continue
        for f in os.listdir(os.path.join(v2, name)):
            if os.stat(os.path.join(v2, name, f)).st_nlink >= 2:
                linked += 1
            else:
                rewritten += 1
    assert linked > 0 and rewritten >= 1

    # final state must equal a full oracle replay of b1 + that one event
    applied = pa.concat_tables([b1, one])
    want = {k: v["content_sha256"]
            for k, v in replay_oracle(applied).items()}
    assert _state(root) == want


def test_bucketed_rerun_is_noop(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(events),
                                    num_buckets=8, num_partitions=4)
    before = _state(root)
    m = sink.apply_incremental_bucketed(root, ray.data.from_arrow(events),
                                        num_buckets=8, num_partitions=4)
    assert m.version == 1           # watermark filter made it a no-op
    assert _state(root) == before


def test_compaction_merges_fragmented_buckets(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    # several small commits to fragment buckets
    step = CFG.n_events // 3
    for i in range(3):
        b = events.filter(pa.compute.and_(
            pa.compute.greater_equal(events["commit_seq"], i * step),
            pa.compute.less(events["commit_seq"], (i + 1) * step)))
        sink.apply_incremental_bucketed(root, ray.data.from_arrow(b),
                                        num_buckets=4, num_partitions=8)
    before = _state(root)
    m = sink.compact_state(root, max_files_per_bucket=1)
    assert m.metrics["compacted_buckets"] >= 1
    assert _state(root) == before          # compaction preserves state
    # compacted buckets now hold a single file
    vdir = os.path.join(root, f"v{m.version:04d}")
    for name in os.listdir(vdir):
        if name.startswith("bucket="):
            files = [f for f in os.listdir(os.path.join(vdir, name))
                     if f.endswith(".parquet")]
            assert len(files) == 1


def test_bucketed_first_commit_empty_batch(tmp_path):
    """First-ever commit whose batch is empty must not crash (commits an
    empty v0001 instead of TypeError on max(None))."""
    root = str(tmp_path / "state_empty")
    empty = ray.data.from_arrow(pa.table({
        "repo": pa.array([], pa.string()),
        "path": pa.array([], pa.string()),
        "commit": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "content": pa.array([], pa.string()),
        "op": pa.array([], pa.string()),
        "commit_seq": pa.array([], pa.int64()),
    }))
    man = sink.apply_incremental_bucketed(root, empty, num_buckets=4)
    assert man.version == 1
    assert man.watermark == -1
    state = sink.read_state(root)
    assert state.count() == 0
    assert set(state.schema().names) >= {"repo", "path", "content",
                                         "content_sha256",
                                         "last_commit_seq"}


def test_gc_versions_keeps_current_and_hardlinked_files(tmp_path):
    root = str(tmp_path / "state_gc")
    cfg = EventGenConfig(n_events=3000, n_repos=10, n_paths_per_repo=50,
                         p_delete=0.05, seed=9)
    ev = generate_events_local(cfg)
    # three commits -> v1, v2, v3
    for lo, hi in ((0, 1000), (1000, 2000), (2000, 3000)):
        mb = ev.filter(pa.compute.and_(
            pa.compute.greater_equal(ev["commit_seq"], lo),
            pa.compute.less(ev["commit_seq"], hi)))
        sink.apply_incremental_bucketed(root, ray.data.from_arrow(mb),
                                        num_buckets=8, num_partitions=4)
    assert sink.current_version(root) == 3
    before = {(r["repo"], r["path"]): r["content_sha256"]
              for r in sink.read_state(root).take_all()}
    deleted = sink.gc_versions(root, keep_last=1)
    assert deleted == [1, 2]
    # current state fully readable after GC (hardlink survival)
    after = {(r["repo"], r["path"]): r["content_sha256"]
             for r in sink.read_state(root).take_all()}
    assert after == before
    assert not os.path.isdir(os.path.join(root, "v0001"))


def test_compaction_many_fragments_streaming(tmp_path):
    """Many small commits -> many fragments per bucket; the streaming
    row-group merge must preserve exact state and multi-row-group files
    (peak memory = one row group, never the whole bucket)."""
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    step = CFG.n_events // 10
    for i in range(10):
        b = events.filter(pa.compute.and_(
            pa.compute.greater_equal(events["commit_seq"], i * step),
            pa.compute.less(events["commit_seq"],
                            (i + 1) * step if i < 9 else CFG.n_events)))
        sink.apply_incremental_bucketed(root, ray.data.from_arrow(b),
                                        num_buckets=2, num_partitions=4)
    before = _state(root)
    m = sink.compact_state(root, max_files_per_bucket=1)
    assert m.metrics["compacted_buckets"] == 2
    assert _state(root) == before
    vdir = os.path.join(root, f"v{m.version:04d}")
    n_files = sum(
        1 for name in os.listdir(vdir) if name.startswith("bucket=")
        for f in os.listdir(os.path.join(vdir, name))
        if f.endswith(".parquet"))
    assert n_files == 2


def test_crashed_stage_dir_is_invisible_and_recoverable(tmp_path):
    """Exactly-once under a simulated crash: a writer that died after
    staging (before the atomic rename) must leave committed state
    untouched, not block the next commit, and be GC-able."""
    import time as _time
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    half = CFG.n_events // 2
    b1 = events.filter(pa.compute.less(events["commit_seq"], half))
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(b1),
                                    num_buckets=8, num_partitions=4)
    before = _state(root)
    v = sink.current_version(root)
    # simulate a crashed writer: stale stage dir with partial junk
    crash = os.path.join(root, f"_stage_v{v + 1:04d}")
    os.makedirs(os.path.join(crash, "bucket=00000"))
    with open(os.path.join(crash, "bucket=00000", "part-0.parquet"),
              "wb") as f:
        f.write(b"not a real parquet file")
    # committed state unaffected by the stale stage
    assert sink.current_version(root) == v
    assert _state(root) == before
    # the next commit proceeds (reuses/overwrites the stage path)
    b2 = events.filter(pa.compute.greater_equal(events["commit_seq"], half))
    m2 = sink.apply_incremental_bucketed(root, ray.data.from_arrow(b2),
                                         num_buckets=8, num_partitions=4)
    assert m2.version == v + 1
    full = sink.apply_incremental_bucketed(
        str(tmp_path / "ref"), ray.data.from_arrow(events),
        num_buckets=8, num_partitions=4)
    assert _state(root) == _state(str(tmp_path / "ref"))
    # any stale stage left behind is GC-able once old enough
    stale = os.path.join(root, "_stage_v9999")
    os.makedirs(stale)
    old = _time.time() - 7200
    os.utime(stale, (old, old))
    sink.gc_versions(root, keep_last=10, stage_min_age_s=3600)
    assert not os.path.exists(stale)


def test_concurrent_commit_rename_race_reapplies_loser(tmp_path,
                                                       monkeypatch):
    """Two writers race for the same next version: stages are
    writer-unique (neither can touch the other's files) and the rename
    loser re-applies against the winner's CURRENT — both batches land,
    exactly once. Simulated by having a full winner commit run inside
    the loser's rename step."""
    import pyarrow as pa

    def _batch(lo, n):
        return pa.table({
            "repo": [f"r{i % 3}" for i in range(lo, lo + n)],
            "path": [f"f{i}" for i in range(lo, lo + n)],
            "commit": [f"c{i}" for i in range(lo, lo + n)],
            "lang": ["py"] * n, "content": [f"body{i}" for i in
                                            range(lo, lo + n)],
            "op": ["insert"] * n,
            "commit_seq": pa.array(range(lo, lo + n), type=pa.int64()),
        })

    root = str(tmp_path / "state")
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(_batch(0, 10)),
                                    num_buckets=4, num_partitions=2)
    winner = _batch(100, 5)
    loser = _batch(200, 5)
    real_rename = os.rename
    fired = {"done": False}

    def racy(src, dst):
        if not fired["done"] and os.path.basename(dst) == "v0002":
            fired["done"] = True    # nested winner commit passes through
            sink.apply_incremental_bucketed(
                root, ray.data.from_arrow(winner),
                num_buckets=4, num_partitions=2)
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", racy)
    man = sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(loser), num_buckets=4, num_partitions=2)
    monkeypatch.undo()
    assert fired["done"]
    assert man.version == 3                     # loser re-applied on top
    assert sink.current_version(root) == 3
    got = {(r["repo"], r["path"]): r["last_commit_seq"]
           for r in sink.read_state(root).take_all()}
    assert len(got) == 20                       # 10 base + 5 + 5
    assert all((f"r{i % 3}", f"f{i}") in got for i in range(100, 105))
    assert all((f"r{i % 3}", f"f{i}") in got for i in range(200, 205))


def test_table_history_and_files_metadata(tmp_path):
    import json as _json

    import ray.data

    from kettleray.gen.synthetic import EventGenConfig, generate_events_local
    root = str(tmp_path / "s")
    ev = generate_events_local(EventGenConfig(
        n_events=1200, n_repos=6, n_paths_per_repo=25, p_delete=0.05,
        seed=9))
    cut = ev.num_rows // 2
    sink.apply_incremental_mor(root, ray.data.from_arrow(ev.slice(0, cut)),
                               num_buckets=4, num_partitions=2)
    sink.apply_incremental_mor(root, ray.data.from_arrow(ev.slice(cut)),
                               num_buckets=4, num_partitions=2)
    sink.compact_mor(root)
    h = sink.table_history(root)
    versions = h["version"].to_pylist()
    assert versions == sorted(versions) and len(versions) == 3
    cur = [r for r in h.to_pylist() if r["is_current"]]
    assert len(cur) == 1 and cur[0]["version"] == 3
    assert cur[0]["operation"] == "compact"
    assert cur[0]["delta_files"] == 0
    v2 = [r for r in h.to_pylist() if r["version"] == 2][0]
    assert v2["delta_files"] > 0
    # watermarks are monotone across versions
    wms = [r["watermark"] for r in h.to_pylist()]
    assert wms == sorted(wms)
    f = sink.table_files(root)
    assert f.num_rows == cur[0]["files"]
    assert sum(f["rows"].to_pylist()) == cur[0]["rows"]
    assert not any(f["is_delta"].to_pylist())
    fv2 = sink.table_files(root, 2)
    assert any(fv2["is_delta"].to_pylist())
    st = [_json.loads(s) for s in fv2["stats"].to_pylist() if s]
    assert st and all(isinstance(d, dict) for d in st)


def test_lookup_many_bulk_matches_point_lookups(tmp_path):
    import ray.data

    from kettleray.gen.synthetic import EventGenConfig, generate_events_local
    root = str(tmp_path / "s")
    ev = generate_events_local(EventGenConfig(
        n_events=3000, n_repos=10, n_paths_per_repo=30, p_delete=0.08,
        seed=41))
    cut = ev.num_rows // 2
    sink.apply_incremental_mor(root, ray.data.from_arrow(ev.slice(0, cut)),
                               num_buckets=8, num_partitions=4)
    sink.apply_incremental_mor(root, ray.data.from_arrow(ev.slice(cut)),
                               num_buckets=8, num_partitions=4)
    state = {(r["repo"], r["path"]): r["content_sha256"]
             for r in sink.read_state(root).take_all()}
    live = sorted(state)[::3][:40]
    dead = [("ghost", f"g{i}.py") for i in range(5)]
    # duplicate requests must not duplicate results
    req = live + live[:7] + dead
    keys = ray.data.from_arrow(pa.table({
        "repo": [k[0] for k in req], "path": [k[1] for k in req]}))
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in sink.lookup_many(root, keys).take_all()}
    assert got == {k: state[k] for k in live}
    # every row agrees with the point-lookup ground truth
    for k in live[:10]:
        t = sink.lookup_state(root, *k, use_blooms=False)
        assert t["content_sha256"][0].as_py() == got[k]


def test_lookup_many_flat_layout(tmp_path):
    import json as _json

    import pyarrow.parquet as pq
    import ray
    import ray.data

    from kettleray.gen.synthetic import EventGenConfig, generate_events_local
    from kettleray.ops import cdc as _cdc
    root = str(tmp_path / "flat")
    ev = generate_events_local(EventGenConfig(
        n_events=1000, n_repos=5, n_paths_per_repo=20, p_delete=0.05,
        seed=43))
    state = _cdc.replay_lww(ray.data.from_arrow(ev), num_partitions=2)
    vdir = os.path.join(root, "v0001")
    os.makedirs(vdir)
    st = pa.concat_tables(ray.get(state.to_arrow_refs()),
                          promote_options="permissive")
    pq.write_table(st, os.path.join(vdir, "part-0.parquet"))
    with open(os.path.join(vdir, "manifest.json"), "w") as f:
        f.write(sink.Manifest(version=1, watermark=0, schema="",
                              files=[], metrics={}).to_json())
    with open(os.path.join(root, "CURRENT"), "w") as f:
        _json.dump({"version": 1}, f)
    want = {(r["repo"], r["path"]) for r in st.slice(0, 15).to_pylist()}
    keys = ray.data.from_arrow(pa.table({
        "repo": [k[0] for k in want], "path": [k[1] for k in want]}))
    got = sink.lookup_many(root, keys).take_all()
    assert {(r["repo"], r["path"]) for r in got} == want
