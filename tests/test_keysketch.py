"""Per-file HLL key-sketch sidecars (kettleray.io.keysketch).

Contract: approx_key_count is a metadata-only union of per-file
sketches — MOR base/delta overlap never double-counts (register-max
merge == sketch of the union), sidecars ride the COW hardlink loop
forward, and a foreign-key sidecar refuses to merge.
"""

import pytest
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import keysketch, sink

CFG = EventGenConfig(n_events=4000, n_repos=10, n_paths_per_repo=40,
                     p_delete=0.05, p_redeliver=0.05, seed=47)


def _exact_keys(root):
    rows = sink.read_state(root).take_all()
    return {(r["repo"], r["path"]) for r in rows}


def test_mor_overlap_never_double_counts(tmp_path):
    root = str(tmp_path / "s")
    events = generate_events_local(CFG)
    half = events.num_rows // 2
    sink.apply_incremental_mor(root, ray.data.from_arrow(
        events.slice(0, half)), num_buckets=8, num_partitions=4)
    # second commit touches MANY of the same keys -> delta files whose
    # keys overlap the base files
    sink.apply_incremental_mor(root, ray.data.from_arrow(
        events.slice(half)), num_buckets=8, num_partitions=4)
    info = keysketch.approx_key_count(root)
    exact = len(_exact_keys(root))
    # state excludes deleted keys; the sketch counts every key that
    # EVER appeared in a live file (deletes are tombstone rows carrying
    # the key), so compare against keys-ever-seen
    ever = len(set(zip(events["repo"].to_pylist(),
                       events["path"].to_pylist())))
    assert info["files_unsketched"] == 0
    assert info["rows_total"] > 0
    # 3x RSE tolerance (p=12 -> ~1.6%)
    tol = 3 * info["rse"] * ever + 1
    assert abs(info["approx_distinct_keys"] - ever) <= tol
    assert exact <= ever  # sanity: live keys are a subset


def test_sidecars_ride_hardlinks_forward(tmp_path):
    root = str(tmp_path / "s")
    events = generate_events_local(CFG)
    half = events.num_rows // 2
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(
        events.slice(0, half)), num_buckets=8, num_partitions=4)
    first = keysketch.build_key_sketches(root)
    assert first["built"] == first["files_total"] > 0
    # incremental commit rewrites only touched buckets; untouched
    # buckets' files (and their sidecars) are hardlinked forward —
    # a SINGLE-key commit touches exactly one bucket
    sink.apply_incremental_bucketed(root, ray.data.from_arrow(
        events.slice(half, 1)), num_buckets=8, num_partitions=4)
    second = keysketch.build_key_sketches(root)
    assert second["version"] == first["version"] + 1
    # at least the sidecars of untouched buckets came along for free
    assert second["existing"] > 0
    info = keysketch.approx_key_count(root)
    assert info["files_unsketched"] == 0


def test_foreign_key_cols_refuse_to_merge(tmp_path):
    root = str(tmp_path / "s")
    sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(generate_events_local(CFG)),
        num_buckets=4, num_partitions=4)
    keysketch.build_key_sketches(root, key_cols=("repo",))
    with pytest.raises(ValueError, match="built over key"):
        keysketch.approx_key_count(root, key_cols=("repo", "path"),
                                   build_missing=False)


def test_missing_sidecars_reported_when_not_building(tmp_path):
    root = str(tmp_path / "s")
    sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(generate_events_local(CFG)),
        num_buckets=4, num_partitions=4)
    info = keysketch.approx_key_count(root, build_missing=False)
    assert info["files_unsketched"] == info["files_total"] > 0
    assert info["approx_distinct_keys"] == 0.0
