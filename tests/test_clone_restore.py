"""Zero-copy shallow clone + version restore over the bucketed sink.

Proofs are physical: inode equality shows the clone/restore moved no
data bytes; divergent commits show clone and source evolve
independently; the restore's change feed shows exactly the undone rows.
"""
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=2000, n_repos=8, n_paths_per_repo=30,
                     p_delete=0.05, seed=77)


def _state(root, version=None):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root, version).take_all()}


def _inodes(vdir):
    out = {}
    for base, _, names in os.walk(vdir):
        for n in names:
            if n.endswith(".parquet"):
                p = os.path.join(base, n)
                out[os.path.relpath(p, vdir)] = os.stat(p).st_ino
    return out


def _build(root, events, upto):
    b = events.filter(pc.less(events["commit_seq"], upto))
    return sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(b), num_buckets=8, num_partitions=4)


def test_clone_is_zero_copy_and_independent(ray_session, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    events = generate_events_local(CFG)
    _build(src, events, 1000)

    man = sink.clone_state(src, dst)
    assert man.version == 1
    assert man.metrics["cloned_from"].endswith("@v1")
    # physical zero-copy: every file shares its inode with the source
    si = _inodes(os.path.join(src, "v0001"))
    di = _inodes(os.path.join(dst, "v0001"))
    assert set(si) == set(di) and all(si[k] == di[k] for k in si)
    assert _state(dst) == _state(src)

    # clone refuses to overwrite a committed table
    try:
        sink.clone_state(src, dst)
        raise AssertionError("expected FileExistsError")
    except FileExistsError:
        pass

    # independent evolution: commit the tail ONLY to the clone
    tail = events.filter(pc.greater_equal(events["commit_seq"], 1000))
    sink.apply_incremental_bucketed(
        dst, ray.data.from_arrow(tail), num_buckets=8, num_partitions=4)
    assert sink.current_version(src) == 1
    assert sink.current_version(dst) == 2
    assert _state(src) != _state(dst)
    # source v1 files untouched (still version 1, same inodes)
    assert _inodes(os.path.join(src, "v0001")) == si


def test_restore_undoes_a_commit(ray_session, tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    _build(root, events, 1000)
    good = _state(root)
    good_wm = sink.read_manifest(root).watermark

    # "bad" commit: the tail
    tail = events.filter(pc.greater_equal(events["commit_seq"], 1000))
    sink.apply_incremental_bucketed(
        root, ray.data.from_arrow(tail), num_buckets=8,
        num_partitions=4)
    assert _state(root) != good

    man = sink.restore_version(root, 1)
    assert man.version == 3 and man.metrics["restored_from"] == 1
    assert man.watermark == good_wm          # replay resumes pre-bad
    assert _state(root) == good
    # history preserved: the bad version still time-travels
    assert _state(root, 2) != good
    # restore was metadata-only: v3 files share inodes with v1
    assert _inodes(os.path.join(root, "v0003")) == \
        _inodes(os.path.join(root, "v0001"))
    # the restore's change feed covers exactly the keys the bad commit
    # had touched (they changed back)
    changed = sink.read_changes(root, 2, 3, num_partitions=2)
    keys = {(r["repo"], r["path"]) for r in changed.take_all()}
    bad_keys = {(r["repo"], r["path"]) for r in tail.to_pylist()}
    assert keys <= bad_keys and keys
