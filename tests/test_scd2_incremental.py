"""Incrementally maintained SCD2 dimension table (io.sink.
apply_incremental_scd2): per-commit history appends must equal a full
batch rebuild, untouched buckets must be hardlinked, and redelivery /
arrival order must not change the history."""

import os

import pyarrow.compute as pc
import ray.data

from kettleray.gen.oracle import scd2_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=3000, n_repos=10, n_paths_per_repo=40,
                     p_delete=0.12, seed=53)

_KEYS = ("repo", "path", "version")


def _hist(root):
    return {tuple(r[k] for k in _KEYS):
            (r["valid_from_seq"], r["valid_to_seq"], r["is_current"],
             r["commit"], r["content_sha256"])
            for r in sink.read_state(root).take_all()}


def _want(events):
    return {tuple(r[k] for k in _KEYS):
            (r["valid_from_seq"], r["valid_to_seq"], r["is_current"],
             r["commit"], r["content_sha256"])
            for r in scd2_oracle(events)}


def _windows(events, cuts):
    lo = 0
    for hi in cuts:
        yield events.filter(pc.and_(
            pc.greater_equal(events["commit_seq"], lo),
            pc.less(events["commit_seq"], hi)))
        lo = hi


def test_incremental_scd2_matches_batch_oracle(tmp_path):
    root = str(tmp_path / "dim")
    events = generate_events_local(CFG)
    for w in _windows(events, (800, 1600, 2400, CFG.n_events)):
        m = sink.apply_incremental_scd2(root, ray.data.from_arrow(w),
                                        num_buckets=8, num_partitions=4)
    assert m.version == 4 and m.metrics["mode"] == "scd2"
    assert _hist(root) == _want(events)


def test_incremental_scd2_hardlinks_untouched_buckets(tmp_path):
    root = str(tmp_path / "dim")
    events = generate_events_local(CFG)
    sink.apply_incremental_scd2(root, ray.data.from_arrow(events),
                                num_buckets=16, num_partitions=4)
    # single-key micro-commit: exactly one bucket rewritten
    one = events.slice(0, 1).set_column(
        6, "commit_seq",
        pc.add(events.slice(0, 1)["commit_seq"], CFG.n_events + 10))
    m2 = sink.apply_incremental_scd2(root, ray.data.from_arrow(one),
                                     num_buckets=16, num_partitions=4)
    assert m2.metrics["touched_buckets"] == 1
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
    # the appended event opened a new current version for its key
    key = (one["repo"][0].as_py(), one["path"][0].as_py())
    rows = [r for r in sink.read_state(root).take_all()
            if (r["repo"], r["path"]) == key]
    cur = [r for r in rows if r["is_current"]]
    assert len(cur) == 1
    assert cur[0]["valid_from_seq"] == one["commit_seq"][0].as_py()


def test_incremental_scd2_redelivery_and_shuffle_invariance(tmp_path):
    root = str(tmp_path / "dim")
    events = generate_events_local(CFG)
    half = pc.less(events["commit_seq"], 1500)
    sink.apply_incremental_scd2(root,
                                ray.data.from_arrow(events.filter(half)),
                                num_buckets=8, num_partitions=4)
    before = _hist(root)
    # full redelivery of the applied prefix: watermark no-ops it
    m = sink.apply_incremental_scd2(
        root, ray.data.from_arrow(events.filter(half)),
        num_buckets=8, num_partitions=4)
    assert m.version == 1 and _hist(root) == before
    # second half arrives SHUFFLED: commit order is data, not arrival
    rest = ray.data.from_arrow(
        events.filter(pc.invert(half))).random_shuffle(seed=11)
    sink.apply_incremental_scd2(root, rest, num_buckets=8,
                                num_partitions=4)
    assert _hist(root) == _want(events)
