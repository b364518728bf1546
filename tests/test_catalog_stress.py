"""Catalog CAS under real contention: N concurrent committers over the
same catalog root must serialize — every commit gets its own snapshot
id, no pin is ever lost, CURRENT never regresses, and crash orphans
(linked snap without a CURRENT write) roll forward instead of wedging
the loop. Pure-filesystem stress (no Ray session needed)."""

import json
import multiprocessing as mp
import os
import random
import threading

from kettleray.io import catalog


def _committer(root, tid, n_commits, out, seed):
    rng = random.Random(seed)
    snaps = []
    for i in range(n_commits):
        if rng.random() < 0.5:
            # jitter widens the window between link and CURRENT write
            threading.Event().wait(rng.random() * 0.002)
        n = catalog.commit_snapshot(
            root, {f"t{tid}": (f"/tmp/t{tid}", i),
                   "shared": (f"/tmp/t{tid}", tid * 1000 + i)},
            note=f"tid={tid} i={i}")
        snaps.append(n)
    out[tid] = snaps


def _assert_serialized(root, per_thread_snaps, n_total, first=1):
    cur = catalog.current_snapshot_id(root)
    assert cur == n_total, (cur, n_total)
    # every commit claimed a distinct snapshot id; ids are the dense
    # range [first..n_total] and each writer's ids are monotone
    all_ids = [n for snaps in per_thread_snaps.values() for n in snaps]
    assert sorted(all_ids) == list(range(first, n_total + 1))
    for snaps in per_thread_snaps.values():
        assert snaps == sorted(snaps)
    # parent chain is complete and linear
    for n in range(first, n_total + 1):
        s = catalog.read_snapshot(root, n)
        assert s["snapshot"] == n
        assert s["parent"] == (n - 1 if n > first else
                               s["parent"])  # first may rebase on setup
        if n > first:
            assert s["parent"] == n - 1
    # no lost pins: the final snapshot carries every thread's LAST pin
    final = catalog.read_snapshot(root, cur)["tables"]
    for tid, snaps in per_thread_snaps.items():
        last_i = len(snaps) - 1
        assert final[f"t{tid}"]["version"] == last_i, (tid, final)
    # and each commit's own snapshot contains the pin it made
    for tid, snaps in per_thread_snaps.items():
        for i, n in enumerate(snaps):
            assert catalog.read_snapshot(root, n)["tables"][
                f"t{tid}"]["version"] == i


def test_concurrent_thread_committers_serialize(tmp_path):
    root = str(tmp_path / "catalog")
    n_threads, n_commits = 16, 8
    out: dict[int, list[int]] = {}
    ts = [threading.Thread(target=_committer,
                           args=(root, tid, n_commits, out, 100 + tid))
          for tid in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    _assert_serialized(root, out, n_threads * n_commits)


def _proc_committer(args):
    root, tid, n_commits, seed = args
    out: dict[int, list[int]] = {}
    _committer(root, tid, n_commits, out, seed)
    return tid, out[tid]


def test_concurrent_process_committers_serialize(tmp_path):
    """Separate PROCESSES (no GIL serialization of the race window):
    the os.link claim is the only arbiter."""
    root = str(tmp_path / "catalog")
    n_procs, n_commits = 8, 6
    with mp.get_context("fork").Pool(n_procs) as pool:
        res = pool.map(_proc_committer,
                       [(root, tid, n_commits, 200 + tid)
                        for tid in range(n_procs)])
    out = dict(res)
    _assert_serialized(root, out, n_procs * n_commits)


def test_contention_rolls_forward_over_crash_orphan(tmp_path):
    """A winner that linked snap_N but crashed before writing CURRENT
    must not wedge later committers: they rebase on the orphan (its
    pins are complete) and CURRENT advances past it."""
    root = str(tmp_path / "catalog")
    catalog.commit_snapshot(root, {"base": ("/tmp/base", 1)})
    # simulate the crash: snapshot 2 linked, CURRENT still at 1
    orphan = {"snapshot": 2, "parent": 1, "note": "crashed winner",
              "tables": {"base": {"root": "/tmp/base", "version": 1},
                         "orphan_pin": {"root": "/tmp/o", "version": 7}},
              "ts": 0.0}
    with open(os.path.join(root, "snap_00002.json"), "w") as f:
        json.dump(orphan, f)
    assert catalog.current_snapshot_id(root) == 1

    n_threads, n_commits = 8, 4
    out: dict[int, list[int]] = {}
    ts = [threading.Thread(target=_committer,
                           args=(root, tid, n_commits, out, 300 + tid))
          for tid in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    total = 2 + n_threads * n_commits
    assert catalog.current_snapshot_id(root) == total
    all_ids = sorted(n for s in out.values() for n in s)
    assert all_ids == list(range(3, total + 1))
    # the orphan's pin rolled forward into every later snapshot
    final = catalog.read_snapshot(root)["tables"]
    assert final["orphan_pin"]["version"] == 7
    for tid, snaps in out.items():
        assert final[f"t{tid}"]["version"] == n_commits - 1
