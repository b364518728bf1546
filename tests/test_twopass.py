"""Shuffle-light two-pass LWW replay vs oracle and vs one-pass."""

import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.ops import cdc

CFG = EventGenConfig(n_events=4000, n_repos=8, n_paths_per_repo=40,
                     p_delete=0.08, p_redeliver=0.05, seed=17)


def test_twopass_matches_oracle():
    events = generate_events_local(CFG)

    def factory():
        return ray.data.from_arrow(events)

    got = {(r["repo"], r["path"]): r
           for r in cdc.replay_lww_twopass(factory,
                                           num_partitions=8).take_all()}
    want = replay_oracle(events)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"], k
        assert got[k]["last_commit_seq"] == want[k]["last_commit_seq"], k
    # exactly one row per key even under redelivery
    assert len(got) == len(cdc.replay_lww_twopass(
        factory, num_partitions=8).take_all())


def test_twopass_equals_onepass():
    events = generate_events_local(CFG)
    one = {(r["repo"], r["path"]): r["content_sha256"]
           for r in cdc.replay_lww(ray.data.from_arrow(events),
                                   num_partitions=8).take_all()}
    two = {(r["repo"], r["path"]): r["content_sha256"]
           for r in cdc.replay_lww_twopass(
               lambda: ray.data.from_arrow(events),
               num_partitions=8).take_all()}
    assert one == two


def test_twopass_tombstones_and_collision_absorption(monkeypatch):
    """(1) keep_tombstones=True surfaces deleted keys as tombstone rows;
    (2) with a deliberately COARSE winner hash (mod 7 — massive false
    positives, including stale rows of deleted keys) the result is still
    exact: tombstone winners are in the set and the final per-key LWW
    reduce absorbs every false positive."""
    import numpy as np
    import kettleray.ops.cdc as cdc_mod

    ev = generate_events_local(CFG)
    want = replay_oracle(ev)

    orig = cdc_mod._winner_hash64
    monkeypatch.setattr(cdc_mod, "_winner_hash64",
                        lambda t, s: orig(t, s) % np.uint64(7))
    got = {(r["repo"], r["path"]): r for r in cdc_mod.replay_lww_twopass(
        lambda columns=None: ray.data.from_arrow(
            ev.select(columns) if columns else ev),
        num_partitions=4).take_all()}
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"]

    monkeypatch.setattr(cdc_mod, "_winner_hash64", orig)
    with_tomb = cdc_mod.replay_lww_twopass(
        lambda columns=None: ray.data.from_arrow(
            ev.select(columns) if columns else ev),
        num_partitions=4, keep_tombstones=True).take_all()
    ops = {(r["repo"], r["path"]): r["op"] for r in with_tomb}
    assert "delete" in set(ops.values())      # tombstones surfaced
    live = {k for k, o in ops.items() if o != "delete"}
    assert live == set(want)

def test_twopass_sharded_winner_set_equals_driver_path():
    """driver_set_limit=0 forces the distributed sharded winner-set
    build (scatter by top hash bits -> per-shard sort/dedup); result
    must be byte-identical to the driver-broadcast path and the oracle."""
    events = generate_events_local(CFG)

    def factory(columns=None):
        return ray.data.from_arrow(
            events.select(columns) if columns else events)

    sharded = {(r["repo"], r["path"]): r
               for r in cdc.replay_lww_twopass(
                   factory, num_partitions=8,
                   driver_set_limit=0).take_all()}
    want = replay_oracle(events)
    assert set(sharded) == set(want)
    for k in want:
        assert sharded[k]["content_sha256"] == want[k]["content_sha256"], k
        assert sharded[k]["last_commit_seq"] == want[k]["last_commit_seq"], k

    # tombstone surfacing works through the sharded probe too
    with_tomb = cdc.replay_lww_twopass(
        factory, num_partitions=4, keep_tombstones=True,
        driver_set_limit=0).take_all()
    ops = {(r["repo"], r["path"]): r["op"] for r in with_tomb}
    assert "delete" in set(ops.values())
    assert {k for k, o in ops.items() if o != "delete"} == set(want)
