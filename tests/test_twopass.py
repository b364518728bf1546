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
