"""Skew handling: hot-key detection, salted replay, salted SCD2."""

import pyarrow as pa
import ray.data

from kettleray.gen.oracle import replay_oracle, scd2_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.ops import skew

# 40% of events hit one (repo, path): a pathological hot key.
CFG = EventGenConfig(n_events=6000, n_repos=8, n_paths_per_repo=30,
                     p_delete=0.05, p_redeliver=0.03, seed=13,
                     hot_key_share=0.4)


def _events():
    return generate_events_local(CFG)


def test_detect_hot_keys_finds_the_hot_key():
    ev = ray.data.from_arrow(_events())
    hot = skew.detect_hot_keys(ev, top_k=4, min_count=1000)
    keys = set(zip(hot["repo"].to_pylist(), hot["path"].to_pylist()))
    assert ("repo_0", "src/f_-1.txt") in keys
    assert len(keys) <= 4


def test_salted_replay_matches_oracle():
    events = _events()
    got = {(r["repo"], r["path"]): r
           for r in skew.replay_lww_salted(
               ray.data.from_arrow(events), num_partitions=8,
               salt_factor=4, hot_min_count=1000).take_all()}
    want = replay_oracle(events)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"], k
        assert got[k]["last_commit_seq"] == want[k]["last_commit_seq"], k


def test_salted_scd2_matches_oracle():
    events = _events()
    got = skew.scd2_history_salted(
        ray.data.from_arrow(events), num_partitions=8,
        window=1000, hot_min_count=1000).take_all()
    want = scd2_oracle(events)
    gk = {(r["repo"], r["path"], r["version"]): r for r in got}
    wk = {(r["repo"], r["path"], r["version"]): r for r in want}
    assert set(gk) == set(wk)
    for k in wk:
        for col in ("valid_from_seq", "valid_to_seq", "is_current",
                    "commit", "content_sha256"):
            assert gk[k][col] == wk[k][col], (k, col)


def test_salted_scd2_no_hot_keys_degenerates_to_plain():
    cfg = EventGenConfig(n_events=1500, n_repos=5, n_paths_per_repo=20,
                         p_delete=0.1, seed=3)
    events = generate_events_local(cfg)
    got = skew.scd2_history_salted(
        ray.data.from_arrow(events), num_partitions=4,
        hot_min_count=10**9).take_all()   # nothing qualifies as hot
    want = scd2_oracle(events)
    assert len(got) == len(want)


def test_detect_hot_keys_sketch_matches_exact():
    """Zero-shuffle Misra-Gries detector finds the same hot keys as the
    exact path, with lower-bound counts within n/(k+1) of exact."""
    ev = ray.data.from_arrow(_events())
    exact = skew.detect_hot_keys(ev, top_k=4, min_count=1000)
    approx = skew.detect_hot_keys(ev, top_k=4, min_count=1000,
                                  method="sketch", sketch_k=512)
    ek = set(zip(exact["repo"].to_pylist(), exact["path"].to_pylist()))
    ak = set(zip(approx["repo"].to_pylist(), approx["path"].to_pylist()))
    assert ("repo_0", "src/f_-1.txt") in ak
    assert ak == ek
    exact_counts = dict(zip(zip(exact["repo"].to_pylist(),
                                exact["path"].to_pylist()),
                            exact["n_events"].to_pylist()))
    err = CFG.n_events / (512 + 1)
    for repo, path, lb in zip(approx["repo"].to_pylist(),
                              approx["path"].to_pylist(),
                              approx["n_events"].to_pylist()):
        true = exact_counts[(repo, path)]
        assert lb <= true <= lb + err


def test_detect_hot_keys_sketch_no_hot_keys_empty():
    cfg = EventGenConfig(n_events=3000, n_repos=20, n_paths_per_repo=50,
                         seed=7, hot_key_share=0.0)
    ev = ray.data.from_arrow(generate_events_local(cfg))
    approx = skew.detect_hot_keys(ev, top_k=4, min_count=1000,
                                  method="sketch", sketch_k=512)
    assert approx.num_rows == 0
    assert approx.column_names == ["repo", "path", "n_events"]
