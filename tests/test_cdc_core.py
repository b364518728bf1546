"""CDC core correctness vs the single-threaded oracle replayer.

Mirrors the reference test scenarios (SURVEY.md §5): MergeRowsTest flag
matrix, InsertUpdate/SynchronizeAfterMerge upsert+delete behavior,
DimensionLookup SCD2 version chains, exactly-once redelivery dedup,
schema evolution.
"""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from kettleray.gen.oracle import diff_oracle, replay_oracle, scd2_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.ops import cdc


CFG = EventGenConfig(n_events=5000, n_repos=10, n_paths_per_repo=50,
                     p_delete=0.08, p_redeliver=0.05, seed=7)


@pytest.fixture(scope="module")
def events_table():
    return generate_events_local(CFG)


@pytest.fixture(scope="module")
def events_ds(events_table):
    return ray.data.from_arrow(events_table)


def _final_state_dict(ds):
    return {(r["repo"], r["path"]): r for r in ds.take_all()}


def test_replay_lww_matches_oracle(events_table, events_ds):
    got = _final_state_dict(
        cdc.replay_lww(events_ds, num_partitions=8))
    want = replay_oracle(events_table)
    assert set(got) == set(want)
    for k, w in want.items():
        g = got[k]
        assert g["content_sha256"] == w["content_sha256"], k
        assert g["last_commit_seq"] == w["last_commit_seq"], k
        assert g["commit"] == w["commit"], k


def test_replay_deterministic_across_parallelism(events_ds, events_table):
    a = _final_state_dict(cdc.replay_lww(events_ds, num_partitions=2))
    b = _final_state_dict(cdc.replay_lww(
        ray.data.from_arrow(events_table).repartition(16),
        num_partitions=13))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["content_sha256"] == b[k]["content_sha256"]
        assert a[k]["last_commit_seq"] == b[k]["last_commit_seq"]


def test_scd2_matches_oracle(events_table, events_ds):
    got = cdc.scd2_history(events_ds, num_partitions=8).take_all()
    want = scd2_oracle(events_table)
    gk = {(r["repo"], r["path"], r["version"]): r for r in got}
    wk = {(r["repo"], r["path"], r["version"]): r for r in want}
    assert set(gk) == set(wk)
    for k in wk:
        for col in ("valid_from_seq", "valid_to_seq", "is_current",
                    "commit", "content_sha256"):
            assert gk[k][col] == wk[k][col], (k, col)


def test_scd2_current_rows_equal_final_state(events_table, events_ds):
    cur = [r for r in cdc.scd2_history(events_ds, num_partitions=4).take_all()
           if r["is_current"]]
    want = replay_oracle(events_table)
    assert {(r["repo"], r["path"]) for r in cur} == set(want)


def test_diff_snapshots_flag_matrix():
    old = pa.table({
        "repo": ["r", "r", "r", "r"],
        "path": ["a", "b", "c", "d"],
        "content_sha256": ["1", "2", "3", "4"],
    })
    new = pa.table({
        "repo": ["r", "r", "r", "r"],
        "path": ["a", "b", "e", "f"],
        "content_sha256": ["1", "22", "5", "6"],
    })
    got = {(r["repo"], r["path"]): r["change_type"]
           for r in cdc.diff_snapshots(
               ray.data.from_arrow(old), ray.data.from_arrow(new),
               num_partitions=4).take_all()}
    assert got == {("r", "a"): "identical", ("r", "b"): "changed",
                   ("r", "c"): "deleted", ("r", "d"): "deleted",
                   ("r", "e"): "new", ("r", "f"): "new"}
    assert got == diff_oracle(old, new)


def test_redelivery_dedup_exactly_once(events_table):
    """Doubling a slice of the log must not change the final state."""
    dup = pa.concat_tables([events_table, events_table.slice(0, 2000)])
    a = replay_oracle(events_table)
    got = _final_state_dict(
        cdc.replay_lww(ray.data.from_arrow(dup), num_partitions=6))
    assert set(got) == set(a)
    for k in a:
        assert got[k]["content_sha256"] == a[k]["content_sha256"]


def test_schema_evolution_additive_and_widening():
    t = pa.table({"repo": ["r"], "path": ["p"], "n": pa.array([3],
                                                             type=pa.int32())})
    target = pa.schema([("repo", pa.string()), ("path", pa.string()),
                        ("n", pa.float64()), ("author", pa.string())])
    out = cdc.evolve_to_schema(ray.data.from_arrow(t), target)
    rows = out.take_all()
    assert rows[0]["n"] == 3.0 and rows[0]["author"] is None

    bad_target = pa.schema([("repo", pa.int64()), ("path", pa.string()),
                            ("n", pa.int32()), ("author", pa.string())])
    with pytest.raises(Exception):
        cdc.evolve_to_schema(ray.data.from_arrow(t), bad_target).take_all()


def test_parse_validate_adds_sha_and_rejects_missing(events_ds):
    out = cdc.parse_validate(events_ds).take(5)
    import hashlib
    for r in out:
        assert r["content_sha256"] == hashlib.sha256(
            r["content"].encode()).hexdigest()
    bad = ray.data.from_arrow(pa.table({"repo": ["x"]}))
    with pytest.raises(Exception):
        cdc.parse_validate(bad).take_all()


def test_scd2_preserves_large_commit_seq():
    """commit_seq above 2^53 must survive SCD2 exactly (no float64
    round-trip of validity boundaries — nanosecond-epoch sequences)."""
    base = 1 << 60
    seqs = [base + 1, base + 2, base + 3]
    t = pa.table({
        "repo": pa.array(["r"] * 3), "path": pa.array(["p"] * 3),
        "commit": pa.array(["a", "b", "c"]),
        "lang": pa.array(["py"] * 3),
        "content": pa.array(["v1", "v2", "v3"]),
        "op": pa.array(["insert", "update", "update"]),
        "commit_seq": pa.array(seqs, type=pa.int64()),
    })
    out = cdc.scd2_history_table(t)
    rows = sorted(out.to_pylist(), key=lambda r: r["version"])
    assert [r["valid_from_seq"] for r in rows] == seqs
    assert [r["valid_to_seq"] for r in rows] == [seqs[1], seqs[2], None]
    assert [r["is_current"] for r in rows] == [False, False, True]
