"""Cross-operator invariants that define the CDC engine's contract."""

import numpy as np
import pyarrow as pa
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.ops import cdc

CFG = EventGenConfig(n_events=4000, n_repos=8, n_paths_per_repo=40,
                     p_delete=0.08, p_redeliver=0.04, seed=29)


def test_arrival_order_is_irrelevant():
    """Commit order is DATA (commit_seq); physically permuting the log
    must not change the replayed state (SURVEY.md §2.10)."""
    events = generate_events_local(CFG)
    rng = np.random.RandomState(0)
    perm = rng.permutation(events.num_rows)
    shuffled = events.take(pa.array(perm, type=pa.int64()))
    a = {(r["repo"], r["path"]): r["content_sha256"]
         for r in cdc.replay_lww(ray.data.from_arrow(events),
                                 num_partitions=4).take_all()}
    b = {(r["repo"], r["path"]): r["content_sha256"]
         for r in cdc.replay_lww(ray.data.from_arrow(shuffled),
                                 num_partitions=7).take_all()}
    assert a == b


def test_diff_plus_apply_reconstructs_new_state():
    """The Kettle composition: Merge Rows (diff) -> Synchronize After
    Merge. Applying the diff's flagged rows as change events on top of
    the old snapshot must reproduce the new snapshot exactly."""
    events = generate_events_local(CFG)
    half_seq = CFG.n_events // 2

    old_t = events.filter(pa.compute.less(events["commit_seq"], half_seq))
    old = cdc.replay_lww(ray.data.from_arrow(old_t), num_partitions=4)
    new = cdc.replay_lww(ray.data.from_arrow(events), num_partitions=4)
    diff = cdc.diff_snapshots(old, new, num_partitions=4).take_all()

    # flags -> change events applied on top of the old state
    apply_rows = []
    for i, r in enumerate(diff):
        if r["change_type"] == "identical":
            continue
        op = "delete" if r["change_type"] == "deleted" else (
            "insert" if r["change_type"] == "new" else "update")
        apply_rows.append({
            "repo": r["repo"], "path": r["path"], "commit": r["commit"],
            "lang": r["lang"],
            "content": "" if op == "delete" else r["content"],
            "op": op,
            "commit_seq": 10_000_000 + i,   # after every original event
        })
    old_as_events = [{
        "repo": r["repo"], "path": r["path"], "commit": r["commit"],
        "lang": r["lang"], "content": r["content"], "op": "insert",
        "commit_seq": r["last_commit_seq"],
    } for r in old.take_all()]
    merged = pa.Table.from_pylist(old_as_events + apply_rows)
    rebuilt = {(r["repo"], r["path"]): r["content_sha256"]
               for r in cdc.replay_lww(ray.data.from_arrow(merged),
                                       num_partitions=4).take_all()}
    want = {(r["repo"], r["path"]): r["content_sha256"]
            for r in new.take_all()}
    assert rebuilt == want


def test_final_state_sha_invariant_vs_oracle():
    """input_hint invariant: per-row sha256(content) equality of the
    final table state against the oracle replayer."""
    events = generate_events_local(CFG)
    import hashlib
    got = cdc.replay_lww(ray.data.from_arrow(events),
                         num_partitions=4).take_all()
    want = replay_oracle(events)
    for r in got:
        assert r["content_sha256"] == \
            hashlib.sha256(r["content"].encode()).hexdigest()
        assert want[(r["repo"], r["path"])]["content_sha256"] == \
            r["content_sha256"]


def test_keyed_repartition_single_block_per_partition():
    """Guard for the engine-wide assumption that Ray's hash shuffle
    finalizes each key partition as exactly ONE block (see
    constraints.txt). If a Ray upgrade starts splitting partitions, this
    fails loudly instead of letting per-block reduces emit duplicate
    winners."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    n, parts = 50_000, 8
    t = pa.table({
        "repo": pa.array([f"r{i % 97}" for i in range(n)]),
        "path": pa.array([f"p{i % 31}" for i in range(n)]),
        "v": pa.array(np.arange(n)),
    })
    ds = ray.data.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow",
        batch_size=4096).repartition(parts, keys=["repo", "path"]) \
        .materialize()
    refs = ds.to_arrow_refs()
    assert len(refs) == parts, (
        f"hash shuffle produced {len(refs)} blocks for {parts} "
        "partitions — per-block reduce assumption broken")
    # every key must live in exactly one block
    seen: dict[tuple, int] = {}
    for bi, ref in enumerate(refs):
        blk = ray.get(ref)
        for k in set(zip(blk["repo"].to_pylist(),
                         blk["path"].to_pylist())):
            assert seen.setdefault(k, bi) == bi, f"key {k} split"
