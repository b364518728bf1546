"""Wide-payload guard rails (SURVEY §7.4 #4): 10 KB content rows through
replay and the MOR trickle sink with content widened to large_string
(64-bit offsets — no 2 GB single-array ceiling) and blocks byte-capped
by target_max_block_size, never row-capped."""

import hashlib

import pyarrow as pa
import ray.data

from kettleray import configure_ray_data
from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events, \
    generate_events_local
from kettleray.ops import cdc

# content_repeat=320 -> ~10 KB content per event
WIDE = EventGenConfig(n_events=3000, n_repos=6, n_paths_per_repo=30,
                      p_delete=0.06, p_redeliver=0.03, seed=31,
                      content_repeat=320)


def _sha_map(rows):
    return {(r["repo"], r["path"]): r["content_sha256"] for r in rows}


def test_wide_replay_large_string_end_to_end():
    """replay_lww over 10 KB payloads with wide_payload=True: content is
    large_string at parse time AND in the final state; the sha invariant
    holds against the oracle replayer."""
    events = generate_events_local(WIDE)
    assert max(len(c) for c in events["content"].to_pylist()[:50]) >= 9000
    ds = cdc.parse_validate(ray.data.from_arrow(events), with_sha=False,
                            wide_payload=True)
    final = cdc.replay_lww(ds, num_partitions=4).materialize()
    assert final.schema().base_schema.field("content").type \
        == pa.large_string()
    got = final.take_all()
    want = replay_oracle(events)
    assert len(got) == len(want)
    for r in got:
        assert r["content_sha256"] == \
            hashlib.sha256(r["content"].encode()).hexdigest()
        assert want[(r["repo"], r["path"])]["content_sha256"] == \
            r["content_sha256"]


def test_wide_mor_trickle_roundtrip(tmp_path):
    """Backfill + micro-commit of 10 KB payloads through the
    merge-on-read sink, content large_string end to end: the bucket
    merge, delta append and read-back all run on int64 offsets, and the
    merged state matches the oracle."""
    import pyarrow.compute as pc
    from kettleray.io import sink
    root = str(tmp_path / "wide_state")
    events = generate_events_local(WIDE)
    cut = (WIDE.n_events * 9) // 10
    wide = cdc.parse_validate(ray.data.from_arrow(events),
                              wide_payload=True)
    b1 = wide.map_batches(
        lambda t: t.filter(pc.less(t["commit_seq"], cut)),
        batch_format="pyarrow")
    b2 = wide.map_batches(
        lambda t: t.filter(pc.greater_equal(t["commit_seq"], cut)),
        batch_format="pyarrow")
    sink.apply_incremental_mor(root, b1, num_buckets=4, num_partitions=4)
    sink.apply_incremental_mor(root, b2, num_buckets=4, num_partitions=4)
    state = sink.read_state(root, num_partitions=4).materialize()
    assert state.schema().base_schema.field("content").type \
        == pa.large_string()
    assert _sha_map(state.take_all()) == {
        k: v["content_sha256"] for k, v in replay_oracle(events).items()}


def test_wide_blocks_are_byte_capped():
    """With a small target_max_block_size, 10 KB-content blocks split by
    BYTES: no materialized block exceeds ~2x the cap even though the
    row count per block would be tiny (row-capped batching would blow
    the heap at 100 TB with multi-MB documents)."""
    cap = 2 * 1024 * 1024
    ctx = configure_ray_data(target_max_block_size=cap)
    try:
        cfg = EventGenConfig(n_events=4000, n_repos=6,
                             n_paths_per_repo=30, seed=33,
                             content_repeat=320)
        ds = cdc.parse_validate(generate_events(cfg,
                                                override_num_blocks=2),
                                with_sha=False, wide_payload=True)
        sizes = [b.nbytes for b in ds.iter_batches(batch_size=None,
                                                   batch_format="pyarrow")]
        assert sum(sizes) > 4 * cap          # the input really is wide
        assert max(sizes) <= 2 * cap, sizes  # and every block is capped
    finally:
        configure_ray_data()                 # restore the default profile
