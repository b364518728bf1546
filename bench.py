"""Benchmark harness: headline CDC pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events_per_sec": ...}

`--scaling`: runs the headline synthetic-replay job in two fresh
processes (num_cpus=8 and 32) on the same input and reports both
throughputs + scaling efficiency (sandbox stand-in for the N vs 4N node
criterion in BASELINE.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_SYNTH = int(os.environ.get("KETTLERAY_BENCH_EVENTS", "8000000"))
# NB: this sandbox is a shared VM with visible CPU steal (measured up to
# ~45% slowdown from noisy neighbors); all timed paths use warmup +
# best-of-3 to keep the numbers comparable.


# Identical job config at every parallelism level (the scaling criterion
# compares the SAME job at N and 4N): 64 input blocks, 16 hash partitions,
# 8 shuffle aggregators. Chosen by sweep — large blocks×partitions
# products choke the single-node aggregator pool (see BASELINE.md).
BLOCKS = 64
PARTS = 16
AGGS = 8


def _init_ray():
    import ray
    from kettleray import configure_ray_data
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    ctx = configure_ray_data()
    ctx.max_hash_shuffle_aggregators = AGGS


def _num_partitions() -> int:
    return PARTS


def run_synthetic_replay(n_events: int | None = None,
                         num_partitions: int | None = None,
                         ) -> tuple[float, int]:
    """Headline: generate + parse + LWW-replay a synthetic CDC stream,
    write final state to partitioned Parquet. Returns (sec, n_events)."""
    import shutil
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import cdc
    n = n_events or N_SYNTH
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=42)
    out = "/tmp/kettleray_bench/final_state"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    ev = generate_events(cfg, override_num_blocks=BLOCKS)
    final = cdc.replay_lww(cdc.parse_validate(ev, with_sha=False),
                           num_partitions=num_partitions
                           or _num_partitions())
    final.write_parquet(out)
    return time.time() - t0, cfg.n_events


def run_window() -> tuple[float, int]:
    """Window family over the synthetic stream: running sum/count +
    row_number/rank per (repo, path) ordered by commit_seq — 2M events
    through ONE keyed exchange + segmented-scan kernels."""
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import aggregates as ag
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=42)
    ev = generate_events(cfg, override_num_blocks=BLOCKS).materialize()
    t0 = time.time()
    ag.running_aggregate(
        ev, ["repo", "path"], "commit_seq",
        [("commit_seq", "count", "n_so_far"),
         (None, "row_number", "rn"), (None, "rank", "rk"),
         ("commit_seq", "max", "max_seq")],
        num_partitions=_num_partitions()).count()
    return time.time() - t0, n


def run_eventtime() -> tuple[float, int, dict]:
    """Event-time windowed ingest (ops.eventtime): 2M events as 4
    in-order micro-batches through the watermark/finalize loop —
    distributed window-stamp + per-block partials, only partials reach
    the driver. Returns (sec, n_events, counts)."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import eventtime as et
    root = "/tmp/kettleray_bench/eventtime"
    shutil.rmtree(root, ignore_errors=True)
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=44)
    ev = generate_events(cfg, override_num_blocks=BLOCKS).map_batches(
        lambda t: t.append_column(
            "ev_us", pc.multiply(t["commit_seq"], 1_000_000)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    t0 = time.time()
    step = n // 4 + 1
    for k in range(4):
        lo, hi = k * step, (k + 1) * step
        b = ev.map_batches(
            lambda t, lo=lo, hi=hi: t.filter(pc.and_(
                pc.greater_equal(t["commit_seq"], lo),
                pc.less(t["commit_seq"], hi))),
            batch_format="pyarrow", zero_copy_batch=True)
        et.ingest(root, b, time_col="ev_us",
                  window_s=n // 256, lateness_s=n // 512,
                  group_cols=("repo",),
                  aggs={"n": ("count", None),
                        "max_seq": ("max", "commit_seq")},
                  batch_id=f"b{k}")
    sec = time.time() - t0
    fin = et.finalized(root)
    return sec, n, {"finalized_windows": fin.count() if fin else 0,
                    "open_windows": et.open_windows(root).num_rows,
                    "versions": et.current_version(root)}


def run_constrained_apply() -> tuple[float, dict]:
    """Constraint-guarded MOR apply (io.constraints): 2M events with
    ~9% planted violations through 3 declared rules + quarantine
    routing. Overhead vs the plain path is the routing map_batches +
    one materialize (compare incremental_apply / trickle lines)."""
    import shutil
    import numpy as np
    import pyarrow as pa
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import constraints as ct
    sroot = "/tmp/kettleray_bench/ct_state"
    qroot = "/tmp/kettleray_bench/ct_quar"
    shutil.rmtree(sroot, ignore_errors=True)
    shutil.rmtree(qroot, ignore_errors=True)
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=45)

    def _plant(t: pa.Table) -> pa.Table:
        seq = t["commit_seq"].to_numpy()
        bad = seq % 11 == 5
        lang = pa.array(np.where(bad, None, t["lang"].to_numpy(
            zero_copy_only=False)), type=pa.string())
        return t.set_column(t.column_names.index("lang"), "lang", lang)

    ev = generate_events(cfg, override_num_blocks=BLOCKS).map_batches(
        _plant, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    ct.set_constraints(sroot, [
        {"name": "lang_set", "kind": "not_null", "col": "lang"},
        {"name": "known_op", "kind": "in", "col": "op",
         "values": ["insert", "update", "delete"]},
        {"name": "seq_pos", "kind": "check",
         "expr": ["commit_seq", ">=", 0]}])
    t0 = time.time()
    _, _, n_bad = ct.apply_with_constraints(
        sroot, qroot, ev, mode="mor", num_buckets=64,
        num_partitions=_num_partitions())
    return time.time() - t0, {"n_events": n, "quarantined": n_bad}


def run_derived_replay() -> float:
    from kettleray.gen.derive import derive_events
    from kettleray.ops import cdc
    t0 = time.time()
    cdc.replay_lww(cdc.parse_validate(derive_events(SF_DIR)),
                   num_partitions=_num_partitions()).count()
    return time.time() - t0


def run_scd2() -> float:
    from kettleray.gen.derive import derive_events
    from kettleray.ops import cdc
    t0 = time.time()
    cdc.scd2_history(derive_events(SF_DIR),
                     num_partitions=_num_partitions()).count()
    return time.time() - t0


def run_skew(salted: bool) -> float:
    """Hot-key stream (30% of events on ONE key): salted vs plain replay."""
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import cdc, skew
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=500,
                         p_delete=0.05, seed=44, hot_key_share=0.3)
    t0 = time.time()
    ev = generate_events(cfg, override_num_blocks=BLOCKS)
    if salted:
        skew.replay_lww_salted(ev, num_partitions=PARTS, salt_factor=8,
                               hot_min_count=n // 50).count()
    else:
        cdc.replay_lww(ev, num_partitions=PARTS).count()
    return time.time() - t0


def run_twopass() -> float:
    """Wide-payload (1.5 KB content) replay via the shuffle-light
    two-pass variant (winners-only shuffle + filtered second scan)."""
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import cdc
    n = max(1_000_000, N_SYNTH // 2)
    cfg = EventGenConfig(n_events=n, n_repos=500, n_paths_per_repo=2000,
                         p_delete=0.05, p_redeliver=0.01, seed=42,
                         content_repeat=32)
    t0 = time.time()
    cdc.replay_lww_twopass(
        lambda columns=None: generate_events(
            cfg, override_num_blocks=BLOCKS, columns=columns),
        num_partitions=PARTS).count()
    return time.time() - t0


def run_incremental() -> float:
    """Two-batch incremental apply through the exactly-once BUCKETED sink
    (default path: copy-on-write file groups — the second commit replays
    only the buckets its keys touch and hardlinks the rest)."""
    import shutil
    import pyarrow.compute as pc
    import ray.data
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    root = "/tmp/kettleray_bench/state"
    shutil.rmtree(root, ignore_errors=True)
    n = max(200_000, N_SYNTH // 10)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=1000,
                         p_delete=0.05, seed=43)
    t0 = time.time()
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    cut = (n * 9) // 10
    # backfill commit, then a repo-local micro-batch (the realistic CDC
    # tail shape): bucketing by repo means the micro-batch rewrites only
    # the buckets of the repos it touches, hardlinking the rest.
    import pyarrow as pa
    repos = pa.array(["repo_0", "repo_1", "repo_2", "repo_3"])
    b1 = ev.map_batches(lambda b: b.filter(pc.less(b["commit_seq"], cut)),
                        batch_format="pyarrow")
    b2 = ev.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["commit_seq"], cut),
            pc.is_in(b["repo"], value_set=repos))),
        batch_format="pyarrow")
    sink.apply_incremental_bucketed(root, b1, num_buckets=64,
                                    bucket_cols=("repo",),
                                    num_partitions=_num_partitions())
    sink.apply_incremental_bucketed(root, b2, num_buckets=64,
                                    bucket_cols=("repo",),
                                    num_partitions=_num_partitions())
    return time.time() - t0


def run_trickle(mode: str) -> tuple[float, int, float, float]:
    """Trickle micro-commits: one backfill + 8 tiny repo-local commits,
    copy-on-write (``bucketed``) vs merge-on-read (``mor``). Returns
    (commit_sec, fresh_bytes_written, read_sec, changefeed_sec): COW
    re-replays + rewrites
    every touched bucket per commit (write amplification ∝ bucket size),
    MOR appends event-sized delta files (∝ batch) and pays a merge at
    read — fresh_bytes is the write-amplification signal, read_sec the
    read-amplification price."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    root = f"/tmp/kettleray_bench/trickle_{mode}"
    shutil.rmtree(root, ignore_errors=True)
    n = max(200_000, N_SYNTH // 20)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=1000,
                         p_delete=0.05, seed=49)
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    cut = (n * 9) // 10
    repos = pa.array([f"repo_{i}" for i in range(100, 104)])
    apply_fn = (sink.apply_incremental_mor if mode == "mor"
                else sink.apply_incremental_bucketed)
    b1 = ev.map_batches(lambda b: b.filter(pc.less(b["commit_seq"], cut)),
                        batch_format="pyarrow")
    apply_fn(root, b1, num_buckets=64, bucket_cols=("repo",),
             num_partitions=_num_partitions())
    tail = ev.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["commit_seq"], cut),
            pc.is_in(b["repo"], value_set=repos))),
        batch_format="pyarrow").materialize()
    k = 8
    step = (n - cut) // k
    fresh_bytes = 0
    t0 = time.time()
    for i in range(k):
        lo, hi = cut + i * step, (cut + (i + 1) * step if i < k - 1
                                  else n)
        w = tail.map_batches(
            lambda b, lo=lo, hi=hi: b.filter(pc.and_(
                pc.greater_equal(b["commit_seq"], lo),
                pc.less(b["commit_seq"], hi))),
            batch_format="pyarrow")
        man = apply_fn(root, w, num_buckets=64, bucket_cols=("repo",),
                       num_partitions=_num_partitions())
        vdir = os.path.join(root, f"v{man.version:04d}")
        for base, _, names in os.walk(vdir):
            for f in names:
                if not f.endswith(".parquet"):
                    continue
                st = os.stat(os.path.join(base, f))
                if st.st_nlink == 1:        # written, not hardlinked
                    fresh_bytes += st.st_size
    commit_sec = time.time() - t0
    t0 = time.time()
    sink.read_state(root, num_partitions=_num_partitions()).count()
    read_sec = time.time() - t0
    # change data feed across the last micro-commit: work ∝ touched
    # buckets (untouched buckets pruned by file identity, no IO)
    t0 = time.time()
    v = sink.current_version(root)
    sink.read_changes(root, v - 1, v).count()
    cdf_sec = time.time() - t0
    return commit_sec, fresh_bytes, read_sec, cdf_sec


def run_replication() -> tuple[float, float, float, float, float]:
    """Cross-lake replication: backfill a primary, bootstrap the
    replica, then 8 trickle commits each followed by a feed-driven
    delta sync — once into a COW replica, once into a MOR replica
    (delta appends, no per-sync replay job). Returns (bootstrap_sec,
    sync8_sec, sync8_mor_sec, full_resync_sec, audit_sec): sync cost
    tracks the COMMIT (touched buckets), the full-resync comparison
    line is what a non-incremental mirror pays PER refresh, and the
    parity audit is the distributed (key, sha) diff over both lakes."""
    import shutil
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    from kettleray.ops import replicate
    src = "/tmp/kettleray_bench/repl_src"
    dst = "/tmp/kettleray_bench/repl_dst"
    dstm = "/tmp/kettleray_bench/repl_dst_mor"
    dst2 = "/tmp/kettleray_bench/repl_dst_resync"
    for d in (src, dst, dstm, dst2):
        shutil.rmtree(d, ignore_errors=True)
    n = max(200_000, N_SYNTH // 20)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=1000,
                         p_delete=0.05, seed=50)
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    cut = (n * 9) // 10
    b1 = ev.map_batches(lambda b: b.filter(pc.less(b["commit_seq"], cut)),
                        batch_format="pyarrow")
    sink.apply_incremental_bucketed(src, b1, num_buckets=64,
                                    bucket_cols=("repo",),
                                    num_partitions=_num_partitions())
    t0 = time.time()
    replicate.replicate_sink(src, dst, num_partitions=_num_partitions())
    bootstrap_sec = time.time() - t0
    replicate.replicate_sink(src, dstm, mode="mor",
                             num_partitions=_num_partitions())
    # trickle commits are repo-local (the realistic CDC tail shape —
    # same protocol as run_trickle) so the feed's file-identity bucket
    # pruning and the apply's touched-bucket routing have something to
    # prune; a tail spread over every repo is a full-table refresh and
    # belongs to the full_resync comparison line instead
    import pyarrow as pa
    repos = pa.array([f"repo_{i}" for i in range(100, 104)])
    tail = ev.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["commit_seq"], cut),
            pc.is_in(b["repo"], value_set=repos))),
        batch_format="pyarrow").materialize()
    k = 8
    step = (n - cut) // k
    sync_sec = 0.0
    sync_mor_sec = 0.0
    for i in range(k):
        lo, hi = cut + i * step, (cut + (i + 1) * step if i < k - 1
                                  else n)
        w = tail.map_batches(
            lambda b, lo=lo, hi=hi: b.filter(pc.and_(
                pc.greater_equal(b["commit_seq"], lo),
                pc.less(b["commit_seq"], hi))),
            batch_format="pyarrow")
        sink.apply_incremental_bucketed(src, w, num_buckets=64,
                                        bucket_cols=("repo",),
                                        num_partitions=_num_partitions())
        t0 = time.time()
        replicate.replicate_sink(src, dst,
                                 num_partitions=_num_partitions())
        sync_sec += time.time() - t0
        t0 = time.time()
        replicate.replicate_sink(src, dstm, mode="mor",
                                 num_partitions=_num_partitions())
        sync_mor_sec += time.time() - t0
    # comparison: a non-incremental mirror re-bootstraps from the FULL
    # state every refresh — time one such refresh at the final version
    t0 = time.time()
    replicate.replicate_sink(src, dst2, num_partitions=_num_partitions())
    full_resync_sec = time.time() - t0
    t0 = time.time()
    audit = replicate.verify_replica(src, dst,
                                     num_partitions=_num_partitions())
    audit_sec = time.time() - t0
    assert audit["missing"] == audit["extra"] == audit["mismatched"] == 0
    audit_m = replicate.verify_replica(src, dstm,
                                       num_partitions=_num_partitions())
    assert audit_m["missing"] == audit_m["extra"] == \
        audit_m["mismatched"] == 0
    return bootstrap_sec, sync_sec, sync_mor_sec, full_resync_sec, \
        audit_sec


def run_bpe() -> tuple[float, float, dict]:
    """BPE tokenizer learning over the sf corpus: distributed word +
    pair statistics feeding the driver-side merge loop (vocab-bounded),
    then the actor-pool encode of the whole corpus with the learned
    merges. Returns (learn_sec, encode_sec, counts)."""
    import ray.data
    from kettleray.ops import bpe
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                 columns=["doc_id", "text"])
    rep: dict = {}
    t0 = time.time()
    merges = bpe.learn_bpe(docs, 200, top_k_vocab=200_000, report=rep)
    learn_sec = time.time() - t0
    t0 = time.time()
    n = bpe.bpe_token_counts(docs, merges,
                             concurrency=max(2, NUM_CPUS // 4)).count()
    encode_sec = time.time() - t0
    rep.update({"merges": len(merges), "docs": n,
                "docs_per_sec": round(n / encode_sec)})
    return learn_sec, encode_sec, rep


def run_sessions(num_partitions: int | None = None
                 ) -> tuple[float, int, dict]:
    """Incremental event-time sessionization (ops.sessions): 2M events
    as 4 in-order micro-batches — per-block partial sessions map-side,
    ONE key shuffle of partials per batch, watermark finalization.
    Returns (sec, n_events, counts)."""
    import shutil
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import sessions as ss
    root = "/tmp/kettleray_bench/sessions"
    shutil.rmtree(root, ignore_errors=True)
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=45)
    ev = generate_events(cfg, override_num_blocks=BLOCKS).map_batches(
        lambda t: t.append_column(
            "ev_us", pc.multiply(t["commit_seq"], 1_000_000)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    t0 = time.time()
    step = n // 4 + 1
    for k in range(4):
        lo, hi = k * step, (k + 1) * step
        b = ev.map_batches(
            lambda t, lo=lo, hi=hi: t.filter(pc.and_(
                pc.greater_equal(t["commit_seq"], lo),
                pc.less(t["commit_seq"], hi))),
            batch_format="pyarrow", zero_copy_batch=True)
        ss.ingest(root, b, time_col="ev_us",
                  gap_s=n // 2048, lateness_s=n // 512,
                  key_cols=("repo",),
                  aggs={"n": ("count", None),
                        "max_seq": ("max", "commit_seq")},
                  num_partitions=num_partitions or _num_partitions(),
                  batch_id=f"b{k}")
    sec = time.time() - t0
    fin = ss.finalized(root)
    op = ss.open_sessions(root)
    return sec, n, {
        "finalized_sessions": fin.count() if fin else 0,
        "open_sessions": op.num_rows if op is not None else 0}


def run_interval_join(num_partitions: int | None = None
                      ) -> tuple[float, dict]:
    """Stream-stream interval join over synthetic events: correlate
    each delete with the updates to the SAME repo in the preceding
    commit-time window — banded (key, band) shuffle of rows, in-
    partition pair expansion. Returns (sec, counts)."""
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops.joins import interval_join
    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=2000,
                         n_paths_per_repo=2000, p_delete=0.02, seed=46)
    ev = generate_events(cfg, override_num_blocks=BLOCKS).map_batches(
        lambda t: t.append_column(
            "ev_us", pc.multiply(t["commit_seq"], 1_000_000)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _side(op_eq):
        def fn(t, op_eq=op_eq):
            m = pc.equal(t["op"], op_eq)
            return t.filter(m).select(["repo", "ev_us", "commit_seq"])
        return fn

    dels = ev.map_batches(_side("delete"), batch_format="pyarrow",
                          zero_copy_batch=True)
    ups = ev.map_batches(_side("update"), batch_format="pyarrow",
                         zero_copy_batch=True)
    t0 = time.time()
    j = interval_join(dels, ups, by=["repo"], on="ev_us",
                      lower=-((n // 4096) * 1_000_000), upper=0,
                      right_cols=["commit_seq"],
                      num_partitions=num_partitions or _num_partitions())
    pairs = j.count()
    sec = time.time() - t0
    return sec, {"n_events": n, "pairs": pairs}


def run_join_view() -> tuple[float, float]:
    """Incrementally maintained join view: bootstrap A⋈B, then 8 tiny
    repo-local commits to A each followed by a sync — per-sync cost must
    track the COMMIT (touched buckets), not the table. Comparison line:
    a fresh full bootstrap (= the per-refresh recompute the incremental
    path avoids). Returns (sync_sec_total, recompute_sec)."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    from kettleray.ops.derived import sync_join_view
    a_root = "/tmp/kettleray_bench/jv_a"
    b_root = "/tmp/kettleray_bench/jv_b"
    dst = "/tmp/kettleray_bench/jv_view"
    dst2 = "/tmp/kettleray_bench/jv_view_recompute"
    for d in (a_root, b_root, dst, dst2):
        shutil.rmtree(d, ignore_errors=True)
    n = max(200_000, N_SYNTH // 20)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=1000,
                         p_delete=0.05, seed=51)
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    cut = (n * 9) // 10
    kw = dict(num_buckets=64, bucket_cols=("repo",),
              num_partitions=_num_partitions())

    def _b_events(ds):
        def _fn(t):
            c2 = pc.binary_join_element_wise(t["lang"], t["commit"], ":")
            return t.set_column(t.column_names.index("content"),
                                "content", c2)
        return ds.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)

    b1 = ev.map_batches(lambda b: b.filter(pc.less(b["commit_seq"], cut)),
                        batch_format="pyarrow")
    sink.apply_incremental_bucketed(a_root, b1, **kw)
    sink.apply_incremental_bucketed(b_root, _b_events(ev), **kw)
    sync_join_view(dst, a_root, b_root, how="inner", apply="mor",
                   num_partitions=_num_partitions())     # bootstrap
    repos = pa.array([f"repo_{i}" for i in range(100, 104)])
    tail = ev.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["commit_seq"], cut),
            pc.is_in(b["repo"], value_set=repos))),
        batch_format="pyarrow").materialize()
    k = 8
    step = max((n - cut) // k, 1)
    t0 = time.time()
    for i in range(k):
        lo, hi = cut + i * step, (cut + (i + 1) * step if i < k - 1
                                  else n)
        w = tail.map_batches(
            lambda b, lo=lo, hi=hi: b.filter(pc.and_(
                pc.greater_equal(b["commit_seq"], lo),
                pc.less(b["commit_seq"], hi))),
            batch_format="pyarrow")
        sink.apply_incremental_bucketed(a_root, w, **kw)
        sync_join_view(dst, a_root, b_root, how="inner", apply="mor",
                       num_partitions=_num_partitions())
    sync_sec = time.time() - t0
    t0 = time.time()
    sync_join_view(dst2, a_root, b_root, how="inner", apply="mor",
                   num_partitions=_num_partitions())     # full recompute
    recompute_sec = time.time() - t0
    return sync_sec, recompute_sec


def run_ivm() -> tuple[float, float, float]:
    """Incremental view maintenance vs full recompute: build a bucketed
    state (backfill commit + repo-local micro-commit), then time the
    maintained per-repo aggregate (only the micro-commit's touched
    buckets are rescanned; every other partial is hardlinked forward)
    against a full-scan recompute of the same view."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    from kettleray.ops import ivm
    root = "/tmp/kettleray_bench/ivm_state"
    shutil.rmtree(root, ignore_errors=True)
    n = max(200_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=200, n_paths_per_repo=1000,
                         p_delete=0.05, seed=47)
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    cut = (n * 9) // 10
    # micro-batch over MID-POPULARITY repos: the realistic CDC tail shape
    # (a commit touches a few ordinary repos, not the whole-corpus hot
    # set — touching repo_0..3 under skew=2.0 would rescan ~85% of rows
    # and measure the hot-key worst case, not incremental maintenance)
    repos = pa.array([f"repo_{i}" for i in range(100, 104)])
    b1 = ev.map_batches(lambda b: b.filter(pc.less(b["commit_seq"], cut)),
                        batch_format="pyarrow")
    b2 = ev.map_batches(
        lambda b: b.filter(pc.and_(
            pc.greater_equal(b["commit_seq"], cut),
            pc.is_in(b["repo"], value_set=repos))),
        batch_format="pyarrow")
    aggs = {"n_files": ("count", None),
            "total_chars": ("sum", _ivm_bench_chars),
            "max_seq": ("max", "last_commit_seq")}
    rc = ["content", "last_commit_seq"]
    sink.apply_incremental_bucketed(root, b1, num_buckets=64,
                                    bucket_cols=("repo",),
                                    num_partitions=_num_partitions())
    ivm.ensure_partials(root, "by_repo", ["repo"], aggs,
                        read_columns=rc)   # v1 cache (untimed)
    sink.apply_incremental_bucketed(root, b2, num_buckets=64,
                                    bucket_cols=("repo",),
                                    num_partitions=_num_partitions())
    t0 = time.time()
    ivm.read_view(root, "by_repo", ["repo"], aggs,
                  read_columns=rc).materialize()
    maintain = time.time() - t0
    t0 = time.time()
    ivm.recompute_view(root, ["repo"], aggs,
                       read_columns=rc).materialize()
    recompute = time.time() - t0
    m = ivm.partials_metrics(root, "by_repo")
    # single-node wall times undersell the asymptotics (page-cache scans
    # hide IO; two small Ray jobs carry ~1 s fixed latency each) — the
    # scale signal is the scanned fraction: maintenance reads ONLY the
    # micro-commit's touched buckets, recompute reads the whole state.
    frac = round(m["scanned_bytes"] / max(1, m["state_bytes"]), 4)
    return maintain, recompute, frac


def _ivm_bench_chars(t):
    import pyarrow.compute as pc
    return pc.cast(pc.utf8_length(t["content"]), "int64")


def run_lsh_incremental() -> tuple[float, float, float, dict]:
    """Incremental near-dup index vs batch re-run: the corpus is the sf
    documents table replicated 10x with salted text (distinct docs,
    same near-dup structure per replica). 9 replicas backfill the index
    in one commit; the 10th arrives as a CDC commit. Returns
    (backfill_sec, incremental_commit_sec, batch_rerun_sec, counts) —
    the batch number is what a nightly full re-sign of the same corpus
    costs, i.e. the work the incremental path avoids."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from kettleray.ops import dedup, incdedup
    root = "/tmp/kettleray_bench/lsh_index"
    shutil.rmtree(root, ignore_errors=True)
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"])
    R = 10

    def _replica(k):
        # a replica marker INTERLEAVED between tokens: cross-replica
        # 3-gram Jaccard drops to ~0 (every gram contains the marker),
        # intra-replica near-dup families keep their similarity — the
        # corpus is 10x the fixture with realistic dup density, not
        # 10 mutual copies of everything
        def _fn(t, k=k):
            txt = pc.replace_substring(t["text"], " ", f" zz{k} ")
            return pa.table({"doc_id": pc.add(t["doc_id"],
                                              k * 10_000_000),
                             "text": txt})
        return docs.map_batches(_fn, batch_format="pyarrow",
                                zero_copy_batch=True)

    kw = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5,
              num_buckets=128, num_partitions=_num_partitions())
    back = _replica(0).union(*[_replica(k) for k in range(1, R - 1)])
    back = back.materialize()
    last = _replica(R - 1).materialize()
    t0 = time.time()
    incdedup.apply_incremental_lsh(root, back, **kw)
    backfill_sec = time.time() - t0
    t0 = time.time()
    man = incdedup.apply_incremental_lsh(root, last, **kw)
    inc_sec = time.time() - t0
    # the alternative: full re-sign + band + verify of the whole corpus
    full = back.union(last)
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(full, "doc_id", "text", num_perm=64,
                                    bands=16, shingle_k=3,
                                    num_partitions=_num_partitions())
    dedup.jaccard_verify(pairs, full, "doc_id", "text", shingle_k=3,
                         threshold=0.5, method="join",
                         num_partitions=_num_partitions()).count()
    batch_sec = time.time() - t0
    counts = {"corpus_docs": back.count() + last.count(),
              "commit_docs": last.count(),
              "commit_new_pairs": man["counts"]["new_pairs"],
              "touched_buckets": len(man["touched_buckets"])}
    return backfill_sec, inc_sec, batch_sec, counts


def run_ann_incremental() -> tuple[float, float, float, dict]:
    """Incremental embedding-ANN index vs full rebuild: 200k synthetic
    64-dim unit vectors (deterministic splitmix64 of (vec_id, dim) —
    no external data). 90% backfill commit, then ONE CDC commit
    (inserts id%10==9, updates id%10==3 re-arriving with new vectors,
    deletes id%10==7) vs a from-scratch batch rebuild of the same
    final corpus — the nightly re-index cost the incremental path
    avoids. Returns (backfill_sec, commit_sec, rebuild_sec, counts)."""
    import shutil
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    from kettleray.gen.synthetic import _mix64
    from kettleray.ops import incann
    root = "/tmp/kettleray_bench/ann_index"
    root2 = "/tmp/kettleray_bench/ann_rebuild"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root2, ignore_errors=True)
    N, DIM = 200_000, 64

    def _vecs(t: pa.Table, keep, salt_fn) -> pa.Table:
        ids = t["id"].to_numpy().astype(np.int64)
        ids = ids[keep(ids)]
        salts = salt_fn(ids)
        cells = (ids[:, None] * DIM + np.arange(DIM)[None, :]
                 + salts[:, None] * (N * DIM))
        m = (_mix64(cells.reshape(-1), 7).astype(np.float64) / 2.0**64
             ).reshape(len(ids), DIM) * 2.0 - 1.0
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                         "embedding": pa.array(list(m),
                                               type=pa.list_(pa.float64()))})

    base = rd.range(N, override_num_blocks=max(16, NUM_CPUS))
    kw = dict(n_planes=8, seed=42, num_id_buckets=64,
              num_partitions=_num_partitions())
    zeros = lambda ids: np.zeros(len(ids), np.int64)
    backfill = base.map_batches(
        lambda t: _vecs(t, lambda i: i % 10 != 9, zeros),
        batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    incann.apply_incremental_ann(root, backfill, **kw)
    backfill_sec = time.time() - t0
    commit = base.map_batches(
        lambda t: _vecs(t, lambda i: (i % 10 == 9) | (i % 10 == 3),
                        lambda i: (i % 10 == 3).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True)
    dels = np.arange(7, N, 10, dtype=np.int64)
    t0 = time.time()
    man = incann.apply_incremental_ann(root, commit, deletes=dels, **kw)
    commit_sec = time.time() - t0
    final = base.map_batches(
        lambda t: _vecs(t, lambda i: i % 10 != 7,
                        lambda i: (i % 10 == 3).astype(np.int64)),
        batch_format="pyarrow", zero_copy_batch=True)
    t0 = time.time()
    incann.apply_incremental_ann(root2, final, **kw)
    rebuild_sec = time.time() - t0
    counts = {"n_vectors": N, "dim": DIM,
              "commit_rows": 2 * (N // 10), "deletes": int(len(dels)),
              "commit_fresh_buckets": len(man.get("touched_buckets",
                                                  []))}
    return backfill_sec, commit_sec, rebuild_sec, counts


def run_inverted_incremental() -> tuple[float, float, float, dict]:
    """Incremental inverted text index vs batch rebuild: the sf
    documents table replicated 10x with replica-salted ids and a
    replica token appended (distinct vocab tail per replica so fresh
    commits touch real shards). 9 replicas backfill; the 10th arrives
    as a CDC commit (plus deletes of replica 0's id%10==7). Returns
    (backfill_sec, commit_sec, rebuild_sec, counts); the rebuild is
    the nightly full re-tokenize the incremental path avoids."""
    import shutil
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from kettleray.ops import incinv, invindex
    root = "/tmp/kettleray_bench/inv_index"
    root2 = "/tmp/kettleray_bench/inv_rebuild"
    shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(root2, ignore_errors=True)
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"])
    R = 10

    def _replica(k):
        def _fn(t, k=k):
            txt = pc.binary_join_element_wise(
                pc.cast(t["text"], pa.string()), f"zzrep{k}", " ")
            return pa.table({"doc_id": pc.add(t["doc_id"],
                                              k * 10_000_000),
                             "text": txt})
        return docs.map_batches(_fn, batch_format="pyarrow",
                                zero_copy_batch=True)

    kw = dict(id_col="doc_id", text_col="text", num_shards=64,
              num_id_buckets=32, num_partitions=_num_partitions())
    back = _replica(0).union(*[_replica(k) for k in range(1, R - 1)])
    back = back.materialize()
    last = _replica(R - 1).materialize()
    t0 = time.time()
    incinv.apply_incremental_inverted(root, back, **kw)
    backfill_sec = time.time() - t0
    import numpy as np
    dels = np.arange(7, 10_000, 10, dtype=np.int64)
    t0 = time.time()
    man = incinv.apply_incremental_inverted(root, last,
                                            deletes=dels, **kw)
    commit_sec = time.time() - t0
    full = back.union(last)
    t0 = time.time()
    invindex.write_inverted_index(full, root2, "doc_id", "text",
                                  num_shards=64)
    rebuild_sec = time.time() - t0
    res, _, _ = incinv.query_incremental_inverted(
        root, ["merge", "sort"], mode="and")
    counts = {"corpus_docs": back.count() + last.count(),
              "commit_docs": last.count(),
              "commit_postings": man["counts"]["new_postings"],
              "touched_shards": len(man["touched_shards"]),
              "query_hits": res.num_rows}
    return backfill_sec, commit_sec, rebuild_sec, counts


def run_dedup_corpus() -> tuple[float, dict]:
    """Flagship near-dup corpus dedup end-to-end on sf documents with
    the round-4 sketch-join verify (sign once -> band pairs -> sketch
    verify -> CC -> left_anti representative filter)."""
    import ray.data as rd
    from kettleray.ops import dedup
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"]).materialize()
    n = docs.count()
    t0 = time.time()
    kept = dedup.dedup_corpus(docs, "doc_id", "text", num_perm=64,
                              bands=16, shingle_k=3, threshold=0.5,
                              num_partitions=32).count()
    return time.time() - t0, {"corpus_docs": n, "survivors": kept}


def run_lm_perplexity() -> tuple[float, dict]:
    """Bigram Stupid-Backoff LM scoring of the whole corpus under its
    own model: two count shuffles + three hash joins + one doc-keyed
    reduce — the CCNet-style perplexity quality gate."""
    import ray.data as rd
    from kettleray.ops import textstats
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"]).materialize()
    n = docs.count()
    t0 = time.time()
    scored = textstats.bigram_backoff_logprob(
        docs, "doc_id", "text", num_partitions=32).count()
    return time.time() - t0, {"corpus_docs": n, "scored_docs": scored}


def run_decontaminate() -> tuple[float, float, dict]:
    """Bloom-prefiltered vs exact-join decontamination at a
    production-shaped ratio: train = the non-eval docs replicated 20x
    (replica-salted ids, text unchanged — semi join dedups grams for
    free), eval = 5% of docs. Outputs are bit-identical (the exact
    verify join kills bloom false positives); the bloom line is the
    engine path at lake scale, the join line the all-to-all exchange
    cost it avoids. Also records how many train gram rows survive the
    broadcast prefilter (the join's residual input)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    from kettleray.ops import bloom, dedup
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"])

    def _mod_is(eq):
        def _fn(t, eq=eq):
            m = pc.subtract(t["doc_id"],
                            pc.multiply(pc.divide(t["doc_id"], 20), 20))
            return t.filter(pc.equal(m, 0) if eq
                            else pc.not_equal(m, 0))
        return docs.map_batches(_fn, batch_format="pyarrow",
                                zero_copy_batch=True)

    base_train = _mod_is(eq=False)
    R = 20

    def _replica(k):
        return base_train.map_batches(
            lambda t, k=k: pa.table({
                "doc_id": pc.add(t["doc_id"], k * 10_000_000),
                "text": t["text"]}),
            batch_format="pyarrow", zero_copy_batch=True)

    train = _replica(0).union(*[_replica(k) for k in range(1, R)])
    train = train.materialize()
    ev = _mod_is(eq=True).materialize()
    kw = dict(n=5, threshold=0.5, num_partitions=_num_partitions())
    t0 = time.time()
    out_b = dedup.decontaminate(train, ev, "text", "doc_id",
                                method="bloom", **kw).materialize()
    bloom_sec = time.time() - t0
    t0 = time.time()
    out_j = dedup.decontaminate(train, ev, "text", "doc_id",
                                method="join", **kw).materialize()
    join_sec = time.time() - t0
    # prefilter effectiveness: train gram rows entering the semi join
    ev_grams = dedup.doc_ngrams_distinct(ev, "text", "doc_id",
                                         n=5).materialize()
    flt = bloom.build_bloom(ev_grams.select_columns(["gram"]), "gram")
    tr_grams = dedup.doc_ngrams_distinct(train, "text", "doc_id",
                                         n=5).select_columns(["gram"])
    survivors = bloom.bloom_filter_hits(tr_grams, "gram", flt).count()
    counts = {"train_docs": train.count(), "eval_docs": ev.count(),
              "train_grams": tr_grams.count(),
              "eval_grams": flt["n_keys"],
              "grams_past_prefilter": survivors,
              "rows_equal": out_b.count() == out_j.count()}
    return bloom_sec, join_sec, counts


def run_pruned_scan_and_dml() -> tuple[dict, dict]:
    """Zone-map pruned scan vs full scan+filter on a lang-clustered
    state, then set-based DML (DELETE / UPDATE as CDC commits) on the
    same table. Returns (timings, pruning report)."""
    import shutil
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.io import sink
    from kettleray.ops import dml
    root = "/tmp/kettleray_bench/pruned_scan"
    shutil.rmtree(root, ignore_errors=True)
    n = max(1_000_000, N_SYNTH // 8)
    cfg = EventGenConfig(n_events=n, n_repos=500, n_paths_per_repo=2000,
                         p_delete=0.05, seed=57)
    ev = generate_events(cfg, override_num_blocks=max(16, NUM_CPUS * 2))
    sink.apply_incremental_bucketed(root, ev, num_buckets=64,
                                    num_partitions=_num_partitions())
    # rows_per_file must be a FRACTION of a bucket's rows or every
    # bucket stays one file and zone maps have nothing to prune
    # (state rows ≈ n/2 over 64 buckets -> aim ~8 files per bucket)
    sink.cluster_state(root, ("lang",),
                       rows_per_file=max(1_000, n // 2 // 64 // 8))
    filters = [("lang", "==", "rs")]

    def _pruned():
        rep: dict = {}
        t0 = time.time()
        sink.scan_state(root, filters, report=rep).count()
        return time.time() - t0, rep

    def _full():
        import pyarrow.compute as pc
        t0 = time.time()
        sink._drop_bucket(sink.read_state(root)).map_batches(
            lambda t: t.filter(pc.equal(t["lang"], "rs")),
            batch_format="pyarrow", batch_size=None).count()
        return time.time() - t0

    _pruned()                                   # warmup
    pruned_sec, rep = min(_pruned() for _ in range(2))
    _full()
    full_sec = min(_full() for _ in range(2))

    # point lookups: key-Bloom sidecars vs plain bucket-routed reads.
    # After lang-clustering a bucket holds ~8 files that ALL span the
    # key space, so without blooms every lookup opens all of them.
    from kettleray.io import blooms
    binfo = blooms.build_key_blooms(root)
    keys = [(f"repo_{i % 500:04d}", f"src/f_{(7 * i) % 2000:05d}.py")
            for i in range(100)]
    keys += [(f"absent_{i}", f"nope/{i}.py") for i in range(100)]
    # resolve the generator's real key shape from one state row
    sample = sink.read_state(root).take(1)[0]
    keys[0] = (sample["repo"], sample["path"])

    def _lookups_reader():
        rdr = sink.StateReader(root)
        rep: dict = {}
        t0 = time.time()
        for r, p in keys:
            rdr.lookup(r, p, report=rep)
        return time.time() - t0, rep

    def _lookups_plain():
        t0 = time.time()
        for r, p in keys:
            sink.lookup_state(root, r, p, use_blooms=False)
        return time.time() - t0

    _lookups_reader()                           # warmup (page cache)
    bloom_sec, brep = _lookups_reader()
    plain_sec = _lookups_plain()
    rep["lookup_bloom_skip_frac"] = round(
        brep["files_bloom_skipped"] / max(1, brep["files_bloom_probed"]),
        3)
    rep["bloom_sidecar_bytes"] = binfo["built_bytes"]

    t0 = time.time()
    man, _ = dml.delete_where(root, [("lang", "==", "go")])
    delete_sec = time.time() - t0
    t0 = time.time()
    dml.update_where(root, [("lang", "==", "ts")],
                     {"content": "[REDACTED]"})
    update_sec = time.time() - t0
    timings = {"pruned_scan": round(pruned_sec, 2),
               "full_scan_filter": round(full_sec, 2),
               "point_lookups_bloom": round(bloom_sec, 2),
               "point_lookups_plain": round(plain_sec, 2),
               "dml_delete_where": round(delete_sec, 2),
               "dml_update_where": round(update_sec, 2)}
    return timings, rep


def run_substring_dedup() -> tuple[float, float, dict]:
    """Cross-doc substring dedup over the sf documents replicated 8x
    (exact replicas: worst-case duplication — every doc's text repeats
    in 7 others). Times the span-stats pass and the full cut rewrite,
    both in hashed (production) mode."""
    import pyarrow.compute as pc
    import ray.data as rd
    from kettleray.ops import dedup
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"])

    def _rep(k):
        return docs.map_batches(
            lambda t, k=k: t.set_column(
                t.column_names.index("doc_id"), "doc_id",
                pc.add(t["doc_id"], k * 10_000_000)),
            batch_format="pyarrow", zero_copy_batch=True)

    corpus = _rep(0)
    for k in range(1, 8):
        corpus = corpus.union(_rep(k))
    corpus = corpus.materialize()
    n = corpus.count()

    def _stats():
        t0 = time.time()
        dedup.duplicate_span_stats(corpus, "doc_id", "text", k=8,
                                   hashed=True,
                                   num_partitions=_num_partitions()
                                   ).count()
        return time.time() - t0

    def _cut():
        t0 = time.time()
        dedup.cut_duplicate_spans(corpus, "doc_id", "text", k=8,
                                  hashed=True,
                                  num_partitions=_num_partitions()
                                  ).count()
        return time.time() - t0

    _stats()
    stats_sec = min(_stats() for _ in range(2))
    cut_sec = min(_cut() for _ in range(2))
    return stats_sec, cut_sec, {"docs": n}


def run_sketches() -> tuple[float, float, float, dict]:
    """Approximate aggregates over the synthetic stream: HLL distinct
    keys (zero shuffle, one 16 KB partial per block) vs the exact
    distinct (hash exchange of every key), plus the Misra-Gries
    hot-key detector (zero shuffle) on the same input."""
    from kettleray.gen.synthetic import EventGenConfig, generate_events
    from kettleray.ops import aggregates as ag
    from kettleray.ops import sketches as sk
    from kettleray.ops import skew

    n = max(1_000_000, N_SYNTH // 4)
    cfg = EventGenConfig(n_events=n, n_repos=500,
                         n_paths_per_repo=2000, p_delete=0.05,
                         p_redeliver=0.01, seed=42,
                         hot_key_share=0.05)
    ev = generate_events(cfg, override_num_blocks=BLOCKS) \
        .select_columns(["repo", "path"]).materialize()

    def _hll():
        t0 = time.time()
        est = sk.approx_distinct(ev, ["repo", "path"], p=14)
        return time.time() - t0, est

    def _exact():
        t0 = time.time()
        cnt = ag.unique_rows(ev, ["repo", "path"],
                             num_partitions=_num_partitions()).count()
        return time.time() - t0, cnt

    def _hot():
        t0 = time.time()
        skew.detect_hot_keys(ev, top_k=8, min_count=n // 100,
                             method="sketch", sketch_k=2048)
        return time.time() - t0

    hll_sec, est = min(_hll() for _ in range(2))
    exact_sec, cnt = min(_exact() for _ in range(2))
    hot_sec = min(_hot() for _ in range(2))
    return hll_sec, exact_sec, hot_sec, {
        "n_events": n, "approx": round(est), "exact": cnt,
        "rel_err": round(abs(est - cnt) / cnt, 4)}


# Comparison lines measure the COST THE ENGINE AVOIDS (batch re-runs,
# recompute baselines, un-salted hot-key replay, unpruned scans) — they
# are not engine pipelines, so round-over-round suite totals compare
# engine vs engine.
COMPARISON_LINES = frozenset({
    "lsh_batch_rerun", "trickle_commits_cow", "ivm_recompute",
    "skew_hotkey_plain", "ann_batch_rebuild", "inverted_batch_rebuild",
    "decontaminate_join", "join_view_recompute", "full_scan_filter",
    "point_lookups_plain", "exact_distinct_shuffle",
    "replica_full_resync",
})


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for ncpu in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            out = subprocess.run(
                [sys.executable, __file__, "--headline-only"], env=env,
                capture_output=True, text=True, check=True).stdout
            results[ncpu] = json.loads(out.strip().splitlines()[-1])
        thr8 = results[8]["events_per_sec"]
        thr32 = results[32]["events_per_sec"]
        print(json.dumps({
            "sec_8": results[8]["value"], "sec_32": results[32]["value"],
            "events_per_sec_8": thr8, "events_per_sec_32": thr32,
            "scaling_efficiency": round((thr32 / thr8) / 4, 3),
            "n_events": N_SYNTH,
        }))
        return

    import ray
    _init_ray()
    if "--headline-only" in sys.argv:
        # untimed warmup: spawns worker processes + hash-shuffle aggregator
        # actors and warms the page cache; then best-of-3 timed runs
        # (per-pipeline aggregator-actor spawn adds ~2x run-to-run noise).
        run_synthetic_replay(n_events=100_000)
        sec, n = min(run_synthetic_replay() for _ in range(3))
        print(json.dumps({"metric": "synthetic_cdc_replay", "value": round(sec, 2),
                          "unit": "sec", "events_per_sec": round(n / sec),
                          "num_cpus": NUM_CPUS, "n_events": n}))
        ray.shutdown()
        return

    queries = {}
    run_synthetic_replay(n_events=100_000)     # untimed session warmup
    t_all = time.time()
    sec, n = min(run_synthetic_replay() for _ in range(2))
    queries["synthetic_replay"] = round(sec, 2)
    eps = round(n / sec)
    queries["derived_replay"] = round(run_derived_replay(), 2)
    win_sec, win_n = run_window()
    queries["window_running_events"] = round(win_sec, 2)
    et_sec, et_n, et_counts = run_eventtime()
    queries["eventtime_windows"] = round(et_sec, 2)
    ct_sec, ct_counts = run_constrained_apply()
    queries["constrained_apply"] = round(ct_sec, 2)
    sess_sec, sess_n, sess_counts = run_sessions()
    queries["sessions_ingest4"] = round(sess_sec, 2)
    ij_sec, ij_counts = run_interval_join()
    queries["interval_join_events"] = round(ij_sec, 2)
    queries["scd2_history"] = round(run_scd2(), 2)
    queries["incremental_apply"] = round(run_incremental(), 2)
    queries["skew_hotkey_salted"] = round(run_skew(salted=True), 2)
    queries["skew_hotkey_plain"] = round(run_skew(salted=False), 2)
    queries["twopass_wide_payload"] = round(run_twopass(), 2)
    ivm_maintain, ivm_recompute, ivm_frac = run_ivm()
    queries["ivm_maintain"] = round(ivm_maintain, 2)
    queries["ivm_recompute"] = round(ivm_recompute, 2)
    cow_sec, cow_bytes, cow_read, cow_cdf = run_trickle("bucketed")
    mor_sec, mor_bytes, mor_read, mor_cdf = run_trickle("mor")
    queries["trickle_commits_cow"] = round(cow_sec, 2)
    queries["trickle_commits_mor"] = round(mor_sec, 2)
    queries["changefeed_cow"] = round(cow_cdf, 2)
    queries["changefeed_mor"] = round(mor_cdf, 2)
    lsh_back, lsh_inc, lsh_batch, lsh_counts = run_lsh_incremental()
    queries["lsh_index_backfill"] = round(lsh_back, 2)
    queries["lsh_commit_incremental"] = round(lsh_inc, 2)
    queries["lsh_batch_rerun"] = round(lsh_batch, 2)
    ann_back, ann_inc, ann_rebuild, ann_counts = run_ann_incremental()
    queries["ann_index_backfill"] = round(ann_back, 2)
    queries["ann_commit_incremental"] = round(ann_inc, 2)
    queries["ann_batch_rebuild"] = round(ann_rebuild, 2)
    inv_back, inv_inc, inv_rebuild, inv_counts = \
        run_inverted_incremental()
    queries["inverted_index_backfill"] = round(inv_back, 2)
    queries["inverted_commit_incremental"] = round(inv_inc, 2)
    queries["inverted_batch_rebuild"] = round(inv_rebuild, 2)
    jv_sync, jv_recompute = run_join_view()
    queries["join_view_sync8"] = round(jv_sync, 2)
    queries["join_view_recompute"] = round(jv_recompute, 2)
    rep_boot, rep_sync, rep_sync_mor, rep_resync, rep_audit = \
        run_replication()
    queries["replica_bootstrap"] = round(rep_boot, 2)
    queries["replication_sync8"] = round(rep_sync, 2)
    queries["replication_sync8_mor"] = round(rep_sync_mor, 2)
    queries["replica_full_resync"] = round(rep_resync, 2)
    queries["replica_parity_audit"] = round(rep_audit, 2)
    bpe_learn, bpe_encode, bpe_counts = run_bpe()
    queries["bpe_learn"] = round(bpe_learn, 2)
    queries["bpe_encode_corpus"] = round(bpe_encode, 2)
    dec_bloom, dec_join, dec_counts = run_decontaminate()
    queries["decontaminate_bloom"] = round(dec_bloom, 2)
    queries["decontaminate_join"] = round(dec_join, 2)
    dc_sec, dc_counts = run_dedup_corpus()
    queries["dedup_corpus_sketch"] = round(dc_sec, 2)
    lm_sec, lm_counts = run_lm_perplexity()
    queries["lm_perplexity"] = round(lm_sec, 2)
    scan_timings, scan_report = run_pruned_scan_and_dml()
    queries.update(scan_timings)
    sub_stats, sub_cut, sub_counts = run_substring_dedup()
    queries["substring_span_stats"] = round(sub_stats, 2)
    queries["substring_dedup_cut"] = round(sub_cut, 2)
    hll_sec, exact_sec, hot_sec, sk_counts = run_sketches()
    queries["approx_distinct_hll"] = round(hll_sec, 2)
    queries["exact_distinct_shuffle"] = round(exact_sec, 2)
    queries["hotkey_detect_sketch"] = round(hot_sec, 2)
    total = round(time.time() - t_all, 2)
    engine = round(sum(v for k, v in queries.items()
                       if k not in COMPARISON_LINES), 2)
    comparison = round(sum(v for k, v in queries.items()
                           if k in COMPARISON_LINES), 2)
    print(json.dumps({
        "metric": "cdc_pipeline_suite_sec",
        "value": total, "unit": "sec", "queries": queries,
        "suite_engine_sec": engine,
        "suite_comparison_sec": comparison,
        "sf": SF_DIR, "num_cpus": NUM_CPUS,
        "events_per_sec": eps, "n_synthetic_events": n,
        "ivm_scanned_fraction": ivm_frac,
        "trickle_fresh_bytes_cow": cow_bytes,
        "trickle_fresh_bytes_mor": mor_bytes,
        "trickle_read_sec_cow": round(cow_read, 2),
        "trickle_read_sec_mor": round(mor_read, 2),
        "lsh_index": lsh_counts,
        "ann_index": ann_counts,
        "inverted_index": inv_counts,
        "decontaminate": dec_counts,
        "pruned_scan": scan_report,
        "substring_dedup": sub_counts,
        "sketches": sk_counts,
        "eventtime": {**et_counts, "n_events": et_n},
        "sessions": {**sess_counts, "n_events": sess_n},
        "interval_join": ij_counts,
        "constrained_apply": ct_counts,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
