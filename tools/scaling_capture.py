"""Fresh-process scaling captures at two parallelism levels with steal
probes — the sandbox stand-in for BASELINE.json's N vs 4N node
criterion, extended beyond the headline replay to the SHUFFLE-JOIN-HEAVY
pipelines (dedup_corpus: two shuffles + two joins + CC iterations;
decontaminate: gram shuffle + hash-partitioned semi join).

Protocol (the record-and-discount discipline from BASELINE.md):
  1. single-thread steal probe (20M-iter loop, clean host ~24-34 M/s)
  2. job at 8 cpus in a FRESH process (untimed warmup + best-of-2)
  3. job at 32 cpus in a FRESH process (same config, same input)
  4. steal probe again
A capture with probe readings far below the clean band, or with the two
legs straddling a host-noise transition, should be recorded and
discounted, not deleted.

Usage:
  python tools/scaling_capture.py dedup_corpus decontaminate
  python tools/scaling_capture.py --job dedup_corpus --cpus 8   # worker
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = int(os.environ.get("KETTLERAY_SCALE_REPLICAS", "16"))
LEVELS = (8, 32)


def probe(iters: int = 20_000_000) -> float:
    """Single-thread CPU-steal probe: M iter/s of a pure-python loop."""
    t0 = time.time()
    x = 0
    for i in range(iters):
        x += i
    return round(iters / (time.time() - t0) / 1e6, 1)


def _spin(iters: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(iters):
        x += i
    return iters / (time.time() - t0) / 1e6


def probe_wide(levels=LEVELS, iters: int = 20_000_000) -> dict:
    """Multi-core steal/turbo probe: per-proc M iter/s at each
    parallelism level. A single-core probe misses what a 4N leg
    actually experiences — hosts deliver LOWER per-core throughput at
    full width (turbo falloff + multi-core steal), which caps the
    measurable (T_4N/T_N)/4 of a CPU-bound job below 1.0 regardless of
    the engine. The HARDWARE CEILING on measured efficiency is
    (agg_4N / agg_N) / 4; report raw efficiency alongside it, and
    raw/ceiling as the algorithm-attributable efficiency."""
    import multiprocessing as mp
    out = {}
    for n in levels:
        with mp.Pool(n) as p:
            rates = p.map(_spin, [iters] * n)
        out[n] = {"per_proc_M": round(sum(rates) / len(rates), 1),
                  "min_M": round(min(rates), 1),
                  "agg_M": round(sum(rates), 1)}
    lo, hi = min(levels), max(levels)
    out["hw_ceiling"] = round(
        (out[hi]["agg_M"] / out[lo]["agg_M"]) / (hi / lo), 3)
    return out


def _replicated_docs(k_from: int, k_to: int):
    """sf documents replicated with an interleaved per-replica marker:
    cross-replica 3-gram Jaccard ~0, intra-replica near-dup structure
    preserved. Replication happens IN-TASK (one map_batches emitting
    k_to-k_from transformed copies per input batch) — the previous
    k-way ``union`` of per-replica datasets built a k-branch DAG whose
    plan/scheduling work pinned the DRIVER at 100% of one core while
    the pool idled, which is exactly the wrong thing to time in a
    scaling capture."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"]).repartition(32)
    ks = list(range(k_from, k_to))

    def _fn(t: "pa.Table") -> "pa.Table":
        outs = []
        for k in ks:
            outs.append(pa.table({
                "doc_id": pc.add(t["doc_id"], k * 10_000_000),
                "text": pc.replace_substring(t["text"], " ",
                                             f" zz{k} ")}))
        return pa.concat_tables(outs)

    return docs.map_batches(_fn, batch_format="pyarrow",
                            zero_copy_batch=True)


def _cluster_partitions() -> int:
    """Partition count by the SAME rule at every cluster size (2x
    cores — context.DEFAULT_NUM_PARTITIONS guidance): the scaling
    criterion compares one JOB at two cluster sizes, and real
    ``ray job submit`` deployments derive partitioning from the
    cluster; freezing it at the small-cluster value caps the 4N leg's
    reduce parallelism by construction (measured below)."""
    import ray
    return 2 * int(ray.cluster_resources().get("CPU", 8))


def job_dedup_corpus() -> tuple[float, int]:
    from kettleray.ops import dedup
    corpus = _replicated_docs(0, REPLICAS).materialize()
    n = corpus.count()
    t0 = time.time()
    dedup.dedup_corpus(corpus, "doc_id", "text", num_perm=64, bands=16,
                       shingle_k=3, threshold=0.5,
                       num_partitions=_cluster_partitions(),
                       verify_method=os.environ.get(
                           "KETTLERAY_VERIFY_METHOD", "sketch")).count()
    return time.time() - t0, n


def job_decontaminate() -> tuple[float, int]:
    from kettleray.ops import dedup
    train = _replicated_docs(0, REPLICAS).materialize()
    ev = _replicated_docs(REPLICAS, REPLICAS + 1).materialize()
    n = train.count() + ev.count()
    t0 = time.time()
    dedup.decontaminate(train, ev, "text", "doc_id", n=8,
                        num_partitions=_cluster_partitions()).count()
    return time.time() - t0, n


def job_replay() -> tuple[float, int]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    return bench.run_synthetic_replay()


def job_sessions() -> tuple[float, int]:
    """Round-5 op under the same two-level protocol: 4 micro-batch
    session ingests (per-block partial sessions + one key shuffle of
    partials + distributed state writes per batch)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    sec, n, _counts = bench.run_sessions(
        num_partitions=_cluster_partitions())
    return sec, n


def job_interval_join() -> tuple[float, int]:
    """Round-5 op: one banded (key, band) exchange + in-partition pair
    expansion — the single-shuffle shape, expected to scale like the
    replay."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    sec, counts = bench.run_interval_join(
        num_partitions=_cluster_partitions())
    return sec, counts["n_events"]


JOBS = {"dedup_corpus": job_dedup_corpus,
        "decontaminate": job_decontaminate,
        "replay": job_replay,
        "sessions": job_sessions,
        "interval_join": job_interval_join}


def _run_worker(name: str, cpus: int) -> None:
    import ray
    from kettleray import configure_ray_data
    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             logging_level="ERROR")
    # RULE-DERIVED config at every parallelism level: identical JOB,
    # identical RULE (configure_ray_data sizes aggregators = cores and
    # parallelism = 2x cores from the live cluster) — how a real
    # `ray job submit` deployment configures N vs 4N clusters. Two
    # earlier protocols both produced artifacts, recorded in
    # BASELINE.md: knobs frozen at the SMALL-cluster values cap the 4N
    # leg's shuffle/reduce width (measured 0.50/0.40 efficiency); and
    # at 80k docs (before the 64-replica corpus) aggregator-spawn
    # storms swamped the compute in the other direction (77.6 s @8 vs
    # 131.3 s @32). Rule-derived knobs + a compute-dominated corpus is
    # the honest shape of the two-cluster-size criterion.
    configure_ray_data()
    fn = JOBS[name]
    fn()                                   # untimed warmup
    sec, units = min(fn() for _ in range(2)), None
    if isinstance(sec, tuple):
        sec, units = sec
    print(json.dumps({"sec": round(sec, 2), "units": units,
                      "cpus": cpus}))
    ray.shutdown()


def main() -> None:
    if "--job" in sys.argv:
        name = sys.argv[sys.argv.index("--job") + 1]
        cpus = int(sys.argv[sys.argv.index("--cpus") + 1])
        _run_worker(name, cpus)
        return
    names = [a for a in sys.argv[1:] if not a.startswith("-")] \
        or ["dedup_corpus", "decontaminate"]
    for name in names:
        cap: dict = {"job": name, "sf": SF_DIR, "replicas": REPLICAS,
                     "probe_before_M": probe()}
        for cpus in LEVELS:
            out = subprocess.run(
                [sys.executable, __file__, "--job", name,
                 "--cpus", str(cpus)],
                capture_output=True, text=True, check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            cap[f"sec_{cpus}"] = r["sec"]
            if r.get("units"):
                cap[f"units_per_sec_{cpus}"] = round(r["units"] / r["sec"])
            cap["units"] = r.get("units")
        cap["probe_after_M"] = probe()
        lo, hi = LEVELS
        cap["scaling_efficiency"] = round(
            (cap[f"sec_{lo}"] / cap[f"sec_{hi}"]) / (hi / lo), 3)
        print(json.dumps(cap))


if __name__ == "__main__":
    main()
