"""Ray Data execution-context tuning for the CDC engine.

Centralizes the DataContext knobs so every entry point (tests, bench,
__ray_entry__) runs with the same execution profile. Never calls
``ray.init`` — sessions are owned by the driver / test fixture / bench.
"""

from __future__ import annotations

from ray.data.context import DataContext, ShuffleStrategy

# Default number of hash partitions for key-based shuffles. On a real
# cluster this should be ~2-4x total cores so each partition block stays
# well under target_max_block_size even at 10^10 events; single-node tests
# override it downward.
DEFAULT_NUM_PARTITIONS = 64


def configure_ray_data(
    *,
    target_max_block_size: int = 128 * 1024 * 1024,
    quiet: bool = True,
) -> DataContext:
    """Apply the engine's DataContext profile and return the context.

    - HASH_SHUFFLE strategy: required for ``Dataset.repartition(keys=...)``
      (key-based hash partitioning), and is the scalable shuffle for the
      groupby-heavy CDC pipelines (one aggregator per partition; no global
      sort barrier).
    - preserve_order=False: commit ordering is explicit data (commit_seq),
      never an executor property (SURVEY.md §2.10), so the executor is free
      to reorder blocks for throughput.
    """
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = False
    # Size the hash-shuffle defaults to the ACTUAL cluster. Ray's
    # defaults (parallelism=200, up to 64 aggregator actors) assume a
    # large cluster; on a small session every default-partition groupby
    # pays a ~30-60 s aggregator-actor spawn storm. 2 partitions/core
    # keeps partition blocks bounded while aggregators ≈ cores avoids
    # oversubscription; both grow automatically with cluster size.
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            ctx.default_hash_shuffle_parallelism = max(2 * cpus, 8)
            ctx.max_hash_shuffle_aggregators = max(cpus, 4)
    except Exception:
        pass
    if quiet:
        ctx.enable_progress_bars = False
        ctx.execution_options.verbose_progress = False
    return ctx


def auto_pool(lo: int = 1, *, per_actor_cpus: int = 1,
              floor: int = 8) -> int:
    """FIXED actor-pool size tracking the CLUSTER, not a constant.

    ``max(lo, cluster_cpus // per_actor_cpus)`` — the per-stage analog
    of the aggregator sizing in :func:`configure_ray_data`. Two
    observed failure modes this replaces:

    - a fixed ``concurrency=(1, 8)`` caps a stateful stage at 8 cores
      no matter the cluster — at 4x the nodes the stage runs at
      exactly the same speed and the job's scaling efficiency
      inherits the cap;
    - an AUTOSCALING range ``(1, N)`` was measured sitting at ONE
      active actor for minutes on a fully-backlogged 32-block
      MinHasher stage (Ray 2.49 pool upscaling never fired) — the
      pool floor, not the cap, is what the stage actually gets.

    A fixed size spawns the pool up front: deterministic parallelism,
    and the spawn cost (~tens of ms per lightweight actor, paid in
    parallel) amortizes over any non-trivial stage. The pool leaves
    ~1/8 of the cluster (min 2 cores) unreserved: a pool that claims
    EVERY core starves the non-fused upstream stages feeding it in
    the same streaming execution — observed as a full deadlock (32
    idle signer actors, load 0.3, zero progress) when a
    repartition -> actor-pool chain ran unfenced. Falls back to
    ``floor`` with no Ray session (schema-inference contexts)."""
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", floor))
            usable = max(1, cpus - max(2, cpus // 8))
            return max(lo, usable // max(per_actor_cpus, 1))
    except Exception:
        pass
    return floor
