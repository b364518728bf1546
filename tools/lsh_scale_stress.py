"""LSH-index scale stress (round-3 judge ask #5): backfill 500k-1M docs,
then trickle commits at growing corpus size — the claim under test is
that COMMIT LATENCY TRACKS THE COMMIT, NOT THE CORPUS (flat curve), and
that compaction + gc keep fragments/bucket and disk bounded.

Corpus: the sf documents table replicated R times with an interleaved
per-replica marker (cross-replica Jaccard ~0, intra-replica near-dup
structure preserved — same construction as bench.run_lsh_incremental).

Prints one JSON line per phase:
  {"phase": "backfill", "docs": N, "sec": S}
  {"phase": "commit", "i": k, "corpus_docs": N, "commit_docs": n,
   "sec": S, "new_pairs": p, "touched_buckets": b}
  {"phase": "fragments", "when": "before|after", ...lsh_fragment_stats}
  {"phase": "compact", "sec": S, ...}
  {"phase": "gc", "deleted_versions": [...], "bytes_before": B,
   "bytes_after": B2}

Usage: python tools/lsh_scale_stress.py [--replicas 100] [--commits 8]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _arg(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def _du(path: str) -> int:
    total = 0
    for base, _, names in os.walk(path):
        for f in names:
            try:
                st = os.stat(os.path.join(base, f))
            except OSError:
                continue
            total += st.st_size // max(st.st_nlink, 1)  # hardlink-aware
    return total


def main() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data as rd
    from kettleray import configure_ray_data
    from kettleray.ops import incdedup

    replicas = _arg("--replicas", 100)      # 100 x 5000 = 500k docs
    n_commits = _arg("--commits", 8)
    ray.init(address="local", num_cpus=NUM_CPUS,
             include_dashboard=False, logging_level="ERROR")
    configure_ray_data()
    root = "/tmp/kettleray_bench/lsh_scale"
    shutil.rmtree(root, ignore_errors=True)
    docs = rd.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                           columns=["doc_id", "text"])
    per_replica = docs.count()

    def _rep_range(k_from, k_to):
        """Replicate IN-TASK (one map_batches emitting every replica
        per input batch) — a k-way union DAG pins the driver at one
        core while the pool idles (same fix as scaling_capture)."""
        ks = list(range(k_from, k_to))

        def _fn(t):
            return pa.concat_tables([pa.table({
                "doc_id": pc.add(t["doc_id"], k * 10_000_000),
                "text": pc.replace_substring(t["text"], " ",
                                             f" zz{k} ")})
                for k in ks])
        return docs.repartition(32).map_batches(
            _fn, batch_format="pyarrow", zero_copy_batch=True)

    def _rep(k):
        return _rep_range(k, k + 1)

    kw = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5,
              num_buckets=128, num_partitions=16)
    n_back = replicas - n_commits
    back = _rep_range(0, n_back).materialize()
    t0 = time.time()
    incdedup.apply_incremental_lsh(root, back, **kw)
    print(json.dumps({"phase": "backfill",
                      "docs": per_replica * n_back,
                      "sec": round(time.time() - t0, 2)}), flush=True)

    # trickle commits at growing corpus size: flat sec == the claim
    for i in range(n_commits):
        k = n_back + i
        commit = _rep(k).materialize()
        t0 = time.time()
        man = incdedup.apply_incremental_lsh(root, commit, **kw)
        print(json.dumps({
            "phase": "commit", "i": i,
            "corpus_docs": per_replica * (k + 1),
            "commit_docs": per_replica,
            "sec": round(time.time() - t0, 2),
            "new_pairs": man["counts"]["new_pairs"],
            "touched_buckets": len(man["touched_buckets"]),
        }), flush=True)

    stats = incdedup.lsh_fragment_stats(root)
    print(json.dumps({"phase": "fragments", "when": "before", **stats}),
          flush=True)
    t0 = time.time()
    res = incdedup.compact_lsh(root, num_partitions=16)
    compact_sec = round(time.time() - t0, 2)
    stats2 = incdedup.lsh_fragment_stats(root)
    print(json.dumps({"phase": "compact", "sec": compact_sec,
                      **{k: v for k, v in res.items()
                         if not isinstance(v, (list, dict))},
                      **res.get("counts", {})}), flush=True)
    print(json.dumps({"phase": "fragments", "when": "after", **stats2}),
          flush=True)
    bytes_before = _du(root)
    deleted = incdedup.gc_lsh(root, keep_last=2, stage_min_age_s=0.0)
    bytes_after = _du(root)
    print(json.dumps({"phase": "gc", "deleted_versions": deleted,
                      "bytes_before": bytes_before,
                      "bytes_after": bytes_after}), flush=True)
    audit = incdedup.fsck_lsh(root)
    print(json.dumps({"phase": "fsck",
                      "ok": not audit.get("problems"),
                      "problems": audit.get("problems", [])}),
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
