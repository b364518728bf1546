"""End-to-end incremental training-data dedup demo: documents land in
a CDC lake sink in micro-commits; the persistent MinHash-LSH index
follows the lake's CHANGE DATA FEED (bootstrap once, then each sync
signs only the changed docs and reads only the touched band buckets);
updates supersede stale pairs, deletes tombstone, compaction folds.

Run standalone:  python examples/incremental_dedup.py  [sf_dir]
(guarded ray.init — the library itself never initializes Ray).
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyarrow.compute as pc
import ray


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from kettleray import configure_ray_data
    from kettleray.gen.derive import derive_events
    from kettleray.io import sink
    from kettleray.ops import incdedup
    configure_ray_data()

    lake = tempfile.mkdtemp(prefix="dedup_lake_")
    index = tempfile.mkdtemp(prefix="dedup_index_")
    for d in (lake, index):
        shutil.rmtree(d, ignore_errors=True)
    kw = dict(num_perm=64, bands=16, shingle_k=3, threshold=0.5,
              num_buckets=16, num_partitions=8)

    ev = derive_events(sf_dir)
    cut = 1_500_000
    b1 = ev.map_batches(
        lambda b: b.filter(pc.less(b["commit_seq"], cut)),
        batch_format="pyarrow", zero_copy_batch=True)

    # 1. first lake commit + index bootstrap from full state
    sink.apply_incremental_bucketed(lake, b1, num_buckets=16,
                                    num_partitions=8)
    man = incdedup.sync_lsh_from_feed(lake, index, **kw)
    print(f"bootstrap: v{man['version']} docs={man['counts']['new_docs']}"
          f" pairs={man['counts']['new_pairs']}"
          f" timings={man['timings']}")

    # 2. second lake commit (updates + deletes) -> feed-driven sync:
    #    only changed keys are re-signed, only touched buckets read
    sink.apply_incremental_bucketed(lake, ev, num_buckets=16,
                                    num_partitions=8)
    man = incdedup.sync_lsh_from_feed(lake, index, **kw)
    print(f"feed sync: v{man['version']} docs={man['counts']['new_docs']}"
          f" deletes={man['counts']['deletes']}"
          f" pairs={man['counts']['new_pairs']}"
          f" touched={len(man['touched_buckets'])}/{kw['num_buckets']}"
          f" timings={man['timings']}")

    live = incdedup.read_pairs(index).to_pandas()
    print(f"live near-dup pairs: {len(live)}")
    if len(live):
        print(live.sort_values("jaccard", ascending=False)
              .head(5).to_string(index=False))

    # 3. compaction: fold superseded band/sketch rows + dead pairs
    man = incdedup.compact_lsh(index)
    print(f"compacted -> v{man['version']} "
          f"live_pairs={man['counts']['live_pairs']}")
    for d in (lake, index):
        shutil.rmtree(d, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
