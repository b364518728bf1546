"""End-to-end serving demo: CDC commits land in a MOR state table; a
catalog branch names the validated snapshot ("prod"); a StateReader
with key-Bloom sidecars serves ~2 ms point lookups off the branch; a
changefeed subscription is the promote-and-reopen signal.

The pattern at 100 TB: per-table commits are invisible to serving
until the "prod" branch advances (validate-then-CAS), readers pin an
immutable version so their caches never go stale, and lookup cost is
bounded by bucket routing + compaction + blooms — not by table size.

Run standalone:  python examples/serving.py  [sf_dir]
(guarded ray.init — the library itself never initializes Ray).
"""

import os
import shutil
import sys
import tempfile
import time

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
    from kettleray.io import blooms, catalog, sink

    configure_ray_data()
    base = tempfile.mkdtemp(prefix="kr_serving_")
    state, croot = os.path.join(base, "state"), os.path.join(base, "cat")
    cursor = os.path.join(base, "cursor.json")
    try:
        ev = derive_events(sf_dir)

        # ---- ingest commit 1 + validate + branch it as prod ---------
        def window(lo, hi):
            return ev.map_batches(
                lambda b, lo=lo, hi=hi: b.filter(pc.and_(
                    pc.greater_equal(b["commit_seq"], lo),
                    pc.less(b["commit_seq"], hi))),
                batch_format="pyarrow", zero_copy_batch=True)

        with catalog.transaction(croot, note="backfill") as tx:
            m = sink.apply_incremental_mor(state, window(0, 1_500_000),
                                           num_buckets=16,
                                           num_partitions=8)
            tx.pin("state", state, m.version)
        blooms.build_key_blooms(state)
        s1 = catalog.current_snapshot_id(croot)
        catalog.create_branch(croot, "prod")            # validated
        catalog.create_tag(croot, f"backfill-{s1}")     # audit point

        # ---- a serving reader pinned to prod ------------------------
        entry = catalog.read_snapshot(croot, ref="prod")["tables"]["state"]
        reader = sink.StateReader(entry["root"],
                                  version=entry["version"])
        sub = sink.ChangeSubscription(state, cursor)
        sub.poll(), sub.ack()                           # bootstrap

        some = sink.read_state(state).take(3)
        t0 = time.time()
        for r in some * 20:
            reader.lookup(r["repo"], r["path"])
        per = (time.time() - t0) / (3 * 20) * 1000
        print(f"prod serving snapshot {s1} v{entry['version']}: "
              f"{per:.2f} ms/lookup")

        # ---- ingest commit 2: invisible to prod until promoted ------
        with catalog.transaction(croot, note="delta") as tx:
            m2 = sink.apply_incremental_mor(state, window(1_500_000,
                                                          1 << 62),
                                            num_buckets=16,
                                            num_partitions=8)
            tx.pin("state", state, m2.version)
        changes = sub.poll()
        n_changed = changes.count() if changes is not None else 0
        sub.ack()
        print(f"feed signalled {n_changed} changed rows; prod still at "
              f"snapshot {catalog.resolve_ref(croot, 'prod')}")

        # ---- validate, then CAS-promote prod and reopen -------------
        s2 = catalog.current_snapshot_id(croot)
        catalog.advance_branch(croot, "prod", s2, expect=s1)
        entry = catalog.read_snapshot(croot, ref="prod")["tables"]["state"]
        reader = sink.StateReader(entry["root"], version=entry["version"])
        got = reader.lookup(some[0]["repo"], some[0]["path"])
        print(f"promoted prod -> snapshot {s2} v{entry['version']}; "
              f"lookup now serves {got.num_rows} row(s) at watermark "
              f"{got['last_commit_seq'][0].as_py() if got.num_rows else '-'}")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main(*sys.argv[1:2])
    ray.shutdown()
