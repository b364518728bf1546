"""Incremental view maintenance + changelog housekeeping ops.

Covers:
- ivm.read_view == full recompute across commits (correctness),
- partial reuse proportional to touched buckets, proven by HARDLINK
  inodes (untouched partials share storage with the previous version),
- spec-mismatch guard on view_id collisions,
- cdc.compact_changelog: tombstones survive, replay(compacted) ==
  replay(full log),
- cdc.split_on_watermark / quarantine_late routing.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from kettleray.io import sink
from kettleray.ops import cdc, ivm


def _ev(rows):
    cols = {k: [r[k] for r in rows]
            for k in ("repo", "path", "commit", "lang", "content", "op",
                      "commit_seq")}
    t = pa.table({**cols, "commit_seq": pa.array(cols["commit_seq"],
                                                 type=pa.int64())})
    return ray.data.from_arrow(t)


def _row(repo, path, seq, op="insert", content=None, lang="en"):
    return {"repo": repo, "path": path, "commit": f"c{seq}", "lang": lang,
            "content": content if content is not None else f"body-{seq}",
            "op": op, "commit_seq": seq}


AGGS = {"n": ("count", None),
        "chars": ("sum", ivm_chars := (lambda t: pc.cast(
            pc.utf8_length(t["content"]), "int64"))),
        "max_seq": ("max", "last_commit_seq")}


def _sorted(ds):
    return sorted(ds.take_all(), key=lambda r: str(r))


class TestIncrementalView:
    def test_view_matches_recompute_and_reuses_partials(self, tmp_path):
        root = str(tmp_path / "state")
        base = [_row(f"r{i % 7}", f"f{i}.py", i) for i in range(1, 101)]
        sink.apply_incremental_bucketed(root, _ev(base), num_buckets=16,
                                        num_partitions=4)
        v1 = _sorted(ivm.read_view(root, "v", ["repo"], AGGS))
        r1 = _sorted(ivm.recompute_view(root, ["repo"], AGGS))
        assert v1 == r1
        m1 = ivm.partials_metrics(root, "v")
        assert m1["reused_partials"] == 0

        # micro-commit touching exactly one key -> one bucket
        micro = [_row("r1", "f1.py", 500, op="update", content="xx"),
                 _row("r0", "f7.py", 501, op="delete")]
        man = sink.apply_incremental_bucketed(root, _ev(micro),
                                              num_buckets=16,
                                              num_partitions=4)
        touched = man.metrics["touched_buckets"]
        v2 = _sorted(ivm.read_view(root, "v", ["repo"], AGGS))
        r2 = _sorted(ivm.recompute_view(root, ["repo"], AGGS))
        assert v2 == r2 and v2 != v1
        m2 = ivm.partials_metrics(root, "v")
        assert m2["reused_partials"] == m2["buckets"] - touched > 0

        # reuse is physical: untouched partials HARDLINK the v1 cache
        c1 = ivm._cache_dir(root, "v", 1)
        c2 = ivm._cache_dir(root, "v", 2)
        shared = fresh = 0
        for b in os.listdir(c2):
            if not b.startswith("bucket="):
                continue
            old = os.path.join(c1, b)
            if not os.path.isdir(old):
                continue
            new_inodes = {os.stat(os.path.join(c2, b, f)).st_ino
                          for f in os.listdir(os.path.join(c2, b))}
            old_inodes = {os.stat(os.path.join(old, f)).st_ino
                          for f in os.listdir(old)}
            if new_inodes & old_inodes:
                shared += 1
            else:
                fresh += 1
        assert shared == m2["reused_partials"]
        assert fresh >= 1

    def test_ensure_is_idempotent(self, tmp_path):
        root = str(tmp_path / "state")
        sink.apply_incremental_bucketed(
            root, _ev([_row("r", "a", 1)]), num_buckets=4, num_partitions=2)
        c1 = ivm.ensure_partials(root, "v", ["repo"], AGGS)
        c2 = ivm.ensure_partials(root, "v", ["repo"], AGGS)
        assert c1 == c2

    def test_spec_mismatch_raises(self, tmp_path):
        root = str(tmp_path / "state")
        sink.apply_incremental_bucketed(
            root, _ev([_row("r", "a", 1)]), num_buckets=4, num_partitions=2)
        ivm.ensure_partials(root, "v", ["repo"], AGGS)
        with pytest.raises(ValueError, match="different"):
            ivm.ensure_partials(root, "v", ["lang"], AGGS)

    def test_unsupported_fn_raises(self, tmp_path):
        with pytest.raises(ValueError, match="self-maintainable"):
            ivm.ensure_partials(str(tmp_path), "v", ["repo"],
                                {"m": ("median", "x")})


class TestCompactChangelog:
    def test_tombstones_survive_and_replay_equivalent(self):
        log = [_row("r", "a", 1), _row("r", "a", 2, op="update"),
               _row("r", "b", 3), _row("r", "b", 4, op="delete"),
               _row("r", "c", 5)]
        ds = _ev(log)
        compacted = cdc.compact_changelog(ds, num_partitions=2)
        rows = compacted.take_all()
        assert {(r["path"], r["op"], r["commit_seq"]) for r in rows} == \
            {("a", "update", 2), ("b", "delete", 4), ("c", "insert", 5)}
        # replaying the compacted log reaches the full log's final state
        full = _sorted(cdc.replay_lww(_ev(log), num_partitions=2))
        via = _sorted(cdc.replay_lww(cdc.compact_changelog(
            _ev(log), num_partitions=2), num_partitions=2))
        assert via == full

    def test_event_shape_preserved(self):
        ds = _ev([_row("r", "a", 1)])
        out = cdc.compact_changelog(ds, num_partitions=1)
        assert set(out.schema().names) == set(ds.schema().names)


class TestStateReads:
    def test_time_travel_and_point_lookup(self, tmp_path):
        root = str(tmp_path / "state")
        sink.apply_incremental_bucketed(
            root, _ev([_row("r", "a", 1, content="v1"),
                       _row("r", "b", 2)]),
            num_buckets=8, num_partitions=2)
        sink.apply_incremental_bucketed(
            root, _ev([_row("r", "a", 3, op="update", content="v2")]),
            num_buckets=8, num_partitions=2)
        # CURRENT sees the update; version 1 still serves the old snapshot
        cur = {r["path"]: r["content"]
               for r in sink.read_state(root).take_all()}
        old = {r["path"]: r["content"]
               for r in sink.read_state(root, version=1).take_all()}
        assert cur == {"a": "v2", "b": "body-2"}
        assert old == {"a": "v1", "b": "body-2"}
        # point lookup reads one bucket only
        t = sink.lookup_state(root, "r", "a")
        assert t.num_rows == 1 and t["content"][0].as_py() == "v2"
        t1 = sink.lookup_state(root, "r", "a", version=1)
        assert t1["content"][0].as_py() == "v1"
        assert sink.lookup_state(root, "r", "missing").num_rows == 0
        with pytest.raises(FileNotFoundError):
            sink.read_state(root, version=99)

    def test_gc_prunes_view_caches(self, tmp_path):
        root = str(tmp_path / "state")
        for seq in (1, 2, 3):
            sink.apply_incremental_bucketed(
                root, _ev([_row("r", "a", seq,
                                op="insert" if seq == 1 else "update")]),
                num_buckets=4, num_partitions=2)
            ivm.ensure_partials(root, "v", ["repo"], AGGS)
        assert os.path.isdir(ivm._cache_dir(root, "v", 1))
        deleted = sink.gc_versions(root, keep_last=1)
        assert deleted == [1, 2]
        assert not os.path.isdir(ivm._cache_dir(root, "v", 1))
        assert not os.path.isdir(ivm._cache_dir(root, "v", 2))
        assert os.path.isdir(ivm._cache_dir(root, "v", 3))
        # the surviving cache still serves the view
        assert _sorted(ivm.read_view(root, "v", ["repo"], AGGS)) == \
            _sorted(ivm.recompute_view(root, ["repo"], AGGS))


class TestRandomizedCommitSequence:
    def test_view_tracks_recompute_across_random_commits(self, tmp_path):
        """Seeded-random micro-commit sequence (inserts/updates/deletes
        over a 40-key space): after EVERY commit the maintained view must
        equal the full recompute — catches stale-partial reuse, delete
        accounting, and multi-version cache chains."""
        import random
        rng = random.Random(7)
        root = str(tmp_path / "state")
        seq = 0
        keyspace = [(f"r{i % 5}", f"f{i}") for i in range(40)]
        for commit in range(4):
            batch = []
            for _ in range(rng.randint(3, 25)):
                repo, path = rng.choice(keyspace)
                seq += 1
                op = rng.choice(
                    ["insert", "update", "update", "delete"])
                batch.append(_row(repo, path, seq, op=op,
                                  content=f"c{seq}" * rng.randint(1, 4)))
            sink.apply_incremental_bucketed(root, _ev(batch),
                                            num_buckets=8,
                                            num_partitions=2)
            got = _sorted(ivm.read_view(root, "v", ["repo"], AGGS))
            ref = _sorted(ivm.recompute_view(root, ["repo"], AGGS))
            assert got == ref, f"diverged at commit {commit}"


class TestMixtureSample:
    def test_deterministic_and_quota_bounded(self):
        from kettleray.ops import aggregates as ag
        rows = [{"src": f"s{i % 5}", "id": i, "payload": f"p{i}"}
                for i in range(200)]
        ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
        quotas = {"s0": 7, "s1": 3, "s2": 0, "s3": 999}
        a = sorted(r["id"] for r in ag.mixture_sample(
            ds, "src", ["id"], quotas, num_partitions=2).take_all())
        # partitioning and arrival order must not change the sample
        b = sorted(r["id"] for r in ag.mixture_sample(
            ds.random_shuffle(seed=3).repartition(7), "src", ["id"],
            quotas, num_partitions=5).take_all())
        assert a == b
        got = ag.mixture_sample(ds, "src", ["id"], quotas,
                                num_partitions=2).take_all()
        by_src = {}
        for r in got:
            by_src.setdefault(r["src"], []).append(r["id"])
        assert len(by_src["s0"]) == 7 and len(by_src["s1"]) == 3
        assert "s2" not in by_src and "s4" not in by_src
        assert len(by_src["s3"]) == 40  # quota above group size -> all


class TestWatermarkRouting:
    def test_split_and_quarantine(self, tmp_path):
        log = [_row("r", "a", 5), _row("r", "a", 15), _row("r", "b", 10),
               _row("r", "c", 11)]
        tagged = cdc.split_on_watermark(_ev(log), 10)
        routes = {r["commit_seq"]: r["route"] for r in tagged.take_all()}
        assert routes == {5: "late", 15: "fresh", 10: "late", 11: "fresh"}

        qdir = str(tmp_path / "quarantine")
        fresh = cdc.quarantine_late(_ev(log), 10, quarantine_dir=qdir)
        assert sorted(r["commit_seq"] for r in fresh.take_all()) == [11, 15]
        late = ray.data.read_parquet(qdir)
        assert sorted(r["commit_seq"] for r in late.take_all()) == [5, 10]
        assert "route" not in late.schema().names


class TestMorView:
    def test_view_over_mor_deltas_matches_recompute_and_reuses(
            self, tmp_path):
        root = str(tmp_path / "state")
        base = [_row(f"r{i % 7}", f"f{i}.py", i) for i in range(1, 101)]
        sink.apply_incremental_mor(root, _ev(base), num_buckets=16,
                                   num_partitions=4)
        v1 = _sorted(ivm.read_view(root, "mv", ["repo"], AGGS,
                                   read_columns=["content",
                                                 "last_commit_seq"]))
        assert v1 == _sorted(ivm.recompute_view(
            root, ["repo"], AGGS,
            read_columns=["content", "last_commit_seq"]))

        # micro-commit: update 2 keys of one repo + delete one key of
        # another — lands as DELTA files, no bucket rewrite
        mb = [_row("r1", "f1.py", 200, content="XXXL"),
              _row("r1", "f8.py", 201, content="Y"),
              _row("r2", "f2.py", 202, op="delete")]
        m = sink.apply_incremental_mor(root, _ev(mb), num_buckets=16,
                                       num_partitions=4)
        assert m.metrics["delta_rows"] == 3
        v2 = _sorted(ivm.read_view(root, "mv", ["repo"], AGGS,
                                   read_columns=["content",
                                                 "last_commit_seq"]))
        r2 = _sorted(ivm.recompute_view(
            root, ["repo"], AGGS,
            read_columns=["content", "last_commit_seq"]))
        assert v2 == r2
        assert v2 != v1          # the commit changed r1/r2 aggregates
        met = ivm.partials_metrics(root, "mv")
        # only the delta-holding buckets were rescanned
        assert met["reused_partials"] >= 13
        assert met["scanned_bytes"] < met["state_bytes"]

        # untouched partials are the SAME inodes as v1's cache
        c1 = ivm._cache_dir(root, "mv", 1)
        c2 = ivm._cache_dir(root, "mv", 2)
        shared = 0
        for bname in os.listdir(c2):
            if not bname.startswith("bucket="):
                continue
            p1 = os.path.join(c1, bname)
            if not os.path.isdir(p1):
                continue
            i1 = {f: os.stat(os.path.join(p1, f)).st_ino
                  for f in os.listdir(p1)}
            for f, ino in ((f, os.stat(os.path.join(c2, bname, f)).st_ino)
                           for f in os.listdir(os.path.join(c2, bname))):
                if i1.get(f) == ino:
                    shared += 1
        assert shared > 0

    def test_view_survives_mor_compaction(self, tmp_path):
        root = str(tmp_path / "state")
        base = [_row(f"r{i % 5}", f"f{i}.py", i) for i in range(1, 61)]
        sink.apply_incremental_mor(root, _ev(base), num_buckets=8,
                                   num_partitions=4)
        mb = [_row("r0", "f5.py", 100, content="ZZ"),
              _row("r3", "f3.py", 101, op="delete")]
        sink.apply_incremental_mor(root, _ev(mb), num_buckets=8,
                                   num_partitions=4)
        before = _sorted(ivm.read_view(root, "cv", ["repo"], AGGS,
                                       read_columns=["content",
                                                     "last_commit_seq"]))
        sink.compact_mor(root, num_partitions=4)
        after = _sorted(ivm.read_view(root, "cv", ["repo"], AGGS,
                                      read_columns=["content",
                                                    "last_commit_seq"]))
        assert after == before
        assert after == _sorted(ivm.recompute_view(
            root, ["repo"], AGGS,
            read_columns=["content", "last_commit_seq"]))
