"""Merge-on-read state sink: commits append per-bucket delta files
(commit IO ∝ batch, not touched-bucket size); reads merge base + deltas
via the distributed LWW replay; compact_mor folds deltas into the base."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.gen.oracle import replay_oracle
from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=3000, n_repos=10, n_paths_per_repo=40,
                     p_delete=0.08, seed=47)


def _state(root, version=None):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root, version).take_all()}


def _want(events):
    return {k: v["content_sha256"] for k, v in replay_oracle(events).items()}


def _commit_windows(events, cuts):
    lo = 0
    for hi in cuts:
        yield events.filter(pc.and_(pc.greater_equal(events["commit_seq"],
                                                     lo),
                                    pc.less(events["commit_seq"], hi)))
        lo = hi


def test_mor_multi_commit_matches_oracle_and_links_everything(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    for w in _commit_windows(events, (1000, 2000, CFG.n_events)):
        m = sink.apply_incremental_mor(root, ray.data.from_arrow(w),
                                       num_buckets=8, num_partitions=4)
    assert m.version == 3 and m.metrics["mode"] == "mor"
    assert m.metrics["delta_rows"] > 0
    assert _state(root) == _want(events)

    # every file carried from v2 must be a hardlink (no data copied) and
    # base bucket files must be untouched since v1 (commit IO ∝ batch)
    v3 = os.path.join(root, "v0003")
    base_files, delta_files = sink._split_base_delta(v3)
    assert delta_files, "MOR commits must leave delta files"
    assert all(os.stat(f).st_nlink >= 2 for f in base_files)
    v1 = os.path.join(root, "v0001")
    v1_inodes = {os.path.relpath(f, v1): os.stat(f).st_ino
                 for f in sink._split_base_delta(v1)[0]}
    for f in base_files:
        assert os.stat(f).st_ino == v1_inodes[os.path.relpath(f, v3)]


def test_mor_delete_costs_one_delta_row_not_a_bucket_rewrite(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    sink.apply_incremental_mor(root, ray.data.from_arrow(events),
                               num_buckets=8, num_partitions=4)
    live = sink.read_state(root).take_all()
    victim = sorted((r["repo"], r["path"]) for r in live)[0]
    tomb = pa.table({
        "repo": [victim[0]], "path": [victim[1]],
        "commit": ["ctomb"], "lang": ["py"], "content": [""],
        "op": ["delete"],
        "commit_seq": pa.array([CFG.n_events + 1], type=pa.int64())})
    m = sink.apply_incremental_mor(root, ray.data.from_arrow(tomb),
                                   num_buckets=8, num_partitions=4)
    assert m.metrics["delta_rows"] == 1
    got = _state(root)
    assert victim not in got
    want = _want(events)
    want.pop(victim)
    assert got == want
    # and the point lookup merges the tombstone too
    assert sink.lookup_state(root, *victim).num_rows == 0
    other = sorted(want)[0]
    hit = sink.lookup_state(root, *other)
    assert hit.num_rows == 1
    assert hit.column("content_sha256")[0].as_py() == want[other]


def test_mor_compaction_clears_deltas_and_preserves_state(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    for w in _commit_windows(events, (1000, 2000, CFG.n_events)):
        sink.apply_incremental_mor(root, ray.data.from_arrow(w),
                                   num_buckets=8, num_partitions=4)
    before = _state(root)
    m = sink.compact_mor(root, num_partitions=4)
    assert m.metrics["delta_files"] == 0 and m.metrics["delta_rows"] == 0
    assert m.metrics["compacted_buckets"] >= 1
    assert not sink._split_base_delta(
        os.path.join(root, f"v{m.version:04d}"))[1]
    assert _state(root) == before
    # compacting a delta-free version is a no-op
    assert sink.compact_mor(root).version == m.version
    # time travel across the compaction boundary still merges deltas
    assert _state(root, m.version - 1) == before


def test_mor_rerun_is_noop_and_watermark_filters(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    sink.apply_incremental_mor(root, ray.data.from_arrow(events),
                               num_buckets=8, num_partitions=4)
    before = _state(root)
    m = sink.apply_incremental_mor(root, ray.data.from_arrow(events),
                                   num_buckets=8, num_partitions=4)
    assert m.version == 1
    assert _state(root) == before


def test_mor_schema_change_autocompacts_then_commits(tmp_path):
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    half = pc.less(events["commit_seq"], 1500)
    sink.apply_incremental_mor(root,
                               ray.data.from_arrow(events.filter(half)),
                               num_buckets=8, num_partitions=4)
    sink.apply_incremental_mor(
        root,
        ray.data.from_arrow(events.filter(pc.invert(half)).slice(0, 50)),
        num_buckets=8, num_partitions=4)
    assert sink.read_manifest(root).metrics["delta_files"] > 0

    # new batch arrives with an ADDITIVE column: old-schema deltas must be
    # folded first so the delta tree stays schema-uniform
    rest = events.filter(pc.invert(half)).slice(50)
    rest = rest.append_column("author",
                              pa.array(["a"] * rest.num_rows))
    m = sink.apply_incremental_mor(root, ray.data.from_arrow(rest),
                                   num_buckets=8, num_partitions=4)
    # versions: 1 (base), 2 (deltas), 3 (auto-compaction), 4 (new deltas)
    assert m.version == 4
    assert "author" in m.metrics["event_schema"]
    got = {(r["repo"], r["path"]): (r["content_sha256"], r["author"])
           for r in sink.read_state(root).take_all()}
    want = replay_oracle(events)   # the three batches partition `events`
    rest_keys = set(zip(rest.column("repo").to_pylist(),
                        rest.column("path").to_pylist(),
                        rest.column("commit_seq").to_pylist()))
    for k, v in want.items():
        author = "a" if (k[0], k[1], v["last_commit_seq"]) in rest_keys \
            else None
        assert got[k] == (v["content_sha256"], author)
    assert set(got) == set(want)


def test_compact_state_refuses_mor_layout(tmp_path):
    import pytest
    root = str(tmp_path / "state")
    events = generate_events_local(CFG)
    for w in _commit_windows(events, (1500, CFG.n_events)):
        sink.apply_incremental_mor(root, ray.data.from_arrow(w),
                                   num_buckets=8, num_partitions=4)
    with pytest.raises(ValueError, match="compact_mor"):
        sink.compact_state(root)


def test_layout_change_across_commits_is_refused(tmp_path):
    import pytest
    events = generate_events_local(CFG)
    for mode, fn in (("mor", sink.apply_incremental_mor),
                     ("cow", sink.apply_incremental_bucketed)):
        root = str(tmp_path / mode)
        fn(root, ray.data.from_arrow(events), num_buckets=8,
           num_partitions=4)
        with pytest.raises(ValueError, match="num_buckets"):
            fn(root, ray.data.from_arrow(events), num_buckets=16,
               num_partitions=4)
        with pytest.raises(ValueError, match="bucket_cols"):
            fn(root, ray.data.from_arrow(events), num_buckets=8,
               bucket_cols=("repo",), num_partitions=4)


def _mk(rows):
    cols = {k: [r[k] for r in rows]
            for k in ("repo", "path", "commit", "lang", "content", "op",
                      "commit_seq")}
    return pa.table({**cols,
                     "commit_seq": pa.array(cols["commit_seq"],
                                            type=pa.int64())})


def _r(repo, path, seq, op="insert", content=None):
    return {"repo": repo, "path": path, "commit": f"c{seq}", "lang": "py",
            "content": content if content is not None else f"body-{seq}",
            "op": op, "commit_seq": seq}


def test_changefeed_flags_and_untouched_bucket_pruning(tmp_path):
    root = str(tmp_path / "state")
    base = [_r(f"r{i % 5}", f"f{i}.py", i) for i in range(1, 41)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=8, num_partitions=4)
    mb = [_r("r1", "f1.py", 100, content="CHANGED"),     # update
          _r("r2", "f2.py", 101, op="delete"),           # delete
          _r("r9", "brand_new.py", 102)]                 # insert
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(mb)),
                               num_buckets=8, num_partitions=4)

    ch = {(r["repo"], r["path"]): r["change_type"]
          for r in sink.read_changes(root, 1, 2).take_all()}
    assert ch == {("r1", "f1.py"): "changed",
                  ("r2", "f2.py"): "deleted",
                  ("r9", "brand_new.py"): "new"}

    # include_identical covers the FULL key universe (untouched buckets
    # included), matching a snapshot FULL OUTER JOIN
    full = sink.read_changes(root, 1, 2, include_identical=True)
    rows = full.take_all()
    assert len(rows) == 41                  # 40 base keys + 1 new key
    assert sum(r["change_type"] == "identical" for r in rows) == 38

    # pruning proof: corrupt a file in a bucket NEITHER commit touched
    # (hardlink-shared between v1 and v2). The pruned feed must never
    # open it — so it still succeeds; the unpruned feed must crash.
    import pytest
    touched = set()
    for t in (mb,):
        k = pa.table({"repo": [r["repo"] for r in t],
                      "path": [r["path"] for r in t]})
        from kettleray.ops import cdc as _cdc
        touched |= set(_cdc.stable_key_buckets(k, ("repo", "path"),
                                               8).tolist())
    victim_bucket = next(b for b in range(8) if b not in touched
                         and os.path.isdir(
                             os.path.join(root, "v0002", f"bucket={b}")))
    vf = sink._parquet_files(
        os.path.join(root, "v0002", f"bucket={victim_bucket}"))[0]
    with open(vf, "wb") as f:
        f.write(b"not parquet anymore")
    assert {(r["repo"], r["path"]): r["change_type"]
            for r in sink.read_changes(root, 1, 2).take_all()} == ch
    with pytest.raises(Exception):
        sink.read_changes(root, 1, 2,
                          include_identical=True).take_all()


def test_maybe_compact_mor_policy(tmp_path):
    root = str(tmp_path / "state")
    base = [_r(f"r{i % 3}", f"f{i}.py", i) for i in range(1, 101)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=4, num_partitions=4)
    # tiny delta: below both bounds -> no compaction
    sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r0", "f3.py", 200)])),
        num_buckets=4, num_partitions=4)
    s = sink.mor_delta_stats(root)
    assert 0 < s["delta_ratio"] < 0.2
    assert sink.maybe_compact_mor(root) is None
    # many trickle commits fragment one bucket past the file bound
    for i in range(9):
        sink.apply_incremental_mor(
            root, ray.data.from_arrow(_mk([_r("r0", "f3.py", 300 + i)])),
            num_buckets=4, num_partitions=4)
    assert sink.mor_delta_stats(root)["max_delta_files_per_bucket"] > 8
    before = {(r["repo"], r["path"]): r["content_sha256"]
              for r in sink.read_state(root).take_all()}
    man = sink.maybe_compact_mor(root, num_partitions=4)
    assert man is not None and man.metrics["delta_files"] == 0
    assert sink.mor_delta_stats(root)["delta_rows"] == 0
    assert {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root).take_all()} == before
    # ratio bound: one bulk delta worth >20% of the base
    bulk = [_r(f"r{i % 3}", f"f{i}.py", 1000 + i, content="X")
            for i in range(1, 40)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(bulk)),
                               num_buckets=4, num_partitions=4)
    assert sink.mor_delta_stats(root)["delta_ratio"] > 0.2
    assert sink.maybe_compact_mor(root, num_partitions=4) is not None


def test_rebucket_state_changes_layout_and_preserves_state(tmp_path):
    import pytest
    root = str(tmp_path / "state")
    base = [_r(f"r{i % 5}", f"f{i}.py", i) for i in range(1, 61)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=4, num_partitions=4)
    sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r0", "f5.py", 100,
                                          content="Z")])),
        num_buckets=4, num_partitions=4)
    before = {(r["repo"], r["path"]): r["content_sha256"]
              for r in sink.read_state(root).take_all()}
    with pytest.raises(ValueError):          # incremental re-bucket refused
        sink.apply_incremental_mor(
            root, ray.data.from_arrow(_mk([_r("r0", "f9.py", 101)])),
            num_buckets=16, num_partitions=4)
    man = sink.rebucket_state(root, num_buckets=16, num_partitions=4)
    assert man.metrics["num_buckets"] == 16
    assert man.metrics["rebucket_of"] == 2
    assert sink.mor_delta_stats(root)["delta_rows"] == 0   # deltas folded
    assert {(r["repo"], r["path"]): r["content_sha256"]
            for r in sink.read_state(root).take_all()} == before
    # incremental commits resume under the NEW layout
    m = sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r0", "f9.py", 101)])),
        num_buckets=16, num_partitions=4)
    assert m.metrics["delta_rows"] == 1
    got = sink.lookup_state(root, "r0", "f9.py")
    assert got.num_rows == 1


def test_fsck_state_detects_missing_and_unlisted(tmp_path):
    root = str(tmp_path / "state")
    base = [_r(f"r{i % 3}", f"f{i}.py", i) for i in range(1, 31)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=4, num_partitions=4)
    rep = sink.fsck_state(root, check_rows=True)
    assert rep["ok"] and not rep["missing"]
    vdir = os.path.join(root, "v0001")
    victim = sink._parquet_files(vdir)[0]
    os.rename(victim, victim + ".hidden")
    rep2 = sink.fsck_state(root)
    assert not rep2["ok"]
    assert os.path.relpath(victim, vdir) in rep2["missing"]
    os.rename(victim + ".hidden", victim)
    with open(os.path.join(vdir, "bucket=0", "rogue.parquet"), "w") as f:
        f.write("x")
    rep3 = sink.fsck_state(root)
    assert not rep3["ok"] and rep3["unlisted"] == ["bucket=0/rogue.parquet"]


def test_apply_with_quarantine_routes_and_state_stays_correct(tmp_path):
    sroot = str(tmp_path / "state")
    qroot = str(tmp_path / "quarantine")
    events = generate_events_local(CFG)
    half = pc.less(events["commit_seq"], 1500)
    sink.apply_incremental_bucketed(
        sroot, ray.data.from_arrow(events.filter(half)),
        num_buckets=8, num_partitions=4)
    wm = sink.read_manifest(sroot).watermark

    # replay the FULL log: the prefix is late (quarantined), the suffix
    # applies; state must equal the full-log oracle
    man, qman = sink.apply_with_quarantine(
        sroot, qroot, ray.data.from_arrow(events),
        num_buckets=8, num_partitions=4)
    assert qman is not None and qman.metrics["late_rows"] > 0
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in sink.read_state(sroot).take_all()}
    assert got == _want(events)
    q1 = sink.read_log(qroot)
    assert q1.count() == events.filter(half).num_rows
    assert max(r["commit_seq"] for r in q1.take_all()) <= wm

    # second late wave APPENDS a new log version (never rewrites)
    man2, qman2 = sink.apply_with_quarantine(
        sroot, qroot, ray.data.from_arrow(events.slice(0, 5)),
        num_buckets=8, num_partitions=4)
    assert man2.version == man.version          # nothing fresh: no-op
    assert qman2.version == qman.version + 1
    assert sink.read_log(qroot).count() == q1.count() + 5


def test_change_subscription_cursor_semantics(tmp_path):
    root = str(tmp_path / "state")
    cursor = str(tmp_path / "cursor.json")
    base = [_r(f"r{i % 3}", f"f{i}.py", i) for i in range(1, 21)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=4, num_partitions=4)
    sub = sink.ChangeSubscription(root, cursor)

    # first poll: whole state as 'new'; unacked crash -> same again
    first = sub.poll().take_all()
    assert len(first) == 20
    assert all(r["change_type"] == "new" for r in first)
    assert len(sink.ChangeSubscription(root, cursor).poll()
               .take_all()) == 20
    sub.ack()
    assert sub.poll() is None                 # caught up

    # two commits, then one poll covers BOTH (cursor -> CURRENT)
    sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r0", "f3.py", 100,
                                          content="X")])),
        num_buckets=4, num_partitions=4)
    sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r1", "f4.py", 101,
                                          op="delete")])),
        num_buckets=4, num_partitions=4)
    got = {(r["repo"], r["path"]): r["change_type"]
           for r in sub.poll().take_all()}
    assert got == {("r0", "f3.py"): "changed", ("r1", "f4.py"): "deleted"}
    # crash before ack: the SAME window re-polls (at-least-once)
    sub2 = sink.ChangeSubscription(root, cursor)
    got2 = {(r["repo"], r["path"]): r["change_type"]
            for r in sub2.poll().take_all()}
    assert got2 == got
    sub2.ack()
    assert sub2.poll() is None


def test_changefeed_across_rebucket_boundary_falls_back(tmp_path):
    root = str(tmp_path / "state")
    base = [_r(f"r{i % 4}", f"f{i}.py", i) for i in range(1, 31)]
    sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(base)),
                               num_buckets=4, num_partitions=4)
    sink.rebucket_state(root, num_buckets=16, num_partitions=4)
    sink.apply_incremental_mor(
        root, ray.data.from_arrow(_mk([_r("r0", "f4.py", 100,
                                          content="Q")])),
        num_buckets=16, num_partitions=4)
    # v1 (4 buckets) -> v3 (16 buckets): the per-bucket-name diff would
    # fabricate deleted/new pairs for every moved key; the fallback
    # key-shuffle diff must report exactly the ONE real change
    got = {(r["repo"], r["path"]): r["change_type"]
           for r in sink.read_changes(root, 1, 3,
                                      num_partitions=4).take_all()}
    assert got == {("r0", "f4.py"): "changed"}
    full = sink.read_changes(root, 1, 3, include_identical=True,
                             num_partitions=4).take_all()
    assert len(full) == 30
    assert sum(r["change_type"] == "identical" for r in full) == 29


def test_append_log_race_loser_takes_next_slot(tmp_path):
    root = str(tmp_path / "log")
    t1 = _mk([_r("r0", "a.py", 1)])
    t2 = _mk([_r("r1", "b.py", 2)])
    sink.append_log(root, ray.data.from_arrow(t1))
    # simulate a concurrent winner grabbing v0002 before our rename
    # (non-empty, as a real winner's version dir always is — renaming
    # onto an EMPTY dir would succeed on POSIX)
    os.makedirs(os.path.join(root, "v0002"))
    with open(os.path.join(root, "v0002", "winner.marker"), "wb") as f:
        f.write(b"x")
    m = sink.append_log(root, ray.data.from_arrow(t2))
    assert m.version == 3                    # took the next free slot
    log = sink.read_log(root).take_all()
    assert {(r["repo"], r["path"]) for r in log} == {("r0", "a.py"),
                                                     ("r1", "b.py")}


def test_bucketed_writer_refuses_nonbucketed_root(tmp_path):
    import pytest
    root = str(tmp_path / "flat")
    events = _mk([_r("r0", "a.py", 1), _r("r1", "b.py", 2)])
    sink.apply_incremental(root, ray.data.from_arrow(events),
                           num_partitions=2)
    with pytest.raises(ValueError, match="non-bucketed"):
        sink.apply_incremental_bucketed(root, ray.data.from_arrow(events),
                                        num_buckets=4, num_partitions=2)
    with pytest.raises(ValueError, match="non-bucketed"):
        sink.apply_incremental_mor(root, ray.data.from_arrow(events),
                                   num_buckets=4, num_partitions=2)


def test_key_history_audit_trail_and_bucket_pruning(tmp_path):
    """key_history walks the version chain with single-bucket reads:
    new -> changed -> (identical rewrite skipped) -> deleted -> new
    (re-add), deletes carrying the PREVIOUS winner's payload; versions
    whose bucket bytes are hardlink-identical are skipped without
    opening a file (proven by corrupting them)."""
    root = str(tmp_path / "state")
    k = ("rk", "file.py")
    other = [_r(f"r{i % 4}", f"f{i}.py", i) for i in range(1, 21)]
    commits = [
        other + [_r(*k, 50, content="v1")],            # v1: new
        [_r(*k, 100, content="v2")],                   # v2: changed
        [_r(*k, 150, content="v2")],                   # v3: same sha
        [_r("r0", "f4.py", 180, content="neighbor")],  # v4: key untouched
        [_r(*k, 200, op="delete")],                    # v5: deleted
        [_r(*k, 250, content="v3")],                   # v6: re-added
    ]
    for rows in commits:
        sink.apply_incremental_mor(root, ray.data.from_arrow(_mk(rows)),
                                   num_buckets=8, num_partitions=4)

    h = sink.key_history(root, *k)
    got = [(r["version"], r["change_type"], r["content"],
            r["last_commit_seq"]) for r in h.to_pylist()]
    # v3's identical-sha rewrite emits nothing; the v5 delete carries
    # the previous winner's payload (content v2 at seq 150, the LWW
    # winner at v4 — NOT the original seq-100 row)
    assert got == [(1, "new", "v1", 50),
                   (2, "changed", "v2", 100),
                   (5, "deleted", "v2", 150),
                   (6, "new", "v3", 250)]

    # absent key: empty, schema'd result
    empty = sink.key_history(root, "rk", "nope.py")
    assert empty.num_rows == 0 and "change_type" in empty.column_names

    # pruning proof: corrupt the key's bucket files in versions whose
    # bucket identity is unchanged from the previous version (v4 shares
    # v3's files via hardlinks, so corrupt a bucket v4 did NOT touch is
    # not enough — instead corrupt a DIFFERENT key's bucket everywhere
    # and show its history never opens the walked key's files).
    from kettleray.ops import cdc as _cdc
    kt = pa.table({"repo": [k[0]], "path": [k[1]]})
    kb = int(_cdc.stable_key_buckets(kt, ("repo", "path"), 8)[0])
    victim = next(b for b in range(8) if b != kb and os.path.isdir(
        os.path.join(root, "v0006", f"bucket={b}")))
    for v in range(1, 7):
        for d in (os.path.join(root, f"v{v:04d}", f"bucket={victim}"),
                  os.path.join(root, f"v{v:04d}", "delta",
                               f"bucket={victim}")):
            if os.path.isdir(d):
                for f in sink._parquet_files(d):
                    with open(f, "wb") as fh:
                        fh.write(b"junk")
    h2 = sink.key_history(root, *k)
    assert h2.to_pylist() == h.to_pylist()
