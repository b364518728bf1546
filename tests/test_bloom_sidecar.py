"""Per-file key-Bloom sidecars (kettleray.io.blooms) + lookup_state
integration.

Contract under test: a bloom skip is a PROOF of absence, so
lookup_state(use_blooms=True) must equal use_blooms=False for every
key and every layout (bucketed COW, MOR with deltas), while the report
proves files were actually skipped for absent keys. Sidecars must ride
forward through the COW hardlink loop and stay invisible to fsck.
"""

import os

import pyarrow as pa
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import blooms, sink

CFG = EventGenConfig(n_events=3000, n_repos=10, n_paths_per_repo=30,
                     p_delete=0.08, seed=31)


def _build(root, events, *, mor=False, num_buckets=8):
    apply = sink.apply_incremental_mor if mor \
        else sink.apply_incremental_bucketed
    return apply(root, ray.data.from_arrow(events), num_buckets=num_buckets,
                 num_partitions=4)


def _some_keys(root, n=25):
    t = sink.read_state(root).take_all()
    keys = sorted({(r["repo"], r["path"]) for r in t})
    step = max(1, len(keys) // n)
    return keys[::step][:n]


def _cmp(a: pa.Table, b: pa.Table):
    assert a.column_names == b.column_names
    assert a.sort_by([(c, "ascending") for c in
                      ("repo", "path")]).equals(
        b.sort_by([(c, "ascending") for c in ("repo", "path")]))


def test_build_then_lookup_parity_and_skips(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    info = blooms.build_key_blooms(root)
    assert info["built"] == info["files_total"] > 0
    assert info["existing"] == 0
    # rebuild is a no-op (all sidecars present)
    again = blooms.build_key_blooms(root)
    assert again["built"] == 0
    assert again["existing"] == info["files_total"]
    # present keys: blooms never change the answer (no false negatives)
    for repo, path in _some_keys(root):
        with_b = sink.lookup_state(root, repo, path)
        without = sink.lookup_state(root, repo, path, use_blooms=False)
        assert with_b.num_rows == 1
        _cmp(with_b, without)
    # absent key: same (empty) answer, and the report proves skipping
    rep = {}
    miss = sink.lookup_state(root, "no-such-repo", "no/such/path.py",
                             report=rep)
    miss_plain = sink.lookup_state(root, "no-such-repo", "no/such/path.py",
                                   use_blooms=False)
    assert miss.num_rows == 0
    assert miss.column_names == miss_plain.column_names
    assert rep["files_bloom_probed"] >= 1
    # 10 bits/key -> ~1% FP; with a handful of files in one bucket an
    # absent key should skip at least one file deterministically
    assert rep["files_bloom_skipped"] >= 1


def test_missing_sidecar_is_unprunable_not_wrong(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    # no sidecars built: lookups behave exactly as before, report says 0
    rep = {}
    repo, path = _some_keys(root, 1)[0]
    t = sink.lookup_state(root, repo, path, report=rep)
    assert t.num_rows == 1
    assert rep["files_bloom_skipped"] == 0


def test_sidecars_ride_hardlinks_across_commits(tmp_path):
    root = str(tmp_path / "s")
    ev = generate_events_local(CFG)
    # tiny second commit over many buckets so most buckets go untouched
    cut = ev.num_rows - 20
    _build(root, ev.slice(0, cut), num_buckets=32)
    blooms.build_key_blooms(root)
    v1 = sink.current_version(root)
    _build(root, ev.slice(cut), num_buckets=32)
    v2 = sink.current_version(root)
    assert v2 == v1 + 1
    v2dir = sink._version_dir(root, v2)
    carried = [os.path.join(dp, f) for dp, _, fs in os.walk(v2dir)
               for f in fs if f.endswith(".bloom")]
    # untouched buckets carried their sidecars forward via hardlink
    assert carried
    assert all(os.stat(p).st_nlink >= 2 for p in carried)
    # build fills only the rewritten buckets' gap
    info = blooms.build_key_blooms(root)
    assert info["existing"] == len(carried)
    assert info["built"] == info["files_total"] - len(carried)
    # and the new version answers identically with blooms on/off
    for repo, path in _some_keys(root, 10):
        _cmp(sink.lookup_state(root, repo, path),
             sink.lookup_state(root, repo, path, use_blooms=False))


def test_mor_layout_deltas_skip_soundly(tmp_path):
    root = str(tmp_path / "s")
    ev = generate_events_local(CFG)
    cut = ev.num_rows // 2
    _build(root, ev.slice(0, cut), mor=True)
    _build(root, ev.slice(cut), mor=True)   # second commit -> delta files
    blooms.build_key_blooms(root)
    man = sink.read_manifest(root)
    assert any("delta" in e["file"] for e in man.files), \
        "fixture must exercise the MOR merge path"
    for repo, path in _some_keys(root, 15):
        _cmp(sink.lookup_state(root, repo, path),
             sink.lookup_state(root, repo, path, use_blooms=False))


def _scan_rows(root, filters, **kw):
    ds = sink.scan_state(root, filters, **kw)
    return sorted((r["repo"], r["path"], r["content_sha256"])
                  for r in ds.take_all())


def _exact_rows(root, filters):
    ds = sink._drop_bucket(sink.read_state(root))
    ds = ds.map_batches(
        lambda t: t.filter(sink._residual_mask(t, filters)),
        batch_format="pyarrow", batch_size=None)
    return sorted((r["repo"], r["path"], r["content_sha256"])
                  for r in ds.take_all())


def test_scan_state_bloom_prunes_full_key_equality(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG), mor=True)
    _build(root, generate_events_local(
        EventGenConfig(n_events=400, n_repos=10, n_paths_per_repo=30,
                       p_delete=0.08, seed=32)), mor=True)
    blooms.build_key_blooms(root)
    repo, path = _some_keys(root, 1)[0]
    flt = [("repo", "==", repo), ("path", "==", path)]
    rep = {}
    got = _scan_rows(root, flt, report=rep)
    assert got == _exact_rows(root, flt)
    assert len(got) == 1
    assert rep["files_bloom_skipped"] >= 1
    # absent key: empty result, heavy skipping
    rep2 = {}
    flt2 = [("repo", "==", "no-such-repo"), ("path", "==", "zz")]
    assert _scan_rows(root, flt2, report=rep2) == []
    assert rep2["files_bloom_skipped"] >= rep2["files_bloom_probed"] - 2


def test_scan_state_partial_key_equality_never_bloom_pruned(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    blooms.build_key_blooms(root)
    repo = _some_keys(root, 1)[0][0]
    flt = [("repo", "==", repo)]
    rep = {}
    got = _scan_rows(root, flt, report=rep)
    assert got == _exact_rows(root, flt)
    assert len(got) > 1
    # sidecars record (repo, path); pinning repo alone is unprunable
    assert rep.get("files_bloom_skipped", 0) == 0


def test_probe_robustness(tmp_path):
    fp = str(tmp_path / "x.parquet")
    import pyarrow.parquet as pq
    pq.write_table(pa.table({"repo": ["r1"], "path": ["p1"]}), fp)
    # no sidecar -> unprunable
    assert blooms.probe_sidecar(fp, {"repo": "r1", "path": "p1"})
    blooms._build_sidecar(fp, ("repo", "path"), 10)
    assert blooms.probe_sidecar(fp, {"repo": "r1", "path": "p1"})
    # caller missing a key column the bloom was built over -> unprunable
    assert blooms.probe_sidecar(fp, {"repo": "r1"})
    # truncated sidecar -> unprunable, never an exception
    sp = blooms.sidecar_path(fp)
    with open(sp, "r+b") as f:
        f.truncate(3)
    assert blooms.probe_sidecar(fp, {"repo": "zz", "path": "zz"})
    # garbage magic -> unprunable
    with open(sp, "wb") as f:
        f.write(b"\x00" * 64)
    assert blooms.probe_sidecar(fp, {"repo": "zz", "path": "zz"})


def test_state_reader_matches_lookup_state(tmp_path):
    root = str(tmp_path / "s")
    ev = generate_events_local(CFG)
    cut = ev.num_rows // 2
    _build(root, ev.slice(0, cut), mor=True)
    _build(root, ev.slice(cut), mor=True)
    blooms.build_key_blooms(root)
    rdr = sink.StateReader(root)
    rep = {}
    for repo, path in _some_keys(root, 20):
        _cmp(rdr.lookup(repo, path, report=rep),
             sink.lookup_state(root, repo, path, use_blooms=False))
    # absent key: identical empty schema on both paths
    miss = rdr.lookup("no-such-repo", "no/such/path.py")
    assert miss.num_rows == 0
    assert miss.column_names == sink.lookup_state(
        root, "no-such-repo", "no/such/path.py",
        use_blooms=False).column_names
    assert rep["files_bloom_skipped"] > 0
    # the reader is pinned to its version: compaction publishes a new
    # one, invisible until a reader is reopened
    v = rdr.version
    sink.compact_mor(root)
    assert rdr.version == v
    assert sink.StateReader(root).version == v + 1


def test_state_reader_flat_layout(tmp_path):
    import ray.data
    root = str(tmp_path / "flat")
    ev = generate_events_local(CFG)
    from kettleray.ops import cdc as _cdc
    state = _cdc.replay_lww(ray.data.from_arrow(ev), num_partitions=2)
    import json

    import pyarrow.parquet as pq
    import ray
    vdir = os.path.join(root, "v0001")
    os.makedirs(vdir)
    state_t = pa.concat_tables(ray.get(state.to_arrow_refs()),
                               promote_options="permissive")
    pq.write_table(state_t, os.path.join(vdir, "part-0.parquet"))
    with open(os.path.join(vdir, "manifest.json"), "w") as f:
        f.write(sink.Manifest(version=1, watermark=0, schema="",
                              files=[], metrics={}).to_json())
    with open(os.path.join(root, "CURRENT"), "w") as f:
        json.dump({"version": 1}, f)
    rdr = sink.StateReader(root)
    row = state_t.slice(0, 1)
    repo, path = row["repo"][0].as_py(), row["path"][0].as_py()
    got = rdr.lookup(repo, path)
    want = sink.lookup_state(root, repo, path, use_blooms=False)
    _cmp(got, want)
    assert got.num_rows == 1


def test_maintenance_hooks_build_blooms(tmp_path):
    root = str(tmp_path / "s")
    ev = generate_events_local(CFG)
    cut = ev.num_rows // 2
    _build(root, ev.slice(0, cut), mor=True)
    _build(root, ev.slice(cut), mor=True)
    # compaction with the hook: the new version is fully bloomed
    sink.compact_mor(root, build_blooms=True)
    info = blooms.build_key_blooms(root)
    assert info["built"] == 0 and info["existing"] == info["files_total"]
    # clustering rewrites every bucket; the hook re-blooms them all
    sink.cluster_state(root, ("lang",), rows_per_file=64,
                       build_blooms=True)
    info = blooms.build_key_blooms(root)
    assert info["built"] == 0 and info["existing"] == info["files_total"]
    for repo, path in _some_keys(root, 5):
        _cmp(sink.lookup_state(root, repo, path),
             sink.lookup_state(root, repo, path, use_blooms=False))


def test_changefeed_driven_reader_refresh(tmp_path):
    """The serving pattern end-to-end: a pinned StateReader serves a
    version while a ChangeSubscription watches the feed; when a commit
    lands, the poll is the signal to reopen — the fresh reader sees the
    new state, the old one keeps serving its immutable version."""
    root = str(tmp_path / "s")
    cur = str(tmp_path / "cursor.json")
    ev = generate_events_local(CFG)
    cut = ev.num_rows - 200
    _build(root, ev.slice(0, cut), mor=True)
    blooms.build_key_blooms(root)
    sub = sink.ChangeSubscription(root, cur)
    assert sub.poll() is not None           # bootstrap window
    sub.ack()
    rdr = sink.StateReader(root)
    assert sub.poll() is None               # caught up -> keep serving
    _build(root, ev.slice(cut), mor=True)   # a commit lands
    changes = sub.poll()
    assert changes is not None              # signal: reopen
    sub.ack()
    fresh = sink.StateReader(root)
    assert fresh.version == rdr.version + 1
    # the fresh reader agrees with the ground-truth point read on the
    # new version; the pinned reader still serves the OLD version
    changed = {(r["repo"], r["path"]) for r in changes.take_all()}
    for repo, path in sorted(changed)[:10]:
        _cmp(fresh.lookup(repo, path),
             sink.lookup_state(root, repo, path, use_blooms=False))
        _cmp(rdr.lookup(repo, path),
             sink.lookup_state(root, repo, path, use_blooms=False,
                               version=rdr.version))


def test_fsck_ignores_sidecars(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    blooms.build_key_blooms(root)
    rep = sink.fsck_state(root)
    assert rep["ok"], rep
