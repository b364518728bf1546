"""Snapshot catalog: cross-table atomic visibility over sink roots."""

import pyarrow as pa
import pytest
import ray.data

from kettleray.io import catalog, sink


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


def _state(ds):
    return {(r["repo"], r["path"]): r["content_sha256"]
            for r in ds.take_all()}


def test_transaction_flips_tables_atomically(tmp_path):
    croot = str(tmp_path / "catalog")
    sroot = str(tmp_path / "state")
    droot = str(tmp_path / "dim")
    b1 = [_r(f"r{i % 3}", f"f{i}.py", i) for i in range(1, 21)]

    with catalog.transaction(croot, note="batch 1") as tx:
        m1 = sink.apply_incremental_mor(sroot, ray.data.from_arrow(_mk(b1)),
                                        num_buckets=4, num_partitions=4)
        m2 = sink.apply_incremental_scd2(droot, ray.data.from_arrow(_mk(b1)),
                                         num_buckets=4, num_partitions=4)
        tx.pin("state", sroot, m1.version)
        tx.pin("dim", droot, m2.version)
    snap1 = catalog.current_snapshot_id(croot)
    s1 = _state(catalog.read_table(croot, "state"))
    d1 = catalog.read_table(croot, "dim").count()

    # batch 2: table commits land, but the transaction FAILS before the
    # snapshot — catalog readers keep the old consistent pair
    b2 = [_r("r0", "f1.py", 100, content="XX"),
          _r("r1", "f2.py", 101, op="delete")]
    with pytest.raises(RuntimeError):
        with catalog.transaction(croot, note="batch 2 (crashes)") as tx:
            m1 = sink.apply_incremental_mor(
                sroot, ray.data.from_arrow(_mk(b2)),
                num_buckets=4, num_partitions=4)
            tx.pin("state", sroot, m1.version)
            raise RuntimeError("dim commit crashed")
    assert catalog.current_snapshot_id(croot) == snap1
    assert _state(catalog.read_table(croot, "state")) == s1
    assert sink.current_version(sroot) == 2     # durable but unpublished

    # retry the whole batch: the state re-apply no-ops (watermark), the
    # dim commit lands, ONE snapshot publishes a consistent pair
    with catalog.transaction(croot, note="batch 2 retry") as tx:
        m1 = sink.apply_incremental_mor(sroot, ray.data.from_arrow(_mk(b2)),
                                        num_buckets=4, num_partitions=4)
        m2 = sink.apply_incremental_scd2(droot, ray.data.from_arrow(_mk(b2)),
                                         num_buckets=4, num_partitions=4)
        tx.pin("state", sroot, m1.version)
        tx.pin("dim", droot, m2.version)
    assert m1.version == 2                       # no-op returned v2
    s2 = _state(catalog.read_table(croot, "state"))
    assert ("r1", "f2.py") not in s2 and s2 != s1
    assert catalog.read_table(croot, "dim").count() > d1

    # time travel: the OLD snapshot still reads the old pair even though
    # both table roots' CURRENT moved on
    assert _state(catalog.read_table(croot, "state",
                                     snapshot=snap1)) == s1

    # partial update composes: repin only one table, the other carries
    catalog.commit_snapshot(croot, {"state": (sroot, 2)}, note="repin")
    snap = catalog.read_snapshot(croot)
    assert snap["tables"]["dim"]["version"] == 2

    pins = catalog.pinned_versions(croot, keep_last=2)
    import os
    assert {2} <= pins[os.path.abspath(sroot)]


def test_gc_respects_catalog_pins(tmp_path):
    import os
    croot = str(tmp_path / "catalog")
    sroot = str(tmp_path / "state")
    rows = [_r(f"r{i % 2}", f"f{i}.py", i) for i in range(1, 11)]
    m1 = sink.apply_incremental_mor(sroot, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=2, num_partitions=2)
    catalog.commit_snapshot(croot, {"state": (sroot, m1.version)})
    for seq in (100, 101, 102):
        sink.apply_incremental_mor(
            sroot, ray.data.from_arrow(_mk([_r("r0", "f1.py", seq)])),
            num_buckets=2, num_partitions=2)
    pins = catalog.pinned_versions(croot).get(os.path.abspath(sroot),
                                              set())
    assert 1 in pins
    deleted = sink.gc_versions(sroot, keep_last=1, pinned=pins)
    assert 1 not in deleted and deleted == [2, 3]
    # the pinned snapshot still reads
    assert catalog.read_table(croot, "state").count() == 10


def test_refs_tag_branch_semantics(tmp_path):
    import os
    croot = str(tmp_path / "catalog")
    sroot = str(tmp_path / "state")
    rows = [_r(f"r{i % 2}", f"f{i}.py", i) for i in range(1, 11)]
    m1 = sink.apply_incremental_mor(sroot, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=2, num_partitions=2)
    s1 = catalog.commit_snapshot(croot, {"state": (sroot, m1.version)})
    catalog.create_tag(croot, "audit-2026-08-19")
    catalog.create_branch(croot, "prod")
    # ingest advances the chain; refs stay where they were
    m2 = sink.apply_incremental_mor(
        sroot, ray.data.from_arrow(_mk([_r("r0", "f1.py", 100,
                                           content="XX")])),
        num_buckets=2, num_partitions=2)
    s2 = catalog.commit_snapshot(croot, {"state": (sroot, m2.version)})
    assert s2 == s1 + 1
    assert catalog.resolve_ref(croot, "prod") == s1
    assert catalog.resolve_ref(croot, "audit-2026-08-19") == s1
    # readers through the branch see the OLD validated state
    old = _state(catalog.read_table(croot, "state", ref="prod"))
    new = _state(catalog.read_table(croot, "state"))
    assert old != new and len(old) == 10 and len(new) == 11
    # promotion: CAS advance; a stale expectation refuses
    catalog.advance_branch(croot, "prod", s2, expect=s1)
    assert _state(catalog.read_table(croot, "state", ref="prod")) == new
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        catalog.advance_branch(croot, "prod", s1, expect=s1)
    # tags are immutable and exclusive
    with _pytest.raises(ValueError):
        catalog.advance_branch(croot, "audit-2026-08-19", s2)
    with _pytest.raises(FileExistsError):
        catalog.create_tag(croot, "audit-2026-08-19", snapshot=s2)
    refs = catalog.list_refs(croot)
    assert refs["prod"]["type"] == "branch"
    assert refs["audit-2026-08-19"]["type"] == "tag"
    catalog.delete_ref(croot, "audit-2026-08-19")
    assert "audit-2026-08-19" not in catalog.list_refs(croot)


def test_refs_protect_versions_from_gc(tmp_path):
    import os
    croot = str(tmp_path / "catalog")
    sroot = str(tmp_path / "state")
    rows = [_r(f"r{i % 2}", f"f{i}.py", i) for i in range(1, 11)]
    m1 = sink.apply_incremental_mor(sroot, ray.data.from_arrow(_mk(rows)),
                                    num_buckets=2, num_partitions=2)
    catalog.commit_snapshot(croot, {"state": (sroot, m1.version)})
    catalog.create_tag(croot, "keep-me")
    # four more snapshots push the tag far outside keep_last=2
    for seq in (100, 101, 102, 103):
        m = sink.apply_incremental_mor(
            sroot, ray.data.from_arrow(_mk([_r("r0", "f1.py", seq)])),
            num_buckets=2, num_partitions=2)
        catalog.commit_snapshot(croot, {"state": (sroot, m.version)})
    pins = catalog.pinned_versions(croot, keep_last=2).get(
        os.path.abspath(sroot), set())
    assert 1 in pins, "tagged snapshot's table version must stay pinned"
    deleted = sink.gc_versions(sroot, keep_last=1, pinned=pins)
    assert 1 not in deleted
    # the tagged state still reads exactly
    assert catalog.read_table(croot, "state", ref="keep-me").count() == 10
