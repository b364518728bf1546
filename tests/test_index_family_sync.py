"""ONE CDC sink feed drives the full incremental-index family — near-dup
LSH (incdedup), embedding ANN (incann), inverted text (incinv) — with a
catalog transaction pinning the three index versions consistently. This
is the lake -> indexes leg of a training-data platform at 100 TB: each
index's maintenance cost tracks the upstream commit (feed rows), never
the corpus, and updates/deletes propagate to ALL indexes exactly once.
No Kettle analog (reference scope is row-stream transforms)."""

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from kettleray.io import catalog, sink
from kettleray.ops import incann, incdedup, incinv
from kettleray.ops.incdedup import stable_doc_id

# ~30 words so a one-word tail edit stays a >0.8-Jaccard near-dup under
# 3-shingles; A/B are EXACT dups (deterministic LSH hit at jaccard 1.0)
TEXT_A = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
          "lamda mu alpha beta gamma delta epsilon zeta eta theta "
          "iota kappa lamda mu alpha beta gamma delta epsilon zeta")
TEXT_C = ("nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
          "nu xi omicron pi rho sigma tau upsilon phi chi psi omega "
          "nu xi omicron pi rho sigma")
TEXT_D = ("quark lepton boson gluon photon hadron meson baryon muon "
          "tauon pion kaon quark lepton boson gluon photon hadron "
          "meson baryon muon tauon pion kaon quark lepton boson gluon")


def _ev(repo, path, seq, content, op="insert"):
    return {"repo": repo, "path": path, "commit": f"c{seq}",
            "lang": "py", "content": content, "op": op,
            "commit_seq": seq}


def _mk_events(rows):
    cols = {k: [r[k] for r in rows] for k in
            ("repo", "path", "commit", "lang", "content", "op",
             "commit_seq")}
    return rd.from_arrow(pa.table({
        k: pa.array(v, type=pa.int64() if k == "commit_seq"
                    else pa.string()) for k, v in cols.items()}))


def _sync_all(sroot, lsh_root, ann_root, inv_root, croot, note):
    """Sync every index off the same feed, then pin the trio in ONE
    catalog snapshot — readers see all three at a consistent feed
    epoch or none."""
    with catalog.transaction(croot, note=note) as tx:
        m_lsh = incdedup.sync_lsh_from_feed(
            sroot, lsh_root, num_perm=64, bands=16, shingle_k=3,
            threshold=0.5, num_buckets=8, num_partitions=2)
        m_ann = incann.sync_ann_from_feed(
            sroot, ann_root, dim=16, n_planes=4, num_id_buckets=8,
            num_partitions=2)
        m_inv = incinv.sync_inverted_from_feed(
            sroot, inv_root, num_shards=16, num_id_buckets=8,
            num_partitions=2)
        tx.pin("lsh", lsh_root, m_lsh["version"])
        tx.pin("ann", ann_root, m_ann["version"])
        tx.pin("inverted", inv_root, m_inv["version"])
    return m_lsh, m_ann, m_inv


def _inv_hits(inv_root, terms, mode="and"):
    t, _, _ = incinv.query_incremental_inverted(inv_root, terms,
                                                mode=mode)
    return set(t["doc_id"].to_pylist())


def _ann_topk(ann_root, text, k=3):
    q = np.asarray(incann.hash_embedding([text], 16)[0].as_py())
    t, _, _ = incann.query_ann(ann_root, q, k=k, probe_hamming=4)
    # query_ann names the id column after the committed id_col, which
    # sync_ann_from_feed pins to "vec_id"
    return t["vec_id"].to_pylist()


def test_feed_drives_all_three_indexes(tmp_path):
    sroot = os.path.join(str(tmp_path), "state")
    lsh_root = os.path.join(str(tmp_path), "lsh")
    ann_root = os.path.join(str(tmp_path), "ann")
    inv_root = os.path.join(str(tmp_path), "inv")
    croot = os.path.join(str(tmp_path), "catalog")
    ids = {n: int(stable_doc_id([r], [p])[0]) for n, (r, p) in
           {"a": ("r0", "a.py"), "b": ("r0", "b.py"),
            "c": ("r1", "c.py")}.items()}

    # ---- batch 1: a == b (exact dup), c distinct ----
    sink.apply_incremental_bucketed(
        sroot, _mk_events([_ev("r0", "a.py", 1, TEXT_A),
                           _ev("r0", "b.py", 2, TEXT_A),
                           _ev("r1", "c.py", 3, TEXT_C)]),
        num_buckets=4, num_partitions=2)
    _sync_all(sroot, lsh_root, ann_root, inv_root, croot, "bootstrap")
    snap1 = catalog.current_snapshot_id(croot)

    assert _inv_hits(inv_root, ["alpha"]) == {ids["a"], ids["b"]}
    assert _inv_hits(inv_root, ["sigma"]) == {ids["c"]}
    assert _ann_topk(ann_root, TEXT_C)[0] == ids["c"]
    pairs = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
             for r in incdedup.read_pairs(
                 lsh_root, num_partitions=2).take_all()}
    assert (min(ids["a"], ids["b"]), max(ids["a"], ids["b"])) in pairs
    assert not any(ids["c"] in p for p in pairs)

    # ---- batch 2: a rewritten (breaks the dup pair), c deleted ----
    sink.apply_incremental_bucketed(
        sroot, _mk_events([_ev("r0", "a.py", 4, TEXT_D, op="update"),
                           _ev("r1", "c.py", 5, "", op="delete")]),
        num_buckets=4, num_partitions=2)
    _sync_all(sroot, lsh_root, ann_root, inv_root, croot, "feed 2")

    # inverted: a's old words gone, new words live, c gone everywhere
    assert _inv_hits(inv_root, ["alpha"]) == {ids["b"]}
    assert _inv_hits(inv_root, ["quark"]) == {ids["a"]}
    assert _inv_hits(inv_root, ["sigma"]) == set()
    # ann: deleted id never returned; a found under its NEW embedding
    assert ids["c"] not in _ann_topk(ann_root, TEXT_C)
    assert _ann_topk(ann_root, TEXT_D)[0] == ids["a"]
    # lsh: the (a, b) pair died with a's update (supersede, not rescan)
    pairs2 = incdedup.read_pairs(lsh_root, num_partitions=2).take_all()
    assert pairs2 == []
    # probing with b's text must match b only, index untouched
    probe = incdedup.probe_lsh(
        lsh_root, rd.from_arrow(pa.table({
            "doc_id": pa.array([999], type=pa.int64()),
            "text": pa.array([TEXT_A], type=pa.string())})),
        num_partitions=2).take_all()
    assert {r["doc_b"] for r in probe} == {ids["b"]}

    # catalog: snapshot 2 pins the advanced trio; snapshot 1 still
    # resolves the OLD consistent versions (time travel)
    snap2 = catalog.current_snapshot_id(croot)
    assert snap2 == snap1 + 1
    s1 = catalog.read_snapshot(croot, snap1)["tables"]
    s2 = catalog.read_snapshot(croot, snap2)["tables"]
    for name in ("lsh", "ann", "inverted"):
        assert s2[name]["version"] > s1[name]["version"]

    # exactly-once: re-sync with no upstream change is a no-op for all
    v_before = (incdedup.current_version(lsh_root),
                incann.current_version(ann_root),
                incinv.current_version(inv_root))
    m_lsh, m_ann, m_inv = _sync_all(sroot, lsh_root, ann_root,
                                    inv_root, croot, "noop")
    assert (m_lsh["version"], m_ann["version"],
            m_inv["version"]) == v_before
