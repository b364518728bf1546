"""Incrementally maintained inverted index (ops/incinv.py): incremental
commits == python tokenize oracle over the final corpus, supersede
across word shards, tombstones, COW hardlinks, compaction, feed sync."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from kettleray.ops import incinv

KW = dict(id_col="doc_id", text_col="text", num_shards=16,
          num_id_buckets=8, num_partitions=2)

WORDS = ["alpha", "beta", "gamma", "delta", "epsilon",
         "zeta", "eta", "theta", "iota", "kappa"]


def _text(i: int) -> str:
    a, b, c = WORDS[i % 10], WORDS[(i + 1) % 10], WORDS[(i + 3) % 10]
    return f"{a} {b} {a} {c} {a}" if i % 2 else f"{a} {b} {c}"


@pytest.fixture()
def root(tmp_path):
    d = os.path.join(str(tmp_path), "inv_index")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ds(ids, texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(ids), type=pa.int64()),
        "text": pa.array(list(texts), type=pa.string())}))


def _final_corpus(n=60):
    """doc_id -> text after: 3 insert commits (id%3), update commit
    (id%10==7 -> text of id-5: entirely different words, so the update
    CROSSES shards), delete commit (id%13==4)."""
    final = {i: _text(i) for i in range(n)}
    for i in range(n):
        if i % 10 == 7 and i - 5 >= 0:
            final[i] = _text(i - 5)
    for i in range(n):
        if i % 13 == 4:
            final.pop(i, None)
    return final


def _commit_sequence(root, n=60, **kw):
    ids = np.arange(n)
    for r in (0, 1, 2):
        sel = ids[ids % 3 == r]
        incinv.apply_incremental_inverted(
            root, _ds(sel, [_text(i) for i in sel]), **kw)
    upd = ids[(ids % 10 == 7) & (ids >= 5)]
    incinv.apply_incremental_inverted(
        root, _ds(upd, [_text(i - 5) for i in upd]), **kw)
    dels = ids[ids % 13 == 4]
    incinv.apply_incremental_inverted(root, None,
                                      deletes=dels.tolist(), **kw)
    return _final_corpus(n)


def _expected(final, terms, mode):
    terms = sorted({t.lower() for t in terms})
    out = {}
    for i, txt in final.items():
        toks = txt.lower().split()
        tfs = {t: toks.count(t) for t in terms}
        hits = [t for t in terms if tfs[t] > 0]
        ok = len(hits) == len(terms) if mode == "and" else bool(hits)
        if ok:
            out[i] = (len(hits), sum(tfs[t] for t in hits))
    return out


def _got(root, terms, mode="and", **qkw):
    t, nread, ntotal = incinv.query_incremental_inverted(
        root, terms, mode=mode, **qkw)
    return {int(r["doc_id"]): (int(r["n_terms"]), int(r["sum_tf"]))
            for r in t.to_pylist()}, nread, ntotal


QUERIES = [(["alpha"], "and"), (["alpha", "beta"], "and"),
           (["alpha", "beta"], "or"), (["gamma", "iota", "zeta"], "or"),
           (["kappa", "delta"], "and"), (["nosuchword"], "or"),
           (["alpha", "nosuchword"], "and"),
           (["alpha", "nosuchword"], "or")]


def test_incremental_matches_oracle(root):
    final = _commit_sequence(root, **KW)
    for terms, mode in QUERIES:
        got, _, _ = _got(root, terms, mode)
        assert got == _expected(final, terms, mode), (terms, mode)


def test_query_prunes_to_term_shards(root):
    _commit_sequence(root, **KW)
    _, nread, ntotal = _got(root, ["alpha"])
    assert 0 < nread < ntotal


def test_large_commit_path_matches_oracle(root):
    """small_max_rows=0 forces the distributed shuffle path for every
    commit — same results as the driver-bounded path."""
    final = _commit_sequence(root, small_max_rows=0, **KW)
    for terms, mode in QUERIES[:4]:
        got, _, _ = _got(root, terms, mode)
        assert got == _expected(final, terms, mode), (terms, mode)


def test_delete_wins_same_commit_tie(root):
    incinv.apply_incremental_inverted(
        root, _ds([1, 2], [_text(1), _text(2)]), **KW)
    incinv.apply_incremental_inverted(
        root, _ds([2, 3], [_text(2), _text(3)]), deletes=[2], **KW)
    got, _, _ = _got(root, WORDS, mode="or")
    assert set(got) == {1, 3}


def test_compact_folds_and_preserves_results(root):
    final = _commit_sequence(root, **KW)
    before = incinv.inverted_fragment_stats(root)
    assert before["live_tombstones"] > 0
    man = incinv.compact_inverted(root)
    after = incinv.inverted_fragment_stats(root)
    assert after["live_tombstones"] == 0
    assert after["max_fragments"] == 1
    assert man["counts"]["live_rows"] <= man["counts"]["folded_rows"]
    for terms, mode in QUERIES:
        got, _, _ = _got(root, terms, mode)
        assert got == _expected(final, terms, mode), (terms, mode)


def test_compact_sums_block_split_partials(root):
    """A doc whose posting rows arrive as multiple same-version partial
    rows (block-split map-side combine) keeps its TOTAL tf through
    compaction."""
    # two single-doc datasets unioned -> two blocks, same commit, same v
    d = _ds([5], ["alpha alpha beta"]).union(
        _ds([5], ["alpha gamma"]))
    # NB: same doc id in two blocks of ONE commit = block-split
    # partials of a doc whose full text is the concatenation
    incinv.apply_incremental_inverted(root, d, **KW)
    got, _, _ = _got(root, ["alpha"])
    assert got == {5: (1, 3)}
    incinv.compact_inverted(root)
    got2, _, _ = _got(root, ["alpha"])
    assert got2 == {5: (1, 3)}


def test_untouched_shards_hardlink_forward(root):
    incinv.apply_incremental_inverted(
        root, _ds([1], ["alpha beta gamma"]), **KW)
    v1 = incinv.current_version(root)
    frag_inodes = {}
    vdir = incinv._vdir(root, v1)
    for base, _, names in os.walk(os.path.join(vdir, "postings")):
        for f in names:
            if f.endswith(".parquet"):
                p = os.path.join(base, f)
                frag_inodes[os.path.relpath(p, vdir)] = os.stat(p).st_ino
    incinv.apply_incremental_inverted(
        root, _ds([2], ["alpha beta gamma"]), **KW)
    v2dir = incinv._vdir(root, incinv.current_version(root))
    carried = 0
    for rel, ino in frag_inodes.items():
        p2 = os.path.join(v2dir, rel)
        assert os.path.exists(p2)
        if os.stat(p2).st_ino == ino:
            carried += 1
    assert carried == len(frag_inodes)   # v1 fragments all linked, not copied


def test_gc_expires_old_versions(root):
    final = _commit_sequence(root, **KW)
    deleted = incinv.gc_inverted(root, keep_last=2, stage_min_age_s=0.0)
    assert deleted and max(deleted) < incinv.current_version(root)
    got, _, _ = _got(root, ["alpha", "beta"], "or")
    assert got == _expected(final, ["alpha", "beta"], "or")


def test_fsck_clean_and_detects_misfiled_word(root):
    _commit_sequence(root, **KW)
    audit = incinv.fsck_inverted(root)
    assert audit["ok"], audit["errors"]
    # plant a misfiled word: copy a fragment into the wrong shard dir
    v = incinv.current_version(root)
    vdir = incinv._vdir(root, v)
    base = os.path.join(vdir, "postings")
    shards = sorted(os.listdir(base))
    src_dir = os.path.join(base, shards[0])
    src = [f for f in os.listdir(src_dir) if f.endswith(".parquet")][0]
    wrong = os.path.join(base, shards[1] if len(shards) > 1
                         else "bucket=999")
    os.makedirs(wrong, exist_ok=True)
    shutil.copy(os.path.join(src_dir, src),
                os.path.join(wrong, "frag-v9999-0.bad.parquet"))
    audit2 = incinv.fsck_inverted(root)
    assert not audit2["ok"]


def test_maybe_compact_policy(root):
    for i in range(4):
        incinv.apply_incremental_inverted(
            root, _ds([i], [f"alpha doc{i}"]), **KW)
    assert incinv.maybe_compact_inverted(root, max_fragments=99) is None
    man = incinv.maybe_compact_inverted(root, max_fragments=2)
    assert man is not None
    assert incinv.inverted_fragment_stats(root)["max_fragments"] == 1


def _mk_events(rows):
    cols = {k: [r[k] for r in rows]
            for k in ("repo", "path", "commit", "lang", "content",
                      "op", "commit_seq")}
    t = pa.table({**cols, "commit_seq": pa.array(cols["commit_seq"],
                                                 type=pa.int64())})
    return rd.from_arrow(t)


def _ev(repo, path, seq, content, op="insert"):
    return {"repo": repo, "path": path, "commit": f"c{seq}",
            "lang": "py", "content": content, "op": op,
            "commit_seq": seq}


def test_feed_sync_bootstrap_then_incremental(root, tmp_path):
    """Lake -> text-search leg: bootstrap from sink state, then consume
    ONLY the change feed (update + delete), exactly-once cursor."""
    from kettleray.io import sink
    from kettleray.ops.incdedup import stable_doc_id
    sroot = os.path.join(str(tmp_path), "state")
    b1 = [_ev("r0", "a.py", 1, "alpha beta gamma"),
          _ev("r0", "b.py", 2, "delta epsilon zeta"),
          _ev("r1", "c.py", 3, "alpha kappa iota")]
    sink.apply_incremental_bucketed(sroot, _mk_events(b1),
                                    num_buckets=4, num_partitions=2)
    man = incinv.sync_inverted_from_feed(sroot, root, **{
        k: v for k, v in KW.items() if k not in ("id_col", "text_col")})
    assert man["counts"]["new_docs"] == 3
    ids = {name: int(stable_doc_id([r], [p])[0])
           for name, (r, p) in {"a": ("r0", "a.py"),
                                "b": ("r0", "b.py"),
                                "c": ("r1", "c.py")}.items()}
    got, _, _ = _got(root, ["alpha"])
    assert set(got) == {ids["a"], ids["c"]}
    # update a.py (new words entirely), delete c.py
    b2 = [_ev("r0", "a.py", 4, "theta iota", op="update"),
          _ev("r1", "c.py", 5, "", op="delete")]
    sink.apply_incremental_bucketed(sroot, _mk_events(b2),
                                    num_buckets=4, num_partitions=2)
    incinv.sync_inverted_from_feed(sroot, root, **{
        k: v for k, v in KW.items() if k not in ("id_col", "text_col")})
    got, _, _ = _got(root, ["alpha"])
    assert got == {}                       # a updated away, c deleted
    got, _, _ = _got(root, ["theta", "iota"], "and")
    assert set(got) == {ids["a"]}
    # exactly-once: a re-sync with no upstream change is a no-op
    v = incinv.current_version(root)
    man2 = incinv.sync_inverted_from_feed(sroot, root, **{
        k: v2 for k, v2 in KW.items()
        if k not in ("id_col", "text_col")})
    assert man2["version"] == v
