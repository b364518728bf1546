"""Zone maps (manifest file stats), pruned scans, clustered layout.

The scan contract: pruning is a pure optimization — scan_state(filters)
must equal read_state + exact filter on EVERY layout (hash-bucketed,
clustered, MOR with deltas), while the report proves files were skipped
once the layout is clustered by the filter column.
"""

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from kettleray.gen.synthetic import EventGenConfig, generate_events_local
from kettleray.io import sink

CFG = EventGenConfig(n_events=4000, n_repos=12, n_paths_per_repo=40,
                     p_delete=0.08, seed=77)


def _build(root, events, *, mor=False, num_buckets=8):
    apply = sink.apply_incremental_mor if mor \
        else sink.apply_incremental_bucketed
    return apply(root, ray.data.from_arrow(events), num_buckets=num_buckets,
                 num_partitions=4)


def _rows(ds, cols=("repo", "path", "content_sha256")):
    out = [tuple(r[c] for c in cols) for r in ds.take_all()]
    return sorted(out)


def _exact(root, filters, version=None):
    ds = sink.read_state(root, version)
    ds = sink._drop_bucket(ds)
    return ds.map_batches(
        lambda t: t.filter(sink._residual_mask(t, filters)),
        batch_format="pyarrow", batch_size=None)


def test_manifest_records_stats(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    man = sink.read_manifest(root)
    assert man.files
    for e in man.files:
        st = e.get("stats")
        assert st is not None
        # key columns are short strings -> both bounds present
        assert "repo" in st and st["repo"][0] <= st["repo"][1]
        assert "last_commit_seq" in st
        lo, hi = st["last_commit_seq"]
        assert isinstance(lo, int) and lo <= hi


def test_scan_equals_exact_filter_unclustered(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    filters = [("lang", "==", "py")]
    got = _rows(sink.scan_state(root, filters))
    want = _rows(_exact(root, filters))
    assert got == want and len(got) > 0


def test_clustered_scan_prunes_and_matches(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    total = sink.read_state(root).count()
    # cluster by lang with small files -> disjoint lang ranges per file
    man = sink.cluster_state(root, ("lang",), rows_per_file=40)
    assert man.metrics["cluster_by"] == ["lang"]
    assert sink.read_state(root).count() == total

    filters = [("lang", "==", "py")]
    rep = {}
    got = _rows(sink.scan_state(root, filters, report=rep))
    want = _rows(_exact(root, filters))
    assert got == want and len(got) > 0
    assert rep["files_pruned"] > 0
    assert rep["files_pruned"] + (rep["files_total"] -
                                  rep["files_pruned"]) == rep["files_total"]
    # pruning must actually bite: kept-file rows well under the table
    assert rep["rows_kept_files"] < total

    # range predicate on the sequence column
    f2 = [("last_commit_seq", ">=", 3000)]
    rep2 = {}
    got2 = _rows(sink.scan_state(root, f2, report=rep2),
                 cols=("repo", "path", "last_commit_seq"))
    want2 = _rows(_exact(root, f2),
                  cols=("repo", "path", "last_commit_seq"))
    assert got2 == want2


def test_scan_mor_deltas_never_pruned(tmp_path):
    """A delta row that moves a key INTO the predicate range must be
    found even when that key's base file is pruned, and one that moves a
    key OUT must not resurrect the stale base row."""
    root = str(tmp_path / "s")
    events = generate_events_local(CFG)
    _build(root, events, mor=True)
    sink.cluster_state(root, ("lang",), rows_per_file=40)

    st = pa.concat_tables(
        [b for b in sink._drop_bucket(sink.read_state(root))
         .iter_batches(batch_format="pyarrow")],
        promote_options="permissive")
    non_py = st.filter(pc.not_equal(st["lang"], "py")).slice(0, 1)
    py = st.filter(pc.equal(st["lang"], "py")).slice(0, 1)
    assert non_py.num_rows == 1 and py.num_rows == 1
    wm = sink.read_manifest(root).watermark

    def _ev(row, lang, seq):
        return pa.table({
            "repo": row["repo"], "path": row["path"],
            "commit": pa.array(["zz"]), "lang": pa.array([lang]),
            "content": pa.array(["moved-" + lang]),
            "op": pa.array(["update"]),
            "commit_seq": pa.array([seq], type=pa.int64())})

    delta = pa.concat_tables([_ev(non_py, "py", wm + 1),
                              _ev(py, "go", wm + 2)])
    sink.apply_incremental_mor(root, ray.data.from_arrow(delta),
                               num_buckets=8, num_partitions=4)

    rep = {}
    got = dict()
    for r in sink.scan_state(root, [("lang", "==", "py")],
                             report=rep).take_all():
        got[(r["repo"], r["path"])] = r["content"]
    moved_in = (non_py["repo"][0].as_py(), non_py["path"][0].as_py())
    moved_out = (py["repo"][0].as_py(), py["path"][0].as_py())
    assert got.get(moved_in) == "moved-py"
    assert moved_out not in got
    assert rep["delta_files"] > 0
    # exact equivalence on the merged layout too
    want = {(r["repo"], r["path"]): r["content"]
            for r in _exact(root, [("lang", "==", "py")]).take_all()}
    assert got == want


def test_scan_all_files_pruned_returns_typed_empty(tmp_path):
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    rep = {}
    ds = sink.scan_state(root, [("lang", "==", "zz-no-such-lang")],
                         report=rep)
    t = pa.concat_tables(
        [b for b in ds.iter_batches(batch_format="pyarrow")],
        promote_options="permissive") if ds.count() else None
    assert ds.count() == 0
    # clustered or not, an impossible predicate on a short string column
    # may or may not prune everything; equivalence is the contract
    assert rep["files_total"] >= rep["files_pruned"] >= 0
    assert t is None


def test_prunable_logic_units():
    st = {"x": [10, 20], "s": ["bb", "dd"]}
    P = sink._file_prunable
    assert P(st, "x", "==", 5) and P(st, "x", "==", 25)
    assert not P(st, "x", "==", 10) and not P(st, "x", "==", 20)
    assert P(st, "x", "<", 10) and not P(st, "x", "<", 11)
    assert P(st, "x", "<=", 9) and not P(st, "x", "<=", 10)
    assert P(st, "x", ">", 20) and not P(st, "x", ">", 19)
    assert P(st, "x", ">=", 21) and not P(st, "x", ">=", 20)
    assert not P(st, "x", "!=", 15)
    assert P({"x": [7, 7]}, "x", "!=", 7)
    assert P(st, "s", "==", "aa") and not P(st, "s", "==", "cc")
    assert not P(st, "y", "==", 1)          # unstated column
    assert not P(None, "x", "==", 1)        # no stats at all
    assert not P(st, "x", "==", "str")      # cross-type: keep


def test_zorder_scan_prunes_both_dimensions_and_matches(tmp_path):
    """order='zorder' gives every file a bounded envelope in EVERY
    cluster column: a range filter on the leading dim AND an equality
    on the trailing dim both prune files, and results stay exact."""
    root = str(tmp_path / "s")
    _build(root, generate_events_local(CFG))
    man = sink.cluster_state(root, ("last_commit_seq", "lang"),
                             rows_per_file=16, order="zorder")
    assert man.metrics["cluster_order"] == "zorder"

    # final-state seqs skew high (a key keeps its LAST event's seq);
    # ~25th percentile keeps rows on every filter while leaving whole
    # files above the cut for the zone maps to prune
    mid = 3100
    for filters in ([("last_commit_seq", "<", mid)],
                    [("lang", "==", "py")],
                    [("last_commit_seq", "<", mid), ("lang", "==", "py")]):
        rep = {}
        got = _rows(sink.scan_state(root, filters, report=rep))
        want = _rows(_exact(root, filters))
        assert got == want, filters
        assert len(got) > 0, filters
        assert rep["files_pruned"] > 0, (filters, rep)


def test_zorder_prunes_trailing_dim_where_lex_cannot(tmp_path):
    """The discriminating case: lexicographic clustering by
    (last_commit_seq, lang) leaves lang interleaved in every file;
    z-order bounds it. Same corpus, same filter, strictly more pruning
    from zorder on the TRAILING column."""
    root_lex = str(tmp_path / "lex")
    root_z = str(tmp_path / "z")
    ev = generate_events_local(CFG)
    _build(root_lex, ev)
    _build(root_z, ev)
    sink.cluster_state(root_lex, ("last_commit_seq", "lang"),
                       rows_per_file=16, order="lex")
    sink.cluster_state(root_z, ("last_commit_seq", "lang"),
                       rows_per_file=16, order="zorder")
    f = [("lang", "==", "py")]
    rep_lex, rep_z = {}, {}
    got_lex = _rows(sink.scan_state(root_lex, f, report=rep_lex))
    got_z = _rows(sink.scan_state(root_z, f, report=rep_z))
    assert got_lex == got_z
    assert rep_z["files_pruned"] > rep_lex["files_pruned"], \
        (rep_lex, rep_z)


def test_zorder_codes_envelope_property():
    """Sorting by the Morton code and chunking gives each chunk a
    tighter 2-D envelope than interleaved (unsorted) order: total
    envelope AREA across chunks must shrink."""
    import numpy as np
    rng = np.random.RandomState(3)
    n = 1024
    t = pa.table({"a": rng.permutation(n).astype("int64"),
                  "b": rng.permutation(n).astype("int64")})
    z = sink._zorder_codes(t, ["a", "b"])
    order = np.argsort(z, kind="stable")
    a = t["a"].to_numpy()[order]
    b = t["b"].to_numpy()[order]

    def area(av, bv, chunk=64):
        tot = 0
        for i in range(0, len(av), chunk):
            sa, sb = av[i:i + chunk], bv[i:i + chunk]
            tot += (sa.max() - sa.min()) * (sb.max() - sb.min())
        return tot

    assert area(a, b) < area(t["a"].to_numpy(), t["b"].to_numpy()) / 4


def test_zorder_codes_many_columns_clamps_bits():
    """>4 cluster columns must clamp bits to 64 // ncols instead of
    shifting past bit 63 (numpy shifts >= 64 are undefined and would
    silently garble the Morton order)."""
    import numpy as np
    rng = np.random.RandomState(7)
    n = 256
    cols = {f"c{i}": rng.permutation(n).astype("int64") for i in range(5)}
    t = pa.table(cols)
    z = sink._zorder_codes(t, list(cols))
    # 5 cols x 12 bits = 60 used bit positions; codes must stay distinct
    # enough to order (not collapse to a handful of garbled values)
    assert len(np.unique(z)) > n // 4
    # determinism
    assert np.array_equal(z, sink._zorder_codes(t, list(cols)))


def test_zorder_codes_string_column_with_nulls():
    """A string cluster column containing nulls must rank (nulls
    lowest), not raise from None < str comparisons."""
    import numpy as np
    t = pa.table({
        "s": pa.array(["b", None, "a", "c", None, "b"]),
        "x": pa.array([5, 3, 1, 6, 2, 4], type=pa.int64())})
    z = sink._zorder_codes(t, ["s", "x"])
    assert len(z) == 6
    # nulls rank lowest: the two null rows get the smallest s-rank, so
    # with x=2,3 small too their codes sort before the 'c' row
    order = np.argsort(z, kind="stable")
    assert set(order[:2].tolist()) & {1, 4}
