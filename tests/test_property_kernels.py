"""Property-based tests: random event logs vs the oracle replayer.

Goes beyond the reference's example-based tests (SURVEY.md §5 notes the
reference has no randomized testing): hypothesis generates adversarial
little logs — duplicate seqs across keys, redeliveries, delete-then-
reinsert chains — and the vectorized kernels must match the
single-threaded oracle on every one.
"""

import hashlib

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from kettleray.gen.oracle import replay_oracle, scd2_oracle
from kettleray.ops import cdc

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c")]


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        k = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        content = "" if op == "delete" else draw(
            st.text(alphabet="abcxyz ", min_size=0, max_size=8))
        rows.append({
            "repo": k[0], "path": k[1],
            "commit": f"c{i:04d}", "lang": "py",
            "content": content, "op": op, "commit_seq": i,
        })
    # redeliver a random subset verbatim (exactly-once fodder)
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=5))
    for i in dup_idx:
        rows.append(dict(rows[i]))
    return pa.Table.from_pylist(rows)


def _lww_via_kernels(t: pa.Table) -> dict:
    """Apply the same kernels the distributed pipeline runs, single-block
    (block boundaries are covered by the Ray-level tests)."""
    r = cdc.lww_reduce_table(t)
    r = cdc.finalize_state_table(r)
    return {(row["repo"], row["path"]): row for row in r.to_pylist()}


@settings(max_examples=150, deadline=None)
@given(event_logs())
def test_lww_kernel_matches_oracle(t):
    got = _lww_via_kernels(t)
    want = replay_oracle(t)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"]
        assert got[k]["last_commit_seq"] == want[k]["last_commit_seq"]


@settings(max_examples=100, deadline=None)
@given(event_logs())
def test_scd2_kernel_matches_oracle(t):
    got = cdc.scd2_history_table(t).to_pylist()
    want = scd2_oracle(t)
    gk = {(r["repo"], r["path"], r["version"]): r for r in got}
    wk = {(r["repo"], r["path"], r["version"]): r for r in want}
    assert set(gk) == set(wk)
    for k in wk:
        for col in ("valid_from_seq", "valid_to_seq", "is_current",
                    "content_sha256"):
            assert gk[k][col] == wk[k][col], (k, col)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=30))
def test_sha256_buffer_path_matches_hashlib(vals):
    arr = pa.array(vals, type=pa.string())
    got = cdc.sha256_hex_array(arr).to_pylist()
    want = [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want


@given(event_logs())
@settings(max_examples=40, deadline=None)
def test_sync_after_merge_roundtrip_property(t):
    """sync(old_state, diff(old, new)) == new_state for arbitrary little
    logs (split at the midpoint seq) — pure-kernel version of the
    cdc_sync_roundtrip driver query."""
    import pyarrow.compute as pc
    from kettleray.ops.cdc import (FLAG_IDENTICAL, OP_DELETE, OP_INSERT,
                                   diff_snapshots, lww_reduce_table,
                                   finalize_state_table, scd2_history_table)
    # kernel-level equivalents (single block, no Ray round trip)
    def state_of(tbl):
        return finalize_state_table(lww_reduce_table(
            cdc.dedup_events_table(tbl)))
    seqs = t["commit_seq"].to_pylist()
    cut = sorted(seqs)[len(seqs) // 2]
    old_t = t.filter(pc.less(t["commit_seq"], cut))
    old = state_of(old_t) if old_t.num_rows else \
        state_of(t.slice(0, 1)).slice(0, 0)
    new = state_of(t)
    # flagged diff computed the dumb way for the property
    ok = {(r["repo"], r["path"]): r for r in old.to_pylist()}
    nk = {(r["repo"], r["path"]): r for r in new.to_pylist()}
    flagged = []
    for k in set(ok) | set(nk):
        if k in ok and k not in nk:
            flagged.append({**ok[k], "change_type": "deleted"})
        elif k in nk and k not in ok:
            flagged.append({**nk[k], "change_type": "new"})
        elif ok[k]["content_sha256"] == nk[k]["content_sha256"]:
            flagged.append({**nk[k], "change_type": "identical"})
        else:
            flagged.append({**nk[k], "change_type": "changed"})
    # apply via the same event construction sync_after_merge uses
    rows = []
    for r in old.to_pylist():
        rows.append({**{c: r[c] for c in ("repo", "path", "commit",
                                          "lang", "content")},
                     "op": OP_INSERT, "commit_seq": r["last_commit_seq"]})
    for r in flagged:
        if r["change_type"] == FLAG_IDENTICAL:
            continue
        is_del = r["change_type"] == "deleted"
        rows.append({**{c: r[c] for c in ("repo", "path", "commit",
                                          "lang", "content")},
                     "op": OP_DELETE if is_del else OP_INSERT,
                     "commit_seq": r["last_commit_seq"] + int(is_del)})
    if not rows:
        return
    merged = pa.Table.from_pylist(rows)
    synced = finalize_state_table(lww_reduce_table(merged))
    got = {(r["repo"], r["path"]): r["content_sha256"]
           for r in synced.to_pylist()}
    want = {(r["repo"], r["path"]): r["content_sha256"]
            for r in new.to_pylist()}
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 5), st.floats(
    allow_nan=False, allow_infinity=False, width=32)),
    min_size=1, max_size=60))
@settings(max_examples=10, deadline=None)
def test_top_k_per_group_matches_pandas(rows):
    import pandas as pd
    import ray.data
    from kettleray.ops.aggregates import top_k_per_group
    # unique order values per group to avoid tie ambiguity
    df = pd.DataFrame(rows, columns=["g", "v"]).drop_duplicates(["g", "v"])
    t = pa.Table.from_pandas(df, preserve_index=False)
    got = top_k_per_group(ray.data.from_arrow(t), ["g"], "v", 2,
                          descending=True, num_partitions=2,
                          rank_col=None).take_all()
    want = df.sort_values("v", ascending=False).groupby("g").head(2)
    gset = {(r["g"], r["v"]) for r in got}
    wset = set(map(tuple, want[["g", "v"]].itertuples(index=False)))
    assert gset == wset


@given(st.lists(st.text(alphabet="abç日 x", min_size=0, max_size=6),
                min_size=1, max_size=30))
@settings(max_examples=30, deadline=None)
def test_hash_hex_md5_buffer_path(vals):
    from kettleray.ops.cdc import hash_hex_array
    arr = pa.array(vals, type=pa.string())
    got = hash_hex_array(arr, "md5").to_pylist()
    want = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want


@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                min_size=1, max_size=40),
       st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                min_size=1, max_size=40),
       st.booleans())
@settings(max_examples=10, deadline=None)
def test_asof_join_matches_pandas_merge_asof(lrows, rrows, strict):
    """asof_join == pandas merge_asof (backward) for random keyed data,
    both strict and non-strict, under distributed partitioning."""
    import pandas as pd
    import ray.data
    from kettleray.ops.joins import asof_join
    ldf = pd.DataFrame(lrows, columns=["k", "t"]).drop_duplicates()
    ldf["lid"] = range(len(ldf))
    # unique (k, t) on the right so the match is well-defined
    rdf = pd.DataFrame(rrows, columns=["k", "t"]).drop_duplicates(["k", "t"])
    rdf["rv"] = rdf["k"] * 1000 + rdf["t"]
    got = asof_join(
        ray.data.from_pandas(ldf).repartition(3),
        ray.data.from_pandas(rdf).repartition(2),
        by=["k"], on="t", right_cols=["rv"], num_partitions=2,
        strict=strict).take_all()
    want = pd.merge_asof(
        ldf.sort_values("t", kind="stable"),
        rdf.sort_values("t", kind="stable"),
        on="t", by="k", direction="backward",
        allow_exact_matches=not strict)
    wmap = {r.lid: (None if pd.isna(r.rv) else int(r.rv))
            for r in want.itertuples()}
    gmap = {r["lid"]: r["rv"] for r in got}
    assert gmap == wmap


def test_needleman_wunsch_and_pair_similarity():
    from kettleray.ops.calculator import (_levenshtein, _needleman_wunsch,
                                          _pair_similarity)
    # default unit penalties: NW score == -levenshtein
    for x, y in [("kitten", "sitting"), ("", "abc"), ("same", "same"),
                 ("flaw", "lawn")]:
        assert _needleman_wunsch(x, y) == -_levenshtein(x, y)
    # custom scoring: classic textbook case
    assert _needleman_wunsch("GATTACA", "GATTACA",
                             match=1, mismatch=-1, gap=-2) == 7
    assert _needleman_wunsch(None, "x") is None
    # Simon White letter pairs: FRANCE vs FRENCH = 2*2/(5+5) = 0.4
    assert abs(_pair_similarity("FRANCE", "FRENCH") - 0.4) < 1e-12
    assert _pair_similarity("a", "a") == 1.0       # no pairs, equal
    assert _pair_similarity("a", "b") == 0.0
    assert _pair_similarity("x", None) is None


def test_script_step_rejects_unsafe_syntax():
    import pytest
    from kettleray.ops.formula import compile_script
    for bad in ("import os", "__import__('os')", "open('/etc/passwd')",
                "x = (1).__class__", "for i in [1]: x = i",
                "x = [r for r in rows]", "def f(): pass"):
        with pytest.raises(ValueError):
            compile_script(bad)
    run, targets = compile_script("a = x + 1\nb = a * 2\n")
    import numpy as np
    out = run({"x": np.array([1, 2])})
    assert targets == ["a", "b"]
    assert out["b"].tolist() == [4, 6]


def test_calculator_base64_roundtrip():
    import pyarrow as pa
    import ray.data
    from kettleray.ops import calculator as calc
    ds = ray.data.from_arrow(pa.table({"s": ["hello", "wörld", None]}))
    out = calc.calculator(ds, [
        calc.CalcOp("enc", "base64_encode", a="s"),
        calc.CalcOp("dec", "base64_decode", a="enc"),
    ]).take_all()
    assert [r["dec"] for r in out] == ["hello", "wörld", None]
    assert out[0]["enc"] == "aGVsbG8="


def test_holistic_group_by_null_semantics_match_pandas():
    """Null handling parity with pandas skipna groupby (randomized)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data
    from kettleray.ops import aggregates as ag

    for seed in (0, 1, 2):
        rng = np.random.RandomState(seed)
        n = 300
        x = rng.randn(n) * 5
        x[rng.rand(n) < 0.3] = np.nan
        s = np.array([f"s{v}" for v in rng.randint(0, 4, n)], dtype=object)
        s[rng.rand(n) < 0.3] = None
        df = pd.DataFrame({"g": rng.randint(0, 9, n),
                           "o": rng.permutation(n),
                           "x": x, "s": s})
        # one group entirely null
        df.loc[df["g"] == 0, "x"] = np.nan
        df.loc[df["g"] == 1, "s"] = None
        ds = ray.data.from_arrow(pa.Table.from_pandas(df))
        got = pd.DataFrame(ag._holistic_group_by(ds, ["g"], [
            ag.Agg("x", "first", "f", order_col="o"),
            ag.Agg("x", "last", "l", order_col="o"),
            ag.Agg("x", "sum", "sm"),
            ag.Agg("x", "avg", "av"),
            ag.Agg("x", "std", "sd"),
            ag.Agg("x", "median", "md"),
            ag.Agg("x", "min", "mn"),
            ag.Agg("x", "max", "mx"),
            ag.Agg("x", "count", "cnt"),
            ag.Agg("s", "count_distinct", "nd"),
            ag.Agg("s", "min", "smin"),
        ], num_partitions=3).take_all()).set_index("g").sort_index()
        sdf = df.sort_values("o", kind="mergesort")
        gb = sdf.groupby("g")
        ref = pd.DataFrame({
            "f": gb["x"].first(), "l": gb["x"].last(),
            "sm": gb["x"].sum(), "av": gb["x"].mean(),
            "sd": gb["x"].std(), "md": gb["x"].median(),
            "mn": gb["x"].min(), "mx": gb["x"].max(),
            "cnt": gb["x"].count(), "nd": gb["s"].nunique(),
            "smin": gb["s"].agg(
                lambda v: v.dropna().min() if v.notna().any() else None),
        }).sort_index()
        for c in ref.columns:
            a_ = got[c].to_numpy()
            b_ = ref[c].to_numpy()
            if ref[c].dtype.kind == "f":
                both_nan = pd.isna(a_.astype(float)) & pd.isna(
                    b_.astype(float))
                ok = both_nan | np.isclose(
                    a_.astype(float), b_.astype(float),
                    rtol=1e-9, atol=1e-9, equal_nan=True)
                assert ok.all(), (seed, c, a_, b_)
            else:
                assert all((pd.isna(u) and pd.isna(v)) or u == v
                           for u, v in zip(a_, b_)), (seed, c, a_, b_)


class TestCompactChangelogProperty:
    """Log-compaction invariants on random little logs (pure kernel:
    compact == lww_reduce keeping event shape)."""

    @given(event_logs())
    @settings(max_examples=40, deadline=None)
    def test_latest_event_per_key_tombstones_kept(self, t):
        compacted = cdc.lww_reduce_table(t)
        # oracle: latest event per key by (commit_seq, commit)
        rows = sorted(t.to_pylist(),
                      key=lambda r: (r["commit_seq"], r["commit"]))
        latest = {}
        for r in rows:
            latest[(r["repo"], r["path"])] = r
        got = {(r["repo"], r["path"]): r for r in compacted.to_pylist()}
        assert set(got) == set(latest)
        for k, r in latest.items():
            assert got[k]["op"] == r["op"]
            assert got[k]["commit_seq"] == r["commit_seq"]
        # replay(compacted) == replay(full): surviving non-delete rows
        full = replay_oracle(t)
        via = replay_oracle(compacted)
        assert via == full


@settings(max_examples=100, deadline=None)
@given(event_logs(), st.integers(min_value=0, max_value=39),
       st.integers(min_value=0, max_value=39))
def test_scd2_incremental_append_matches_batch(t, cut_a, cut_b):
    """Splitting an event log at arbitrary points and applying the tail
    pieces via scd2_append_table (history -> event skeleton -> kernel)
    must equal one batch scd2_history_table over the whole log; the
    skeleton reconstruction must also round-trip exactly."""
    import pyarrow.compute as pc
    lo, hi = sorted((cut_a, cut_b))
    a = t.filter(pc.less(t["commit_seq"], lo))
    b = t.filter(pc.and_(pc.greater_equal(t["commit_seq"], lo),
                         pc.less(t["commit_seq"], hi)))
    c = t.filter(pc.greater_equal(t["commit_seq"], hi))
    full = cdc.scd2_history_table(t)

    h = cdc.scd2_history_table(a)
    rt = cdc.scd2_history_table(cdc.scd2_events_from_history(h))
    key = [("repo", "ascending"), ("path", "ascending"),
           ("version", "ascending")]
    assert rt.sort_by(key).equals(h.sort_by(key))

    for piece in (b, c):
        if piece.num_rows:
            h = cdc.scd2_append_table(h, piece)
    assert h.select(full.column_names).sort_by(key).equals(
        full.sort_by(key))


@settings(max_examples=100, deadline=None)
@given(event_logs(), st.integers(min_value=0, max_value=45))
def test_patch_replay_kernels_match_oracle(t, cut):
    """Partial-update semantics (null patch_col = unchanged): the
    patch-merge kernel — including the two-row-per-key map-side combine
    split at an arbitrary block boundary — must match a sequential
    forward-fill oracle."""
    import pyarrow.compute as pc
    # null out every third event's content (and deletes'), like the
    # cdc_patch_replay gate query
    seq = t["commit_seq"]
    mod3 = pc.subtract(seq, pc.multiply(pc.divide(seq, 3), 3))
    mask = pc.or_(pc.equal(t["op"], "delete"), pc.equal(mod3, 0))
    t = t.set_column(t.column_names.index("content"), "content",
                     pc.if_else(mask, pa.scalar(None, type=pa.string()),
                                t["content"]))

    state: dict = {}
    rows = sorted(t.to_pylist(), key=lambda r: (r["commit_seq"],
                                                r["commit"]))
    seen = set()
    for r in rows:
        ek = (r["repo"], r["path"], r["commit_seq"])
        if ek in seen:
            continue
        seen.add(ek)
        k = (r["repo"], r["path"])
        cur = dict(r)
        if cur["content"] is None:
            cur["content"] = state.get(k, {}).get("content")
        state[k] = cur
    want = {k: (v["content"], v["commit_seq"])
            for k, v in state.items() if v["op"] != "delete"}

    def _combine(s):
        return cdc.dedup_events_table(pa.concat_tables(
            [cdc.lww_reduce_table(s),
             cdc.lww_reduce_table(s.filter(pc.is_valid(s["content"])))],
            promote_options="permissive"))

    parts = [s for s in (t.slice(0, cut), t.slice(cut)) if s.num_rows]
    comb = pa.concat_tables([_combine(s) for s in parts]) if parts \
        else t
    got_t = cdc.finalize_state_table(cdc.patch_merge_table(comb),
                                     with_sha=False)
    got = {(r["repo"], r["path"]): (r["content"], r["last_commit_seq"])
           for r in got_t.to_pylist()}
    assert got == want


# ---------------------------------------------------------------------------
# Key-Bloom sidecars: NO FALSE NEGATIVES, for any key set and any probe.
# ---------------------------------------------------------------------------

_key_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    min_size=0, max_size=24)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_key_text, _key_text), min_size=0, max_size=60),
       st.lists(st.tuples(_key_text, _key_text), min_size=1, max_size=20))
def test_bloom_sidecar_never_false_negative(tmp_path_factory, present,
                                            probes):
    import pyarrow.parquet as pq

    from kettleray.io import blooms

    d = tmp_path_factory.mktemp("bl")
    fp = str(d / "f.parquet")
    t = pa.table({"repo": pa.array([k[0] for k in present],
                                   type=pa.string()),
                  "path": pa.array([k[1] for k in present],
                                   type=pa.string())})
    pq.write_table(t, fp)
    blooms._build_sidecar(fp, ("repo", "path"), 10)
    sc = blooms.load_sidecar(fp)
    for r, p in present:
        kv = {"repo": r, "path": p}
        assert blooms.probe_sidecar(fp, kv), "file-probe false negative"
        assert sc.might_contain(kv), "in-memory false negative"
    # absent probes may false-positive but must agree between the two
    # probe implementations (same header, same bits)
    for r, p in probes:
        kv = {"repo": r, "path": p}
        assert blooms.probe_sidecar(fp, kv) == sc.might_contain(kv)
