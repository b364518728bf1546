"""Round-4 operator tests: sequence packing, DSIR scoring, SemDeDup,
SCD type-3 — edge cases the sf-fixture gate queries cannot hit
(zero-token docs, delete-final keys, null tracked values, dup-free
clusters)."""

import numpy as np
import pyarrow as pa
import ray.data

from kettleray.ops import cdc, dedup, packing, textstats


# ---------------------------------------------------------------------------
# pack_sequences
# ---------------------------------------------------------------------------

def _pack(table, seq_len, **kw):
    out = packing.pack_sequences(ray.data.from_arrow(table), "doc_id",
                                 "text", seq_len=seq_len, **kw).take_all()
    return {r["doc_id"]: r for r in out}


def test_pack_sequences_spans_and_straddle():
    t = pa.table({"doc_id": [3, 1, 2],
                  "text": ["c c c c", "a a a", "b b"]})
    by = _pack(t, 4)
    # order is doc_id asc: doc1 (3 toks) doc2 (2) doc3 (4) => stream of 9
    assert (by[1]["start_token"], by[1]["seq_first"],
            by[1]["seq_last"]) == (0, 0, 0)
    assert (by[2]["start_token"], by[2]["seq_first"],
            by[2]["seq_last"]) == (3, 0, 1)      # straddles 0->1
    assert (by[3]["start_token"], by[3]["seq_first"],
            by[3]["seq_last"]) == (5, 1, 2)


def test_pack_sequences_empty_text_counts_one_like_sql():
    # "" splits to [""] (one token) in BOTH Arrow and DuckDB — documented
    t = pa.table({"doc_id": [1, 2], "text": ["", "x y"]})
    by = _pack(t, 2)
    assert by[1]["n_tokens"] == 1
    assert by[2]["start_token"] == 1


def test_pack_stats():
    t = pa.table({"doc_id": [1, 2], "text": ["a a a", "b b b"]})
    ds = packing.pack_sequences(ray.data.from_arrow(t), "doc_id", "text",
                                seq_len=4)
    st = packing.pack_stats(ds, seq_len=4).to_pylist()[0]
    assert st["total_tokens"] == 6 and st["n_sequences"] == 2
    assert st["straddling_docs"] == 1
    assert st["tail_fill"] == 0.5


# ---------------------------------------------------------------------------
# dsir_score
# ---------------------------------------------------------------------------

def test_dsir_scores_target_like_docs_higher():
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["alpha beta gamma", "alpha beta beta",
                 "zulu yankee xray", "zulu zulu xray"]})
    ds = ray.data.from_arrow(docs)
    target = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["alpha beta gamma",
                                   "alpha beta beta"]}))
    out = {r["doc_id"]: r["dsir_logratio"]
           for r in textstats.dsir_score(ds, target, "doc_id", "text",
                                         num_buckets=64).take_all()}
    # target is a SUBSET of the corpus (its tokens count on both sides),
    # so absolute signs shift — the guaranteed property is the ordering:
    # target-like docs outscore off-target docs
    assert out[1] > out[3] and out[1] > out[4]
    assert out[2] > out[3] and out[2] > out[4]


def test_dsir_matches_hand_computation():
    # one doc, one token; corpus = {"a": 2, "b": 1}, target = {"a": 1}
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["a a", "b"]}))
    target = ray.data.from_arrow(pa.table({"doc_id": [1], "text": ["a"]}))
    B = 16
    out = {r["doc_id"]: r
           for r in textstats.dsir_score(docs, target, "doc_id", "text",
                                         num_buckets=B).take_all()}
    llr_a = (np.log(1 + 1) - np.log(1 + B)) - (np.log(2 + 1) - np.log(3 + B))
    llr_b = (np.log(0 + 1) - np.log(1 + B)) - (np.log(1 + 1) - np.log(3 + B))
    assert abs(out[1]["dsir_logratio"] - round(llr_a, 6)) < 1e-9
    assert abs(out[2]["dsir_logratio"] - round(llr_b, 6)) < 1e-9


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------

def _vec_table(ids, vecs):
    return pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                     "embedding": pa.array([list(map(float, v))
                                            for v in vecs],
                                           type=pa.list_(pa.float32()))})


def test_semantic_dedup_keeps_min_per_group():
    # cluster axis-aligned: centroid 0 ~ x, centroid 1 ~ y
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    t = _vec_table(
        [1, 2, 3, 4, 5],
        [[1, 0], [1, 0.001], [0.9, 0.05],     # near-dups in cluster 0
         [0, 1], [0.05, 0.9]])                # distinct-ish in cluster 1
    out = dedup.semantic_dedup(ray.data.from_arrow(t), "vec_id",
                               "embedding", cents, threshold=0.999,
                               num_partitions=2).take_all()
    survivors = sorted(r["vec_id"] for r in out)
    assert 1 in survivors and 2 not in survivors     # 1~2 dup, keep min
    assert {3, 4, 5} <= set(survivors)
    clusters = {r["vec_id"]: r["cluster"] for r in out}
    assert clusters[1] == 0 and clusters[4] == 1


def test_semantic_dedup_no_dups_keeps_everything():
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    t = _vec_table([1, 2], [[1, 0], [0, 1]])
    out = dedup.semantic_dedup(ray.data.from_arrow(t), "vec_id",
                               "embedding", cents, threshold=0.99,
                               num_partitions=2).take_all()
    assert sorted(r["vec_id"] for r in out) == [1, 2]


# ---------------------------------------------------------------------------
# scd3_state
# ---------------------------------------------------------------------------

def _ev(rows):
    return pa.table({
        "repo": pa.array([r[0] for r in rows], type=pa.string()),
        "path": pa.array([r[1] for r in rows], type=pa.string()),
        "commit": pa.array([r[2] for r in rows], type=pa.string()),
        "lang": pa.array([r[3] for r in rows], type=pa.string()),
        "content": pa.array([r[4] for r in rows], type=pa.string()),
        "op": pa.array([r[5] for r in rows], type=pa.string()),
        "commit_seq": pa.array([r[6] for r in rows], type=pa.int64())})


def test_scd3_tracks_previous_distinct_value():
    rows = [
        ("r", "a", "c1", "py", "v1", "insert", 1),
        ("r", "a", "c2", "py", "v2", "update", 2),   # content change
        ("r", "a", "c3", "go", "v2", "update", 3),   # lang change
        ("r", "a", "c4", "go", "v2", "update", 4),   # no-op (collapsed)
        ("r", "b", "c5", "py", "w1", "insert", 5),
    ]
    out = {(r["repo"], r["path"]): r
           for r in cdc.scd3_state(ray.data.from_arrow(_ev(rows)),
                                   num_partitions=2).take_all()}
    a = out[("r", "a")]
    assert a["lang"] == "go" and a["lang_prev"] == "py"
    assert a["lang_nchanges"] == 1
    assert a["content_sha256_nchanges"] == 1
    assert a["content_sha256_prev"] == \
        cdc.sha256_hex_array(pa.array(["v1"]))[0].as_py()
    b = out[("r", "b")]
    assert b["lang_prev"] is None and b["lang_nchanges"] == 0
    assert b["content_sha256_prev"] is None


def test_scd3_delete_final_drops_key_but_interleaved_does_not_reset():
    rows = [
        ("r", "a", "c1", "py", "v1", "insert", 1),
        ("r", "a", "c2", "py", "v1", "delete", 2),
        ("r", "a", "c3", "go", "v1", "insert", 3),   # lang py -> go
        ("r", "b", "c4", "py", "w1", "insert", 4),
        ("r", "b", "c5", "py", "w1", "delete", 5),   # final delete
    ]
    out = {(r["repo"], r["path"]): r
           for r in cdc.scd3_state(ray.data.from_arrow(_ev(rows)),
                                   num_partitions=2).take_all()}
    assert ("r", "b") not in out
    a = out[("r", "a")]
    assert a["lang_prev"] == "py" and a["lang_nchanges"] == 1


def test_scd3_null_tracked_value_roundtrips():
    rows = [("r", "a", "c1", None, "v1", "insert", 1),
            ("r", "a", "c2", "py", "v1", "update", 2)]
    out = cdc.scd3_state(ray.data.from_arrow(_ev(rows)),
                         num_partitions=2).take_all()
    a = out[0]
    assert a["lang"] == "py" and a["lang_prev"] is None
    assert a["lang_nchanges"] == 1
