"""Dedup / similarity / textstats / multimodal operator tests."""

import numpy as np
import pyarrow as pa
import ray.data

from kettleray.ops import dedup, multimodal, similarity, textstats


def test_exact_dedup_keeps_min_id():
    t = pa.table({"doc_id": [5, 1, 3, 2], "text": ["a", "b", "a", "b"]})
    out = dedup.exact_dedup(ray.data.from_arrow(t), "text", "doc_id",
                            num_partitions=2).take_all()
    assert sorted((r["doc_id"], r["text"]) for r in out) == \
        [(1, "b"), (3, "a")]


def test_minhash_finds_near_duplicates():
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest tonight")
    texts = [base,
             base.replace("tonight", "today"),          # near-dup of 0
             "completely different content about database systems and "
             "distributed computing with ray data pipelines",
             base.replace("quick", "slow"),             # near-dup of 0
             "another unrelated short text"]
    t = pa.table({"doc_id": list(range(5)), "text": texts})
    docs = ray.data.from_arrow(t)
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_perm=64,
                                    bands=32, shingle_k=2,
                                    num_partitions=2)
    verified = dedup.jaccard_verify(pairs, docs, "doc_id", "text",
                                    shingle_k=2, threshold=0.5).take_all()
    found = {(r["doc_a"], r["doc_b"]) for r in verified}
    assert (0, 1) in found and (0, 3) in found
    assert all(a in (0, 1, 3) and b in (0, 1, 3) for a, b in found)


def test_connected_components_groups_dups():
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": [1, 2, 10], "doc_b": [2, 3, 11]}))
    comp = {r["node"]: r["component"]
            for r in dedup.connected_components(pairs,
                                                num_partitions=2).take_all()}
    assert comp[1] == comp[2] == comp[3]
    assert comp[10] == comp[11] != comp[1]


def test_simhash_deterministic_and_close_for_neardups():
    t = pa.table({"doc_id": [0, 1],
                  "text": ["alpha beta gamma delta epsilon zeta",
                           "alpha beta gamma delta epsilon eta"]})
    out = dedup.simhash(ray.data.from_arrow(t), "doc_id", "text").take_all()
    a, b = (int(r["simhash"], 16) for r in sorted(out,
                                                  key=lambda r: r["doc_id"]))
    hamming = bin(a ^ b).count("1")
    assert hamming <= 16          # near-dups have close fingerprints
    out2 = dedup.simhash(ray.data.from_arrow(t), "doc_id",
                         "text").take_all()
    assert sorted(r["simhash"] for r in out) == \
        sorted(r["simhash"] for r in out2)


def test_embedding_cosine_dups():
    v = np.eye(4).tolist() + [[1.0, 0.001, 0, 0]]
    t = pa.table({"vec_id": list(range(5)),
                  "embedding": pa.array(v, type=pa.list_(pa.float32()))})
    out = dedup.embedding_cosine_dups(ray.data.from_arrow(t), "vec_id",
                                      "embedding",
                                      threshold=0.99).take_all()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(0, 4)}


def test_brute_force_topk_and_lsh_topk_agree_on_top1():
    rng = np.random.RandomState(0)
    mat = rng.standard_normal((300, 16))
    q = mat[7] + rng.standard_normal(16) * 0.01
    t = pa.table({"vec_id": list(range(300)),
                  "embedding": pa.array(mat.tolist(),
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    bf = similarity.brute_force_topk(ds, "vec_id", "embedding", q, k=5)
    assert bf["vec_id"][0].as_py() == 7
    lsh = similarity.lsh_topk(ds, "vec_id", "embedding", q, k=5,
                              n_planes=6, probe_hamming=1)
    assert 7 in lsh["vec_id"].to_pylist()


def test_token_count_and_quality():
    t = pa.table({"doc_id": [0, 1],
                  "text": ["Hello World 123", "  a  b  "]})
    out = textstats.token_count(ray.data.from_arrow(t), "text").take_all()
    assert [r["n_tokens"] for r in sorted(out, key=lambda r: r["doc_id"])] \
        == [3, 2]
    q = textstats.text_quality(ray.data.from_arrow(t), "text").take_all()
    r0 = next(r for r in q if r["doc_id"] == 0)
    assert r0["n_chars_calc"] == 15
    assert abs(r0["alpha_ratio"] - round(10 / 15, 4)) < 1e-9


def test_lang_id_heuristic():
    t = pa.table({"doc_id": [0, 1],
                  "text": ["the cat and the dog of a house is that it",
                           "der hund und die katze ist von den nicht"]})
    out = textstats.lang_id(ray.data.from_arrow(t)).take_all()
    pred = {r["doc_id"]: r["lang_pred"] for r in out}
    assert pred[0] == "en" and pred[1] == "de"


def test_multimodal_image_plumbing():
    media = ray.data.from_arrow(multimodal.synthetic_media_table(20))
    out = multimodal.extract_image_features(media, mode="fake").take_all()
    assert len(out) == 20
    assert all(64 <= r["width"] <= 256 and 0 <= r["mean_intensity"] <= 1
               for r in out)
    # determinism
    out2 = multimodal.extract_image_features(media, mode="fake").take_all()
    assert sorted(r["mean_intensity"] for r in out) == \
        sorted(r["mean_intensity"] for r in out2)


def test_lsh_pathological_bucket_capped():
    """1,000 identical docs (one hot band bucket) must finish in bounded
    time/output: oversized buckets are dropped, not exploded to O(k^2)."""
    import time
    texts = ["the same boilerplate text repeated many times over" ] * 1000
    texts += ["a genuinely unique document about rivers and stars",
              "a genuinely unique document about rivers and stars !"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    t0 = time.time()
    pairs = dedup.minhash_lsh_pairs(
        ray.data.from_arrow(t), "doc_id", "text", num_perm=64, bands=16,
        shingle_k=3, num_partitions=4, max_bucket=64).take_all()
    elapsed = time.time() - t0
    # the 1000-doc bucket would alone contribute 499,500 pairs; capped,
    # the only surviving candidate pair is the unique near-dup pair
    got = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1000, 1001) in got
    assert all(a >= 1000 for a, b in got)
    assert elapsed < 120


def test_embedding_dups_lsh_matches_brute():
    """LSH-bucketed path finds exact-copy pairs (identical vectors always
    co-bucket) and agrees with the guarded brute-force path."""
    rng = np.random.RandomState(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    mat = np.vstack([base, base[:10]])        # ids 40..49 copy ids 0..9
    t = pa.table({"vec_id": pa.array(range(50), type=pa.int64()),
                  "embedding": pa.array(mat.tolist(),
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    lsh = dedup.embedding_cosine_dups(ds, "vec_id", "embedding",
                                      threshold=0.999, method="lsh",
                                      num_partitions=4).take_all()
    brute = dedup.embedding_cosine_dups(ds, "vec_id", "embedding",
                                        threshold=0.999,
                                        method="brute").take_all()
    key = lambda r: (r["id_a"], r["id_b"])
    expect = {(i, 40 + i) for i in range(10)}
    assert {key(r) for r in brute} >= expect
    assert sorted(map(key, lsh)) == sorted(map(key, brute))


def test_simhash_ignores_whitespace_only_and_null():
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(["", "   ", None])})
    out = dedup.simhash(ray.data.from_arrow(t), "doc_id", "text").take_all()
    assert all(r["simhash"] == "0" * 16 for r in out)


def test_jaccard_verify_join_matches_broadcast():
    """The distributed (join) verify path must agree exactly with the
    broadcast path."""
    import pyarrow.parquet as pq
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text", num_perm=64,
                                    bands=16, shingle_k=3,
                                    num_partitions=4)
    bc = dedup.jaccard_verify(pairs, docs, "doc_id", "text", shingle_k=3,
                              threshold=0.5).take_all()
    jn = dedup.jaccard_verify(pairs, docs, "doc_id", "text", shingle_k=3,
                              threshold=0.5, method="join",
                              num_partitions=4).take_all()
    key = lambda r: (r["doc_a"], r["doc_b"])
    assert sorted(bc, key=key) == sorted(jn, key=key)
    assert len(bc) > 0


def test_lang_id_six_languages():
    from kettleray.ops.textstats import lang_id
    t = pa.table({"text": pa.array([
        "the cat sat on the mat and it was happy with his day",
        "der hund ist mit den kindern zu hause und das ist auch gut",
        "le chat est dans la maison et les enfants sont pour le jardin",
        "el perro es de la casa y los gatos no son como sus amigos",
        "il cane non è per la casa come anche il gatto del vicino",
        "o cachorro está em casa com o gato e não quer mais sair para a rua",
        "zzz qqq xxx",
    ])})
    out = lang_id(ray.data.from_arrow(t), "text").take_all()
    assert [r["lang_pred"] for r in out] == \
        ["en", "de", "fr", "es", "it", "pt", "unknown"]


def test_multimodal_audio_plumbing():
    from kettleray.ops import multimodal
    media = ray.data.from_arrow(multimodal.synthetic_media_table(60))
    auds = media.map_batches(
        lambda t: t.filter(__import__("pyarrow").compute.equal(t["kind"],
                                                               "audio")),
        batch_format="pyarrow", zero_copy_batch=True)
    out = multimodal.extract_audio_features(auds, mode="fake").take_all()
    assert len(out) == 30
    assert all(0.5 <= r["duration_s"] <= 16.5 for r in out)
    # deterministic: same payload -> same features
    again = multimodal.extract_audio_features(auds, mode="fake").take_all()
    key = lambda r: r["media_id"]
    assert sorted(out, key=key) == sorted(again, key=key)


def test_ann_index_partition_pruned_query(tmp_path):
    """Written IVF layout: the query physically reads only its probe
    buckets' files and still finds planted exact neighbors."""
    rng = np.random.RandomState(9)
    mat = rng.standard_normal((400, 16)).astype(np.float32)
    q = mat[7].copy()
    mat[350] = q          # planted exact dup of the query vector
    t = pa.table({"vec_id": pa.array(range(400), type=pa.int64()),
                  "embedding": pa.array(mat.tolist(),
                                        type=pa.list_(pa.float32()))})
    root = str(tmp_path / "ann_index")
    meta = similarity.write_ann_index(ray.data.from_arrow(t), root,
                                      "vec_id", "embedding", n_planes=6)
    res, n_read, n_total = similarity.query_ann_index(root, q, k=3,
                                                      probe_hamming=1)
    ids = [r["vec_id"] for r in res.to_pylist()]
    assert set(ids[:2]) == {7, 350}        # query vec + planted dup
    assert 0 < n_read < n_total           # pruning actually happened
    assert meta["dim"] == 16


def test_kmeans_fit_matches_numpy_reference():
    """Distributed Lloyd's (per-block partial sums, no shuffle) ==
    single-process numpy Lloyd's with the same deterministic init,
    regardless of block layout."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from kettleray.ops import clustering

    rng = np.random.RandomState(7)
    blobs = np.concatenate([
        rng.randn(40, 6) + c for c in (0, 8, -8)])
    ids = np.arange(len(blobs))
    t = pa.table({"vid": pa.array(ids),
                  "v": pa.array(list(blobs.astype(np.float64)))})
    ds = ray.data.from_arrow(t).repartition(5)
    got = clustering.kmeans_fit(ds, "v", 3, n_iter=8, id_col="vid")

    # numpy reference: same init (3 lowest ids), same empty-cluster rule
    cents = blobs[:3].astype(np.float64)
    for _ in range(8):
        d2 = -2 * blobs @ cents.T + (cents * cents).sum(1)[None, :]
        a = np.argmin(d2, axis=1)
        new = cents.copy()
        for j in range(3):
            if (a == j).any():
                new[j] = blobs[a == j].mean(axis=0)
        cents = new
    assert np.allclose(got, cents, atol=1e-9)

    # assignment stage agrees with the fitted centroids
    out = clustering.kmeans_assign(ds, "v", got, out_col="c").take_all()
    by_id = {r["vid"]: r["c"] for r in out}
    d2 = -2 * blobs @ got.T + (got * got).sum(1)[None, :]
    ref = np.argmin(d2, axis=1)
    assert all(by_id[i] == ref[i] for i in ids)


def test_ngram_counts_doc_boundaries_and_n3():
    """Trigram rolling join never crosses document boundaries; n=1
    delegates to word_counts."""
    import pyarrow as pa
    import ray.data
    from kettleray.ops import textstats
    t = pa.table({"text": ["a b c d", "c d e", "", "  ", None, "x"]})
    ds = ray.data.from_arrow(t)
    got = {r["ngram"]: r["n"]
           for r in textstats.ngram_counts(ds, "text", n=3,
                                           num_partitions=2).take_all()}
    assert got == {"a b c": 1, "b c d": 1, "c d e": 1}
    uni = {r["ngram"]: r["n"]
           for r in textstats.ngram_counts(ds, "text", n=1,
                                           num_partitions=2).take_all()}
    assert uni["c"] == 2 and uni["x"] == 1 and "" not in uni


def test_video_frame_sample_plumbing():
    """1->N frame expansion: deterministic fake decode, k rows per
    video, stable frame bytes; strict mode raises without ffmpeg."""
    import pytest
    import ray.data
    from kettleray.ops import multimodal as mm
    t = mm.synthetic_media_table(6)
    ds = ray.data.from_arrow(t)
    out = mm.sample_video_frames(ds, k=3).take_all()
    assert len(out) == 18
    per = {}
    for r in out:
        per.setdefault(r["media_id"], []).append(r)
    for mid, rows in per.items():
        assert len(rows) == 3
        assert all(isinstance(r["frame_payload"], bytes)
                   and len(r["frame_payload"]) == 32 for r in rows)
        assert [r["frame_idx"] for r in rows] == \
            sorted(r["frame_idx"] for r in rows)
    out2 = mm.sample_video_frames(ds, k=3).take_all()
    assert sorted((r["media_id"], r["frame_idx"]) for r in out2) == \
        sorted((r["media_id"], r["frame_idx"]) for r in out)
    with pytest.raises(Exception, match="NotImplementedError|ffmpeg"):
        mm.sample_video_frames(ds, k=2, mode="strict").take_all()


def test_inverted_index_partition_pruning(tmp_path):
    """AND/OR term queries read only the terms' shard files."""
    import pyarrow as pa
    import ray.data
    from kettleray.ops import invindex
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": ["alpha beta gamma", "beta gamma", "alpha"]})
    root = str(tmp_path / "inv")
    invindex.write_inverted_index(ray.data.from_arrow(t), root,
                                  "doc_id", "text", num_shards=8)
    res, nread, ntotal = invindex.query_inverted_index(
        root, ["ALPHA", "beta"], mode="and")
    rows = {r["doc_id"]: (r["n_terms"], r["sum_tf"])
            for r in res.take_all()}
    assert rows == {1: (2, 2)}
    assert 0 < nread <= ntotal
    res_or, nread_or, _ = invindex.query_inverted_index(
        root, ["alpha", "beta"], mode="or")
    assert {r["doc_id"] for r in res_or.take_all()} == {1, 2, 3}
    res_none, _, _ = invindex.query_inverted_index(
        root, ["zzz_not_there"])
    assert res_none.take_all() == []


def test_winnowing_fingerprints():
    """Identical docs produce identical fingerprint sets; docs shorter
    than k produce none; a shared substring yields overlapping prints."""
    import pyarrow as pa
    import ray.data
    from kettleray.ops.textstats import winnowing_fingerprints
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "tiny",                          # < k: no fingerprints
            "a totally different sentence with the quick brown fox here",
        ]),
    })
    out = winnowing_fingerprints(
        ray.data.from_arrow(docs), "text", "doc_id").take_all()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] == by_doc[2]            # identical docs
    assert 3 not in by_doc                   # too short
    assert by_doc[1] & by_doc[4]             # shared k-grams overlap
    assert len(by_doc[1]) < 44               # winnowing compresses


def test_winnowing_neardup_finds_planted_pair():
    import pyarrow as pa
    import ray.data
    from kettleray.ops.dedup import winnowing_neardup
    base = ("def compute(rows): return [transform(r) for r in rows if "
            "r.valid and r.score > threshold] # shared helper body")
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array([
            base + " alpha tail",
            base + " beta tail",                      # near-dup of 1
            "completely unrelated content about weather patterns and "
            "ocean currents in the southern hemisphere today",
        ]),
    })
    out = winnowing_neardup(ray.data.from_arrow(docs), "text", "doc_id",
                            min_shared=10, num_partitions=4).take_all()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_semi_join_join_method_matches_broadcast():
    from kettleray.ops.joins import semi_join
    main = ray.data.from_arrow(pa.table({
        "k": list(range(20)), "v": [f"v{i}" for i in range(20)]}))
    lk = ray.data.from_arrow(pa.table({"k": [3, 5, 5, 7, 99]}))
    for anti in (False, True):
        bc = semi_join(main, lk, ["k"], anti=anti,
                       method="broadcast").take_all()
        jn = semi_join(main, lk, ["k"], anti=anti, method="join",
                       num_partitions=3).take_all()
        key = lambda r: (r["k"], r["v"])
        assert sorted(map(key, bc)) == sorted(map(key, jn))
        # duplicate lookup keys must NOT duplicate main rows
        assert len({r["k"] for r in jn}) == len(jn)


def test_dedup_corpus_distributed_tail_no_driver_pull(monkeypatch):
    """dedup_corpus's representative filter and verify must stay on the
    hash-partitioned join path: poison to_arrow_refs (the only driver-
    materialization door for Datasets in this repo) and run end-to-end."""
    import ray.data.dataset as dsmod

    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen sixteen")
    texts = [base, base.replace("ten", "zzz"),
             "totally unrelated words about graphs and shuffles here",
             base.replace("two", "yyy"), "short odd text"]
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(5)), "text": texts}))

    def _boom(self, *a, **k):
        raise AssertionError("driver materialization in dedup_corpus")

    monkeypatch.setattr(dsmod.Dataset, "to_arrow_refs", _boom)
    out = dedup.dedup_corpus(docs, "doc_id", "text", num_perm=64,
                             bands=32, shingle_k=2, threshold=0.5,
                             num_partitions=2).take_all()
    ids = sorted(r["doc_id"] for r in out)
    assert 0 in ids and 2 in ids and 4 in ids       # representatives kept
    assert 1 not in ids and 3 not in ids            # near-dups dropped


def test_dedup_corpus_no_dups_returns_all():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["alpha beta gamma delta", "epsilon zeta eta theta",
                 "iota kappa lambda mu"]}))
    out = dedup.dedup_corpus(docs, "doc_id", "text", num_perm=32,
                             bands=16, shingle_k=2, threshold=0.5,
                             num_partitions=2).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2, 3]


def test_repetition_stats_edge_cases():
    t = pa.table({"doc_id": [0, 1, 2, 3],
                  "text": ["a a a a",              # one token repeated
                           "w x y z",              # all distinct
                           "",                     # empty
                           "p q p q p q"]})        # repeated bigrams
    out = {r["doc_id"]: r for r in textstats.repetition_stats(
        ray.data.from_arrow(t), "text").take_all()}
    assert out[0]["n_tokens"] == 4
    assert out[0]["dup_token_ratio"] == 0.75     # 4 tokens, 1 distinct
    assert out[0]["top_token_ratio"] == 1.0
    # "a a a a": 3 bigrams, 1 distinct -> ratio 2/3
    assert abs(out[0]["dup_2gram_ratio"] - 2/3) < 1e-6
    assert out[1]["dup_token_ratio"] == 0.0
    assert out[1]["top_token_ratio"] == 0.25
    assert out[1]["dup_2gram_ratio"] == 0.0
    assert out[2]["n_tokens"] == 0
    assert out[2]["dup_token_ratio"] is None
    # "p q p q p q": 6 tokens 2 distinct; 5 bigrams 2 distinct;
    # 4 trigrams 2 distinct
    assert abs(out[3]["dup_token_ratio"] - 4/6) < 1e-6
    assert abs(out[3]["dup_2gram_ratio"] - 3/5) < 1e-6
    assert abs(out[3]["dup_3gram_ratio"] - 2/4) < 1e-6


def test_paragraph_dedup_separator_mode():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["A B\n\nC D\n\nE F",       # all novel
                 "C D\n\nG H",              # "C D" seen in doc 1
                 "A B\n\nC D"]}))           # nothing novel -> doc gone
    out = {r["doc_id"]: r["text"] for r in dedup.paragraph_dedup(
        docs, "text", "doc_id", sep="\n\n", joiner="\n",
        num_partitions=2).take_all()}
    assert out == {1: "A B\nC D\nE F", 2: "G H"}


def test_split_paragraphs_token_chunks():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": [7, 8],
        "text": ["t0 t1 t2 t3 t4", ""]}))    # 5 tokens -> 2+0 paras (k=3)
    rows = dedup.split_paragraphs(docs, "text", "doc_id",
                                  tokens_per_para=3).take_all()
    got = sorted((r["doc_id"], r["para_idx"], r["para"]) for r in rows)
    assert got == [(7, 0, "t0 t1 t2"), (7, 1, "t3 t4")]


def test_decontaminate_flags_leaked_eval_doc():
    train = ray.data.from_arrow(pa.table({
        "doc_id": [0, 2],
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 "one two three four five six"]}))
    ev = ray.data.from_arrow(pa.table({
        "doc_id": [1, 3, 5],
        # doc 1: verbatim copy of train doc 0 -> contamination 1.0
        "text": ["alpha beta gamma delta epsilon zeta eta theta",
                 # doc 3: fully novel
                 "red green blue cyan magenta yellow black white",
                 # doc 5: too short for 5-grams -> absent from output
                 "tiny doc"]}))
    out = {r["doc_id"]: r for r in dedup.decontaminate(
        train, ev, "text", "doc_id", n=5, threshold=0.5,
        num_partitions=2).take_all()}
    assert set(out) == {1, 3}
    assert out[1]["contamination"] == 1.0 and out[1]["contaminated"]
    assert out[3]["contamination"] == 0.0 and not out[3]["contaminated"]
    assert out[1]["n_grams"] == 4 and out[1]["n_matched"] == 4


def test_decontaminate_zero_hit_eval_set():
    """A fully-clean eval set (zero matched grams anywhere) must score
    every doc 0.0 — regression for the empty-join-side crash: an empty
    hits stream re-emits zero-column shuffle blocks inside the
    left_outer join no matter how it was solidified (acero 'No match
    ... FieldRef'), so decontaminate short-circuits it."""
    train = ray.data.from_arrow(pa.table({
        "doc_id": [0], "text": ["alpha beta gamma delta epsilon"]}))
    ev = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["one two three four five six",
                 "red green blue cyan magenta yellow"]}))
    out = {r["doc_id"]: r for r in dedup.decontaminate(
        train, ev, "text", "doc_id", n=5, threshold=0.5,
        num_partitions=4).take_all()}
    assert set(out) == {1, 2}
    for d in (1, 2):
        assert out[d]["contamination"] == 0.0
        assert not out[d]["contaminated"]
        assert out[d]["n_matched"] == 0
