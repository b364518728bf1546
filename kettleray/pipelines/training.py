"""Training-data pipeline queries: dedup, similarity, text analysis,
windowed events, multimodal plumbing — over the documents / embeddings /
events test tables. SQL-expressible ones carry DuckDB oracles; the rest
are rows-only checks (driver records the weaker check)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from kettleray import configure_ray_data
from kettleray.ops import dedup, similarity, textstats
from kettleray.ops import aggregates as ag


def _t(sf_dir, name, columns=None):
    configure_ray_data()
    return ray.data.read_parquet(f"{sf_dir}/{name}.parquet",
                                 columns=columns)


def q_token_count(sf_dir):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return textstats.token_count(ds, "text").select_columns(
        ["doc_id", "n_tokens"])


def q_text_quality(sf_dir):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return textstats.text_quality(ds, "text").select_columns(
        ["doc_id", "n_chars_calc", "alpha_ratio", "digit_ratio",
         "upper_ratio"])


def q_doc_fingerprint(sf_dir):
    ds = _t(sf_dir, "documents", ["doc_id", "text"])
    return textstats.doc_fingerprint(ds, "text").select_columns(
        ["doc_id", "fingerprint"])


def q_exact_dedup(sf_dir):
    ds = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    return dedup.exact_dedup(ds, "text", "doc_id", num_partitions=8)


def q_ann_cosine_scores(sf_dir):
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qvec = qt.filter(pc.equal(qt["vec_id"], 0))["embedding"][0].as_py()
    return similarity.cosine_scores(emb, "vec_id", "embedding",
                                    np.asarray(qvec), round_to=4)


def q_events_window(sf_dir):
    """Tumbling 1h window per user — the windowed-aggregate shape
    (groupby(key, floor(ts/size)); Ray Data has no watermarks, window id
    is explicit data, SURVEY.md §2.10)."""
    ds = _t(sf_dir, "events", ["user_id", "ts", "value"])

    def _win(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())        # epoch micros
        win = pc.divide(us, 3_600_000_000)
        return t.append_column("window_id", pc.cast(win, pa.int64()))

    wds = ds.map_batches(_win, batch_format="pyarrow", zero_copy_batch=True)
    out = ag.group_by(wds, ["user_id", "window_id"], [
        ag.Agg(None, "count", "n_events"),
        ag.Agg("value", "sum", "sum_value"),
    ])
    from kettleray.ops import calculator as calc
    return calc.calculator(out, [
        calc.CalcOp("sum_value", "round", a="sum_value", const_b=4)])


def q_events_sessionize(sf_dir):
    """Session windows on the events stream: 30-minute inactivity gap."""
    ds = _t(sf_dir, "events", ["event_id", "user_id", "ts"])
    return ag.sessionize(ds, "user_id", "ts", gap_us=1_800_000_000,
                         num_partitions=8)


# --- rows-only (non-SQL-expressible) --------------------------------------

def q_minhash_neardup(sf_dir):
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    pairs = dedup.minhash_lsh_pairs(docs, "doc_id", "text",
                                    num_perm=64, bands=16, shingle_k=3,
                                    num_partitions=8)
    return dedup.jaccard_verify(pairs, docs, "doc_id", "text",
                                shingle_k=3, threshold=0.5)


def q_simhash(sf_dir):
    docs = _t(sf_dir, "documents", ["doc_id", "text"])
    return dedup.simhash(docs, "doc_id", "text")


def q_lang_id(sf_dir):
    docs = _t(sf_dir, "documents", ["doc_id", "text", "lang"])
    return textstats.lang_id(docs, "text")


def q_embedding_neardup(sf_dir):
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    return dedup.embedding_cosine_dups(emb, "vec_id", "embedding",
                                       threshold=0.99)


def q_ann_lsh_topk(sf_dir):
    emb = _t(sf_dir, "embeddings", ["vec_id", "embedding"])
    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"])
    qvec = qt.filter(pc.equal(qt["vec_id"], 0))["embedding"][0].as_py()
    return similarity.lsh_topk(emb, "vec_id", "embedding",
                               np.asarray(qvec), k=10)


def q_multimodal_image(sf_dir):
    from kettleray.ops import multimodal
    configure_ray_data()
    media = ray.data.from_arrow(multimodal.synthetic_media_table(200))
    imgs = media.filter(lambda r: r["kind"] == "image")
    return multimodal.extract_image_features(imgs, mode="fake") \
        .select_columns(["media_id", "width", "height", "mean_intensity"])


QUERIES = {
    "token_count": q_token_count,
    "text_quality": q_text_quality,
    "doc_fingerprint": q_doc_fingerprint,
    "exact_dedup": q_exact_dedup,
    "ann_cosine_scores": q_ann_cosine_scores,
    "events_window": q_events_window,
    "events_sessionize": q_events_sessionize,
    "minhash_neardup": q_minhash_neardup,
    "simhash_fingerprints": q_simhash,
    "lang_id": q_lang_id,
    "embedding_neardup": q_embedding_neardup,
    "ann_lsh_topk": q_ann_lsh_topk,
    "multimodal_image_features": q_multimodal_image,
}

ORACLES = {
    "token_count":
        "SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), "
        "'\\s+')) AS BIGINT) AS n_tokens FROM documents",
    "text_quality":
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_calc, "
        "ROUND(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 "
        "/ GREATEST(length(text), 1), 4) AS alpha_ratio, "
        "ROUND(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 "
        "/ GREATEST(length(text), 1), 4) AS digit_ratio, "
        "ROUND(length(regexp_replace(text, '[^A-Z]', '', 'g')) * 1.0 "
        "/ GREATEST(length(text), 1), 4) AS upper_ratio FROM documents",
    "doc_fingerprint":
        "SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', "
        "'g'))) AS fingerprint FROM documents",
    "exact_dedup":
        "SELECT doc_id, text, lang FROM documents WHERE doc_id IN "
        "(SELECT min(doc_id) FROM documents GROUP BY text)",
    "ann_cosine_scores":
        "SELECT vec_id, ROUND(list_cosine_similarity("
        "CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) "
        "FROM embeddings WHERE vec_id = 0)), 4) AS cosine FROM embeddings",
    "events_window":
        "SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS "
        "window_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS "
        "sum_value FROM events GROUP BY user_id, window_id",
    "events_sessionize": (
        "WITH g AS (SELECT event_id, user_id, ts, CASE WHEN "
        "lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > "
        "INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts)) "
        "SELECT event_id, user_id, ts, CAST(SUM(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
        "AS BIGINT) AS session_id FROM g"),
}
