"""Training-data-pipeline operators as first-class queries (driver contract).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
near-dup), similarity search (brute-force cosine top-k + LSH-bucketed ANN),
text analysis (lang-id, quality, token stats, fingerprinting), multimodal
binary plumbing — over the driver-provided `documents` and `embeddings`
tables (TESTDATA.md).

SQL-expressible ops carry DuckDB oracles; hash-family ops (xxhash64-based
LSH/SimHash) are rows-only by design (the driver records the weaker check).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ocds_entity_extract_spark.functions.text import collapse_ws
from ocds_entity_extract_spark.queries import ORACLE_SQL, SPARK_QUERIES, _t, query


# vector helpers live in functions/vectors.py (imported by similarity.py
# too — keeping them there avoids a circular import with the LSH oracle)
from ocds_entity_extract_spark.functions.vectors import cosine, dot, norm  # noqa: E402,F401


# =====================================================================
# deduplication
# =====================================================================

@query(
    "dedup_exact",
    """
    SELECT CAST(count(*) AS BIGINT) AS total_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS exact_dups
    FROM documents
    """,
)
def q_dedup_exact(spark, sf_dir):
    """Exact dedup via content hash (groupBy(md5) ≙ A1 identity dedup)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5("text")))
        .cast("bigint")
        .alias("exact_dups"),
    )


@query(
    "dedup_near_embedding",
    """
    SELECT a.label,
           count(*) AS n_near_pairs
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding, b.embedding), 3) >= 0.45
    GROUP BY a.label
    """,
)
def q_dedup_near_embedding(spark, sf_dir):
    """Embedding-cosine near-dup: label-blocked self-join (blocking bounds
    the pair count — the 100 TB version blocks on LSH buckets instead)."""
    e = _t(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("label"), F.col("vec_id").alias("vid_a"), F.col("embedding").alias("va")
    )
    b = e.select(
        F.col("label"), F.col("vec_id").alias("vid_b"), F.col("embedding").alias("vb")
    )
    return (
        a.join(b, "label")
        .filter(F.col("vid_a") < F.col("vid_b"))
        .filter(F.round(cosine(F.col("va"), F.col("vb")), 3) >= 0.45)
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_near_pairs"))
    )


@query("dedup_minhash_docs")  # rows-only: xxhash64 family has no DuckDB twin
def q_dedup_minhash_docs(spark, sf_dir):
    """MinHash-LSH near-dup candidates over word 3-gram shingles of
    documents.text (shingle -> minhash -> band -> bucket-join; same
    machinery as entity linking but on documents)."""
    from ocds_entity_extract_spark.operators.dedup import minhash_candidate_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return minhash_candidate_pairs(d)


@query("simhash_docs")  # rows-only
def q_simhash_docs(spark, sf_dir):
    """64-bit SimHash per document (token-hash sign-vote), Arrow-batched."""
    from ocds_entity_extract_spark.operators.dedup import with_simhash

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return with_simhash(d).select("doc_id", "simhash")


@query(
    "ngram_jaccard_pairs",
    r"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, greatest(len(toks) - 2, 1) + 1)]) AS s
      FROM (SELECT doc_id, source, string_split_regex(text, '\s+') AS toks
            FROM documents)
    ), pairs AS (
      SELECT a.source AS source, a.doc_id AS id_a, b.doc_id AS id_b,
             round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
      FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
    )
    SELECT source, id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.2
    """,
)
def q_ngram_jaccard_pairs(spark, sf_dir):
    """Exact word-3-gram Jaccard pairs within source blocks. The Spark side
    intersects HASHED shingle sets (xxhash64) — equal to the oracle's
    string-set Jaccard up to negligible 64-bit collisions."""
    from ocds_entity_extract_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    return ngram_jaccard_pairs(d, block_col="source", threshold=0.2)


# =====================================================================
# similarity search
# =====================================================================

@query(
    "ann_topk_bruteforce",
    """
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id, round(list_cosine_similarity(e.embedding, q.qv), 3) AS score
    FROM embeddings e, q
    WHERE e.vec_id != 0
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """,
)
def q_ann_topk_bruteforce(spark, sf_dir):
    """Brute-force cosine top-k (ANN baseline). Order on the ROUNDED score
    + vec_id so both engines resolve ties identically."""
    e = _t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id", F.round(cosine(F.col("embedding"), F.col("qv")), 3).alias("score")
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


def _ann_lsh_oracle_sql(dim: int = 64, n_planes: int = 4, seed: int = 7) -> str:
    """DuckDB twin of ann_topk_lsh: the SAME seeded hyperplanes (plain
    literals in both plans) -> sign-pattern bucket -> bucket-local top-k."""
    from ocds_entity_extract_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes, seed)
    cases = "\n           + ".join(
        f"CASE WHEN list_dot_product(embedding, {[round(x, 17) for x in p]}) > 0 "
        f"THEN {1 << i} ELSE 0 END"
        for i, p in enumerate(planes)
    )
    return f"""
    WITH b AS (
      SELECT vec_id, embedding,
             ({cases}) AS bucket
      FROM embeddings
    ), q AS (SELECT embedding AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
    SELECT e.vec_id, round(list_cosine_similarity(e.embedding, q.qv), 3) AS score
    FROM b e, q
    WHERE e.vec_id != 0 AND e.bucket = q.qbucket
    ORDER BY score DESC, e.vec_id
    LIMIT 10
    """


@query("ann_topk_lsh", _ann_lsh_oracle_sql())
def q_ann_topk_lsh(spark, sf_dir):
    """LSH-bucketed ANN: random-hyperplane signature buckets, search only
    the query's bucket (the scale path: bucket-local top-k)."""
    from ocds_entity_extract_spark.operators.similarity import ann_topk_lsh

    e = _t(spark, sf_dir, "embeddings")
    return ann_topk_lsh(e, query_vec_id=0, k=10, n_planes=4)


# =====================================================================
# text analysis
# =====================================================================

def _hits(col, pat: str):
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(pat), F.lit(""))))
        / len(pat)
    ).cast("bigint")


@query(
    "lang_id_heuristic",
    """
    SELECT detected, count(*) AS n_docs FROM (
      SELECT CASE
        WHEN ((length(text) - length(replace(text, ' the ', ''))) / 5
              + (length(text) - length(replace(text, ' and ', ''))) / 5)
           > ((length(text) - length(replace(text, ' el ', ''))) / 4
              + (length(text) - length(replace(text, ' la ', ''))) / 4) THEN 'en'
        WHEN ((length(text) - length(replace(text, ' el ', ''))) / 4
              + (length(text) - length(replace(text, ' la ', ''))) / 4)
           > ((length(text) - length(replace(text, ' the ', ''))) / 5
              + (length(text) - length(replace(text, ' and ', ''))) / 5) THEN 'es'
        ELSE 'und' END AS detected
      FROM documents)
    GROUP BY detected
    """,
)
def q_lang_id_heuristic(spark, sf_dir):
    """Stopword-marker language ID (n-gram heuristic family)."""
    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    en = _hits(t, " the ") + _hits(t, " and ")
    es = _hits(t, " el ") + _hits(t, " la ")
    detected = (
        F.when(en > es, F.lit("en")).when(es > en, F.lit("es")).otherwise(F.lit("und"))
    )
    return (
        d.select(detected.alias("detected"))
        .groupBy("detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "quality_scores",
    """
    SELECT doc_id,
           CAST(length(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens,
           round(CAST(n_chars AS DOUBLE)
                 / length(string_split_regex(text, '\\s+')), 2) AS chars_per_token,
           CAST((length(text) - length(replace(text, ' the ', ''))) / 5 AS BIGINT) AS stop_hits
    FROM documents
    """,
)
def q_quality_scores(spark, sf_dir):
    """Per-doc quality features: token count, chars/token, stopword hits."""
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(F.col("n_chars").cast("double") / n_tok, 2).alias("chars_per_token"),
        _hits(F.col("text"), " the ").alias("stop_hits"),
    )


@query(
    "token_stats_total",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(string_split_regex(text, '\\s+'))) AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    """,
)
def q_token_stats_total(spark, sf_dir):
    """Corpus-level token accounting (map-side partial sums)."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query(
    "doc_fingerprints",
    """
    SELECT doc_id,
           sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fingerprint
    FROM documents
    """,
)
def q_doc_fingerprints(spark, sf_dir):
    """Normalized content fingerprint (S9 content-hash id family)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.lower(collapse_ws("text")), 256).alias("fingerprint"),
    )


# =====================================================================
# multimodal binary plumbing
# =====================================================================

@query(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text) AS content_sha
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Opaque-binary metadata pass: byte length + content hash over a
    binary payload column (the schema/partitioning side of multimodal)."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("content_sha"),
    )


@query("multimodal_decode_stub")  # rows-only: stubbed decoder
def q_multimodal_decode_stub(spark, sf_dir):
    """mapInPandas over binary payloads through the (stubbed) decoder —
    the Spark-side plumbing (schema, batching, UDF signature) is real."""
    from ocds_entity_extract_spark.operators.multimodal import decode_binary_meta

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return decode_binary_meta(d)


@query(
    "multimodal_features",
    """
    SELECT doc_id,
           [round(CAST(('0x' || substr(sha256(text), 2*i+1, 2)) AS INT) / 255.0, 6)
            for i in range(0, 8)] AS features
    FROM documents
    """,
)
def q_multimodal_features(spark, sf_dir):
    """mapInPandas featurizer (stub model: sha256-byte vector) — the SQL
    oracle mirrors the fake exactly, so even this mapInPandas path sits
    under the full value-hash gate."""
    from ocds_entity_extract_spark.operators.multimodal import extract_features

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    feats = extract_features(d, dim=8)
    return feats.select(
        "doc_id", F.transform("features", lambda v: F.round(v, 6)).alias("features")
    )


@query(
    "multimodal_frame_sample",
    """
    WITH f AS (
      SELECT doc_id, text, length(text) AS len,
             CASE WHEN length(text) >= 4 THEN 4 ELSE 1 END AS k
      FROM documents
    )
    SELECT doc_id, CAST(t.i AS BIGINT) AS frame_idx,
           CAST((t.i * len) // k AS BIGINT) AS offset_bytes,
           sha256(substring(text, CAST((t.i * len) // k AS BIGINT) + 1, 256)) AS frame_sha
    FROM f CROSS JOIN unnest(range(f.k)) AS t(i)
    """,
)
def q_multimodal_frame_sample(spark, sf_dir):
    """mapInPandas FAN-OUT (1 payload row -> k frame rows): the video
    frame-sampling plumbing. Oracle slices the VARCHAR text — byte-exact
    here because the driver corpus is pure ASCII (verified); the operator
    itself is byte-offset-correct for any binary."""
    from ocds_entity_extract_spark.operators.multimodal import sample_frames

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return sample_frames(d, n_frames=4, frame_bytes=256)


@query("multimodal_resize_stub")  # rows-only: iterated-sha keystream output
def q_multimodal_resize_stub(spark, sf_dir):
    """mapInPandas binary->binary transform (stub resize): exercises the
    Arrow binary-output path that would carry real pixel buffers."""
    from ocds_entity_extract_spark.operators.multimodal import resize_payload

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    resized = resize_payload(d, out_width=16, out_height=16)
    return resized.select(
        "doc_id", "out_width", "out_height",
        F.sha2("payload", 256).alias("payload_sha"),
        F.octet_length("payload").cast("bigint").alias("payload_bytes"),
    )


# =====================================================================
# KG pipeline (flagship; rows-only — pandas UDF + LSH + CC)
# =====================================================================

def _kg_pages(spark, n_pages: int = 300):
    from ocds_entity_extract_spark.datagen import generate_corpus
    from ocds_entity_extract_spark.schemas import PAGES_SCHEMA

    pages, _, aux = generate_corpus(n_pages=n_pages, seed=42)
    return spark.createDataFrame(pages, schema=PAGES_SCHEMA), aux


@query("kg_triples")  # rows-only
def q_kg_triples(spark, sf_dir):
    """Full KG pipeline (deterministic seeded corpus): pages -> triples."""
    from ocds_entity_extract_spark.functions.classify import load_classifier_override
    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.schemas import CLASSIFIER_SCHEMA

    pages, aux = _kg_pages(spark)
    override = load_classifier_override(
        spark, spark.createDataFrame(aux["classifier_override"], schema=CLASSIFIER_SCHEMA)
    ) if aux["classifier_override"] else None
    return build_triples(spark, pages, override).triples


@query("kg_entities")  # rows-only
def q_kg_entities(spark, sf_dir):
    """Merged entity table from the same corpus (arrays stringified)."""
    from ocds_entity_extract_spark.plans.pipeline import build_triples

    pages, _ = _kg_pages(spark)
    res = build_triples(spark, pages)
    return res.entities.select(
        "entity_id",
        "name",
        "entity_type",
        "mention_count",
        "page_count",
        F.array_join("other_names", ",").alias("other_names"),
        F.array_join("sources", ",").alias("sources"),
    )
