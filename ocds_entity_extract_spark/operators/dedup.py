"""Document deduplication operators for the training-data pipeline.

- exact dedup: hash-groupBy (see queries.q_dedup_exact)
- MinHash-LSH: word n-gram shingles -> K minhashes -> banded buckets ->
  candidate self-join (same native machinery as entity linking, reused at
  document granularity)
- SimHash: 64-bit token-hash sign-vote signature, Arrow-batched
- n-gram Jaccard: exact verification inside blocks

Scale notes: shingling/minhashing are narrow per-row Column expressions;
the only shuffles are the band-bucket self-join (bucket-capped) and the
block join. Hot buckets are capped exactly as in operators/linking.py.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType


def with_word_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Add `shingles`: distinct word n-grams (joined with single spaces)."""
    toks = F.split(F.col(text_col), r"\s+")
    return df.withColumn("_toks", toks).withColumn(
        "shingles",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
            f" i -> concat_ws(' ', slice(_toks, i, {n}))))"
        ),
    ).drop("_toks")


def minhash_candidate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 2,
    max_bucket: int = 64,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """documents -> verified near-dup pairs (id_a, id_b, jaccard).

    Signature build is the codegen path (explode -> hash once -> grouped
    mins, see linking.minhash_signature_table); verification Jaccard runs
    on the HASHED shingle sets (exact up to negligible 64-bit collisions).
    """
    from ocds_entity_extract_spark.operators.linking import (
        _lsh_pairs,
        minhash_signature_table,
    )

    sh = with_word_shingles(docs.select(id_col, text_col), text_col)
    sig = minhash_signature_table(sh, id_col, num_hashes, band_size).cache()
    pairs = (
        _lsh_pairs(sig, id_col, max_bucket)
        .withColumnRenamed("src", "id_a")
        .withColumnRenamed("dst", "id_b")
        .distinct()
    )
    sh_sets = sig.select(F.col(id_col), F.col("sh_hashed"))
    joined = (
        pairs.join(sh_sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh_hashed", "sh_a"), "id_a")
        .join(sh_sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh_hashed", "sh_b"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        joined.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


@F.pandas_udf(LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens; md5-based token hashes
    (stdlib-deterministic on every executor). Arrow-batched."""

    def one(t: str | None) -> int | None:
        if t is None:
            return None
        votes = [0] * 64
        for tok in t.split():
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            for i in range(64):
                votes[i] += 1 if (h >> i) & 1 else -1
        sig = 0
        for i in range(64):
            if votes[i] > 0:
                sig |= 1 << i
        # wrap to signed 64-bit for Spark LongType
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    return text.map(one)


def with_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.withColumn("simhash", simhash64(F.col(text_col)))


def simhash_near_pairs(
    docs: DataFrame, id_col: str = "doc_id", max_hamming: int = 6
) -> DataFrame:
    """SimHash near-dup join: block on 4 x 16-bit chunks (pigeonhole: any
    pair within hamming distance <= 6 shares at least one exact chunk when
    split into 4), verify hamming via bit_count(xor)."""
    sh = with_simhash(docs).select(id_col, "simhash")
    chunks = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright("simhash", i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select(id_col, "simhash", F.col("c.chunk_id").alias("chunk_id"), F.col("c.chunk").alias("chunk"))
    a = chunks.select(
        "chunk_id", "chunk", F.col(id_col).alias("id_a"), F.col("simhash").alias("sig_a")
    )
    b = chunks.select(
        "chunk_id", "chunk", F.col(id_col).alias("id_b"), F.col("simhash").alias("sig_b")
    )
    pairs = (
        a.join(b, ["chunk_id", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    block_col: str = "source",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact word n-gram Jaccard >= threshold within blocks (block join
    bounds the pair count; at scale the block is an LSH bucket).

    Shingles are hashed to 64-bit longs BEFORE the self-join: the block
    join is quadratic within each block, so the per-pair intersect work and
    the shuffled array payload both shrink (~8 bytes vs full n-gram
    strings); Jaccard over distinct 64-bit hashes equals Jaccard over the
    strings up to negligible collision probability.
    """
    sh = with_word_shingles(
        docs.select(id_col, block_col, text_col), text_col, n
    ).withColumn("sh_h", F.expr("transform(shingles, s -> xxhash64(s))"))
    a = sh.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col("sh_h").alias("sh_a")
    )
    b = sh.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_b"), F.col("sh_h").alias("sh_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("blk").alias(block_col), "id_a", "id_b", "jaccard")
    )
