"""Entity linking: MinHash-LSH blocking + candidate scoring -> sameAs edges.

The reference resolves aliases only by exact id equality (dict key probe,
reference extract.js:1380-1382); the web-scale north rule requires fuzzy
alias resolution. Design (all JVM-side Column expressions — no UDF, no
per-shingle explode shuffle):

1. slug -> character 3-gram shingle array (higher-order `transform` over
   `sequence`, computed once per DISTINCT entity id — dedup first, so the
   cost is O(|entities|), not O(|mentions|)).
2. K minhashes: `array_min(transform(shingles, s -> xxhash64(s, i)))` —
   K columns, zero shuffles.
3. LSH bands: r minhashes hashed per band; explode only the B band keys
   (B ~ 8 rows per entity) -> self-join on (band_id, band_hash).
   Hot buckets (degenerate shingle patterns) are CAPPED at
   `max_bucket_size` before the self-join — the standard LSH skew guard:
   a bucket of size m yields m^2/2 pairs, so one hot bucket can dominate
   the whole job at 100 TB scale.
4. Exact-Jaccard verification on the candidate pairs
   (array_intersect/size — pair count is LSH-bounded, cheap).
5. A cheap prefix block (first `prefix_len` slug chars) unioned in as a
   secondary blocker — catches prefix-preserving aliases LSH may drop at
   the band boundary; same cap + verification applies.

Output: undirected verified edges (src, dst, jaccard) with src < dst,
feeding connected components (operators/cc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_NUM_HASHES = 16
DEFAULT_BAND_SIZE = 2          # r: minhashes per band -> B = K / r bands
# verification: overlap coefficient |A∩B| / min(|A|,|B|) — robust for the
# dominant alias shapes (token-prefix drops: the shorter slug's shingles are
# a subset of the longer's), where plain Jaccard of a short alias vs a long
# canonical dips into the same range as sibling-entity pairs.
DEFAULT_CONTAINMENT_THRESHOLD = 0.80
DEFAULT_MIN_INTERSECT = 6
DEFAULT_MAX_BUCKET = 64
DEFAULT_PREFIX_LEN = 10


def with_shingles(df: DataFrame, col: str = "entity_id", n: int = 3) -> DataFrame:
    """Add `shingles`: distinct character n-grams of the slug column."""
    return df.withColumn(
        "shingles",
        F.expr(
            f"array_distinct(transform(sequence(1, greatest(length({col}) - {n - 1}, 1)),"
            f" i -> substring({col}, i, {n})))"
        ),
    )


def with_minhash_bands(
    df: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
) -> DataFrame:
    """Add `bands`: array of (band_id, band_hash) structs from K minhashes.

    xxhash64(shingle, seed_i) gives K independent hash families; band hash
    combines r consecutive minhashes. Everything stays inside codegen.
    """
    mh = [
        F.array_min(
            F.expr(f"transform(shingles, s -> xxhash64(s, {i}))")
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    df = df.select("*", *mh)
    n_bands = num_hashes // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return df.withColumn("bands", bands).drop(*[f"mh{i}" for i in range(num_hashes)])


def _cap_buckets(buckets: DataFrame, keys: list[str], max_bucket: int) -> DataFrame:
    """Drop pathologically hot LSH buckets before the self-join (skew guard)."""
    sizes = buckets.groupBy(*keys).agg(F.count(F.lit(1)).alias("_bsz"))
    return (
        buckets.join(sizes.filter(F.col("_bsz") <= max_bucket), keys, "inner")
        .drop("_bsz")
    )


def candidate_pairs(
    entities: DataFrame,
    id_col: str = "entity_id",
    num_hashes: int = DEFAULT_NUM_HASHES,
    band_size: int = DEFAULT_BAND_SIZE,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    prefix_len: int = DEFAULT_PREFIX_LEN,
) -> DataFrame:
    """DISTINCT ids -> candidate (src, dst) pairs, src < dst, deduped."""
    base = entities.select(id_col).distinct()
    sh = with_shingles(base, id_col)
    banded = with_minhash_bands(sh, num_hashes, band_size)

    lsh_buckets = banded.select(
        F.col(id_col), F.explode("bands").alias("b")
    ).select(id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    lsh_buckets = _cap_buckets(lsh_buckets, ["band_id", "band_hash"], max_bucket)

    left = lsh_buckets.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("src")
    )
    right = lsh_buckets.select(
        F.col("band_id"), F.col("band_hash"), F.col(id_col).alias("dst")
    )
    lsh_pairs = left.join(right, ["band_id", "band_hash"]).filter(
        F.col("src") < F.col("dst")
    ).select("src", "dst")

    pref = base.select(
        F.col(id_col), F.substring(id_col, 1, prefix_len).alias("pfx")
    ).filter(F.length(id_col) >= prefix_len)
    pref = _cap_buckets(pref, ["pfx"], max_bucket)
    pref_pairs = (
        pref.alias("a")
        .join(pref.alias("b"), "pfx")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("src"), F.col(f"b.{id_col}").alias("dst"))
    )
    return lsh_pairs.unionByName(pref_pairs).distinct()


def verified_edges(
    entities: DataFrame,
    id_col: str = "entity_id",
    threshold: float = DEFAULT_CONTAINMENT_THRESHOLD,
    min_intersect: int = DEFAULT_MIN_INTERSECT,
    **kw,
) -> DataFrame:
    """Candidate pairs -> exact-similarity-verified sameAs edges.

    Score = overlap coefficient (containment) of the exact shingle sets; an
    edge also needs `min_intersect` shared shingles so trivially short slugs
    cannot reach the threshold by chance.
    """
    pairs = candidate_pairs(entities, id_col, **kw)
    sh = with_shingles(entities.select(id_col).distinct(), id_col).select(
        F.col(id_col), F.col("shingles")
    )
    joined = (
        pairs.join(sh.withColumnRenamed(id_col, "src").withColumnRenamed("shingles", "sh_src"), "src")
        .join(sh.withColumnRenamed(id_col, "dst").withColumnRenamed("shingles", "sh_dst"), "dst")
    )
    inter = F.size(F.array_intersect("sh_src", "sh_dst"))
    containment = inter / F.least(F.size("sh_src"), F.size("sh_dst"))
    jac = inter / F.size(F.array_union("sh_src", "sh_dst"))
    return (
        joined.withColumn("containment", containment)
        .withColumn("jaccard", jac)
        .filter(
            (F.col("containment") >= threshold) & (inter >= F.lit(min_intersect))
        )
        .select("src", "dst", "containment", "jaccard")
    )
