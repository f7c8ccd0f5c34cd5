"""Advanced-analytics operator coverage: as-of / range joins, top-k per
group, cube / pivot reshapes, stratified sampling, multi-resolution
rollups, sliding windows.

These extend the engine beyond the reference's own operator set toward
what a large-scale training-data pipeline needs (point-in-time feature
joins, windowed labeling, stratified corpus sampling, hypertable-style
rollups). Every query follows the registry conventions in queries.py
(identical column aliases both sides, doubles rounded, timestamps
rendered as strings, BIGINT casts).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocds_entity_extract_spark.functions.phash import (
    portable_hash64,
    portable_hash64_sql,
)
from ocds_entity_extract_spark.queries import TS_FMT_DUCK, TS_FMT_SPARK, _t, query


# =====================================================================
# as-of join (point-in-time feature lookup)
# =====================================================================

@query(
    "asof_join_events",
    f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purch AS (
      SELECT user_id, ts AS pts, max(value) AS pvalue
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '{TS_FMT_DUCK}') AS click_ts,
           strftime(p.pts, '{TS_FMT_DUCK}') AS purchase_ts,
           round(p.pvalue, 2) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ts >= p.pts
    """,
)
def q_asof_join_events(spark, sf_dir):
    """For every click, the user's most recent purchase at-or-before the
    click (point-in-time-correct: no future leakage). Spark side is the
    union+window as-of operator (operators/asof.py — one shuffle, stays in
    codegen); the oracle is DuckDB's native ASOF LEFT JOIN, a genuinely
    independent implementation of the same semantics."""
    from ocds_entity_extract_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    joined = asof_join(
        clicks,
        purch,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["pvalue"],
        matched_ts_col="_pts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", TS_FMT_SPARK).alias("click_ts"),
        F.date_format("_pts", TS_FMT_SPARK).alias("purchase_ts"),
        F.round("pvalue", 2).alias("last_purchase_value"),
    )


# =====================================================================
# range join (windowed attribution)
# =====================================================================

@query(
    "range_join_attribution",
    """
    WITH s AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup'
    ),
    c AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'click'
    )
    SELECT s.event_id,
           CAST(count(*) AS BIGINT) AS n_clicks,
           round(sum(c.value), 2) AS click_value
    FROM s JOIN c
      ON s.user_id = c.user_id
     AND c.ts >= s.ts AND c.ts < s.ts + INTERVAL 1 HOUR
    GROUP BY s.event_id
    """,
)
def q_range_join_attribution(spark, sf_dir):
    """Clicks within 1h after each signup (windowed attribution). Spark
    side is the binned-equi-join rewrite (operators/asof.py
    range_join_binned — bounded fan-out, no nested loop); the oracle is a
    plain inequality join."""
    from ocds_entity_extract_spark.operators.asof import range_join_binned

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), "value"
    )
    joined = range_join_binned(
        signups, clicks, key="user_id", left_ts="ts", right_ts="cts",
        window_seconds=3600,
    )
    return joined.groupBy("event_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.round(F.sum("value"), 2).alias("click_value"),
    )


# =====================================================================
# top-k per group (window ranking)
# =====================================================================

@query(
    "topk_per_group",
    """
    WITH rev AS (
      SELECT p.p_brand, l.l_partkey,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_brand, l.l_partkey
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY p_brand ORDER BY revenue DESC, l_partkey
      ) AS rk
      FROM rev
    )
    SELECT p_brand, l_partkey, revenue, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def q_topk_per_group(spark, sf_dir):
    """Top-3 revenue parts per brand. Ranking key is the ROUNDED revenue
    (+ partkey tiebreak) so engine-level float-summation order can never
    flip the ranking between Spark and the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("l_partkey")
    )
    return (
        rev.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("p_brand", "l_partkey", "revenue", "rk")
    )


# =====================================================================
# cube / grouping-sets aggregation
# =====================================================================

@query(
    "cube_agg",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube_agg(spark, sf_dir):
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass (Catalyst expands to a single Expand + hash-agg — one shuffle,
    partial aggs apply)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


# =====================================================================
# pivot (long -> wide reshape)
# =====================================================================

@query(
    "pivot_orderstatus",
    """
    SELECT n.n_name,
           round(sum(CASE WHEN o.o_orderstatus = 'O' THEN o.o_totalprice END), 2) AS status_o,
           round(sum(CASE WHEN o.o_orderstatus = 'F' THEN o.o_totalprice END), 2) AS status_f,
           round(sum(CASE WHEN o.o_orderstatus = 'P' THEN o.o_totalprice END), 2) AS status_p
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_pivot_orderstatus(spark, sf_dir):
    """Order value per nation pivoted wide by status. The pivot value list
    is EXPLICIT (['O','F','P']) — without it Spark runs an extra distinct
    job to discover values and the output schema becomes data-dependent."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    wide = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
    )
    return wide.select(
        "n_name",
        F.col("O").alias("status_o"),
        F.col("F").alias("status_f"),
        F.col("P").alias("status_p"),
    )


# =====================================================================
# stratified deterministic sampling (training-corpus curation)
# =====================================================================

_STRATA_SQL = "CASE WHEN lang = 'en' THEN 20 ELSE 50 END"


@query(
    "stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {portable_hash64_sql("'strat:' || CAST(doc_id AS VARCHAR)")} % 100
          < {_STRATA_SQL}
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Per-stratum deterministic downsampling: 20% of 'en' docs, 50% of
    everything else, selected by a portable content hash — the same rows
    on ANY engine, any partitioning, any run (unlike df.sample, whose
    output is partitioning-dependent). This is the scalable corpus-
    curation primitive: a pure filter, no shuffle, fully pushed into the
    scan stage."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(
        portable_hash64(
            F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))
        ),
        F.lit(100),
    )
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    return d.filter(bucket < rate).select("doc_id", "lang")


# =====================================================================
# hypertable-style multi-resolution rollup
# =====================================================================

@query(
    "hypertable_rollup",
    f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket, event_type,
             CAST(count(*) AS BIGINT) AS n_events, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT 'hour' AS grain, strftime(bucket, '{TS_FMT_DUCK}') AS bucket_ts,
           event_type, n_events, round(sv, 2) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS grain,
           strftime(date_trunc('day', bucket), '{TS_FMT_DUCK}') AS bucket_ts,
           event_type, CAST(sum(n_events) AS BIGINT) AS n_events,
           round(sum(sv), 2) AS sum_value
    FROM hourly GROUP BY 2, 3
    """,
)
def q_hypertable_rollup(spark, sf_dir):
    """Hour + day rollups in one result (hypertable continuous-aggregate
    pattern). The DAY grain is aggregated FROM THE HOURLY ROLLUP, not from
    raw events — one corpus pass total; the second agg runs over ~720
    rows. At 100 TB this cascade (raw -> hour -> day -> month) is the
    only affordable shape; re-scanning raw per grain would multiply the
    corpus reads by the grain count."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("value").alias("sv"),
        )
    )
    hour_out = hourly.select(
        F.lit("hour").alias("grain"),
        F.date_format("bucket", TS_FMT_SPARK).alias("bucket_ts"),
        "event_type",
        "n_events",
        F.round("sv", 2).alias("sum_value"),
    )
    day_out = (
        hourly.groupBy(
            F.date_trunc("day", "bucket").alias("dbucket"), "event_type"
        )
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.round(F.sum("sv"), 2).alias("sum_value"),
        )
        .select(
            F.lit("day").alias("grain"),
            F.date_format("dbucket", TS_FMT_SPARK).alias("bucket_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return hour_out.unionByName(day_out)


# =====================================================================
# iterative PageRank (fixed-point, bit-identical across engines)
# =====================================================================

_PAGERANK_EDGES_CTE = """
    SELECT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
           's' || CAST(l.l_suppkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    UNION
    SELECT 's' || CAST(l.l_suppkey AS VARCHAR) AS src,
           'c' || CAST(o.o_custkey AS VARCHAR) AS dst
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
"""

_PAGERANK_ITERS = 8


def _pagerank_oracle_sql() -> str:
    from ocds_entity_extract_spark.operators.graph import pagerank_sql_unrolled

    return (
        pagerank_sql_unrolled(_PAGERANK_EDGES_CTE, _PAGERANK_ITERS)
        + f"\nSELECT node, rank_int FROM r{_PAGERANK_ITERS} WHERE rank_int >"
        " (SELECT r_init FROM nn)"
    )


@query("pagerank_copurchase", _pagerank_oracle_sql())
def q_pagerank_copurchase(spark, sf_dir):
    """PageRank over the customer<->supplier co-purchase graph — the
    iterative-DataFrame-join pattern (driver loop + localCheckpoint
    lineage truncation, same machinery as the CC operator) under the
    value-hash gate: fixed-point BIGINT arithmetic makes all 8 iterations
    bit-identical between Spark and the DuckDB unrolled-CTE twin. Output
    filtered to above-initial-rank nodes (the salient ones)."""
    from ocds_entity_extract_spark.operators.graph import pagerank_fixed_point

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
    )
    edges = (
        pairs.select(F.col("c").alias("src"), F.col("s").alias("dst"))
        .unionByName(pairs.select(F.col("s").alias("src"), F.col("c").alias("dst")))
    )
    ranks = pagerank_fixed_point(edges, iterations=_PAGERANK_ITERS)
    n_nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .count()
    )
    from ocds_entity_extract_spark.operators.graph import DEFAULT_SCALE

    return ranks.filter(F.col("rank_int") > DEFAULT_SCALE // n_nodes)


# =====================================================================
# end-to-end corpus curation (quality -> dedup -> split)
# =====================================================================

@query(
    "corpus_curation",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             len(string_split_regex(text, '\\s+')) AS n_tokens,
             sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    filtered AS (
      SELECT * FROM scored
      WHERE n_tokens >= 20 AND CAST(n_chars AS DOUBLE) / n_tokens <= 12
    ),
    deduped AS (
      SELECT * FROM filtered
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT CASE
             WHEN {portable_hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                  % 100 < 90 THEN 'train'
             ELSE 'holdout'
           END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens
    FROM deduped
    GROUP BY 1, 2
    """,
)
def q_corpus_curation(spark, sf_dir):
    """The full training-corpus curation chain as ONE plan: quality
    filter (token count + chars/token) -> exact near-identity dedup
    (normalized sha256 fingerprint, min-doc_id winner) -> deterministic
    hash split -> per-(split, lang) accounting.

    Plan shape at 100 TB: the filter and fingerprint are scan-local; the
    dedup is the only corpus-sized shuffle (partial-aggregated on the
    fingerprint); the split/accounting agg rides the tiny dedup output.
    Every stage reuses the operators verified individually
    (quality_scores, doc_fingerprints, dataset_split) — this query pins
    their COMPOSITION under one value hash."""
    from pyspark.sql.window import Window

    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), r"\s+")).cast("bigint")
    from ocds_entity_extract_spark.functions.text import collapse_ws

    scored = d.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tok.alias("n_tokens"),
        F.sha2(F.lower(collapse_ws("text")), 256).alias("fp"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= 20)
        & (F.col("n_chars").cast("double") / F.col("n_tokens") <= 12)
    )
    deduped = (
        filtered.withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("fp").orderBy("doc_id")),
        )
        .filter(F.col("_rn") == 1)
    )
    split = F.when(
        F.pmod(
            portable_hash64(
                F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
            ),
            F.lit(100),
        )
        < 90,
        F.lit("train"),
    ).otherwise(F.lit("holdout"))
    return deduped.groupBy(split.alias("split"), "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# =====================================================================
# percentile / quantile profiling
# =====================================================================

@query(
    "value_percentiles",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 2) AS p50,
           round(quantile_cont(value, 0.9), 2) AS p90,
           round(quantile_cont(value, 0.99), 2) AS p99
    FROM events GROUP BY event_type
    """,
)
def q_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, verified value-for-value). At 100 TB swap for
    `percentile_approx` (t-digest sketch, mergeable partial aggregation);
    the exact version is the oracle-checkable twin that bounds the
    sketch's error."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 2).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 2).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 2).alias("p99"),
    )


# =====================================================================
# Structured Streaming under the value-hash gate
# =====================================================================

@query(
    "streaming_hourly_counts",
    f"""
    SELECT strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS hour_ts,
           event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_hourly_counts(spark, sf_dir):
    """Windowed streaming aggregation, drained with trigger(availableNow)
    and compared value-for-value against the batch oracle — the
    batch/stream unification guarantee (same DataFrame surface, same
    results) checked by the driver gate, not just by pytest.

    The watermark bounds aggregation state for unbounded streams; with an
    availableNow drain over a bounded source it never discards data, so
    the result must equal the batch GROUP BY. File-stream sources require
    a DIRECTORY, so the single-file test table is exposed through a
    symlinked temp dir (a real deployment streams a directory/Kafka topic
    anyway)."""
    import hashlib
    import pathlib

    src = pathlib.Path(sf_dir) / "events.parquet"
    key = hashlib.md5(str(src).encode()).hexdigest()[:10]
    d = pathlib.Path(f"/tmp/sg_stream_{key}/events")
    d.mkdir(parents=True, exist_ok=True)
    link = d / "events.parquet"
    if not link.is_symlink():
        link.symlink_to(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).parquet(str(d))
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sink = f"q_stream_hourly_{key}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        F.date_format("w.start", TS_FMT_SPARK).alias("hour_ts"),
        "event_type",
        "n",
    )


# =====================================================================
# sliding-window aggregation (moving average)
# =====================================================================

@query(
    "sliding_window_avg",
    f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, strftime(bucket, '{TS_FMT_DUCK}') AS bucket_ts, n,
           round(avg(n) OVER (
             PARTITION BY event_type ORDER BY bucket
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ), 2) AS ma3
    FROM hourly
    """,
)
def q_sliding_window_avg(spark, sf_dir):
    """3-hour moving average of hourly event counts per type: pre-agg to
    hours first (shrinks the window input from O(events) to O(hours)),
    then a rows-frame window — the cheap formulation at any scale."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(-2, Window.currentRow)
    )
    return hourly.select(
        "event_type",
        F.date_format("bucket", TS_FMT_SPARK).alias("bucket_ts"),
        "n",
        F.round(F.avg("n").over(w), 2).alias("ma3"),
    )
