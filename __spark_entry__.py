"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — synthesizes the `input_hint` pages table
  from /root/testdata/sf0.001/documents.parquet and runs the full KG
  pipeline (extract_text pandas UDF -> mentions -> classify -> merge ->
  MinHash-LSH linking -> connected components -> triples).
- ``queries()`` / ``oracle_sql()``: operator registry from
  ocds_entity_extract_spark.queries / queries_ml (SURVEY.md §2 coverage,
  one DuckDB oracle per SQL-expressible operator).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 documents -> synthetic pages -> KG triples."""
    from pyspark.sql import functions as F

    from ocds_entity_extract_spark.plans.pipeline import build_triples

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # deterministic page synthesis: wrap each doc in HTML and embed a
    # company-style mention derived from the doc's own leading words.
    frag = F.initcap(F.substring(F.col("text"), 1, 40))
    html = F.encode(
        F.concat(
            F.lit("<html><head><title>doc</title><script>var x=1;</script></head><body><p>hoy "),
            frag,
            F.lit(" S.A. de C.V. anunció resultados.</p><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
        "UTF-8",
    )
    pages = docs.select(
        F.concat(F.lit("https://docs.example.mx/"), F.col("doc_id").cast("string")).alias("url"),
        (F.lit("2025-01-01 00:00:00").cast("timestamp") + F.make_interval(secs=F.col("doc_id"))).alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
    return build_triples(spark, pages).triples


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocds_entity_extract_spark import queries as _q          # noqa: F401
    from ocds_entity_extract_spark import queries_analytics as _qa  # noqa: F401
    from ocds_entity_extract_spark import queries_ml as _qml     # noqa: F401
    from ocds_entity_extract_spark.queries import SPARK_QUERIES

    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocds_entity_extract_spark import queries as _q          # noqa: F401
    from ocds_entity_extract_spark import queries_analytics as _qa  # noqa: F401
    from ocds_entity_extract_spark import queries_ml as _qml     # noqa: F401
    from ocds_entity_extract_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
