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
    """Flagship: sf0.001 documents -> template pages -> KG triples.

    Uses the SAME deterministic html template the oracle-gated
    kg_pipeline_triples query runs (queries_ml._kg_template_pages), so the
    driver smoke exercises every emitted predicate — mentions/type/sameAs
    plus memberOf (membership sentences), inArea/partOf (place-suffixed
    institutions) — not just the company path."""
    from ocds_entity_extract_spark.plans.pipeline import build_triples
    from ocds_entity_extract_spark.queries_ml import _kg_template_pages

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    triples = build_triples(spark, _kg_template_pages(docs)).triples
    # contract lock: the smoke must cover EVERY emitted predicate, not just
    # ">0 rows" — a template regression that silently drops an edge family
    # (e.g. products or contacts) fails here, at smoke time. Cheap: the
    # pipeline caches its intermediates, so the driver's own collect()
    # afterwards reuses them.
    want = {
        "mentions", "type", "sameAs", "memberOf", "inArea", "partOf",
        "mentionsProduct",
    }
    got = {r["pred"] for r in triples.select("pred").distinct().collect()}
    assert want <= got, f"entry() smoke is missing predicates: {want - got}"
    return triples


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
