"""Physical-plan assertions: the plans we ship are the plans we want
(pushdown, broadcast, partial aggregation, no gratuitous shuffles).
These guard the 100 TB design properties, not just correctness."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark, sf_dir):
    """pricing_summary: shipdate filter reaches the parquet scan; only the
    needed columns are read."""
    from ocds_entity_extract_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["pricing_summary"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]
    assert "HashAggregate" in plan  # partial+final hash agg


def test_broadcast_join_in_dim_query(spark, sf_dir):
    from ocds_entity_extract_spark.queries import SPARK_QUERIES

    plan = plan_of(SPARK_QUERIES["dim_broadcast_join"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mentions_stage_is_narrow(spark, pages_df):
    """pages -> mentions is shuffle-free (no Exchange in the plan)."""
    from ocds_entity_extract_spark.functions.html import with_extracted_text
    from ocds_entity_extract_spark.operators.mentions import detect_mentions

    plan = plan_of(detect_mentions(with_extracted_text(pages_df)))
    assert "Exchange" not in plan


def test_classifier_override_broadcasts(spark, pages_df, small_corpus):
    from ocds_entity_extract_spark.functions.classify import (
        load_classifier_override,
        with_entity_type,
    )
    from ocds_entity_extract_spark.functions.html import with_extracted_text
    from ocds_entity_extract_spark.operators.mentions import detect_mentions
    from ocds_entity_extract_spark.schemas import CLASSIFIER_SCHEMA

    _, _, aux = small_corpus
    override = load_classifier_override(
        spark, spark.createDataFrame(aux["classifier_override"], CLASSIFIER_SCHEMA)
    )
    plan = plan_of(
        with_entity_type(detect_mentions(with_extracted_text(pages_df)), override)
    )
    assert "BroadcastHashJoin" in plan


def test_merge_shuffle_budget(spark):
    """merge_entities: at most two Exchanges — the groupBy on entity_id
    plus the distinct-expand stage that exact countDistinct(url) needs.
    (At 100 TB switch page_count to approx_count_distinct -> one Exchange.)"""
    from ocds_entity_extract_spark.operators.merge import merge_entities

    df = spark.createDataFrame(
        [("u", "2025-01-01 00:00:00", "d", "A B", "A B", "a-b", "person")],
        "url string, warc_ts string, domain string, surface string,"
        " name_norm string, entity_id string, entity_type string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    plan = plan_of(merge_entities(df))
    # count Exchange NODES in the plan tree (each node also reappears in the
    # detail section, so count the tree-branch form)
    assert plan.count("- Exchange") <= 2
