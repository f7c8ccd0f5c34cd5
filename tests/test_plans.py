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


def test_percentile_approx_within_tolerance(spark):
    """The production percentile path (mergeable percentile_approx sketch)
    must stay within sketch tolerance of the exact oracle-hashed twin on
    the bench events table: p50/p90/p99 within 1% relative (accuracy
    10000 => rank error ~1e-4; generous margin for interpolation, since
    percentile_approx returns an actual sample, quantile_cont
    interpolates)."""
    import os

    from ocds_entity_extract_spark.queries_analytics import (
        q_value_percentiles,
        q_value_percentiles_approx,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    exact = {r["event_type"]: r for r in q_value_percentiles(spark, sf_dir).collect()}
    approx = {
        r["event_type"]: r for r in q_value_percentiles_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys() and exact
    for et, e in exact.items():
        a = approx[et]
        assert a["n"] == e["n"]
        for c in ("p50", "p90", "p99"):
            rel = abs(a[c] - e[c]) / max(abs(e[c]), 1e-9)
            assert rel <= 0.01, (et, c, e[c], a[c])


def test_corpus_curation_dedup_is_pure_hash_agg(spark, sf_dir):
    """The curation dedup (keep lowest doc_id per fingerprint) must plan
    as HashAggregate with map-side partials — NOT a row_number window
    (shuffles every surviving row, sorts each reducer partition) and NOT
    a min_by(struct) (whose struct buffer silently falls back to
    SortAggregate on both sides of the exchange). The string winner
    column is dictionary-encoded to int64 for the agg and decoded via a
    broadcast of the distinct-lang dim (round-5 rewrite; the A/B is in
    the query docstring)."""
    from ocds_entity_extract_spark.queries_analytics import q_corpus_curation

    plan = plan_of(q_corpus_curation(spark, sf_dir))
    assert "SortAggregate" not in plan
    assert "Window" not in plan
    assert "- Sort" not in plan  # no sort anywhere in the tree
    assert "BroadcastHashJoin" in plan  # lang decode is map-side
    assert plan.count("partial_min_by") >= 1  # map-side combine present
