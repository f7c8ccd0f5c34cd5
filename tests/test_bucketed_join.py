"""Bucketed co-located join: the shuffle-free big-join strategy.

At 100 TB the orders⋈lineitem-class joins dominate shuffle volume; writing
both tables bucketed by the join key (same bucket count) lets Spark plan a
SortMergeJoin with NO Exchange on either side — each bucket pair joins
in place. This test proves the engine's write path produces genuinely
co-located tables: identical join results AND an Exchange-free physical
plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "orders_b"))
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "lineitem_b"))
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _joined(o, li):
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    o, li = bucketed_tables
    # disable auto-broadcast so the join strategy under test is SMJ over
    # bucketed scans, as it would be for two 10-TB fact tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _joined(o, li)._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    o, li = bucketed_tables
    plain_o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    plain_li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    got = {r["o_orderkey"]: (r["n_items"], r["total"]) for r in _joined(o, li).collect()}
    want = {
        r["o_orderkey"]: (r["n_items"], r["total"])
        for r in _joined(plain_o, plain_li).collect()
    }
    assert got == want and len(got) > 0
