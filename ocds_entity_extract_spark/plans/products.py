"""Product entities from procurement-report sentences.

≙ the reference's contract-item consumption (reference extract.js:40-106
accumulation loop, extract.js:108-140 createProduct, extract.js:142-153
getProductID): where OCDS hands the reference `contract.items[]`, a web
page hands us PRODUCT_RE sentences (operators/mentions.py) carrying the
same fields — item id, description, quantity, unit price, overprice and
reference average — with the page's `warc_ts` standing in for
`contract.period.startDate`.

Aggregation semantics, re-expressed ORDER-FREE (the reference folds
sequentially over a Mongo cursor; every aggregate below is a decomposable
sum/min/max so the Spark plan is one partial-aggregated groupBy):

- purchase_count / purchase_quantity    ≙ extract.js:68-70 counters
- purchase_amount = Σ qty·unit_price    ≙ extract.js:69 (item.valueMxIMSS;
  the webtext sentence carries unit price + qty, so the item value is
  their product)
- avg_unit_price = Σ qty·unit / Σ qty   ≙ extract.js:62-66 — the running
  average `(accumulated + price·qty) / (prev_qty + qty)` telescopes to
  exactly this ratio (A13 decomposition), so one decomposable pair of
  sums replaces the order-dependent fold
- amount_over_all / _with_overcost      ≙ extract.js:72-76 (≠0 / >0 gates)
- quantity_lost_all / _with_overcost    ≙ extract.js:77-81 (over/avg,
  avg≠0 gate)
- first/last_purchase_date              ≙ extract.js:83-97 min/max (A15)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocds_entity_extract_spark.functions.text import cbmei_id_reformat
from ocds_entity_extract_spark.operators.mentions import PRODUCT_RE


def products_from_spans(spans: DataFrame) -> DataFrame:
    """detect_spans output -> one typed row per product item occurrence.

    The `product_spans` gate means only product-bearing pages reach the
    explode; the per-group regexp_extract calls run on short, already
    matched spans. Product ids get the CBMEI dotted reformat (F3,
    ≙ getProductID, extract.js:142-153)."""
    p = spans.filter(F.size("product_spans") > 0).select(
        "url", "warc_ts", F.explode("product_spans").alias("s")
    )
    g = lambda i: F.regexp_extract("s", PRODUCT_RE, i)  # noqa: E731
    return p.select(
        "url",
        "warc_ts",
        cbmei_id_reformat(g(1)).alias("product_id"),
        g(2).alias("description"),
        g(3).cast("long").alias("quantity"),
        g(4).cast("double").alias("unit_price"),
        g(5).cast("double").alias("overprice"),
        g(6).cast("double").alias("avg_value"),
    ).filter(F.col("product_id") != "")


def product_docs(items: DataFrame) -> DataFrame:
    """Item occurrences -> one product document per product_id (A12-A15).

    One groupBy with map-side partial aggregation; description resolves by
    min() (order-free stand-in for the reference's first-wins dict insert —
    deterministic under any partitioning, and a catalog description is
    constant per id anyway)."""
    over = F.col("overprice")
    avgv = F.col("avg_value")
    val = F.col("quantity") * F.col("unit_price")
    zero = F.lit(0.0)
    return items.groupBy("product_id").agg(
        F.min("description").alias("description"),
        F.count("*").alias("purchase_count"),
        F.sum("quantity").alias("purchase_quantity"),
        F.sum(val).alias("purchase_amount"),
        (F.sum(val) / F.sum("quantity")).alias("avg_unit_price"),
        F.sum(F.when(over != 0, over).otherwise(zero)).alias("amount_over_all"),
        F.sum(F.when(over > 0, over).otherwise(zero)).alias(
            "amount_over_with_overcost"
        ),
        F.sum(
            F.when((over != 0) & (avgv != 0), over / avgv).otherwise(zero)
        ).alias("quantity_lost_all"),
        F.sum(
            F.when((over > 0) & (avgv != 0), over / avgv).otherwise(zero)
        ).alias("quantity_lost_with_overcost"),
        F.min(F.to_date("warc_ts")).alias("first_purchase_date"),
        F.max(F.to_date("warc_ts")).alias("last_purchase_date"),
    )
