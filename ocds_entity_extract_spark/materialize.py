"""Triple materialization: partitioned tables + per-partition lineage +
metrics + content-hash ids.

≙ reference sink layer (insert.js / stream.js) re-expressed:
- content-hash `_id` (insert.js:37 object-hash)  -> sha2(canonical concat)
  with PINNED column order (SURVEY.md §7.3 canonicalization contract);
- run timestamp stamp (insert.js:38)             -> run_ts passed in (no
  current_timestamp in the data path — determinism);
- per-type counts report (index.js:108-129)      -> metrics rows;
- per-partition lineage rows (north_rule)        -> row_count + content
  hash per (pred) partition, committed with the data.

Layout: triples partitioned by `pred` (low cardinality, prunes predicate-
scoped reads) — the analogue of the reference's per-entity-type collections.
At cluster scale add `bucket(subj)` via Iceberg partition transforms.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, functions as F

from ocds_entity_extract_spark.sources.catalog import Catalog


def with_triple_id(triples: DataFrame) -> DataFrame:
    """Stable content-hash id, pinned field order subj|pred|obj."""
    return triples.withColumn(
        "_id", F.sha2(F.concat_ws("|", "subj", "pred", "obj"), 256)
    )


def materialize_triples(
    cat: Catalog,
    triples: DataFrame,
    run_id: str,
    run_ts: dt.datetime | None = None,
    table: str = "triples",
) -> dict[str, float]:
    """Write triples partitioned by pred; append lineage + metrics rows.
    Returns the metrics dict."""
    run_ts = run_ts or dt.datetime.now(dt.timezone.utc)
    stamped = with_triple_id(triples)
    cat.overwrite_partitions(table, stamped, partition_by=["pred"])

    written = cat.read(table)
    lineage = (
        written.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("row_count"),
            F.expr("bit_xor(xxhash64(_id))").alias("xh"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(table).alias("stage"),
            F.col("pred").alias("partition_key"),
            F.col("row_count"),
            F.lower(F.hex("xh")).alias("content_hash"),
            F.lit(run_ts).alias("committed_ts"),
        )
    )
    cat.append("lineage", lineage)

    counts = {r["partition_key"]: r["row_count"] for r in lineage.collect()}
    metrics = {f"triples_{k}": float(v) for k, v in counts.items()}
    metrics["triples_total"] = float(sum(counts.values()))
    mdf = cat.spark.createDataFrame(
        [(run_id, k, v) for k, v in metrics.items()],
        "run_id string, metric string, value double",
    )
    cat.append("metrics", mdf)
    return metrics
