"""Entity output documents (Popolo-style) + NDJSON stream sink.

≙ the reference's six output kinds (SURVEY.md §1.3): person
(extract.js:1220-1292), company (704-783), institution (831-989),
state/area (785-829), membership (1102-1218), each a JSON document; and the
NDJSON stdout sink with fixed group order (stream.js:3-42) / per-collection
DB sink (insert.js:3-45).

Spark-first: one nested-struct DataFrame per kind, union'd with an
`entity_type` discriminator; the `[SPLIT]`-delimited group concat becomes
`partitionBy(entity_type)` — one directory per group, same information,
parallel writers. Content-hash `_id` stamped with pinned field order
(≙ insert.js:37 object-hash; SURVEY.md §7.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocds_entity_extract_spark.functions.text import membership_id


def entity_documents(entities: DataFrame, mapping: DataFrame) -> DataFrame:
    """Merged entities -> canonical output documents.

    - canonicalized id (sameAs mapping applied; alias rows folded into the
      canonical doc's other_names)
    - classification array ≙ the reference's classification field
    - counters struct ≙ contract_count/purchase_count role buckets
      (mention/page counts are the web-scale analogue)
    """
    canon = (
        entities.join(mapping, "entity_id")
        .groupBy("canonical_id")
        .agg(
            F.min_by("name", F.struct("first_seen", "entity_id")).alias("name"),
            F.max(
                F.when(F.col("entity_type") == "institution", 3)
                .when(F.col("entity_type") == "company", 2)
                .otherwise(1)
            ).alias("_rank"),
            F.array_sort(
                F.array_distinct(
                    F.flatten(
                        F.collect_list(
                            F.concat(F.array("name"), F.col("other_names"))
                        )
                    )
                )
            ).alias("_all_names"),
            F.sum("mention_count").alias("mention_count"),
            F.sum("page_count").alias("page_count"),
            F.min("first_seen").alias("first_seen"),
            F.max("last_seen").alias("last_seen"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sources")))).alias(
                "sources"
            ),
        )
    )
    etype = (
        F.when(F.col("_rank") == 3, "institution")
        .when(F.col("_rank") == 2, "company")
        .otherwise("person")
    )
    doc = canon.select(
        F.col("canonical_id").alias("id"),
        "name",
        etype.alias("entity_type"),
        F.array(etype).alias("classification"),
        F.array_remove(F.col("_all_names"), F.col("name")).alias("other_names"),
        F.struct(
            F.col("mention_count").alias("mentions"),
            F.col("page_count").alias("pages"),
        ).alias("counters"),
        "sources",
        "first_seen",
        "last_seen",
    )
    # content-hash id, pinned field order (id|name|type) — stable across runs
    return doc.withColumn(
        "_id",
        F.sha2(F.concat_ws("|", "id", "name", "entity_type"), 256),
    )


def membership_documents(memberships: DataFrame, mapping: DataFrame) -> DataFrame:
    """(url, person_id, role, org_id) candidates -> membership edge docs
    {id: person_canon_org_canon, role, person_id, organization_id}
    (≙ the six membership constructors' common shape, extract.js:1102-1218)."""
    m = (
        memberships.join(
            mapping.withColumnRenamed("entity_id", "person_id"), "person_id"
        )
        .withColumnRenamed("canonical_id", "person_canon")
        .join(mapping.withColumnRenamed("entity_id", "org_id"), "org_id")
        .withColumnRenamed("canonical_id", "org_canon")
    )
    return (
        m.groupBy("person_canon", "org_canon")
        .agg(
            F.min("role").alias("role"),
            F.countDistinct("url").alias("evidence_pages"),
        )
        .select(
            membership_id("person_canon", "org_canon").alias("id"),
            "role",
            F.col("person_canon").alias("person_id"),
            F.col("org_canon").alias("organization_id"),
            "evidence_pages",
        )
        .withColumn(
            "_id",
            F.sha2(F.concat_ws("|", "id", "role"), 256),
        )
    )


def write_ndjson_grouped(
    df: DataFrame, path: str, group_col: str = "entity_type"
) -> None:
    """NDJSON stream sink: one directory per group (≙ stream.js [SPLIT]
    groups / insert.js per-collection inserts), parallel JSON writers."""
    df.write.mode("overwrite").partitionBy(group_col).json(path)
