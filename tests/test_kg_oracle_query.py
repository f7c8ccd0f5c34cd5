"""The flagship end-to-end oracle query (kg_pipeline_triples).

Two invariants:
1. The size-adaptive linking escape hatch is invisible: forcing the
   DISTRIBUTED linking+CC path produces the byte-identical triple set the
   driver-side union-find path produces on the same template corpus.
2. The DuckDB twin (_kg_triples_oracle_sql) value-hash-matches the real
   Spark plan at sf0.001 — the same gate the driver applies at sf0.01.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def template_pages(spark):
    from ocds_entity_extract_spark.queries_ml import _kg_template_pages

    return _kg_template_pages(spark.read.parquet(f"{SF_DIR}/documents.parquet"))


def _triples_set(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in df.collect()}


def test_driver_vs_distributed_linking_same_triples(spark, template_pages):
    from ocds_entity_extract_spark.plans.pipeline import build_triples

    driver_side = _triples_set(
        build_triples(spark, template_pages).triples
    )
    distributed = _triples_set(
        build_triples(spark, template_pages, max_driver_linking=0).triples
    )
    assert driver_side == distributed
    assert len(driver_side) > 0
    spark.catalog.clearCache()


def test_oracle_matches_spark_at_sf0001(spark):
    duckdb = pytest.importorskip("duckdb")

    from ocds_entity_extract_spark.queries_ml import (
        _kg_triples_oracle_sql,
        q_kg_pipeline_triples,
    )

    sdf = q_kg_pipeline_triples(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF_DIR}/documents.parquet')"
    )
    odf = con.sql(_kg_triples_oracle_sql()).df()

    def canon(df):
        return sorted(map(tuple, df[sorted(df.columns)].itertuples(index=False)))

    assert len(sdf) == len(odf) > 0
    assert canon(sdf) == canon(odf)
    # every emitted predicate family is actually exercised by the template
    assert {"mentions", "type", "sameAs", "memberOf", "inArea", "partOf"} <= set(
        sdf["pred"].unique()
    )
