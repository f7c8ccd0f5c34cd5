"""Geo dims (F7/F8/F9 as broadcast tables) + area hierarchy (X4
fallthrough) + area membership edges."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocds_entity_extract_spark.functions.geo import (
    country_dim,
    mx_state_dim,
    with_country_code,
    with_state_code,
)
from ocds_entity_extract_spark.plans.areas import area_edges, area_nodes, with_area_ancestors

ADDR_SCHEMA = (
    "entity_id string, country_name string, region string, locality string,"
    " gov_level string"
)
ADDRS = [
    ("e-city", "México", "Jalisco", "Guadalajara", "city"),
    ("e-state", "México", "Veracruz de Ignacio de la Llave", None, "region"),
    ("e-country", "Estados Unidos", None, None, "country"),
    ("e-nolevel-city", "México", "Nuevo León", "Monterrey", None),
    ("e-nolevel-country", "Francia", None, None, None),
    ("e-unknown-state", "México", "Estado Inventado", None, "region"),
]


def _addrs(spark):
    return spark.createDataFrame(ADDRS, ADDR_SCHEMA)


def test_country_dim_lookup(spark):
    df = spark.createDataFrame(
        [("a", "México"), ("b", "MX"), ("c", "Francia"), ("d", "Desconocido")],
        "entity_id string, country_name string",
    )
    out = {r["entity_id"]: r["country_code"] for r in with_country_code(df, spark).collect()}
    assert out == {"a": "MX", "b": "MX", "c": "FR", "d": None}


def test_state_dim_aliases(spark):
    df = spark.createDataFrame(
        [("a", "Veracruz"), ("b", "Veracruz de Ignacio de la Llave"),
         ("c", "CDMX"), ("d", "Estado Inventado")],
        "entity_id string, region string",
    )
    out = {r["entity_id"]: r["state_code"] for r in with_state_code(df, spark).collect()}
    assert out["a"] == "MX-VER" and out["b"] == "MX-VER"
    assert out["c"] == "MX-CMX"
    assert out["d"] == "MX-estado-inventado"   # fallback id, never null


def test_area_fallthrough_levels(spark):
    rows = {
        r["entity_id"]: r["areas"]
        for r in with_area_ancestors(_addrs(spark), spark).collect()
    }
    assert [a["classification"] for a in rows["e-city"]] == ["city", "region", "country"]
    assert [a["classification"] for a in rows["e-state"]] == ["region", "country"]
    assert [a["classification"] for a in rows["e-country"]] == ["country"]
    # no gov_level: inferred from most specific address field (else-branch)
    assert [a["classification"] for a in rows["e-nolevel-city"]] == ["city", "region", "country"]
    assert [a["classification"] for a in rows["e-nolevel-country"]] == ["country"]
    city = rows["e-city"][0]
    assert city["area_id"] == "MX-JAL-guadalajara"
    assert city["parent_id"] == "MX-JAL"


def test_area_nodes_dedup(spark):
    nodes = {r["area_id"]: r for r in area_nodes(_addrs(spark), spark).collect()}
    assert nodes["mx"]["classification"] == "country"
    assert nodes["MX-JAL"]["parent_id"] == "mx"
    # two entities in México -> one country node
    assert sum(1 for a in nodes if a == "mx") == 1


def test_area_edges(spark):
    edges = {
        (r["subj"], r["pred"], r["obj"]) for r in area_edges(_addrs(spark), spark).collect()
    }
    assert ("e-city", "inArea", "MX-JAL-guadalajara") in edges
    assert ("MX-JAL-guadalajara", "partOf", "MX-JAL") in edges
    assert ("MX-JAL", "partOf", "mx") in edges
    assert ("e-country", "inArea", "us") in edges


def test_country_dim_reference_parity(spark):
    """F7: dim covers the reference's ~80 getCountryName arms
    (extract.js:1384-1467) — re-derived from public ISO-3166."""
    from ocds_entity_extract_spark.functions.geo import COUNTRIES, country_dim

    assert len(COUNTRIES) >= 80
    assert len({c for c, _ in COUNTRIES}) == len(COUNTRIES)  # unique codes
    dim = {r["code"]: r["name_es"] for r in country_dim(spark).collect()}
    assert dim["UA"] == "Ucrania" and dim["VN"] == "Vietnam"
    assert dim["QA"] == "Catar" and dim["SA"] == "Arabia Saudita"
