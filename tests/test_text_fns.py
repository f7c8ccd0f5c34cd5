"""Unit tests for the name-normalization Column functions (SURVEY.md §2.7)
and agreement between the Spark slug and its Python mirror (datagen golden
derivation depends on exact agreement)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocds_entity_extract_spark.datagen import simple_name_py
from ocds_entity_extract_spark.functions.text import (
    cbmei_id_reformat,
    collapse_ws,
    membership_id,
    simple_name,
    strip_accents,
    url_domain,
)

NAMES = [
    "Secretaría de Educación Pública",
    "Grupo   Aurora\tDelta  S.A. de C.V.",
    "JOSÉ  Ñoño   Gutiérrez",
    "Comisión Nacional -- Electoral",
    "  trailing  and   leading  ",
    "Ünïcødé Çombining",
    "a",
    "",
]


def _col_results(spark, col_fn, values):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    return [r[0] for r in df.select(col_fn(F.col("s")).alias("o")).collect()]


def test_collapse_ws(spark):
    out = _col_results(spark, collapse_ws, ["a  b\t c", " x ", "a\n\nb"])
    assert out == ["a b c", "x", "a b"]


def test_strip_accents(spark):
    out = _col_results(spark, strip_accents, ["Secretaría", "Ñoño", "ünïcø"])
    assert out == ["Secretaria", "Nono", "unico"]


def test_simple_name_matches_python_mirror(spark):
    out = _col_results(spark, simple_name, NAMES)
    expected = [simple_name_py(n) for n in NAMES]
    assert out == expected


def test_simple_name_examples(spark):
    out = _col_results(
        spark, simple_name, ["Grupo Aurora S.A. de C.V.", "José  Pérez "]
    )
    assert out == ["grupo-aurora-s-a-de-c-v", "jose-perez"]


def test_membership_id(spark):
    df = spark.createDataFrame([("a", "b")], "c1 string, c2 string")
    assert df.select(membership_id("c1", "c2").alias("o")).collect()[0][0] == "a_b"


def test_url_domain(spark):
    out = _col_results(
        spark, url_domain, ["https://x.example.mx/a/b", "http://h/p"]
    )
    assert out == ["x.example.mx", "h"]


def test_cbmei_id_reformat(spark):
    out = _col_results(
        spark, cbmei_id_reformat, ["123456789012", "already.dotted", "short"]
    )
    assert out == ["123.456.7890.12", "already.dotted", "short"]
