"""Property-based parity: the Spark Column slug (`simple_name`) and its
Python mirror (`datagen.simple_name_py`) must agree on ANY input — the
golden-triple derivation depends on exact agreement (SURVEY.md §7.3)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from ocds_entity_extract_spark.datagen import simple_name_py
from ocds_entity_extract_spark.functions.text import simple_name

# alphabet biased toward the corpus: Spanish letters, accents, punctuation
ALPHA = (
    "abcdefghijklmnopqrstuvwxyz ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "áéíóúñüÁÉÍÓÚÑÜ0123456789 .,-_'\"()&/"
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.text(alphabet=ALPHA, min_size=0, max_size=40), min_size=1, max_size=20))
def test_simple_name_parity(spark, strings):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = [r["slug"] for r in df.select(simple_name("s").alias("slug")).collect()]
    want = [simple_name_py(s) for s in strings]
    assert got == want
