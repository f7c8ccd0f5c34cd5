"""Invariant #1: byte-identical extracted text per url (BASELINE.md).

Covers: pinned extractor spec behavior, pandas-UDF == pure-Python parity,
determinism across partitionings, and a committed golden file."""

from __future__ import annotations

import json
import pathlib

from pyspark.sql import functions as F

from ocds_entity_extract_spark.functions.html import extract_text, extract_text_bytes
from ocds_entity_extract_spark.schemas import PAGES_SCHEMA

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden" / "extract_text_golden.json"


def test_spec_basics():
    html = (
        b"<html><head><title>T</title><script>var x='NO';</script>"
        b"<style>p{}</style></head><body><p>hola  \n mundo</p>"
        b"<div>a&amp;b &aacute;</div><noscript>NOPE</noscript></body></html>"
    )
    assert extract_text_bytes(html) == "T hola mundo a&b á"


def test_spec_edge_cases():
    assert extract_text_bytes(None) is None
    assert extract_text_bytes(b"") == ""
    assert extract_text_bytes(b"plain text only") == "plain text only"
    assert extract_text_bytes(b"<p>unclosed <b>tags") == "unclosed tags"
    # invalid utf-8 replaced deterministically
    assert extract_text_bytes(b"<p>a\xff b</p>") == "a� b"


def test_udf_matches_python(spark, small_corpus):
    pages, _, _ = small_corpus
    df = spark.createDataFrame(pages[:50], schema=PAGES_SCHEMA)
    rows = df.select("url", extract_text("html").alias("t")).collect()
    expected = {p["url"]: extract_text_bytes(p["html"]) for p in pages[:50]}
    for r in rows:
        assert r["t"] == expected[r["url"]], r["url"]


def test_partitioning_invariance(spark, small_corpus):
    """Same bytes per url regardless of partition layout (the invariant)."""
    pages, _, _ = small_corpus
    df1 = spark.createDataFrame(pages[:80], schema=PAGES_SCHEMA).repartition(1)
    df7 = spark.createDataFrame(pages[:80], schema=PAGES_SCHEMA).repartition(7)
    t1 = dict(df1.select("url", extract_text("html")).collect())
    t7 = dict(df7.select("url", extract_text("html")).collect())
    assert t1 == t7


def test_golden_file(spark, small_corpus):
    """Committed golden pins the extractor spec across versions/envs."""
    pages, _, _ = small_corpus
    sample = pages[:10]
    actual = {p["url"]: extract_text_bytes(p["html"]) for p in sample}
    if not GOLDEN_PATH.exists():
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        GOLDEN_PATH.write_text(json.dumps(actual, indent=1, sort_keys=True))
    golden = json.loads(GOLDEN_PATH.read_text())
    assert actual == golden


def test_fast_path_matches_parser_oracle(small_corpus):
    """The regex fast path is byte-identical to the stdlib-HTMLParser spec
    oracle on the corpus AND on adversarial markup (unterminated blocks,
    quoted '>' attributes, entity-encoded tags, broken utf-8)."""
    from ocds_entity_extract_spark.functions.html import extract_text_bytes_parser

    pages, _, _ = small_corpus
    for p in pages:
        assert extract_text_bytes(p["html"]) == extract_text_bytes_parser(p["html"]), p["url"]

    adversarial = [
        None,
        b"",
        b"plain",
        b"<p>a</p",
        b"a < b <p>c</p>",
        b'<a title="x>y">t</a>',
        b'<script>var a="</script>";</script>rest',
        b"<!-- <script>x</script> -->ok",
        b"<script><!-- </script>ok2",
        b"&lt;p&gt; &amp;amp; &copy;",
        b"<SCRIPT>UP</SCRIPT>low",
        b"<style>s</style>text<template>t</template>end",
        b"<p>unterminated <script>xx",
        b"\xff\xfe broken utf8 <p>ok</p>",
        b"<!-- unterminated",
        b"x<!DOCTYPE html>y",
        b"<p>fin</p><",
        b"tail<",
    ]
    for c in adversarial:
        assert extract_text_bytes(c) == extract_text_bytes_parser(c), c
