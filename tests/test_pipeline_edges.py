"""Pipeline edge probes: null/empty html, empty input, pre-extracted text.

These are the degenerate inputs a 10^12-page crawl WILL contain; the
pipeline must produce empty-but-well-formed results, never throw."""

from __future__ import annotations

import datetime as dt

from ocds_entity_extract_spark.plans.pipeline import build_triples
from ocds_entity_extract_spark.schemas import PAGES_SCHEMA

TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _pages(spark, rows):
    return spark.createDataFrame(rows, schema=PAGES_SCHEMA)


def test_null_and_empty_html(spark):
    rows = [
        {"url": "https://a.example.mx/1", "warc_ts": TS, "html": None,
         "text": None, "lang": "es"},
        {"url": "https://a.example.mx/2", "warc_ts": TS, "html": b"",
         "text": None, "lang": "es"},
        {"url": "https://a.example.mx/3", "warc_ts": TS,
         "html": "<p>hoy Grupo Aurora S.A. de C.V. firmó.</p>".encode(),
         "text": None, "lang": "es"},
    ]
    res = build_triples(spark, _pages(spark, rows))
    triples = res.triples.collect()
    # only page 3 contributes; null/empty html pages vanish silently
    assert {t["subj"] for t in triples if t["pred"] == "mentions"} == {
        "https://a.example.mx/3"
    }
    assert all(t["obj"] for t in triples)


def test_empty_pages_table(spark):
    res = build_triples(spark, _pages(spark, []))
    assert res.triples.count() == 0
    assert res.entities.count() == 0


def test_pre_extracted_text_skips_parse(spark):
    # schema allows precomputed text; html=None must still work because
    # with_extracted_text coalesces (incremental re-run path)
    rows = [
        {"url": "https://a.example.mx/9", "warc_ts": TS, "html": None,
         "text": "hoy Constructora Delta S.A. de C.V. presentó resultados.",
         "lang": "es"},
    ]
    res = build_triples(spark, _pages(spark, rows))
    objs = {t["obj"] for t in res.triples.filter("pred = 'type'").collect()}
    assert "company" in objs
