"""Multimodal binary plumbing: decode / features / frame fan-out / resize.

The decoders are stubs (no media libs in the container) but the Spark-side
contract — schemas, Arrow batch shapes, 1:1 vs 1:k row counts, binary
output path, determinism — is what these tests pin."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ocds_entity_extract_spark.operators.multimodal import (
    decode_binary_meta,
    extract_features,
    resize_payload,
    sample_frames,
)

PAYLOADS = [
    (1, b"x" * 1000),
    (2, b"abc"),                 # shorter than n_frames -> single frame
    (3, "texto con acentos áéí".encode("utf-8") * 40),
]


def _df(spark):
    return spark.createDataFrame(PAYLOADS, "doc_id long, payload binary")


def test_decode_meta(spark):
    rows = {r["doc_id"]: r for r in decode_binary_meta(_df(spark)).collect()}
    assert rows[1]["n_bytes"] == 1000
    assert rows[1]["content_sha"] == hashlib.sha256(b"x" * 1000).hexdigest()
    assert 16 <= rows[1]["fake_width"] < 80


def test_extract_features_matches_sha(spark):
    rows = {r["doc_id"]: r["features"] for r in extract_features(_df(spark), dim=8).collect()}
    want = [b / 255.0 for b in hashlib.sha256(b"abc").digest()[:8]]
    assert rows[2] == want
    assert len(rows[1]) == 8 and all(0.0 <= v <= 1.0 for v in rows[1])


def test_sample_frames_fanout(spark):
    rows = sample_frames(_df(spark), n_frames=4, frame_bytes=256).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4          # 1 row -> 4 frames
    assert len(by_doc[2]) == 1          # short payload -> 1 frame
    f0 = sorted(by_doc[1], key=lambda r: r["frame_idx"])[1]
    assert f0["offset_bytes"] == 250
    assert f0["frame_sha"] == hashlib.sha256((b"x" * 1000)[250:506]).hexdigest()


def test_resize_payload_size_and_determinism(spark):
    a = {r["doc_id"]: bytes(r["payload"]) for r in resize_payload(_df(spark), 16, 16).collect()}
    b = {r["doc_id"]: bytes(r["payload"]) for r in resize_payload(_df(spark), 16, 16).collect()}
    assert a == b
    assert all(len(p) == 256 for p in a.values())
    assert a[1] != a[2]
