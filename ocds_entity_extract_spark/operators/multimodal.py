"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with struct metadata. Four
operators cover the training-data surface:

- `decode_binary_meta`  — payload -> typed metadata (mapInPandas, 1:1)
- `extract_features`    — payload -> fixed-dim float vector (mapInPandas,
  1:1; the fake featurizer is sha256-byte-derived so a DuckDB oracle can
  mirror it exactly)
- `sample_frames`       — payload -> k frame rows (mapInPandas FAN-OUT,
  1:k — the UDTF-shaped operator: video frame sampling)
- `resize_payload`      — payload -> payload' + target dims (mapInPandas,
  1:1 binary-to-binary transform)

The media decode itself is STUBBED (no image/audio libs in this container
— deterministic fakes clearly marked below); the Spark-side plumbing —
schema, Arrow batch shape, mapInPandas signatures, fan-out row counts,
partition sizing — is real and tested.

At scale: binary columns dominate row size, so `spark.sql.files.
maxPartitionBytes` governs batch memory; mapInPandas streams Arrow batches
so a partition never fully materializes in Python.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_META_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_sha", StringType(), False),
        StructField("fake_width", LongType(), True),
        StructField("fake_height", LongType(), True),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB decoder. A real deployment replaces this with PIL/libav frame
    decode; the container has no media libs, so dimensions are derived
    deterministically from the content hash (clearly fake, stable)."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64


def decode_binary_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas over (id, binary payload) -> decoded metadata rows.

    One output row per input row; the iterator signature keeps Arrow
    batches streaming (constant memory per partition).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_sha": payloads.map(
                        lambda p: hashlib.sha256(bytes(p)).hexdigest()
                    ),
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return df.mapInPandas(run, DECODED_META_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("features", ArrayType(DoubleType(), False), False),
    ]
)


def extract_features(
    df: DataFrame, dim: int = 8, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas featurizer: payload -> dim-dimensional double vector.

    STUB model: feature i = byte i of sha256(payload) / 255.0 — a real
    deployment swaps in an image/audio embedding model here. Chosen so a
    SQL oracle can reproduce it exactly (sha256 + hex-byte arithmetic),
    keeping even the mapInPandas path under the value-hash gate.
    """
    assert dim <= 32, "sha256 supplies 32 bytes"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [b / 255.0 for b in hashlib.sha256(bytes(p)).digest()[:dim]]
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64"), "features": feats}
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("offset_bytes", LongType(), False),
        StructField("frame_sha", StringType(), False),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    frame_bytes: int = 256,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas FAN-OUT: one payload row -> up to n_frames frame rows.

    The UDTF-shaped operator (video frame sampling): frame k is the
    `frame_bytes` slice at offset k*len//n_frames — a real deployment
    replaces the slice+sha with an actual frame decode. Payloads shorter
    than n_frames bytes yield one frame at offset 0.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_off, out_sha = [], [], [], []
            for did, p in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(p)
                k = n_frames if len(raw) >= n_frames else 1
                for i in range(k):
                    off = i * len(raw) // k
                    frame = raw[off:off + frame_bytes]
                    out_id.append(int(did))
                    out_idx.append(i)
                    out_off.append(off)
                    out_sha.append(hashlib.sha256(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "offset_bytes": pd.Series(out_off, dtype="int64"),
                    "frame_sha": pd.Series(out_sha, dtype="object"),
                }
            )

    return df.mapInPandas(run, FRAMES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_width", LongType(), False),
        StructField("out_height", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def resize_payload(
    df: DataFrame,
    out_width: int = 16,
    out_height: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """mapInPandas binary-to-binary transform: payload -> resized payload.

    STUB resize: output = the first out_width*out_height bytes of an
    infinite sha256 keystream of the payload (deterministic, size-exact) —
    a real deployment swaps in PIL `Image.resize`. Exercises the
    binary-out Arrow path (the one that carries real pixel buffers).

    The keystream iterates over ASCII hex digests (block_{i+1} =
    sha256(hex(block_i))) rather than raw digests so a SQL oracle whose
    sha256 only accepts VARCHAR can reproduce the bytes exactly.
    """
    n_out = out_width * out_height

    def fake_pixels(raw: bytes) -> bytes:
        out = bytearray()
        block_hex = hashlib.sha256(raw).hexdigest()
        while len(out) < n_out:
            out.extend(bytes.fromhex(block_hex))
            block_hex = hashlib.sha256(block_hex.encode()).hexdigest()
        return bytes(out[:n_out])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "out_width": out_width,
                    "out_height": out_height,
                    "payload": pdf[payload_col].map(lambda p: fake_pixels(bytes(p))),
                }
            )

    return df.mapInPandas(run, RESIZED_SCHEMA)
