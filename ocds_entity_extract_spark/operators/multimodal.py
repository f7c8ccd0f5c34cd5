"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with struct metadata. The
decode/feature-extract step is STUBBED (no image/audio libs in this
container — deterministic fake decoder clearly marked below); the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
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
