"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in operators can't
express (BASELINE.json's "custom stateful operators" line): arbitrary
per-key state carried across micro-batches, Arrow-batched on the Python
side. Here: a running per-user profile (lifetime event count / total value /
last seen) that emits an updated row per user per micro-batch — the shape of
an online feature store updater.

State is partitioned by user_id: at 100 TB of events the state store shards
across executors with the shuffle, and each micro-batch touches only the
keys present in that batch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("lifetime_events", T.LongType()),
        T.StructField("lifetime_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "lifetime_events": [n],
            "lifetime_value": [round(total, 2)],
            "last_seen_us": [last_us],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Streaming running per-user profile; one updated row per user per
    micro-batch in which that user appears."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=PROFILE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
