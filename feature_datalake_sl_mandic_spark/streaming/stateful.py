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


# ------------------------------------------- clamped running balance (stream)

BALANCE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("balance_cents", T.LongType()),
        T.StructField("n_applied", T.LongType()),
    ]
)

BALANCE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("bal", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _update_balance(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    bal, n = state.get if state.exists else (0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    # deltas within a micro-batch apply in event-time order; order ACROSS
    # micro-batches is the source's ordering contract (see docstring)
    batch = batch.sort_values(["ts", "event_id"])
    for d in batch["delta_cents"].astype("int64"):
        bal = max(0, bal + int(d))
        n += 1
    state.update((int(bal), int(n)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "balance_cents": [int(bal)], "n_applied": [int(n)]}
    )


def clamped_balances(deltas: DataFrame) -> DataFrame:
    """Streaming twin of ``events_capped_running_balance``: the zero-clamped
    ledger b_t = max(0, b_{t-1} + delta_t) carried ACROSS micro-batches as
    per-user state — the op is non-decomposable (no window rewrite exists),
    so custom state is the only streaming form. Input: a stream of
    (user_id, ts, event_id, delta_cents). Emits each user's post-batch
    balance and applied-count per micro-batch in which the user appears;
    integer-cents state means stream == batch EXACTLY when micro-batches
    respect event-time order per user (file sources replaying time-ordered
    files satisfy this; see tests/test_stateful_streaming.py).

    Scale: state is two longs per user, sharded with the user_id shuffle;
    each micro-batch touches only the users present in it."""
    return deltas.groupBy("user_id").applyInPandasWithState(
        _update_balance,
        outputStructType=BALANCE_SCHEMA,
        stateStructType=BALANCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
