"""Property tests for the two skew-resilient event plans (round-10 verdict
ask #3): their correctness rests on coupled-constant invariants that a
single fixture cannot pin —

- ``events_sessionize_chunked`` must equal ``events_sessionize`` for ANY
  chunk width >= the session gap (the merge pass's completeness argument:
  across a chunk boundary min_ts(next) - max_ts(prev) IS the event gap,
  sessions spanning many chunks merge transitively through adjacent pairs);
- ``_bucketed_attribution`` must equal the plain un-bucketed interval join
  for ANY (interval, bucket) pair, because the probe count is DERIVED
  (n_back = ceil(interval / bucket)) rather than hard-coded.

Randomized timelines cover the documented edge cases: null timestamps,
duplicate timestamps (event_id tie-break), events exactly ON chunk/bucket
boundaries, bursts chaining sessions across >2 chunks, and isolated events.
Values are multiples of 0.25 (binary-exact) so float summation order can
never make the two plans' round(sum, 2) differ.
"""

from __future__ import annotations

import datetime
import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_datalake_sl_mandic_spark.operators import events as events_mod

GAP_US = events_mod.SESSION_GAP_MIN * 60 * 1_000_000
HOUR_US = 3600 * 1_000_000
BASE = datetime.datetime(2024, 3, 1)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        # the session runs UTC and catalog.load_table normalizes ts to
        # TIMESTAMP, so synthetic frames use TIMESTAMP directly
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _random_events(seed: int, n: int = 300, chunk_us: int = HOUR_US):
    """Adversarial timeline: bursts (in-gap chains spanning many chunks),
    exact-boundary timestamps, duplicate timestamps, null ts/value."""
    rng = random.Random(seed)
    rows = []
    last_us = {u: rng.randrange(0, 4 * 24 * HOUR_US) for u in range(5)}
    for i in range(n):
        u = rng.randrange(5)
        r = rng.random()
        if r < 0.04:
            ts = None  # null timestamp: sorts first, merges per lag rule
        else:
            if r < 0.45:
                # in-gap step: chains a session across chunk boundaries
                step = rng.randrange(0, GAP_US)
            elif r < 0.65:
                # near-gap step: exercises the > gap_us strict comparison
                step = GAP_US + rng.randrange(-2, 3)
            elif r < 0.8:
                step = rng.randrange(GAP_US, 8 * HOUR_US)  # session break
            else:
                step = 0  # duplicate timestamp -> event_id tie-break
            last_us[u] += step
            us = last_us[u]
            if rng.random() < 0.1:
                us = (us // chunk_us) * chunk_us  # exactly ON a boundary
                last_us[u] = us
            ts = BASE + datetime.timedelta(microseconds=us)
        etype = rng.choice(["click", "purchase", "view"])
        value = None if rng.random() < 0.05 else rng.randrange(0, 400) * 0.25
        rows.append((i, ts, u, etype, value, "{}"))
    return rows


def _write_lake(spark, tmp_path, rows) -> str:
    spark.createDataFrame(rows, SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.parametrize("chunk_hours", [0.5, 1, 7])  # 0.5 h == the gap
@pytest.mark.parametrize("seed", [7, 23])
def test_chunked_sessionize_equals_single_window(
    spark, tmp_path, monkeypatch, seed, chunk_hours
):
    assert chunk_hours * 3600 >= events_mod.SESSION_GAP_MIN * 60
    chunk_us = int(chunk_hours * 3600 * 1_000_000)
    sf = _write_lake(spark, tmp_path, _random_events(seed, chunk_us=chunk_us))
    monkeypatch.setattr(events_mod, "SESSION_CHUNK_HOURS", chunk_hours)
    want = events_mod.events_sessionize(spark, sf).collect()
    got = events_mod.events_sessionize_chunked(spark, sf).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def _plain_attribution(ev, interval_us: int):
    """The un-bucketed reference: user-keyed interval join, identical
    predicates and projection to _bucketed_attribution."""
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        "value",
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (
                F.unix_micros("click_ts")
                >= F.unix_micros("purchase_ts") - F.lit(interval_us)
            ),
        )
        .select(
            "user_id",
            "purchase_id",
            "click_id",
            F.unix_micros("click_ts").alias("click_us"),
            F.unix_micros("purchase_ts").alias("purchase_us"),
            F.round("value", 2).alias("value"),
        )
        .orderBy("purchase_id", "click_id")
    )


@pytest.mark.parametrize(
    "interval_us,bucket_us",
    [
        (HOUR_US, HOUR_US),  # the registered setting: n_back = 1
        (HOUR_US, HOUR_US // 2),  # narrower buckets: n_back = 2
        (3 * HOUR_US // 2, HOUR_US),  # non-divisible: ceil(1.5) = 2
        (HOUR_US, 2 * HOUR_US),  # bucket wider than interval: n_back = 1
    ],
)
@pytest.mark.parametrize("seed", [11, 42])
def test_bucketed_attribution_equals_plain_interval_join(
    spark, seed, interval_us, bucket_us
):
    ev = spark.createDataFrame(
        _random_events(seed, n=400, chunk_us=bucket_us), SCHEMA
    )
    want = _plain_attribution(ev, interval_us).collect()
    got = events_mod._bucketed_attribution(ev, interval_us, bucket_us).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) > 0, "vacuous fixture: no attributed pairs generated"


def test_attribution_interval_boundaries_exact(spark):
    """Deterministic boundary pin: a click exactly one interval before the
    purchase is IN (>=), one microsecond earlier is OUT, a click at the
    purchase instant is IN (<=), a click after is OUT — across a bucket
    boundary, so a dropped probe bucket would lose the in-window rows."""
    interval, bucket = HOUR_US, HOUR_US
    pt = BASE + datetime.timedelta(microseconds=7 * HOUR_US + 1)  # just past a boundary
    mk = lambda i, off_us, et: (  # noqa: E731
        i,
        pt + datetime.timedelta(microseconds=off_us),
        1,
        et,
        1.0,
        "{}",
    )
    rows = [
        mk(0, 0, "purchase"),
        mk(1, 0, "click"),  # at the purchase instant: IN
        mk(2, -interval, "click"),  # exactly interval before (prev bucket): IN
        mk(3, -interval - 1, "click"),  # one microsecond too early: OUT
        mk(4, 1, "click"),  # after the purchase: OUT
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = events_mod._bucketed_attribution(ev, interval, bucket).collect()
    assert sorted(r.click_id for r in got) == [1, 2]


def test_chunk_width_invariant_is_asserted():
    """The module-load assert fires on a too-narrow chunk (ask #3a)."""
    src = open(events_mod.__file__).read()
    assert "SESSION_CHUNK_HOURS * 3600 >= SESSION_GAP_MIN * 60" in src
