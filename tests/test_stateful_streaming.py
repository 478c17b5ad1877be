"""applyInPandasWithState: state must survive across micro-batches and the
final per-user profile must equal the batch aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.streaming import jobs
from feature_datalake_sl_mandic_spark.streaming.stateful import user_profiles
from tests.conftest import SF_SMALL


def test_user_profiles_match_batch(spark, tmp_path):
    from feature_datalake_sl_mandic_spark.catalog import load_table

    # split events into 3 files so availableNow + maxFilesPerTrigger=1 runs
    # multiple micro-batches -> state actually carries over
    src = load_table(spark, SF_SMALL, "events")
    events_dir = str(tmp_path / "events")
    src.repartition(3).write.mode("overwrite").parquet(events_dir)

    stream = jobs.read_events_stream(spark, events_dir, max_files_per_trigger=1)
    rows = jobs.run_available_now(
        user_profiles(stream), str(tmp_path / "ckpt"), output_mode="update"
    )
    # keep the LAST emission per user (update mode emits one row per batch
    # in which the user appears; lifetime counts only grow)
    final: dict[int, tuple] = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["lifetime_events"] >= cur[0]:
            final[r["user_id"]] = (
                r["lifetime_events"],
                r["lifetime_value"],
                r["last_seen_us"],
            )

    batch = (
        spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
            F.unix_micros(F.max("ts")).alias("last_us"),
        )
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["v"], r["last_us"]) for r in batch}
    assert set(final) == set(want)
    for uid, (n, v, last) in want.items():
        gn, gv, glast = final[uid]
        assert gn == n, uid
        assert abs(gv - v) < 0.02, uid
        assert glast == last, uid


def test_transform_with_state_api_present_but_env_blocked():
    """Spark 4's transformWithStateInPandas is the successor stateful API to
    applyInPandasWithState. The API imports and plans fine here, but its
    driver worker needs google.protobuf, which this container lacks (no
    package installs) — probed end-to-end: the query crashes with
    ImportError('cannot import name descriptor from google.protobuf').
    applyInPandasWithState (tested above) is the supported stateful path in
    this environment; swap-in is mechanical when protobuf is available."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: F401

    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False
    if not has_protobuf:
        import pytest

        pytest.skip("transformWithState needs google.protobuf (not installed here)")


def test_clamped_balance_stream_equals_batch(spark, tmp_path):
    """The zero-clamped ledger is order-sensitive and non-decomposable: the
    streaming form must equal the batch kernel exactly (integer cents) when
    micro-batches replay in event-time order."""
    from feature_datalake_sl_mandic_spark.catalog import load_table
    from feature_datalake_sl_mandic_spark.operators.events import (
        BALANCE_USER_CAP,
        events_capped_running_balance,
    )
    from feature_datalake_sl_mandic_spark.streaming.stateful import clamped_balances

    ev = load_table(spark, SF_SMALL, "events")
    deltas = ev.where(
        F.col("event_type").isin("purchase", "error")
        & (F.col("user_id") < BALANCE_USER_CAP)
    ).select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.round(F.col("value") * 100).cast("bigint"),
        )
        .otherwise(-F.round(F.col("value") * 100).cast("bigint"))
        .alias("delta_cents"),
    )
    # two TIME-ordered files -> two micro-batches in event-time order
    # (file-stream sources process files by modification time; the second
    # file is written after the first)
    mid = deltas.agg(F.expr("percentile(unix_micros(ts), 0.5)")).first()[0]
    src_dir = tmp_path / "deltas"
    deltas.where(F.unix_micros("ts") <= mid).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src_dir / "b0"))
    deltas.where(F.unix_micros("ts") > mid).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src_dir / "b1"))

    stream = (
        spark.readStream.schema(deltas.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    rows = jobs.run_available_now(
        clamped_balances(stream), str(tmp_path / "ckpt"), output_mode="update"
    )
    final: dict[int, tuple] = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_applied"] >= cur[1]:
            final[r["user_id"]] = (r["balance_cents"], r["n_applied"])

    batch_rows = events_capped_running_balance(spark, SF_SMALL).collect()
    want: dict[int, tuple] = {}
    counts: dict[int, int] = {}
    for r in batch_rows:
        counts[r["user_id"]] = counts.get(r["user_id"], 0) + 1
        want[r["user_id"]] = (int(round(r["balance"] * 100)), r["rn"])
    assert set(final) == set(want)
    for uid, (bal, rn) in want.items():
        gbal, gn = final[uid]
        assert gn == counts[uid], uid
        assert gbal == bal, uid
