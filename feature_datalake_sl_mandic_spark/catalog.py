"""Catalog: load the lake tables as DataFrames / temp views.

Mirrors the reference's schema-on-read model (JDBC metadata inference,
``Sites/DataProc_Script/spark_ingest_slmandicprd.py:63-65``) for an offline
Parquet lake: ``spark.read.parquet`` infers StructType from footers; no
central schema registry. Special-cases ``events.ts`` which is physical
parquet TIMESTAMP(NANOS) — unsupported by Spark's reader — by reading it as
Long nanos (``spark.sql.legacy.parquet.nanosAsLong``) and truncating to
microsecond TIMESTAMP (identical to DuckDB's CAST(ts_ns AS TIMESTAMP)).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.session import apply_runtime_confs

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _read_events(spark: SparkSession, path: str) -> DataFrame:
    """Read events.parquet normalizing ``ts`` to session-TZ TIMESTAMP.

    The fixture has carried two physical types across driver generations:
    parquet TIMESTAMP(NANOS) (unreadable directly — nanosAsLong conf reads it
    as Long nanos, truncated here to microsecond TIMESTAMP) and plain
    TIMESTAMP(MICROS) with isAdjustedToUTC=false (Spark 4 infers
    TIMESTAMP_NTZ). Event-time operators use instant semantics
    (``unix_micros``, watermarks), so both forms are normalized to TIMESTAMP
    (LTZ); the session is pinned to UTC (session.py) so the wall-clock values
    are identical to DuckDB's naive reading of the same file. All conversion
    stays JVM-side and scales to any size. Fallback (conf rejected by an
    externally-created session): PyArrow cast to us then createDataFrame —
    acceptable only for the small test fixtures, flagged loudly.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    try:
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    except Exception:
        # Last resort (conf static/rejected): driver-side Arrow read with
        # explicit ns->us truncation. Fine for test fixtures only; the scale
        # path is the conf branch above.
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.dataset as ds

        tbl = ds.dataset(path, format="parquet").to_table()
        cols = {
            f.name: (
                pc.cast(
                    tbl[f.name],
                    pa.timestamp("us"),
                    options=pc.CastOptions(
                        target_type=pa.timestamp("us"), allow_time_truncate=True
                    ),
                )
                if f.name == "ts"
                else tbl[f.name]
            )
            for f in tbl.schema
        }
        return spark.createDataFrame(pa.table(cols).to_pandas())


# DataFrame handle cache: spark.read.parquet re-reads footers for schema
# inference on EVERY call, which costs 10-50 ms per table per query build —
# q5 touches 6 tables, so plan construction alone was ~0.9 s. The logical
# plan (an unresolved relation + schema) is immutable and reusable across
# queries, so cache it per (session, dir, table). Bounded: |tables| × |dirs|.
_DF_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def _session_key(spark: SparkSession) -> str:
    """Stable identity for a live session. id(spark) is unsafe here —
    CPython reuses addresses after GC, so a new session could collide with
    a dead one's cached (invalid) DataFrames."""
    try:
        return spark.sparkContext.applicationId
    except Exception:  # context already stopped mid-teardown
        return f"dead-{id(spark)}"


def _clean_event_values(df: DataFrame) -> DataFrame:
    """Non-finite ``value`` -> NULL at the load boundary (round-7 audit).

    A NaN/Inf-poisoned events lake crashed 17 of the 41 value-consuming
    queries (ANSI CAST_OVERFLOW on NaN->decimal, DuckDB STDDEV
    out-of-range) and silently DIVERGED four more between engines
    (Theil-Sen slopes, MAD outlier sets, PSI bucket counts — Spark and
    DuckDB disagree on NaN bucketing/quantiles). NULLing the corrupt
    measurement keeps the event itself (counts, sessions, funnels are
    value-independent facts) while every aggregate skips it — and NULL
    semantics are exactly what the null-injection suite already hardened
    and oracle-verified for every one of these queries. The DuckDB side
    of the poisoned-lake parity test applies the identical normalization
    to its view (tests/test_degenerate_events.py); on a healthy lake the
    projection is an identity.

    Scale trade-off, measured: a predicate on the derived ``value`` can no
    longer push to the parquet scan (Catalyst won't push through the
    CASE). Audited across all registered plans: the only value predicates
    ever pushed were two ``IsNotNull(value)`` filters — which MUST now
    evaluate post-normalization anyway (a NaN row is not null at the scan
    but must be treated as null) — and no query carries a static
    comparative value predicate, so nothing loses row-group skipping."""
    if "value" not in df.columns:
        return df
    v = F.col("value")
    cleaned = F.when(
        F.isnan(v) | (F.abs(v) == F.lit(float("inf"))), F.lit(None)
    ).otherwise(v)
    return df.withColumn("value", cleaned)


_CONFS_MARKER = "spark.feature_datalake.runtimeConfsApplied"

# Fallback once-per-wrapper memo for sessions whose conf surface REJECTS
# reads (the except branch below). Without it, a conf-get that keeps
# raising would re-apply RUNTIME_CONFS on every load_table call, silently
# clobbering deliberate caller overrides — the exact guarantee the marker
# conf exists to provide. WeakSet: holds no session alive, and a reused
# id() after GC cannot false-hit because membership is by live reference.
_CONFS_APPLIED_FALLBACK: "weakref.WeakSet" = weakref.WeakSet()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # every query loads through here, so this is the one place that can
    # guarantee RUNTIME_CONFS on an externally-created (bare driver)
    # session too — load_tables() alone only covers callers of the plural
    # form. NOTE: this means load_table applies session-level runtime confs
    # as a side effect, once per session. Tracked by a marker conf ON the
    # session itself (one py4j read) rather than any Python-side key:
    # RUNTIME_CONFS live in per-session SQLConf, and spark.newSession()
    # siblings share one applicationId while each starting from default
    # confs — an appId key would silently skip every sibling, and a
    # wrapper-id key can false-hit after id reuse. If the conf surface
    # itself raises, fall back to a per-wrapper WeakSet so the apply still
    # happens at most once per session wrapper.
    # The fallback memo is consulted on the happy path too: a session whose
    # conf GET works but whose conf SET fails (swallowed below) would
    # otherwise re-apply RUNTIME_CONFS on every call — the exact clobbering
    # the memo exists to prevent. WeakSet membership of an un-weakref-able
    # wrapper returns False (no raise), so no guard is needed here.
    try:
        applied = spark.conf.get(_CONFS_MARKER, "0") == "1"
    except Exception:
        applied = False
    applied = applied or spark in _CONFS_APPLIED_FALLBACK
    if not applied:
        apply_runtime_confs(spark)
        try:
            spark.conf.set(_CONFS_MARKER, "1")
        except Exception:
            pass
        try:
            _CONFS_APPLIED_FALLBACK.add(spark)
        except TypeError:
            pass  # un-weakref-able wrapper: degrade to the pre-memo behavior
    key = (_session_key(spark), sf_dir, name)
    df = _DF_CACHE.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if name == "events":
            df = _clean_event_values(_read_events(spark, path))
        else:
            df = spark.read.parquet(path)
        _DF_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register: bool = True,
    names: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Load lake tables; optionally register each as a temp view.

    Registration gives the SQL surface (``spark.sql``) the same catalog the
    DataFrame surface sees — the engine's equivalent of the reference's
    BigQuery dataset-of-tables. (RUNTIME_CONFS are applied by load_table
    below, once per session — no unconditional re-apply here, so a caller
    that deliberately overrides a conf between calls keeps its override.)"""
    out: dict[str, DataFrame] = {}
    for name in names or TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
