"""NaN/Inf-poisoned events lake: both-engine parity for every value consumer.

Round-7 escalation of the corrupt-input ladder to the OTHER float column:
``events.value``. The probe that motivated this suite planted NaN and ±Inf
values and found 17 of the 41 value-consuming queries CRASHING (ANSI
CAST_OVERFLOW on NaN→decimal cents, DuckDB STDDEV out-of-range) and four
more SILENTLY DIVERGING between engines (Theil-Sen slopes, MAD outlier
sets, PSI bucket counts) — with eleven others deterministically emitting
NaN into hash-checked output.

The contract (``catalog._clean_event_values``): non-finite ``value`` is a
corrupt MEASUREMENT, normalized to NULL at the load boundary — the event
row itself survives (counts, sessions, funnels are value-independent
facts), every aggregate skips the NULL identically on both engines, and
NULL-value semantics were already hardened and oracle-verified by the
null-injection suite. The DuckDB views here apply the identical
normalization, mirroring the engine's load boundary; queries that never
read ``value`` are unaffected by construction (the projection is an
identity on finite data).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark import catalog, registry
from feature_datalake_sl_mandic_spark.oracle import compare
from tests.conftest import SF_SMALL

SPECS = registry.load_all()

# Every registered query whose oracle touches events.value.
VALUE_CONSUMERS = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None and "events" in s.oracle and "value" in s.oracle
)

_CLEAN_VALUE_SQL = (
    "CASE WHEN isnan(value) OR isinf(value) THEN NULL ELSE value END AS value"
)


@pytest.fixture(scope="module")
def nan_events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("nan_events"))
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = catalog.load_table(spark, SF_SMALL, t)
        if t == "events":
            # plant poison AFTER the loader's normalization (the cached
            # relation is already cleaned), spread across event ids so
            # NaN and both infinities land in many users/days/types
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 97 == 0, F.lit(float("nan")))
                .when(F.col("event_id") % 97 == 1, F.lit(float("inf")))
                .when(F.col("event_id") % 97 == 2, F.lit(float("-inf")))
                .otherwise(F.col("value")),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("name", VALUE_CONSUMERS)
def test_nan_events_match_oracle(name, spark, nan_events_dir):
    """Each value consumer must run, emit only finite floats, and
    hash-match DuckDB over the identically-normalized view."""
    spec = SPECS[name]
    spdf = spec.fn(spark, nan_events_dir).toPandas()
    for col in spdf.columns:
        if spdf[col].dtype.kind == "f":
            assert np.isfinite(spdf[col].dropna()).all(), (name, col)
    con = duckdb.connect()
    for t in catalog.TABLE_NAMES:
        p = os.path.join(nan_events_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t == "events":
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE ({_CLEAN_VALUE_SQL}) "
                f"FROM read_parquet('{p}/*.parquet')"
            )
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, name) if "WARNING" not in e]
    assert not errs, "\n".join(errs)


def test_loader_nulls_non_finite_values(spark, nan_events_dir):
    """The load boundary itself: every event row survives, value is NULL
    exactly where the parquet had NaN/Inf."""
    raw = spark.read.parquet(os.path.join(nan_events_dir, "events.parquet"))
    cleaned = catalog.load_table(spark, nan_events_dir, "events")
    assert cleaned.count() == raw.count()
    poisoned = raw.where(
        F.isnan("value") | (F.abs("value") == F.lit(float("inf")))
    ).count()
    nulls = cleaned.where(F.col("value").isNull()).count()
    raw_nulls = raw.where(F.col("value").isNull()).count()
    assert poisoned > 0  # fixture actually exercises the boundary
    assert nulls == raw_nulls + poisoned
