"""Degenerate-VALUE robustness: every registered query must execute against
a lake of pathological but schema-valid values without raising.

Completes the edge-input triad (test_empty_inputs.py: empty tables;
test_null_inputs.py: ~10% NULLs; here: degenerate values). This class found
25 real ANSI divide-by-zero crashes in round 6 — zero-variance strata
(Neyman/Welch/ANOVA), zero-norm embedding vectors (the whole cosine family),
all-zero value series (seasonal indexes), single-day series (OLS trend,
KS split), empty conversion cohorts, and a DF-cap that empties every
shingle set (LSH recall scorecard).

The lake: constant/empty text, one language, zero/constant embedding
vectors, one event type on one timestamp with value 0, one order
status/priority with constant prices, constant lineitem measures. Queries
run via collect() — NOT count(): Catalyst prunes unused columns under
count(), which hid two of the crashes above.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark import catalog, registry
from tests.conftest import SF_SMALL

SPECS = registry.load_all()


def _degrade(t: str, df):
    c = F.col
    if t == "documents":
        text = (
            F.when(c("doc_id") % 5 == 0, F.lit(""))
            .when(c("doc_id") % 5 == 1, F.lit("x"))
            .otherwise(F.lit("the same constant sentence repeated here"))
        )
        return df.select(
            "doc_id",
            text.alias("text"),
            F.lit("en").alias("lang"),
            c("source"),
            F.length(text).cast("bigint").alias("n_chars"),
        )
    if t == "embeddings":
        z = F.array(*[F.lit(0.0).cast("float")] * 64)
        o = F.array(*[F.lit(1.0).cast("float")] * 64)
        return df.select(
            "vec_id",
            F.when(c("vec_id") % 3 == 0, z).otherwise(o).alias("embedding"),
            F.lit(0).cast("int").alias("label"),
        )
    if t == "events":
        return df.select(
            "event_id",
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
            F.lit(1).cast("bigint").alias("user_id"),
            F.lit("click").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit('{"k": 0}').alias("props"),
        )
    if t == "orders":
        dtypes = dict(df.dtypes)
        return df.select(
            "o_orderkey",
            "o_custkey",
            F.lit("O").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit("1995-01-01").cast(dtypes["o_orderdate"]).alias("o_orderdate"),
            F.lit("1-URGENT").alias("o_orderpriority"),
        )
    if t == "lineitem":
        dtypes = dict(df.dtypes)
        m = {x: F.col(x) for x in df.columns}
        for col, v in [("l_quantity", 1.0), ("l_extendedprice", 100.0),
                       ("l_discount", 0.0), ("l_tax", 0.0)]:
            if col in m:
                m[col] = F.lit(v).cast(dtypes[col]).alias(col)
        for col, v in [("l_returnflag", "N"), ("l_linestatus", "O"),
                       ("l_shipmode", "AIR")]:
            if col in m:
                m[col] = F.lit(v).alias(col)
        return df.select(*[m[x] for x in df.columns])
    if t == "customer":
        dtypes = dict(df.dtypes)
        m = {x: F.col(x) for x in df.columns}
        if "c_mktsegment" in m:
            m["c_mktsegment"] = F.lit("BUILDING").alias("c_mktsegment")
        if "c_acctbal" in m:
            m["c_acctbal"] = (
                F.lit(0.0).cast(dtypes["c_acctbal"]).alias("c_acctbal")
            )
        return df.select(*[m[x] for x in df.columns])
    return df


@pytest.fixture(scope="session")
def degenerate_lake_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("degen_lake"))
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = catalog.load_table(spark, SF_SMALL, t)
        _degrade(t, df).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_survives_degenerate_values(name, spark, degenerate_lake_dir):
    rows = SPECS[name].fn(spark, degenerate_lake_dir).collect()
    assert len(rows) >= 0


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_DEGEN_ORACLE") != "1",
    reason="full oracle comparison over the degenerate lake takes ~10 min; "
    "set SPARK_GRAFT_DEGEN_ORACLE=1 (run at least once per round — it found "
    "three SILENT divergences execution-only checks cannot: the argmax "
    "tie-break, a NULL-vs-'' empty-result split, a NULL-boolean z-test)",
)
@pytest.mark.parametrize(
    "name", sorted(n for n, s in SPECS.items() if s.oracle is not None)
)
def test_degenerate_lake_matches_oracle(name, spark, degenerate_lake_dir):
    import duckdb

    from feature_datalake_sl_mandic_spark.oracle import compare

    spec = SPECS[name]
    spdf = spec.fn(spark, degenerate_lake_dir).toPandas()
    con = duckdb.connect()
    for t in catalog.TABLE_NAMES:
        p = os.path.join(degenerate_lake_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, name) if "WARNING" not in e]
    assert not errs, "\n".join(errs)


@pytest.fixture(scope="session")
def single_row_lake_dir(spark, tmp_path_factory):
    """Every table cut to exactly ONE row — the n=1 regime where sample
    variances are NULL, population variances are 0, and x-spreads vanish
    (found embedding_outliers_mahalanobis dividing by a zero per-dimension
    variance; any constant/padded dimension triggers the same at full size)."""
    out = str(tmp_path_factory.mktemp("onerow_lake"))
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        catalog.load_table(spark, SF_SMALL, t).limit(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_survives_single_row_lake(name, spark, single_row_lake_dir):
    rows = SPECS[name].fn(spark, single_row_lake_dir).collect()
    assert len(rows) >= 0


def test_nonfinite_money_is_quarantined_identically(spark, tmp_path):
    """Non-finite MONEY (a NaN/Inf o_totalprice): money columns are
    DECIMAL-sourced in the reference's data model (S9 type mapping — a
    relational source cannot emit NaN), so the engine's enforcement point
    is the INGEST EXPECTATION, not read-time normalization: the existing
    price_range rule (0 < price <= cap) fails every non-finite value under
    BOTH engines' NaN total orders (NaN fails <= cap; +Inf fails the cap;
    -Inf fails > 0), so corrupt money lands in quarantine with the rule
    named — pinned here on a poisoned lake with the driver's own DuckDB
    comparison."""
    import duckdb

    from feature_datalake_sl_mandic_spark.oracle import compare
    from pyspark.sql import functions as F

    out = str(tmp_path / "nanmoney")
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = catalog.load_table(spark, SF_SMALL, t)
        if t == "orders":
            df = df.withColumn(
                "o_totalprice",
                F.when(F.col("o_orderkey") % 83 == 0, F.lit(float("nan")))
                .when(F.col("o_orderkey") % 83 == 1, F.lit(float("inf")))
                .when(F.col("o_orderkey") % 83 == 2, F.lit(float("-inf")))
                .otherwise(F.col("o_totalprice")),
            )
        df.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))

    spec = SPECS["validate_quarantine_orders"]
    spdf = spec.fn(spark, out).toPandas()
    # every poisoned key is quarantined and price_range is among its reasons
    poisoned = spdf[spdf.o_orderkey % 83 <= 2]
    assert len(poisoned) > 0
    assert poisoned.failed_rules.str.contains("price_range").all()
    con = duckdb.connect()
    for t in catalog.TABLE_NAMES:
        p = os.path.join(out, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
            )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, "validate_quarantine_orders") if "WARNING" not in e]
    assert not errs, "\n".join(errs)
