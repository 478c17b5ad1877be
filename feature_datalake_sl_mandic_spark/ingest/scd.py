"""Slowly-changing-dimension Type 2 merge.

The reference pipeline is full-refresh only (every changed table is rewritten
whole — ``Sites/DataProc_Script/spark_ingest_slmandicprd.py:99-103``, mode
``overwrite``); a warehouse built on it loses history. This module adds the
standard SCD2 alternative: tracked attribute changes CLOSE the current row
(``valid_to`` = effective date, ``is_current`` = 0) and INSERT a new version,
so every key's full attribute history stays queryable with
``WHERE valid_from <= d AND d < valid_to``.

Scale shape: one shuffle on the dimension key for the update⋈current join;
the untouched-row branch is an anti-join on the same key (same partitioning,
AQE reuses the exchange). No windows over the whole dimension, no driver
loops — at 100 TB the dimension and the batch both stream through a hash
join. Change comparison is null-safe (``eqNullSafe`` / ``IS NOT DISTINCT
FROM``) so NULL→value and value→NULL transitions are versioned too.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register

HIGH_DATE = "9999-12-31"


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Apply one SCD2 batch. ``dim`` must carry ``valid_from``, ``valid_to``,
    ``is_current``; ``updates`` carries ``key`` + ``tracked`` only.

    Returns the post-merge dimension (all versions). Deterministic: pure
    function of its inputs, no timestamps read from the clock.
    """
    attr_cols = [c for c in dim.columns if c not in ("valid_from", "valid_to", "is_current")]
    current = dim.where(F.col("is_current") == 1)
    upd = updates.select(key, *tracked)

    def differs() -> Column:
        cond = F.lit(False)
        for c in tracked:
            cond = cond | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"upd.{c}"))
        return cond

    # ONE batch⋈current join feeds every derived branch (closed rows carry
    # the cur-side attributes, opened rows mix upd tracked + cur non-tracked
    # values) — at 100 TB the dimension shuffles once for this join and once
    # for the untouched anti-join on the same key (AQE reuses the exchange),
    # instead of once per branch. on=key (string) coalesces the key into one
    # unqualified output column; other columns stay alias-qualified.
    # O(batch)-sized: pin it so closed/opened/changed-keys branches read one
    # materialization instead of re-running the join (and the update source)
    # once per branch.
    matched = (
        upd.alias("upd")
        .join(current.alias("cur"), on=key, how="left")
        .localCheckpoint(eager=False)
    )
    is_new = F.col("cur.valid_from").isNull()
    is_changed = F.col("cur.valid_from").isNotNull() & differs()
    non_tracked = [c for c in attr_cols if c != key and c not in tracked]

    closed = matched.where(is_changed).select(
        F.col(key),
        *[F.col(f"cur.{c}").alias(c) for c in attr_cols if c != key],
        F.col("cur.valid_from").alias("valid_from"),
        F.lit(effective_date).cast("date").alias("valid_to"),
        F.lit(0).alias("is_current"),
    )
    # Opened versions: changed keys take updated tracked values and keep
    # their previous non-tracked attributes; brand-new keys get NULLs there.
    opened = matched.where(is_changed | is_new).select(
        F.col(key),
        *[F.col(f"cur.{c}").alias(c) for c in non_tracked],
        *[F.col(f"upd.{c}").alias(c) for c in tracked],
        F.lit(effective_date).cast("date").alias("valid_from"),
        F.lit(HIGH_DATE).cast("date").alias("valid_to"),
        F.lit(1).alias("is_current"),
    )
    # Untouched: everything except the current rows of changed keys.
    changed_keys = matched.where(is_changed).select(F.col(key))
    untouched = dim.join(
        changed_keys.withColumn("is_current", F.lit(1)),
        on=[key, "is_current"],
        how="anti",
    )
    return untouched.unionByName(closed.select(*untouched.columns)).unionByName(
        opened.select(*untouched.columns)
    )


# ---------------------------------------------------------------------------
# Registered query: SCD2 over the customer dimension with a deterministic
# synthetic batch (acctbal bump for custkey%10==3, no-op rows for %10==4,
# brand-new keys custkey+1000000 for %10==7) applied to the 2024-06-01 load.
# ---------------------------------------------------------------------------

_EFFECTIVE = "2024-06-01"
_INITIAL = "2023-01-01"


def _updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cu,) = _t(spark, sf_dir, "customer")
    bump = cu.where(F.col("c_custkey") % 10 == 3).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    noop = cu.where(F.col("c_custkey") % 10 == 4).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    # Halve via exact integer cents: x/2 lands exactly on .005 for odd cents,
    # where double-repr rounding diverges between engines. Integer math with
    # explicit half-away-from-zero is bit-identical everywhere.
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    half_cents = F.when(cents >= 0, F.floor((cents + 1) / 2)).otherwise(
        -F.floor((-cents + 1) / 2)
    )
    fresh = cu.where(F.col("c_custkey") % 10 == 7).select(
        (F.col("c_custkey") + 1_000_000).alias("c_custkey"),
        (half_cents / 100.0).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    return bump.unionByName(noop).unionByName(fresh)


@register(
    "scd2_customer_dim",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             DATE '{_INITIAL}' AS valid_from, DATE '{HIGH_DATE}' AS valid_to,
             1 AS is_current
      FROM customer
    ), upd AS (
      SELECT c_custkey, round(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 3
      UNION ALL
      SELECT c_custkey, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 4
      UNION ALL
      SELECT c_custkey + 1000000,
             (CASE WHEN cents >= 0 THEN CAST(floor((cents + 1) / 2.0) AS BIGINT)
                   ELSE -CAST(floor((-cents + 1) / 2.0) AS BIGINT) END) / 100.0,
             'NEWSEG'
        FROM (SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer) t WHERE c_custkey % 10 = 7
    ), changed AS (
      SELECT u.c_custkey
      FROM upd u JOIN dim d ON u.c_custkey = d.c_custkey AND d.is_current = 1
      WHERE u.c_acctbal IS DISTINCT FROM d.c_acctbal
         OR u.c_mktsegment IS DISTINCT FROM d.c_mktsegment
    ), untouched AS (
      SELECT * FROM dim
      WHERE NOT (is_current = 1 AND c_custkey IN (SELECT c_custkey FROM changed))
    ), closed AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
             valid_from, DATE '{_EFFECTIVE}' AS valid_to, 0 AS is_current
      FROM dim
      WHERE is_current = 1 AND c_custkey IN (SELECT c_custkey FROM changed)
    ), opened AS (
      SELECT u.c_custkey, d.c_name, d.c_nationkey, u.c_acctbal, u.c_mktsegment,
             DATE '{_EFFECTIVE}' AS valid_from, DATE '{HIGH_DATE}' AS valid_to,
             1 AS is_current
      FROM upd u
      LEFT JOIN (SELECT * FROM dim WHERE is_current = 1) d
        ON u.c_custkey = d.c_custkey
      WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
         OR d.c_custkey IS NULL
    ), merged AS (
      SELECT * FROM untouched
      UNION ALL SELECT * FROM closed
      UNION ALL SELECT * FROM opened
    )
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           CAST(valid_from AS VARCHAR) AS valid_from,
           CAST(valid_to AS VARCHAR) AS valid_to,
           CAST(is_current AS BIGINT) AS is_current
    FROM merged
    WHERE c_custkey % 10 IN (3, 4, 7)
    ORDER BY c_custkey, valid_from
    """,
    tags=("ingest", "scd2", "merge", "dimension-history"),
)
def scd2_customer_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 merge of a deterministic update batch into the customer
    dimension: changed keys get a closed-out old version + a new current one,
    no-op rows stay single-version, brand-new keys insert. Output restricted
    to the three touched key families, dates stringified for the gate."""
    (cu,) = _t(spark, sf_dir, "customer")
    dim = (
        cu.withColumn("valid_from", F.lit(_INITIAL).cast("date"))
        .withColumn("valid_to", F.lit(HIGH_DATE).cast("date"))
        .withColumn("is_current", F.lit(1))
    )
    merged = scd2_apply(
        dim,
        _updates(spark, sf_dir),
        key="c_custkey",
        tracked=["c_acctbal", "c_mktsegment"],
        effective_date=_EFFECTIVE,
    )
    return (
        merged.where((F.col("c_custkey") % 10).isin(3, 4, 7))
        .select(
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
            F.col("valid_from").cast("string").alias("valid_from"),
            F.col("valid_to").cast("string").alias("valid_to"),
            F.col("is_current").cast("bigint").alias("is_current"),
        )
        .orderBy("c_custkey", "valid_from")
    )


# --------------------------------------------------- point-in-time lookup

_PIT_INITIAL = "1990-01-01"
_PIT_EFFECTIVE = "1996-01-01"  # mid-range of the fixture's order dates


@register(
    "scd2_point_in_time_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey, c_acctbal, c_mktsegment,
             DATE '{_PIT_INITIAL}' AS valid_from,
             DATE '{_PIT_EFFECTIVE}' AS valid_to, 0 AS ver
      FROM customer WHERE c_custkey % 10 = 3
      UNION ALL
      SELECT c_custkey, round(c_acctbal + 100, 2), c_mktsegment,
             DATE '{_PIT_EFFECTIVE}', DATE '{HIGH_DATE}', 1
      FROM customer WHERE c_custkey % 10 = 3
    )
    SELECT o.o_orderkey, o.o_custkey,
           CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR) AS order_date,
           d.c_acctbal AS acctbal_at_order,
           CAST(d.ver AS BIGINT) AS dim_version
    FROM orders o JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND d.valid_from <= CAST(o.o_orderdate AS DATE)
     AND CAST(o.o_orderdate AS DATE) < d.valid_to
    WHERE o.o_custkey % 10 = 3
    ORDER BY o_orderkey
    """,
    tags=("ingest", "scd2", "point-in-time", "range-join", "as-of"),
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) lookup against the SCD2 dimension: each order
    joins the customer version that was valid ON ITS ORDER DATE — the
    consumer side of SCD2, and the pattern that makes training-data
    features leak-proof (feature-at-event-time, never feature-of-today).
    The dimension is built through the real ``scd2_apply`` merge (initial
    load 1990, one tracked change effective 1996), then facts range-join on
    (key, valid_from <= t < valid_to); the oracle states the closed-form
    two-version dimension directly, so the merge machinery itself is under
    test. Exactly one version matches per fact by SCD2's non-overlap
    invariant.

    Scale: equi-join on the dimension key with the validity range as a
    residual filter — planned as a hash join, not an interval cross; the
    dimension carries one row per key-version, never per fact."""
    (cu, od) = _t(spark, sf_dir, "customer", "orders")
    fam = cu.where(F.col("c_custkey") % 10 == 3)
    dim0 = (
        fam.select("c_custkey", "c_acctbal", "c_mktsegment")
        .withColumn("valid_from", F.lit(_PIT_INITIAL).cast("date"))
        .withColumn("valid_to", F.lit(HIGH_DATE).cast("date"))
        .withColumn("is_current", F.lit(1))
    )
    updates = fam.select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    dim = scd2_apply(
        dim0,
        updates,
        key="c_custkey",
        tracked=["c_acctbal", "c_mktsegment"],
        effective_date=_PIT_EFFECTIVE,
    )
    facts = od.where(F.col("o_custkey") % 10 == 3).select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("order_d")
    )
    # Version ordinal = position in the key's validity chain, NOT is_current
    # (which only coincides with the ordinal while the dimension has exactly
    # two versions — a third scd2_apply batch would silently change its
    # meaning). Per-key window, bounded by versions-per-key.
    ver_w = Window.partitionBy("c_custkey").orderBy("valid_from")
    dim = dim.withColumn("ver", F.row_number().over(ver_w) - 1)
    return (
        facts.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("valid_from") <= F.col("order_d"))
            & (F.col("order_d") < F.col("valid_to")),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("order_d").cast("string").alias("order_date"),
            F.col("c_acctbal").alias("acctbal_at_order"),
            F.col("ver").cast("bigint").alias("dim_version"),
        )
        .orderBy("o_orderkey")
    )
