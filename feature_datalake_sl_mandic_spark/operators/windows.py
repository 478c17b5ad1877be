"""Window functions: ranking, offsets (lag/lead), frames (running aggregates).

Absent from the reference entirely (SURVEY.md §2.2 grep-verified). Expressed
via ``pyspark.sql.window.Window`` so the physical plan is a single sort within
each hash-partitioned group — the canonical scalable pattern (no self-joins).
All orderings carry a unique tiebreaker column so results are deterministic
and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


@register(
    "window_rank_orders",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice,
             row_number()   OVER w AS rn,
             rank()         OVER w AS rnk,
             dense_rank()   OVER w AS drnk,
             ntile(4)       OVER w AS quartile,
             round(percent_rank() OVER w, 6) AS prank,
             round(cume_dist()    OVER w, 6) AS cdist
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    SELECT * FROM ranked WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
    tags=("window", "rank", "topk-per-group"),
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer with the full ranking-function family.

    row_number-filter is the scalable top-k-per-group idiom: one shuffle on
    the partition key, per-group sort, early filter."""
    (od,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("prank"),
            F.round(F.cume_dist().over(w), 6).alias("cdist"),
        )
        .where(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@register(
    "window_lag_order_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS totalprice,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "lag-lead"),
)
def window_lag_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead offsets along each customer's order timeline."""
    (od,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("totalprice"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).alias(
            "days_since_prev"
        ),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_total,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate, o_orderkey
                                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
             AS moving_avg_3,
           count(*) OVER (PARTITION BY o_custkey) AS cust_orders
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "frame", "running-agg"),
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative + sliding ROWS frames and a whole-partition aggregate."""
    (od,) = _t(spark, sf_dir, "orders")
    w_order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_mov = w_order.rowsBetween(-2, Window.currentRow)
    w_all = Window.partitionBy("o_custkey")
    return od.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_total"),
        F.round(F.avg("o_totalprice").over(w_mov), 4).alias("moving_avg_3"),
        F.count(F.lit(1)).over(w_all).alias("cust_orders"),
    ).orderBy("o_custkey", "o_orderkey")


@register(
    "window_first_last_nth_order",
    oracle="""
    SELECT DISTINCT o_custkey,
           strftime(first_value(o_orderdate) OVER w, '%Y-%m-%d') AS first_day,
           strftime(last_value(o_orderdate)  OVER w, '%Y-%m-%d') AS last_day,
           strftime(nth_value(o_orderdate, 2) OVER w, '%Y-%m-%d') AS second_day,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
    """,
    tags=("window", "first-last-nth", "frame"),
)
def window_first_last_nth_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-position window functions (first_value/last_value/nth_value)
    over an unbounded frame: each customer's first, last, and second order
    day in one windowed pass + DISTINCT — no self-joins, no argmin subquery.
    Dates emitted as ISO strings (cross-engine dtype discipline)."""
    (od,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    day = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return (
        od.select(
            "o_custkey",
            day(F.first("o_orderdate").over(w)).alias("first_day"),
            day(F.last("o_orderdate").over(w)).alias("last_day"),
            day(F.nth_value("o_orderdate", 2).over(w)).alias("second_day"),
            F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
        )
        .distinct()
        .orderBy("o_custkey")
    )


@register(
    "window_range_frame_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev,
             count(*) AS n
      FROM events GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(rev AS DOUBLE) AS day_revenue,
           round(CAST(sum(rev) OVER w AS DOUBLE)
                 / sum(n) OVER w, 6) AS avg_per_event_7d,
           CAST(sum(n) OVER w AS BIGINT) AS events_7d
    FROM daily
    WINDOW w AS (ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING
                                      AND CURRENT ROW)
    ORDER BY day
    """,
    tags=("window", "range-frame", "timeseries", "moving-average"),
)
def window_range_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: 7-day trailing aggregates over daily revenue
    — the frame is defined by a VALUE interval, not a row count, so gaps in
    the calendar shrink the window instead of silently reaching further back
    (the bug row-frames have on sparse time series). Sums stay DECIMAL inside
    the frame so re-aggregation order cannot drift between engines.

    Scale shape: NO unpartitioned window anywhere. Because the frame's
    lookback is bounded (6 days), the series splits into fixed 32-day epoch
    buckets and the window partitions by bucket; rows in the last 6 days of
    each bucket are additionally copied into the NEXT bucket as
    frame-context-only rows (``borrowed``) and filtered back out after the
    window — every frame sees exactly the rows the global window would, but
    the sort is per-bucket and parallel. The oracle states the semantics as
    the plain global RANGE window."""
    _BUCKET_DAYS, _LOOKBACK = 32, 6
    (ev,) = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
        # rangeBetween needs an orderable numeric: days since epoch. Daily is
        # tiny (one row per calendar day); checkpoint so the rollup feeding
        # both the native and the borrowed side runs once.
        .withColumn("epoch", F.datediff("d", F.lit("1970-01-01")))
        .localCheckpoint()
    )
    native = daily.withColumn(
        "bucket", F.floor(F.col("epoch") / _BUCKET_DAYS)
    ).withColumn("borrowed", F.lit(False))
    spill = (
        daily.where(F.col("epoch") % _BUCKET_DAYS >= _BUCKET_DAYS - _LOOKBACK)
        .withColumn("bucket", F.floor(F.col("epoch") / _BUCKET_DAYS) + 1)
        .withColumn("borrowed", F.lit(True))
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("epoch")
        .rangeBetween(-_LOOKBACK, Window.currentRow)
    )
    return (
        native.unionByName(spill)
        .select(
            "d",
            "rev",
            "borrowed",
            F.sum("rev").over(w).alias("rev_7d"),
            F.sum("n").over(w).alias("n_7d"),
        )
        .where(~F.col("borrowed"))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            F.col("rev").cast("double").alias("day_revenue"),
            F.round(F.col("rev_7d").cast("double") / F.col("n_7d"), 6).alias(
                "avg_per_event_7d"
            ),
            F.col("n_7d").cast("bigint").alias("events_7d"),
        )
        .orderBy("day")
    )
