"""Time-series smoothing & anomaly detection over the ``events`` table.

Extension surface (the reference has no time-series ops — SURVEY.md §2.2):
batch analytics a monitoring/training-telemetry pipeline needs on top of the
event stream: exponential smoothing of a metric series and rolling z-score
outlier flagging. Both are expressed with window functions only — one shuffle
on the series key, no UDFs — so at 100 TB they parallelize per entity
(partitionBy the series key; here the key is ``event_type`` whose cardinality
is small in the fixture, and the daily pre-aggregation bounds each partition
to the calendar, same argument as ``window_range_frame_moving_avg``).

EWMA is computed in closed form (pandas ``adjust=True`` semantics):

    y_t = sum_{i<=t} (1-a)^(t-i) x_i / sum_{i<=t} (1-a)^(t-i)

via two running sums of ``x_i * r^i`` and ``r^i`` with ``r = 1/(1-a)`` — the
``(1-a)^t`` factor cancels in the ratio, so no per-row recursion is needed and
the whole thing stays inside whole-stage codegen. Both engines do the same
IEEE double math; results are rounded to 4 decimals on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_datalake_sl_mandic_spark.functions.hashing import (
    md5_int60_col,
    md5_int60_sql,
)
from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register

EWMA_ALPHA = 0.3
ZSCORE_WINDOW = 7  # trailing rows (excluding current) for the baseline
ZSCORE_THRESHOLD = 2.0

_DAILY_CTE = """
    SELECT event_type,
           CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           round(sum(value), 2) AS daily_value
    FROM events
    GROUP BY 1, 2
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    (ev,) = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("daily_value"))


@register(
    "ts_ewma_daily_value",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    pos AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i
      FROM daily
    ), sums AS (
      SELECT event_type, day, daily_value,
             sum(daily_value * pow(1.0 / (1.0 - {EWMA_ALPHA}), i))
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS num,
             sum(pow(1.0 / (1.0 - {EWMA_ALPHA}), i))
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS den
      FROM pos
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(num / den, 4) AS ewma_value
    FROM sums
    ORDER BY event_type, day
    """,
    tags=("timeseries", "ewma", "window", "events"),
)
def ts_ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=0.3) of daily event value
    per event_type — closed-form ratio of two running sums, window-only."""
    daily = _daily_series(spark, sf_dir)
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r = 1.0 / (1.0 - EWMA_ALPHA)
    pos = daily.withColumn("i", F.row_number().over(w_ord) - F.lit(1))
    weighted = pos.withColumn("wt", F.pow(F.lit(r), F.col("i")))
    return (
        weighted.withColumn("num", F.sum(F.col("daily_value") * F.col("wt")).over(w_run))
        .withColumn("den", F.sum("wt").over(w_run))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_value",
            F.round(F.col("num") / F.col("den"), 4).alias("ewma_value"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_zscore_anomalies",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    stats AS (
      SELECT event_type, day, daily_value,
             avg(daily_value) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_mean,
             stddev_samp(daily_value) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_std,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                                    ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_n
      FROM daily
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(base_mean, 4) AS base_mean,
           round((daily_value - base_mean) / base_std, 4) AS zscore
    FROM stats
    WHERE base_n >= 3 AND base_std > 0
      AND abs((daily_value - base_mean) / base_std) > {ZSCORE_THRESHOLD}
    ORDER BY event_type, day
    """,
    tags=("timeseries", "anomaly", "zscore", "window", "events"),
)
def ts_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outliers: each day's value vs the trailing-7-day mean
    and sample stddev (current row excluded, >=3 baseline days). Flags days
    with |z| > 2. Window-only — one shuffle on the series key."""
    daily = _daily_series(spark, sf_dir)
    w_base = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    z = (F.col("daily_value") - F.col("base_mean")) / F.col("base_std")
    return (
        daily.withColumn("base_mean", F.avg("daily_value").over(w_base))
        .withColumn("base_std", F.stddev_samp("daily_value").over(w_base))
        .withColumn("base_n", F.count(F.lit(1)).over(w_base))
        .where(
            (F.col("base_n") >= 3)
            & (F.col("base_std") > 0)
            & (F.abs(z) > ZSCORE_THRESHOLD)
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_value",
            F.round("base_mean", 4).alias("base_mean"),
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


ROLLMED_WINDOW = 6  # current row + 6 preceding


@register(
    "ts_rolling_median_value",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE})
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(quantile_cont(daily_value, 0.5) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN {ROLLMED_WINDOW} PRECEDING AND CURRENT ROW), 4) AS rolling_median,
           count(*) OVER (
             PARTITION BY event_type ORDER BY day
             ROWS BETWEEN {ROLLMED_WINDOW} PRECEDING AND CURRENT ROW) AS n_in_window
    FROM daily
    ORDER BY event_type, day
    """,
    tags=("timeseries", "rolling-median", "window", "holistic-agg", "events"),
)
def ts_rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling exact median (7-row trailing frame) per series — a HOLISTIC
    aggregate as a window function (vs the distributive sums of
    ``ts_ewma_daily_value``): the robust-smoothing twin of the mean-based
    EWMA, immune to the single-day spikes ``ts_zscore_anomalies`` flags.
    Both engines interpolate even-count medians identically
    (``percentile``/``quantile_cont``); frame rows are bounded by the
    calendar so per-partition state is O(window)."""
    daily = _daily_series(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ROLLMED_WINDOW, Window.currentRow)
    )
    return daily.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "daily_value",
        F.round(F.expr("percentile(daily_value, 0.5)").over(w), 4).alias(
            "rolling_median"
        ),
        F.count(F.lit(1)).over(w).alias("n_in_window"),
    ).orderBy("event_type", "day")


# 1.5 * 1.4826 (normal-consistency constant): ~1.5-sigma equivalent. The
# fixture's daily sums aggregate many events, so deviations are mild — the
# classical 3-sigma cut flags nothing at any SF; 1.5-sigma keeps the oracle
# non-vacuous (8-17 flagged days per SF) while exercising the same plan.
MAD_K = 2.2239


@register(
    "ts_mad_outliers",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    med AS (
      SELECT event_type, median(daily_value) AS med_value
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, d.daily_value, m.med_value,
             abs(d.daily_value - m.med_value) AS abs_dev
      FROM daily d JOIN med m ON d.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, median(abs_dev) AS mad_value
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.day AS VARCHAR) AS day, d.daily_value,
           round(d.med_value, 4) AS med_value,
           round(m.mad_value, 4) AS mad_value,
           round(d.abs_dev, 4) AS abs_dev
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    WHERE d.abs_dev > {MAD_K} * m.mad_value
    ORDER BY d.event_type, d.day
    """,
    tags=("timeseries", "outliers", "robust-stats", "events"),
)
def ts_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier detection on the daily value series:
    flag days where |x - median| > 1.5 * 1.4826 * MAD. Robust to the outliers
    it hunts (unlike the z-score variant, whose mean/std the anomaly itself
    inflates). Plan shape: two tiny per-key aggregations (exact ``median``)
    broadcast back onto the series — the series itself is never re-sorted or
    collected; both medians and the comparison use identical IEEE doubles on
    both engines, with rounding applied only to displayed columns.

    The daily aggregate (one row per (event_type, day) — calendar-bounded)
    is localCheckpoint'd: it feeds four downstream derivations (median,
    deviations, MAD, final filter) and without the checkpoint each one
    replays the events scan+aggregation, 22 shuffles instead of ~6."""
    daily = _daily_series(spark, sf_dir).localCheckpoint()
    med = daily.groupBy("event_type").agg(
        F.median("daily_value").alias("med_value")
    )
    # dev feeds both the MAD aggregate and the final filter; checkpoint it
    # too so the med-join isn't replayed (14 -> ~6 shuffles).
    dev = (
        daily.join(F.broadcast(med), "event_type")
        .withColumn("abs_dev", F.abs(F.col("daily_value") - F.col("med_value")))
        .localCheckpoint()
    )
    mad = dev.groupBy("event_type").agg(F.median("abs_dev").alias("mad_value"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .where(F.col("abs_dev") > MAD_K * F.col("mad_value"))
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_value",
            F.round("med_value", 4).alias("med_value"),
            F.round("mad_value", 4).alias("mad_value"),
            F.round("abs_dev", 4).alias("abs_dev"),
        )
        .orderBy("event_type", "day")
    )


# --------------------------------------------------------- linear trend (OLS)


@register(
    "ts_linear_trend_daily",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    xy AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x,
             CAST(round(daily_value * 100, 0) AS BIGINT) AS y
      FROM daily
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM xy GROUP BY event_type
    )
    SELECT event_type, n_days, slope_per_day,
           round((CAST(sy AS DOUBLE) / 100.0 - slope_per_day * CAST(sx AS DOUBLE))
                 / CAST(n_days AS DOUBLE), 4) AS intercept
    FROM (
      SELECT *,
             CASE WHEN n_days * sxx - sx * sx <> 0 THEN
               round(CAST(n_days * sxy - sx * sy AS DOUBLE)
                     / CAST(n_days * sxx - sx * sx AS DOUBLE) / 100.0, 6)
             END AS slope_per_day
      FROM stats
    )
    ORDER BY event_type
    """,
    tags=("timeseries", "regression", "sufficient-statistics"),
)
def ts_linear_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend (slope + intercept of daily totals over time) via
    sufficient statistics: one partial-aggregated pass collects
    (n, Σx, Σy, Σx², Σxy) per series and the closed-form normal equations do
    the rest — regression with zero iteration, the map-reduce classic. At
    100 TB this is a single shuffle on the series key carrying five doubles
    per series, regardless of row count. Daily totals are pre-rounded to
    cents on both sides so the engines aggregate identical inputs; slope and
    intercept round to absorb summation-order epsilon."""
    daily = _daily_series(spark, sf_dir)
    # Exact-integer sufficient statistics (x = epoch days, y = cents): the
    # normal-equation numerators are exact, so the slope is ONE IEEE
    # division — a rational slope can land exactly on the rounding grid's
    # midpoint, where float-summed statistics flip between engines (the
    # Chow-test lesson applied here proactively).
    xy = daily.select(
        "event_type",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("daily_value") * 100, 0).cast("bigint").alias("y"),
    )
    stats = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    # a single-day series has zero x-variance: the OLS line is undefined —
    # NULL slope (the intercept inherits NULL through the arithmetic) on
    # both engines; the denominator test is exact-integer so the branch
    # can never disagree between engines (degenerate-lake audit, round 6)
    sxx_var = F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        sxx_var != 0,
        F.round(
            (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / sxx_var.cast("double")
            / 100.0,
            6,
        ),
    )
    # The ROUNDED slope feeds the intercept on both sides: an unrounded-slope
    # epsilon (~1e-16) is amplified by sx (~epoch-days x n_days) well past
    # any final rounding.
    intercept = (
        F.col("sy").cast("double") / 100.0
        - F.col("slope_per_day") * F.col("sx").cast("double")
    ) / F.col("n_days").cast("double")
    return (
        stats.withColumn("slope_per_day", slope)
        .select(
            "event_type",
            "n_days",
            "slope_per_day",
            F.round(intercept, 4).alias("intercept"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------- linear interpolation


@register(
    "ts_linear_interpolate",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    masked AS (
      SELECT event_type, day,
             date_diff('day', DATE '1970-01-01', day) AS x,
             CASE WHEN date_diff('day', DATE '1970-01-01', day) % 5 = 2
                  THEN NULL ELSE daily_value END AS v
      FROM daily
    ),
    ctx AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
               OVER w_prev AS px,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
               OVER w_next AS nx
      FROM masked
      WINDOW w_prev AS (PARTITION BY event_type ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             w_next AS (PARTITION BY event_type ORDER BY x
                        ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           round(CASE WHEN v IS NOT NULL THEN v
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                           THEN pv + (nv - pv) * (x - px) / (nx - px)
                      WHEN pv IS NOT NULL THEN pv
                      ELSE nv END, 4) AS value_filled,
           CAST((v IS NULL) AS INT) AS is_interpolated
    FROM ctx
    ORDER BY event_type, day
    """,
    tags=("timeseries", "interpolation", "gap-fill", "window"),
)
def ts_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing points in a per-series daily metric
    (every 5th day deterministically knocked out to simulate sensor gaps):
    each gap fills from the straight line between its nearest observed
    neighbors, falling back to nearest-value at the series edges — the
    upgrade over forward-fill (``events_gapfill_resample``) when the metric
    trends inside a gap.

    Pure window algebra: two IGNORE-NULLS window passes per series (previous
    observed value+position, next observed value+position) and a closed-form
    projection — no UDFs, no joins, one shuffle on the series key."""
    daily = _daily_series(spark, sf_dir)
    x = F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
    masked = daily.select(
        "event_type",
        "day",
        x.alias("x"),
        F.when(x % 5 == 2, F.lit(None).cast("double"))
        .otherwise(F.col("daily_value"))
        .alias("v"),
    )
    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_next = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    obs_x = F.when(F.col("v").isNotNull(), F.col("x"))
    ctx = masked.select(
        "event_type",
        "day",
        "x",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_x, ignorenulls=True).over(w_prev).alias("px"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_x, ignorenulls=True).over(w_next).alias("nx"),
    )
    interp = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv")) * (F.col("x") - F.col("px"))
            / (F.col("nx") - F.col("px")),
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return ctx.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.round(interp, 4).alias("value_filled"),
        F.col("v").isNull().cast("int").alias("is_interpolated"),
    ).orderBy("event_type", "day")


# --------------------------------------------------- drift detection (PSI)

PSI_SPLIT = "2024-01-16"  # reference period before, current period after
PSI_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]
_PSI_DECILES_SQL = "[" + ", ".join(str(d) for d in PSI_DECILES) + "]"


@register(
    "drift_psi_event_values",
    oracle=f"""
    WITH ev AS (
      SELECT value, CAST(ts AS TIMESTAMP) < TIMESTAMP '{PSI_SPLIT} 00:00:00'
               AS is_ref
      FROM events
    ),
    cuts AS (
      SELECT list_transform(quantile_cont(value, {_PSI_DECILES_SQL}),
                            c -> round(c, 6)) AS cutoffs
      FROM ev WHERE is_ref
    ),
    bucketed AS (
      SELECT len(list_filter(c.cutoffs, x -> e.value > x)) + 1 AS bucket,
             e.is_ref
      FROM ev e CROSS JOIN cuts c
    ),
    counts AS (
      SELECT bucket,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
      FROM bucketed GROUP BY bucket
    ),
    tot AS (
      SELECT sum(n_ref)::BIGINT AS t_ref, sum(n_cur)::BIGINT AS t_cur
      FROM counts
    )
    SELECT bucket, n_ref, n_cur,
           round((n_ref + 1.0) / (t_ref + 10), 6) AS p_ref,
           round((n_cur + 1.0) / (t_cur + 10), 6) AS p_cur,
           round(((n_cur + 1.0) / (t_cur + 10) - (n_ref + 1.0) / (t_ref + 10))
                 * ln(((n_cur + 1.0) / (t_cur + 10))
                      / ((n_ref + 1.0) / (t_ref + 10))), 6) AS psi_term
    FROM counts CROSS JOIN tot
    ORDER BY bucket
    """,
    tags=("timeseries", "drift", "psi", "percentile", "ml-ops"),
)
def drift_psi_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference and a current period
    of the event-value distribution — the standard ML-ops drift alarm for
    features and scores (PSI > 0.25 = retrain). Buckets are the EXACT
    deciles of the reference period (computed once, broadcast back — the
    same no-range-partitioning shape as quality_decile_stats), and shares
    use Laplace +1 smoothing on both sides so an empty current bucket
    cannot produce ln(0). Per-bucket PSI terms are emitted so the alarm is
    attributable to the distribution region that moved."""
    (ev,) = _t(spark, sf_dir, "events")
    e = ev.select(
        "value",
        (F.col("ts") < F.lit(f"{PSI_SPLIT} 00:00:00").cast("timestamp")).alias(
            "is_ref"
        ),
    )
    cuts = (
        e.where("is_ref")
        .agg(
            F.transform(
                F.percentile("value", F.array(*[F.lit(d) for d in PSI_DECILES])),
                lambda c: F.round(c, 6),
            ).alias("cutoffs")
        )
    )
    bucketed = e.crossJoin(F.broadcast(cuts)).select(
        (F.size(F.filter("cutoffs", lambda x: F.col("value") > x)) + 1)
        .cast("bigint")
        .alias("bucket"),
        "is_ref",
    )
    # 11-row bucket relation feeds the totals scalar AND the final PSI terms
    # — pin so the bucketing pass over events runs once, not per subtree
    counts = (
        bucketed.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
        )
        .localCheckpoint(eager=False)
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p_ref = (F.col("n_ref") + 1.0) / (F.col("t_ref") + 10)
    p_cur = (F.col("n_cur") + 1.0) / (F.col("t_cur") + 10)
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_ref",
            "n_cur",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cur, 6).alias("p_cur"),
            F.round((p_cur - p_ref) * F.log(p_cur / p_ref), 6).alias("psi_term"),
        )
        .orderBy("bucket")
    )


ACF_MAX_LAG = 7  # weekly seasonality shows up as a peak at lag 7


@register(
    "ts_autocorrelation",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    mu AS (SELECT event_type, avg(daily_value) AS mu FROM daily GROUP BY 1),
    cen AS (
      SELECT d.event_type, d.day, d.daily_value - m.mu AS c
      FROM daily d JOIN mu m USING (event_type)
    ),
    den AS (SELECT event_type, sum(c * c) AS den FROM cen GROUP BY 1),
    pairs AS (
      SELECT a.event_type, t.k AS lag, sum(a.c * b.c) AS num,
             count(*) AS n_pairs
      FROM cen a
      CROSS JOIN range(1, {ACF_MAX_LAG + 1}) t(k)
      JOIN cen b ON b.event_type = a.event_type
                AND b.day = a.day + CAST(t.k AS INTEGER)
      GROUP BY 1, 2
    )
    SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, p.n_pairs,
           round(p.num / d.den, 4) AS acf
    FROM pairs p JOIN den d USING (event_type)
    ORDER BY event_type, lag
    """,
    tags=("timeseries", "autocorrelation", "seasonality", "events"),
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1..7) of the per-type daily value series —
    the seasonality/persistence diagnostic that motivates the EWMA/z-score
    window choices: a peak at lag 7 means weekly seasonality, fast decay
    means the 7-row z-score baseline is long enough. Standard biased ACF
    estimator: acf(k) = Σ(x_t−μ)(x_{{t+k}}−μ) / Σ(x_t−μ)², pairs matched by
    calendar day (gaps drop pairs, never misalign them).

    Scale shape: everything happens on the daily pre-aggregate (bounded by
    |event_type| × calendar), the per-series mean broadcasts back, and the
    lag pairing is an equi-join on (event_type, day+k) — no window over an
    unbounded series, no UDF."""
    # The centered daily series feeds four subtrees (den, both join sides);
    # it is bounded (|event_type| x calendar), so truncate lineage once
    # instead of recomputing the events scan per subtree.
    daily = _daily_series(spark, sf_dir)
    mu = daily.groupBy("event_type").agg(F.avg("daily_value").alias("mu"))
    cen = (
        daily.join(F.broadcast(mu), "event_type")
        .select(
            "event_type", "day", (F.col("daily_value") - F.col("mu")).alias("c")
        )
        .localCheckpoint(eager=False)
    )
    den = cen.groupBy("event_type").agg(F.sum(F.col("c") * F.col("c")).alias("den"))
    lags = spark.range(1, ACF_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = cen.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        F.col("c").alias("ca"),
        F.date_add(F.col("day"), F.col("lag").cast("int")).alias("day_b"),
    )
    b = cen.select(
        "event_type", F.col("day").alias("day_b"), F.col("c").alias("cb")
    )
    pairs = (
        a.join(b, ["event_type", "day_b"])
        .groupBy("event_type", "lag")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).alias("num"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
    return (
        pairs.join(F.broadcast(den), "event_type")
        .select(
            "event_type",
            "lag",
            "n_pairs",
            F.round(F.col("num") / F.col("den"), 4).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


XCORR_MAX_LAG = 3
XCORR_MIN_PAIRS = 10


@register(
    "ts_cross_correlation_lags",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    lags AS (SELECT unnest(range(0, {XCORR_MAX_LAG} + 1)) AS lag),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, l.lag,
             corr(a.daily_value, b.daily_value) AS r,
             count(*) AS n_pairs,
             stddev_samp(a.daily_value) AS sa,
             stddev_samp(b.daily_value) AS sb
      FROM daily a
      CROSS JOIN lags l
      JOIN daily b
        ON b.day = a.day + CAST(l.lag AS INTEGER)
       AND b.event_type <> a.event_type
      GROUP BY 1, 2, 3
    )
    SELECT type_a, type_b, CAST(lag AS BIGINT) AS lag, n_pairs,
           round(r, 4) AS xcorr
    FROM pairs
    WHERE n_pairs >= {XCORR_MIN_PAIRS} AND sa > 0 AND sb > 0
    ORDER BY type_a, type_b, lag
    """,
    tags=("timeseries", "cross-correlation", "leading-indicator", "events"),
)
def ts_cross_correlation_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily value series of every
    ordered pair of event types: xcorr(a, b, k) = Pearson corr of a_t with
    b_{t+k} over calendar-matched days, k = 0..XCORR_MAX_LAG. The
    leading-indicator companion to ``ts_autocorrelation`` — a peak at k>0
    for (view, purchase) means views lead purchases by k days. Ordered pairs
    (a != b) cover both lead directions without negative lags.

    Scale shape: identical to the ACF plan — everything runs on the daily
    pre-aggregate (bounded by |event_type| x calendar), the lag table is a
    broadcast literal, and pairing is an equi-join on the shifted day. The
    per-day fanout is |event_type|^2 x lags, a constant; no window over the
    raw series, no UDF. Zero-variance series are dropped on both sides
    rather than risking engine-specific NaN-vs-NULL corr semantics."""
    # pinned: both sides of the lag pairing read the same bounded daily
    # relation instead of re-running the events scan + daily agg per side
    daily = _daily_series(spark, sf_dir).localCheckpoint(eager=False)
    lags = spark.range(0, XCORR_MAX_LAG + 1).select(F.col("id").alias("lag"))
    a = daily.crossJoin(F.broadcast(lags)).select(
        F.col("event_type").alias("type_a"),
        "lag",
        F.col("daily_value").alias("va"),
        F.date_add(F.col("day"), F.col("lag").cast("int")).alias("day_b"),
    )
    b = daily.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("day_b"),
        F.col("daily_value").alias("vb"),
    )
    pairs = (
        a.join(b, "day_b")
        .where(F.col("type_a") != F.col("type_b"))
        .groupBy("type_a", "type_b", "lag")
        .agg(
            F.corr("va", "vb").alias("r"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.stddev_samp("va").alias("sa"),
            F.stddev_samp("vb").alias("sb"),
        )
    )
    return (
        pairs.where(
            (F.col("n_pairs") >= XCORR_MIN_PAIRS) & (F.col("sa") > 0) & (F.col("sb") > 0)
        )
        .select(
            "type_a", "type_b", "lag", "n_pairs", F.round("r", 4).alias("xcorr")
        )
        .orderBy("type_a", "type_b", "lag")
    )


@register(
    "ts_seasonal_dow_index",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    per_dow AS (
      SELECT event_type, isodow(day) AS dow,
             count(*) AS n_days, avg(daily_value) AS dow_mean
      FROM daily GROUP BY 1, 2
    ), per_type AS (
      SELECT event_type, avg(daily_value) AS type_mean FROM daily GROUP BY 1
    )
    SELECT d.event_type, CAST(d.dow AS BIGINT) AS dow, d.n_days,
           round(d.dow_mean, 4) AS dow_mean,
           CASE WHEN t.type_mean <> 0
                THEN round(d.dow_mean / t.type_mean, 4) END AS seasonal_index
    FROM per_dow d JOIN per_type t USING (event_type)
    ORDER BY event_type, dow
    """,
    tags=("timeseries", "seasonality", "decomposition", "events"),
)
def ts_seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal decomposition of the per-type daily value series:
    seasonal_index(type, dow) = mean(daily_value | dow) / mean(daily_value).
    ISO day numbering (1=Monday..7=Sunday) on both engines (Spark
    ``weekday()+1`` == DuckDB ``isodow``). Deseasonalizing a series is then
    a broadcast join on (event_type, dow) and one division — the index table
    is |event_type| x 7 rows no matter the input size.

    Scale shape: two partial-aggregating groupBys over the bounded daily
    relation; the per-type mean broadcasts back. No window, no UDF. The
    daily relation is pinned so both groupBys share one events scan
    (deriving the type mean from the dow sums instead would re-order the
    float summation vs the oracle's direct avg — not worth the ulp risk
    for a bounded relation)."""
    daily = _daily_series(spark, sf_dir).localCheckpoint(eager=False)
    per_dow = daily.groupBy(
        "event_type", (F.weekday("day") + F.lit(1)).cast("bigint").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_days"), F.avg("daily_value").alias("dow_mean"))
    per_type = daily.groupBy("event_type").agg(F.avg("daily_value").alias("type_mean"))
    return (
        per_dow.join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "dow",
            "n_days",
            F.round("dow_mean", 4).alias("dow_mean"),
            # an all-zero series has no definable seasonality: NULL index on
            # both engines (degenerate-lake audit, round 6)
            F.when(
                F.col("type_mean") != 0,
                F.round(F.col("dow_mean") / F.col("type_mean"), 4),
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


@register(
    "ts_seasonal_adjusted_anomalies",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    idx AS (
      SELECT d.event_type, isodow(d.day) AS dow,
             avg(d.daily_value) / t.type_mean AS seasonal_index
      FROM daily d
      JOIN (SELECT event_type, avg(daily_value) AS type_mean
            FROM daily GROUP BY 1) t USING (event_type)
      WHERE t.type_mean <> 0
      GROUP BY d.event_type, isodow(d.day), t.type_mean
    ),
    adj AS (
      SELECT d.event_type, d.day, d.daily_value,
             d.daily_value / i.seasonal_index AS adj_value
      FROM daily d JOIN idx i
        ON d.event_type = i.event_type AND isodow(d.day) = i.dow
      WHERE i.seasonal_index <> 0
    ),
    stats AS (
      SELECT event_type, day, daily_value, adj_value,
             avg(adj_value) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_mean,
             stddev_samp(adj_value) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_std,
             count(*) OVER (PARTITION BY event_type ORDER BY day
                                  ROWS BETWEEN {ZSCORE_WINDOW} PRECEDING AND 1 PRECEDING) AS base_n
      FROM adj
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(adj_value, 4) AS adj_value,
           round((adj_value - base_mean) / base_std, 4) AS zscore
    FROM stats
    WHERE base_n >= 3 AND base_std > 0
      AND abs((adj_value - base_mean) / base_std) > {ZSCORE_THRESHOLD}
    ORDER BY event_type, day
    """,
    tags=("timeseries", "anomaly", "seasonality", "zscore", "events"),
)
def ts_seasonal_adjusted_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonally-adjusted anomaly detection — ``ts_zscore_anomalies`` run on
    the DESEASONALIZED series (daily_value / day-of-week index from
    ``ts_seasonal_dow_index``): a quiet-Sunday dip stops masquerading as an
    anomaly and a weekday-sized spike on a weekend stops hiding. This is the
    composition the two underlying operators exist for, registered so the
    composed semantics are hash-checked end to end.

    Scale shape: the index table is |event_type| x 7 rows (broadcast join
    back onto the bounded daily relation); the z-score pass is the same
    single partitioned window as the unadjusted detector."""
    # The daily pre-aggregate feeds three subtrees (type mean, dow index,
    # adjusted series) — truncate its lineage once instead of re-scanning
    # events per subtree (same cut as the ACF plan).
    daily = _daily_series(spark, sf_dir).localCheckpoint(eager=False)
    dow = (F.weekday("day") + F.lit(1)).alias("dow")
    per_type = daily.groupBy("event_type").agg(F.avg("daily_value").alias("type_mean"))
    # a zero type mean (all-zero series) has no definable index, and a zero
    # dow index cannot deseasonalize — both cells drop on BOTH engines
    # instead of dividing by zero (degenerate-lake audit, round 6)
    idx = (
        daily.join(F.broadcast(per_type), "event_type")
        .where(F.col("type_mean") != 0)
        .groupBy("event_type", dow)
        .agg((F.avg("daily_value") / F.first("type_mean")).alias("seasonal_index"))
        .where(F.col("seasonal_index") != 0)
    )
    adj = daily.withColumn("dow", dow).join(
        F.broadcast(idx), ["event_type", "dow"]
    ).select(
        "event_type",
        "day",
        "daily_value",
        (F.col("daily_value") / F.col("seasonal_index")).alias("adj_value"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-ZSCORE_WINDOW, -1)
    )
    stats = adj.select(
        "event_type",
        "day",
        "daily_value",
        "adj_value",
        F.avg("adj_value").over(w).alias("base_mean"),
        F.stddev_samp("adj_value").over(w).alias("base_std"),
        F.count(F.lit(1)).over(w).alias("base_n"),
    )
    z = (F.col("adj_value") - F.col("base_mean")) / F.col("base_std")
    return (
        stats.where(
            (F.col("base_n") >= 3)
            & (F.col("base_std") > 0)
            & (F.abs(z) > ZSCORE_THRESHOLD)
        )
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_value",
            F.round("adj_value", 4).alias("adj_value"),
            F.round(z, 4).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


FORECAST_SEASON = 7  # seasonal-naive lag (days)
BACKTEST_DAYS = 28  # trailing window scored per series


@register(
    "ts_seasonal_naive_backtest",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    horizon AS (
      SELECT event_type, max(day) AS last_day FROM daily GROUP BY 1
    ),
    joined AS (
      SELECT a.event_type, a.day, a.daily_value,
             f.daily_value AS forecast
      FROM daily a
      JOIN daily f ON f.event_type = a.event_type
                  AND f.day = a.day - {FORECAST_SEASON}
      JOIN horizon h ON h.event_type = a.event_type
      WHERE a.day > h.last_day - {BACKTEST_DAYS}
        AND a.daily_value <> 0
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_scored,
           round(avg(abs(daily_value - forecast) / abs(daily_value)), 4)
             AS mape,
           round(avg(abs(daily_value - forecast)), 4) AS mae
    FROM joined
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "forecast", "backtest", "seasonal-naive", "events"),
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each day's value as the
    value one season (7 days) earlier and score MAPE / MAE over the trailing
    28 days per series — the baseline every fancier forecaster must beat,
    and the accuracy floor a monitoring pipeline alarms against. The
    forecast 'join' is the same shifted-calendar equi-join as the ACF/xcorr
    plans; gaps drop scored days rather than misaligning them.

    Scale shape: runs entirely on the bounded daily pre-aggregate — one
    equi-join on (event_type, day - 7), one per-series aggregation. Zero
    windows, zero UDFs."""
    daily = _daily_series(spark, sf_dir).localCheckpoint(eager=False)
    horizon = daily.groupBy("event_type").agg(F.max("day").alias("last_day"))
    f_side = daily.select(
        "event_type",
        F.date_add(F.col("day"), FORECAST_SEASON).alias("day"),
        F.col("daily_value").alias("forecast"),
    )
    joined = (
        daily.join(f_side, ["event_type", "day"])
        .join(F.broadcast(horizon), "event_type")
        .where(
            (F.col("day") > F.date_sub(F.col("last_day"), BACKTEST_DAYS))
            & (F.col("daily_value") != 0)
        )
    )
    err = F.abs(F.col("daily_value") - F.col("forecast"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            F.round(F.avg(err / F.abs(F.col("daily_value"))), 4).alias("mape"),
            F.round(F.avg(err), 4).alias("mae"),
        )
        .orderBy("event_type")
    )


CUSUM_DRIFT_K = 0.5  # drift allowance, in per-series stddev units
CUSUM_THRESHOLD_H = 4.0  # alarm threshold, in per-series stddev units


@register(
    "ts_cusum_mean_shift",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    st AS (
      SELECT event_type, avg(daily_value) AS mu,
             stddev_samp(daily_value) AS sigma
      FROM daily GROUP BY 1
    ),
    cum AS (
      SELECT d.event_type, d.day, d.daily_value,
             sum((d.daily_value - s.mu) / s.sigma - {CUSUM_DRIFT_K})
               OVER (PARTITION BY d.event_type ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM daily d JOIN st s USING (event_type)
      WHERE s.sigma > 0
    ),
    scored AS (
      SELECT event_type, day, daily_value,
             c - min(c) OVER (PARTITION BY event_type ORDER BY day
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cusum_score
      FROM cum
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(cusum_score, 4) AS cusum_score
    FROM scored
    WHERE cusum_score > {CUSUM_THRESHOLD_H}
    ORDER BY event_type, day
    """,
    tags=("timeseries", "changepoint", "cusum", "window", "events"),
)
def ts_cusum_mean_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detection (Page's test): standardized
    deviations accumulate with a drift allowance k, and the classic
    recursive score S_t = max(0, S_{{t-1}} + z_t - k) is rewritten in CLOSED
    FORM as C_t - min_{{i<=t}} C_i over the plain cumulative sum C — two
    running windows, no recursion, no UDF. Days where the score exceeds h
    flag a sustained UPWARD mean shift (a persistent level change the
    spike-oriented z-score detector deliberately ignores, and the
    seasonally-adjusted detector only sees day-by-day).

    Scale shape: same as every detector in this module — the bounded daily
    pre-aggregate, per-series broadcast stats, one partitioned ordered
    window. The rewrite is exact: max(0, .) folding and prefix-min differ
    by algebra, not approximation."""
    daily = _daily_series(spark, sf_dir).localCheckpoint(eager=False)
    st = daily.groupBy("event_type").agg(
        F.avg("daily_value").alias("mu"),
        F.stddev_samp("daily_value").alias("sigma"),
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    z_drift = (F.col("daily_value") - F.col("mu")) / F.col("sigma") - F.lit(
        CUSUM_DRIFT_K
    )
    cum = (
        daily.join(F.broadcast(st), "event_type")
        .where(F.col("sigma") > 0)
        .withColumn("c", F.sum(z_drift).over(w_run))
    )
    score = F.col("c") - F.min("c").over(w_run)
    return (
        cum.withColumn("cusum_score", score)
        .where(F.col("cusum_score") > CUSUM_THRESHOLD_H)
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            "daily_value",
            F.round("cusum_score", 4).alias("cusum_score"),
        )
        .orderBy("event_type", "day")
    )


@register(
    "ts_theilsen_trend",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    idx AS (
      SELECT event_type, day, daily_value,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    slopes AS (
      SELECT a.event_type,
             (b.daily_value - a.daily_value) * 1.0 / (b.i - a.i) AS s
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND b.i > a.i
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(quantile_cont(s, 0.5), 4) AS theilsen_slope
    FROM slopes
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "robust-regression", "theil-sen", "events"),
)
def ts_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend: the MEDIAN of all pairwise slopes per series —
    a 29%-breakdown-point alternative to the OLS slope of
    ``ts_linear_trend_daily``, immune to the outlier days that drag a
    least-squares fit (compare the two on a series with one bad day and OLS
    moves, Theil-Sen doesn't). Slopes are taken over the observation index,
    matching the OLS op's x-axis.

    Scale shape: the pair join is per-series over the BOUNDED daily
    relation (|calendar|^2 pairs per series at worst — thousands, not
    data-sized); at an unbounded series length you'd sample pairs
    (repeated-median variants), same plan shape. Exact median via
    percentile on both engines, rounded at 4."""
    daily = _daily_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w)).localCheckpoint(eager=False)
    a = idx.select("event_type", F.col("i").alias("ia"), F.col("daily_value").alias("va"))
    b = idx.select("event_type", F.col("i").alias("ib"), F.col("daily_value").alias("vb"))
    slopes = (
        a.join(b, "event_type")
        .where(F.col("ib") > F.col("ia"))
        .select(
            "event_type",
            ((F.col("vb") - F.col("va")) / (F.col("ib") - F.col("ia"))).alias("s"),
        )
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.expr("percentile(s, 0.5)"), 4).alias("theilsen_slope"),
        )
        .orderBy("event_type")
    )


@register(
    "ts_mann_kendall_test",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    idx AS (
      SELECT event_type, daily_value,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    pairs AS (
      SELECT a.event_type,
             sum(sign(b.daily_value - a.daily_value)) AS s
      FROM idx a JOIN idx b
        ON a.event_type = b.event_type AND b.i > a.i
      GROUP BY 1
    ),
    ties AS (
      SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
      FROM (SELECT event_type, daily_value, count(*) AS t
            FROM daily GROUP BY 1, 2)
      GROUP BY 1
    ),
    n_t AS (SELECT event_type, count(*) AS n FROM daily GROUP BY 1)
    SELECT p.event_type, CAST(n.n AS BIGINT) AS n,
           CAST(p.s AS BIGINT) AS s,
           round((n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term) / 18.0, 4)
             AS var_s,
           round((p.s - sign(p.s))
                 / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term) / 18.0),
                 4) AS z,
           abs((p.s - sign(p.s))
               / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term) / 18.0))
             > 1.96 AS significant_95
    FROM pairs p
    JOIN n_t n USING (event_type)
    JOIN ties t USING (event_type)
    ORDER BY p.event_type
    """,
    tags=("timeseries", "trend-test", "mann-kendall", "nonparametric"),
)
def ts_mann_kendall_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall nonparametric trend TEST — the hypothesis-test companion
    to the Theil-Sen slope ESTIMATE (the two are standard together):
    S = sum over ordered pairs of sign(x_j - x_i), variance with the exact
    tie correction, z via the continuity-corrected normal approximation,
    significance at 95%. Sign-based, so a single outlier day moves S by at
    most n-1 — the robustness OLS's t-test lacks.

    Scale shape: the same bounded per-series pair join as Theil-Sen (and
    you'd sample pairs identically at unbounded lengths); ties and counts
    are one aggregation each over the daily relation."""
    daily = _daily_series(spark, sf_dir).localCheckpoint()
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w))
    a = idx.select("event_type", F.col("i").alias("ia"), F.col("daily_value").alias("va"))
    b = idx.select("event_type", F.col("i").alias("ib"), F.col("daily_value").alias("vb"))
    pairs = (
        a.join(b, "event_type")
        .where(F.col("ib") > F.col("ia"))
        .groupBy("event_type")
        .agg(F.sum(F.signum(F.col("vb") - F.col("va"))).alias("s"))
    )
    ties = (
        daily.groupBy("event_type", "daily_value")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    n_t = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z = (F.col("s") - F.signum(F.col("s"))) / F.sqrt(var_s)
    return (
        pairs.join(n_t, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("s").cast("bigint").alias("s"),
            F.round(var_s, 4).alias("var_s"),
            F.round(z, 4).alias("z"),
            (F.abs(z) > 1.96).alias("significant_95"),
        )
        .orderBy("event_type")
    )


TS_ANCHOR_K = 8  # sampled-pair variant: anchors per series


@register(
    "ts_trend_pair_sampled",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    idx AS (
      SELECT event_type, day, daily_value,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
      FROM daily
    ),
    anch AS (
      SELECT event_type, i, daily_value FROM (
        SELECT idx.*,
               row_number() OVER (
                 PARTITION BY event_type
                 ORDER BY {{h}}, day
               ) AS rn
        FROM idx
      ) WHERE rn <= {TS_ANCHOR_K}
    ),
    slopes AS (
      SELECT a.event_type,
             (b.daily_value - a.daily_value) * 1.0 / (b.i - a.i) AS s
      FROM anch a JOIN idx b
        ON a.event_type = b.event_type AND b.i <> a.i
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_pairs_sampled,
           round(quantile_cont(s, 0.5), 4) AS theilsen_slope_sampled,
           round(avg(sign(s)), 4) AS kendall_tau_sampled
    FROM slopes
    GROUP BY event_type
    ORDER BY event_type
    """.format(h=md5_int60_sql(
        "coalesce(event_type, '__null__') || '|' || CAST(day AS VARCHAR)"
    )),
    tags=("timeseries", "theil-sen", "mann-kendall", "pair-sampling", "sampled"),
)
def ts_trend_pair_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-SAMPLED Theil-Sen slope + Kendall-tau trend direction: the
    unbounded-series fallback the exact forms (``ts_theilsen_trend``,
    ``ts_mann_kendall_test``) name in their docstrings. Instead of all
    n(n-1)/2 pairs per series, each series contributes only pairs anchored
    at its TS_ANCHOR_K deterministically-sampled rows (smallest md5 of the
    series key + day — reproducible across engines and runs), giving n x K
    pairs: LINEAR in series length, so a minute-grain or per-entity series
    that would make the exact O(n^2) join explode stays bounded. The slope
    is the median of anchored slopes (Siegel's repeated-median cousin; same
    29% breakdown intuition), tau is the mean concordance sign over the
    sampled pairs. Agreement with the exact estimators on the daily fixture
    is pinned in tests/test_round4_ops.py.

    Scale shape: anchor selection is a partitioned top-K window over the
    daily relation; the pair join fans each series row out to at most K
    anchors (broadcastable: |types| x K rows). Everything downstream
    aggregates per series. No O(n^2) anywhere."""
    return pair_sampled_trend(_daily_series(spark, sf_dir))


def pair_sampled_trend(daily: DataFrame, k: int = TS_ANCHOR_K) -> DataFrame:
    """Core of ``ts_trend_pair_sampled`` over any (event_type, day,
    daily_value) relation — factored so the agreement tests can drive it
    with synthetic trended series (the fixture's event series are
    near-trendless noise, where ANY subsampled estimator rightfully
    disagrees with the exact one)."""
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.withColumn("i", F.row_number().over(w)).localCheckpoint(eager=False)
    # NULL event_type coalesces to a sentinel on both engines (concat_ws
    # drops NULL parts; the oracle's || nulls the key) so anchor ranking
    # cannot desync on a nullable lake.
    hv = md5_int60_col(
        F.concat_ws(
            "|",
            F.coalesce(F.col("event_type"), F.lit("__null__")),
            F.col("day").cast("string"),
        )
    )
    wa = Window.partitionBy("event_type").orderBy(hv.asc(), F.col("day").asc())
    anch = (
        idx.withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") <= k)
        .select(
            "event_type", F.col("i").alias("ia"), F.col("daily_value").alias("va")
        )
    )
    b = idx.select(
        "event_type", F.col("i").alias("ib"), F.col("daily_value").alias("vb")
    )
    slopes = (
        F.broadcast(anch)
        .join(b, "event_type")
        .where(F.col("ib") != F.col("ia"))
        .select(
            "event_type",
            ((F.col("vb") - F.col("va")) / (F.col("ib") - F.col("ia"))).alias("s"),
        )
    )
    return (
        slopes.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_pairs_sampled"),
            F.round(F.expr("percentile(s, 0.5)"), 4).alias("theilsen_slope_sampled"),
            F.round(F.avg(F.signum("s")), 4).alias("kendall_tau_sampled"),
        )
        .orderBy("event_type")
    )


KS_SPLIT_DAY = "2024-01-16"  # same reference/current boundary as the PSI op
KS_ALPHA_C = 1.358  # c(alpha) for alpha = 0.05


@register(
    "ts_ks_two_sample_drift",
    oracle=f"""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '{KS_SPLIT_DAY}'
                  THEN 0 ELSE 1 END AS side
      FROM events
      WHERE value IS NOT NULL
    ),
    counts AS (
      SELECT event_type, value,
             sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS c0,
             sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS c1
      FROM tagged GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, value,
             sum(c0) OVER (PARTITION BY event_type ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f0,
             sum(c1) OVER (PARTITION BY event_type ORDER BY value
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS f1,
             sum(c0) OVER (PARTITION BY event_type) AS n0,
             sum(c1) OVER (PARTITION BY event_type) AS n1
      FROM counts
    )
    SELECT event_type,
           CAST(max(n0) AS BIGINT) AS n_ref,
           CAST(max(n1) AS BIGINT) AS n_cur,
           round(max(abs(f0 * 1.0 / nullif(n0, 0)
                         - f1 * 1.0 / nullif(n1, 0))), 6) AS ks_stat,
           round({KS_ALPHA_C} * sqrt((max(n0) + max(n1)) * 1.0
                                     / nullif(max(n0) * max(n1), 0)), 6)
             AS critical_05,
           coalesce(max(abs(f0 * 1.0 / nullif(n0, 0)
                            - f1 * 1.0 / nullif(n1, 0)))
             > {KS_ALPHA_C} * sqrt((max(n0) + max(n1)) * 1.0
                                   / nullif(max(n0) * max(n1), 0)), FALSE)
             AS reject_05
    FROM cum
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "drift", "ks-test", "nonparametric", "events"),
)
def ts_ks_two_sample_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type: D = the
    maximum gap between the reference (before KS_SPLIT_DAY) and current
    empirical CDFs of ``value``, against the large-sample critical value at
    alpha = 0.05. The binning-free companion to ``drift_psi_event_values``:
    PSI localizes WHICH deciles moved, KS tests WHETHER the distributions
    differ at all, with no bucket choices to defend.

    Scale shape: both CDFs come from ONE pass — per-(type, value) side
    counts, then running sums over the value order within each type (the
    same partitioned-window shape as every detector here); D is a plain max
    aggregation. No sort of raw rows, no UDF, no quantile approximation."""
    (ev,) = _t(spark, sf_dir, "events")
    side = (F.col("ts").cast("timestamp") >= F.lit(KS_SPLIT_DAY).cast("timestamp")).cast(
        "int"
    )
    # NULL values are excluded explicitly: Spark windows order NULLS FIRST
    # ascending, DuckDB NULLS LAST — an unfiltered NULL row would shift both
    # CDFs differently per engine (and a NULL has no place in an ECDF anyway).
    counts = (
        ev.where(F.col("value").isNotNull())
        .select("event_type", "value", side.alias("side"))
        .groupBy("event_type", "value")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0)).alias("c0"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).alias("c1"),
        )
    )
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = counts.select(
        "event_type",
        F.sum("c0").over(w_run).alias("f0"),
        F.sum("c1").over(w_run).alias("f1"),
        F.sum("c0").over(w_all).alias("n0"),
        F.sum("c1").over(w_all).alias("n1"),
    )
    # an empty reference or current sample has no ECDF: the test is
    # undefined — NULL stats via nullif (so no ANSI divide-by-zero on
    # either engine) and a FALSE reject flag (degenerate-lake audit, r6)
    gap = F.abs(
        F.col("f0") / F.nullif(F.col("n0"), F.lit(0))
        - F.col("f1") / F.nullif(F.col("n1"), F.lit(0))
    )
    crit = F.lit(KS_ALPHA_C) * F.sqrt(
        (F.max("n0") + F.max("n1"))
        * 1.0
        / F.nullif(F.max("n0") * F.max("n1"), F.lit(0))
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n0").cast("bigint").alias("n_ref"),
            F.max("n1").cast("bigint").alias("n_cur"),
            F.round(F.max(gap), 6).alias("ks_stat"),
            F.round(crit, 6).alias("critical_05"),
            F.coalesce(F.max(gap) > crit, F.lit(False)).alias("reject_05"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------- Brown's double exponential smoothing

BROWN_ALPHA = 0.3


@register(
    "ts_brown_double_smoothing",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    pos AS (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i
      FROM daily
    ), s1 AS (
      SELECT event_type, day, daily_value, i,
             sum(daily_value * pow(1.0 / (1.0 - {BROWN_ALPHA}), i))
               OVER w / sum(pow(1.0 / (1.0 - {BROWN_ALPHA}), i)) OVER w AS s1
      FROM pos
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s2 AS (
      SELECT event_type, day, daily_value, s1,
             sum(s1 * pow(1.0 / (1.0 - {BROWN_ALPHA}), i))
               OVER w / sum(pow(1.0 / (1.0 - {BROWN_ALPHA}), i)) OVER w AS s2
      FROM s1
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, daily_value,
           round(2 * s1 - s2, 4) AS level,
           round({BROWN_ALPHA} / (1.0 - {BROWN_ALPHA}) * (s1 - s2), 4) AS trend,
           round(2 * s1 - s2 + {BROWN_ALPHA} / (1.0 - {BROWN_ALPHA}) * (s1 - s2), 4)
             AS forecast_next
    FROM s2
    ORDER BY event_type, day
    """,
    tags=("timeseries", "ewma", "forecast", "window", "events"),
)
def ts_brown_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown's double exponential smoothing (level + trend) of the daily
    event-value series: S1 = EWMA(x), S2 = EWMA(S1) — both in the same
    closed-form power-sum ratio as ``ts_ewma_daily_value`` (adjust=True
    weighting, stated in the output contract) — then Brown's estimates
    level = 2*S1 - S2, trend = a/(1-a) * (S1 - S2) and the one-step-ahead
    forecast level + trend.

    Scale shape: two chained ordered-frame window passes over the SAME
    partitioning (event_type) — Spark plans one Exchange then two Window
    operators over the sorted runs; nothing leaves codegen, no recursion,
    no UDF. Oracle computes the identical IEEE-double expressions in DuckDB.
    """
    daily = _daily_series(spark, sf_dir)
    w_ord = Window.partitionBy("event_type").orderBy("day")
    w_run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = BROWN_ALPHA
    r = 1.0 / (1.0 - a)
    pos = daily.withColumn("i", F.row_number().over(w_ord) - F.lit(1)).withColumn(
        "wt", F.pow(F.lit(r), F.col("i"))
    )
    s1 = pos.withColumn(
        "s1", F.sum(F.col("daily_value") * F.col("wt")).over(w_run) / F.sum("wt").over(w_run)
    )
    s2 = s1.withColumn(
        "s2", F.sum(F.col("s1") * F.col("wt")).over(w_run) / F.sum("wt").over(w_run)
    )
    level = 2 * F.col("s1") - F.col("s2")
    trend = F.lit(a / (1.0 - a)) * (F.col("s1") - F.col("s2"))
    return s2.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "daily_value",
        F.round(level, 4).alias("level"),
        F.round(trend, 4).alias("trend"),
        F.round(level + trend, 4).alias("forecast_next"),
    ).orderBy("event_type", "day")


# ---------------------------------------------- Chow structural-break test

CHOW_F_CRIT = 3.0  # ~F(2, n-4) upper 5% for the fixture's n (fixed contract)


@register(
    "ts_chow_structural_break",
    oracle=f"""
    WITH daily AS ({_DAILY_CTE}),
    idx AS (
      SELECT event_type,
             CAST(round(daily_value * 100, 0) AS BIGINT) AS y,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
               AS x,
             CASE WHEN day < DATE '{KS_SPLIT_DAY}' THEN 0 ELSE 1 END AS seg
      FROM daily
    ),
    stats AS (
      SELECT event_type, seg, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(x * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
      FROM idx GROUP BY 1, 2
    ),
    rss AS (
      SELECT event_type, seg, n,
             (CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS DOUBLE)
               - CAST(CAST(n * sxy - sx * sy AS DOUBLE) AS DOUBLE)
                 * CAST(CAST(n * sxy - sx * sy AS DOUBLE) AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
               / CAST(n AS DOUBLE) / 10000.0 AS r,
             CAST(n * sxy - sx * sy AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 AS slope
      FROM stats
    ),
    pooled AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
             sum(x * y) AS sxy, sum(CAST(y AS HUGEINT) * y) AS syy
      FROM idx GROUP BY 1
    ),
    prss AS (
      SELECT event_type, n,
             (CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS DOUBLE)
               - CAST(CAST(n * sxy - sx * sy AS DOUBLE) AS DOUBLE)
                 * CAST(CAST(n * sxy - sx * sy AS DOUBLE) AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
               / CAST(n AS DOUBLE) / 10000.0 AS r
      FROM pooled
    )
    SELECT p.event_type,
           CAST(p.n AS BIGINT) AS n_days,
           round(r0.slope, 4) AS slope_before,
           round(r1.slope, 4) AS slope_after,
           round(((p.r - r0.r - r1.r) / 2)
                 / ((r0.r + r1.r) / (p.n - 4)), 4) AS chow_f,
           ((p.r - r0.r - r1.r) / 2) / ((r0.r + r1.r) / (p.n - 4))
             > {CHOW_F_CRIT} AS break_at_05
    FROM prss p
    JOIN rss r0 ON p.event_type = r0.event_type AND r0.seg = 0
    JOIN rss r1 ON p.event_type = r1.event_type AND r1.seg = 1
    ORDER BY p.event_type
    """,
    tags=("timeseries", "structural-break", "chow-test", "regression"),
)
def ts_chow_structural_break(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chow test for a structural break at a known date (the PSI/KS split
    day): fit OLS trend lines to the before- and after-segments and to the
    pooled series — all three entirely from per-segment sufficient
    statistics (one aggregation pass, the ``ts_linear_trend_daily``
    machinery) — and test whether the two-segment fit explains
    significantly more variance: F = ((RSS_pooled - RSS_1 - RSS_2)/2) /
    ((RSS_1+RSS_2)/(n-4)). Where KS/PSI ask 'did the DISTRIBUTION move',
    Chow asks 'did the TREND LINE break' — the regime-change alarm for
    metrics that drift in slope rather than in level. Per-segment slopes
    ride along so the break's direction is part of the checked output.

    Determinism: daily values are exact cents, so ALL sufficient sums
    accumulate as exact integers and the slope is a ratio of exact-integer
    numerators (n*Sxy - Sx*Sy over n*Sxx - Sx*Sx) — no float cancellation
    before the single IEEE division, because a rational slope CAN land
    exactly on the 4dp rounding grid's midpoint and a float-summed Sxy
    flipped one there (caught by the repeated full-registry sweep, same
    class as the PCA fix). decimal(38,0)/HUGEINT guards the y^2 sums.

    Scale shape: one map-side-combined aggregation to 2 rows per series,
    one to 1 row per series, then literal arithmetic — no windows over raw
    data beyond the day-index ranking, no second pass."""
    daily = _daily_series(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    idx = daily.select(
        "event_type",
        F.round(F.col("daily_value") * 100, 0).cast("bigint").alias("y"),
        F.row_number().over(w).cast("bigint").alias("x"),
        (F.col("day") >= F.lit(KS_SPLIT_DAY).cast("date")).cast("int").alias("seg"),
    ).localCheckpoint()  # feeds the per-segment AND pooled aggregations

    def suff(df, keys):
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast("decimal(20,0)") * F.col("y")).alias("syy"),
        )

    def rss_cols(df):
        sxy_num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        sxx_num = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
        syy_num = (
            F.col("n") * F.col("syy")
            - F.col("sy").cast("decimal(20,0)") * F.col("sy")
        ).cast("double")
        r = (syy_num - sxy_num * sxy_num / sxx_num) / F.col("n").cast(
            "double"
        ) / 10000.0
        return df.withColumn("r", r).withColumn(
            "slope", sxy_num / sxx_num / 100.0
        )

    seg_rss = rss_cols(suff(idx, ["event_type", "seg"]))
    pooled = rss_cols(suff(idx, ["event_type"]))
    r0 = seg_rss.where(F.col("seg") == 0).select(
        "event_type", F.col("r").alias("r0"), F.col("slope").alias("slope_before")
    )
    r1 = seg_rss.where(F.col("seg") == 1).select(
        "event_type", F.col("r").alias("r1"), F.col("slope").alias("slope_after")
    )
    f_stat = ((F.col("r") - F.col("r0") - F.col("r1")) / 2) / (
        (F.col("r0") + F.col("r1")) / (F.col("n") - 4)
    )
    return (
        pooled.join(F.broadcast(r0), "event_type")
        .join(F.broadcast(r1), "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.round("slope_before", 4).alias("slope_before"),
            F.round("slope_after", 4).alias("slope_after"),
            F.round(f_stat, 4).alias("chow_f"),
            (f_stat > CHOW_F_CRIT).alias("break_at_05"),
        )
        .orderBy("event_type")
    )
