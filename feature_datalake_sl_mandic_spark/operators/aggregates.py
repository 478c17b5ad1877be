"""Aggregation family: rollup/cube/grouping sets, distinct aggs, statistics,
exact percentiles, conditional aggregation, approximate sketches.

The reference's entire aggregation surface is one MAX…GROUP BY outsourced to
BigQuery plus df.count() (SURVEY.md §2.1 S4/S7). Everything here is
partial-aggregatable (map-side combine), so shuffles carry O(groups) rows.
Approximate sketches (HLL, approx quantiles) are engine-specific by design —
they get rows-only driver checks (no oracle) while their exact counterparts
are oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_datalake_sl_mandic_spark.catalog import load_tables
from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


@register(
    "agg_rollup_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, 'ALL')   AS status,
           coalesce(o_orderpriority, 'ALL') AS priority,
           grouping(o_orderstatus)          AS g_status,
           grouping(o_orderpriority)        AS g_priority,
           count(*)                         AS n,
           round(sum(o_totalprice), 2)      AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY g_status, g_priority, status, priority
    """,
    tags=("groupby-agg", "rollup", "grouping"),
)
def agg_rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy with GROUPING() disambiguation of the NULL rows."""
    (od,) = _t(spark, sf_dir, "orders")
    return (
        od.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
            F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
            "total",
        )
        .orderBy("g_status", "g_priority", "status", "priority")
    )


@register(
    "agg_cube_lineitem",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           grouping(l_returnflag) AS g_rf,
           grouping(l_linestatus) AS g_ls,
           count(*) AS n,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, returnflag, linestatus
    """,
    tags=("groupby-agg", "cube", "grouping"),
)
def agg_cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions — all 2^2 grouping combinations in one pass."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "g_rf",
            "g_ls",
            "n",
            "qty",
        )
        .orderBy("g_rf", "g_ls", "returnflag", "linestatus")
    )


@register(
    "agg_grouping_sets_events",
    oracle="""
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(CAST(user_id % 10 AS VARCHAR), 'ALL') AS user_bucket,
           count(*) AS n,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    ORDER BY etype, user_bucket
    """,
    tags=("groupby-agg", "grouping-sets"),
)
def agg_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (via spark.sql — the SQL surface over the same
    catalog the DataFrame API sees)."""
    load_tables(spark, sf_dir, names=["events"])
    return spark.sql(
        """
        SELECT coalesce(event_type, 'ALL') AS etype,
               coalesce(CAST(user_id % 10 AS STRING), 'ALL') AS user_bucket,
               count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY etype, user_bucket
        """
    )


@register(
    "agg_distinct_suppliers",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(DISTINCT l_partkey) AS n_parts,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("groupby-agg", "distinct-agg"),
)
def agg_distinct_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one aggregate (Spark expands + re-aggregates)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_stats_acctbal",
    oracle="""
    SELECT c_mktsegment,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(stddev_samp(c_acctbal), 4) AS std_bal,
           round(var_samp(c_acctbal), 4) AS var_bal,
           round(quantile_cont(c_acctbal, 0.5)::DOUBLE, 4) AS median_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("groupby-agg", "statistics", "percentile"),
)
def agg_stats_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median."""
    (cu,) = _t(spark, sf_dir, "customer")
    return (
        cu.groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
            F.round(F.var_samp("c_acctbal"), 4).alias("var_bal"),
            F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("median_bal"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "agg_conditional_pivot",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) FILTER (WHERE o.o_orderstatus = 'O') AS open_orders,
           count(*) FILTER (WHERE o.o_orderstatus = 'F') AS finished_orders,
           count(*) FILTER (WHERE o.o_orderstatus = 'P') AS pending_orders,
           round(sum(o.o_totalprice) FILTER (WHERE o.o_orderpriority = '1-URGENT'), 2)
             AS urgent_total
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY nation
    """,
    tags=("groupby-agg", "conditional-agg", "pivot"),
)
def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot): count/sum FILTER equivalents
    via sum(when(...)) — one pass, no multi-query pivot."""
    od, cu, na = _t(spark, sf_dir, "orders", "customer", "nation")
    st = F.col("o_orderstatus")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.when(st == "O", 1)).alias("open_orders"),
            F.count(F.when(st == "F", 1)).alias("finished_orders"),
            F.count(F.when(st == "P", 1)).alias("pending_orders"),
            F.round(
                F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))),
                2,
            ).alias("urgent_total"),
        )
        .orderBy("nation")
    )


@register(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS approx_suppliers_ok,
           TRUE AS approx_orders_ok,
           TRUE AS p50_price_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("groupby-agg", "approx", "sketch"),
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates (HLL++ distinct, approx quantiles): the sketch
    path a 100 TB profile job would take instead of exact distincts.

    Sketch internals are engine-specific, so the driver-checkable contract is
    an ERROR-BAND one: exact distinct counts (value-compared against the
    oracle) plus booleans asserting each Spark sketch lands within its
    documented error bound of the exact answer (HLL++ rsd=0.02 checked at
    ±5%; approx_percentile vs exact percentile at ±5%). The oracle emits TRUE
    for the bands — both engines agree exactly when the sketches behave.
    Raw sketch values stay under pytest (tests/test_aggregates.py).

    Plan shape (round 11): the exact DISTINCT aggregates and the sketch
    aggregates run as TWO branches joined on the 3-row group key, not one
    agg. Mixing them forced RewriteDistinctAggregates' Expand (x3 rows)
    around TypedImperativeAggregate buffers (HLL / percentile), whose
    serialized buffers then ride every Expand slot through the two-level
    merge — measured 19-33 s at sf0.1 under the noop sink vs <=1.6 s for
    either branch alone (bench's count() had pruned the agg columns and
    hidden it). Split: distinct branch stays a pure codegen HashAggregate,
    sketch branch is a single-pass ObjectHashAggregate, and the join is a
    broadcast of a low-cardinality-bounded relation (|l_returnflag| = 3).
    13x at sf0.1 (33 -> 2.5 s noop); at 100 TB the Expand-tripled shuffle
    of percentile buffers is gone outright. Output identical (driver hash
    + oracle unchanged)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    exact = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("exact_suppliers"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("_approx_supp"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_approx_ord"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("_p50_approx"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("_p50_exact"),
    )
    agg = exact.join(F.broadcast(sketches), "l_returnflag")

    def _within(approx, exact, tol):  # |approx - exact| <= tol * exact
        return F.abs(F.col(approx) - F.col(exact)) <= F.lit(tol) * F.col(exact)

    return agg.select(
        "l_returnflag",
        "exact_suppliers",
        "exact_orders",
        _within("_approx_supp", "exact_suppliers", 0.05).alias("approx_suppliers_ok"),
        _within("_approx_ord", "exact_orders", 0.05).alias("approx_orders_ok"),
        _within("_p50_approx", "_p50_exact", 0.05).alias("p50_price_ok"),
    ).orderBy("l_returnflag")


@register(
    "agg_unpivot_nation_metrics",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n FROM customer GROUP BY 1),
    sn AS (SELECT s_nationkey AS nk, count(*) AS n FROM supplier GROUP BY 1),
    wide AS (
      SELECT n.n_name AS nation,
             CAST(coalesce(cn.n, 0) AS BIGINT) AS customers,
             CAST(coalesce(sn.n, 0) AS BIGINT) AS suppliers
      FROM nation n
      LEFT JOIN cn ON cn.nk = n.n_nationkey
      LEFT JOIN sn ON sn.nk = n.n_nationkey
    )
    SELECT nation, metric, value FROM (
      SELECT nation, 'customers' AS metric, customers AS value FROM wide
      UNION ALL
      SELECT nation, 'suppliers' AS metric, suppliers AS value FROM wide
    )
    ORDER BY nation, metric
    """,
    tags=("unpivot", "stack", "groupby-agg", "set-ops"),
)
def agg_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot via the ``stack`` generator: per-nation entity
    counts computed once, then melted to (nation, metric, value) rows in a
    single projection — the inverse of pivot, without re-scanning the wide
    table once per metric as a UNION ALL plan would.

    Each fact side pre-aggregates to one row per nation BEFORE the join:
    joining raw customers x suppliers per nation first would fan out to their
    cross product (the classic multi-fact trap at scale). The per-nation
    counts then broadcast onto the 25-row nation dim."""
    na, cu, su = _t(spark, sf_dir, "nation", "customer", "supplier")
    cn = cu.groupBy(F.col("c_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("cn"))
    sn = su.groupBy(F.col("s_nationkey").alias("nk")).agg(F.count(F.lit(1)).alias("sn"))
    wide = (
        na.join(cn, cn.nk == na.n_nationkey, "left")
        .join(sn, sn.nk == na.n_nationkey, "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("cn", F.lit(0)).alias("customers"),
            F.coalesce("sn", F.lit(0)).alias("suppliers"),
        )
    )
    return wide.select(
        "nation",
        F.expr(
            "stack(2, 'customers', customers, 'suppliers', suppliers)"
        ).alias("metric", "value"),
    ).orderBy("nation", "metric")


HIST_LO, HIST_HI, HIST_BUCKETS = 0.0, 600000.0, 12


@register(
    "agg_histogram_order_value",
    oracle=f"""
    WITH b AS (
      SELECT CAST(least(floor((o_totalprice - {HIST_LO})
                        / (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS})),
                   {HIST_BUCKETS - 1}) AS BIGINT) AS bucket
      FROM orders
    )
    SELECT bucket,
           round(bucket * (({HIST_HI} - {HIST_LO}) / {HIST_BUCKETS}), 2) AS lo_edge,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS pct
    FROM b GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("groupby-agg", "histogram", "bucketing"),
)
def agg_histogram_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound equi-width histogram: bucket index from identical floor
    arithmetic on both engines (portable width_bucket), share-of-total via a
    window over the aggregate. One partial-aggregated shuffle of bucket ids —
    the profiling primitive that stays O(buckets) at any corpus size."""
    (od,) = _t(spark, sf_dir, "orders")
    step = (HIST_HI - HIST_LO) / HIST_BUCKETS
    bucket = F.least(
        F.floor((F.col("o_totalprice") - HIST_LO) / step),
        F.lit(HIST_BUCKETS - 1),
    ).cast("bigint")
    counts = (
        od.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
        # ^ bounded bucket relation feeding the total AND the share join —
        # pinned so the orders scan runs once, not per branch
    )
    # Share-of-total via a broadcast 1-row total instead of an unpartitioned
    # window: the window form funnels the (already tiny) aggregate through a
    # single-partition WindowExec; the broadcast form keeps every stage
    # partition-parallel and AQE reuses the counts exchange for the total.
    total = counts.agg(F.sum("n").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "bucket",
            F.round(F.col("bucket") * step, 2).alias("lo_edge"),
            "n",
            F.round(F.col("n") * 100.0 / F.col("tot"), 4).alias("pct"),
        )
        .orderBy("bucket")
    )


@register(
    "agg_winsorized_event_values",
    oracle="""
    WITH st AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           round(st.p05, 4) AS p05,
           round(st.p95, 4) AS p95,
           round(CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 4) AS mean_raw,
           round(CAST(sum(CAST(least(greatest(e.value, st.p05), st.p95)
                               AS DECIMAL(38,6))) AS DOUBLE)
                 / count(*), 4) AS mean_winsorized
    FROM events e JOIN st USING (event_type)
    GROUP BY e.event_type, st.p05, st.p95
    ORDER BY e.event_type
    """,
    tags=("robust-stats", "exact-percentile", "winsorize", "groupby-agg"),
)
def agg_winsorized_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-group means: clamp each value to its group's exact
    [p5, p95] band, then compare raw vs robust means — outlier-resistant
    metrics over noisy event values.

    Spark's exact `percentile` and DuckDB's `quantile_cont` share the
    (n-1)*p linear-interpolation definition and agree bit-for-bit (probed),
    so the clamp thresholds are hash-checkable with no rounding slack. The
    per-group thresholds are a |groups|-row relation broadcast back into the
    scan; means accumulate as DECIMAL so summation order can't drift. Two
    passes over events — at 100 TB the percentile pass can swap to
    approx_percentile without changing the plan shape.
    """
    (ev,) = _t(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p95"))
    n = F.count(F.lit(1))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "p05", "p95")
        .agg(
            n.alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,6)")).cast("double") / n, 4
            ).alias("mean_raw"),
            F.round(
                F.sum(clamped.cast("decimal(38,6)")).cast("double") / n, 4
            ).alias("mean_winsorized"),
        )
        .select(
            "event_type",
            "n",
            F.round("p05", 4).alias("p05"),
            F.round("p95", 4).alias("p95"),
            "mean_raw",
            "mean_winsorized",
        )
        .orderBy("event_type")
    )


@register(
    "agg_exact_mode_priority",
    oracle="""
    WITH counts AS (
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY 1, 2
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY o_orderstatus
                                   ORDER BY n DESC, o_orderpriority) AS rn
      FROM counts
    )
    SELECT o_orderstatus,
           o_orderpriority AS mode_priority,
           n AS mode_count,
           CAST((SELECT sum(n) FROM counts c
                 WHERE c.o_orderstatus = r.o_orderstatus) AS BIGINT)
             AS group_total
    FROM ranked r WHERE rn = 1
    ORDER BY o_orderstatus
    """,
    tags=("aggregation", "mode", "argmax", "deterministic-ties"),
)
def agg_exact_mode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group mode with a DETERMINISTIC tie-break (highest count,
    then lexicographically-first value) — the reproducibility contract
    Spark's built-in ``mode()`` explicitly does not make for ties, which is
    why pipelines that feed downstream joins re-derive it this way. Two
    map-side-combined aggregations: value counts, then argmax-by-struct per
    group (count descending encoded by negation, value ascending) — no
    per-group window over raw rows.

    Scale shape: first groupBy collapses to |status x priority| cells before
    any shuffle; the argmax is ``min(struct(-n, value))`` over those cells."""
    (orders,) = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    best = F.min(
        F.struct((-F.col("n")).alias("neg_n"), F.col("o_orderpriority").alias("v"))
    )
    return (
        counts.groupBy("o_orderstatus")
        .agg(
            best.getField("v").alias("mode_priority"),
            (-best.getField("neg_n")).alias("mode_count"),
            F.sum("n").alias("group_total"),
        )
        .orderBy("o_orderstatus")
    )


# ------------------------------------------------ Pareto / ABC classification

ABC_A_CUT = 0.80  # cumulative revenue share boundaries
ABC_B_CUT = 0.95
_ABC_BUCKET = 50_000  # revenue band width for the two-level prefix sum


@register(
    "customers_pareto_abc",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,2))) AS revenue
      FROM orders GROUP BY o_custkey
    ),
    tot AS (SELECT sum(revenue) AS total FROM rev),
    cum AS (
      SELECT o_custkey, revenue,
             sum(revenue) OVER (ORDER BY revenue DESC, o_custkey
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS cum_rev
      FROM rev
    ),
    classed AS (
      SELECT c.o_custkey, c.revenue,
             CASE WHEN c.cum_rev / t.total <= {ABC_A_CUT} THEN 'A'
                  WHEN c.cum_rev / t.total <= {ABC_B_CUT} THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM cum c CROSS JOIN tot
      t
    )
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(round(sum(revenue), 2) AS DOUBLE) AS class_revenue,
           round(CAST(sum(revenue) AS DOUBLE)
                 / CAST((SELECT total FROM tot) AS DOUBLE), 4) AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
    tags=("aggregation", "pareto", "abc-analysis", "prefix-sum"),
)
def customers_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC customer classification: rank customers by total
    revenue, split at 80% / 95% cumulative share — the classic
    concentration analysis behind tiered service levels and the actionable
    twin of ``stats_gini_order_values`` (Gini says HOW concentrated, ABC
    says WHO the A-tier is). Revenue accumulates in DECIMAL so the
    cumulative sums (and therefore the class boundaries) are exact and
    engine-identical — no float prefix sum deciding a tier.

    Scale shape: NO global window. The descending revenue order splits
    into revenue-range bands; within each band a partitioned window
    computes local prefix sums, and the per-band totals (a <=|bands|-row
    relation) contribute each band's offset via a bounded self-join — the
    same two-level prefix-sum that ``corpus_pack_shards`` uses to avoid
    serializing a corpus through one task. The oracle states the semantics
    as the plain global-window formulation; equality proves the
    decomposition exact."""
    (od,) = _t(spark, sf_dir, "orders")
    rev = (
        od.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,2)")).alias("revenue"))
        .withColumn(
            "band",
            F.least(
                F.floor(F.col("revenue") / _ABC_BUCKET).cast("bigint"), F.lit(50)
            ),
        )
        .localCheckpoint()  # feeds band totals, local windows, and the total
    )
    tot = rev.agg(F.sum("revenue").alias("total"))
    band_tot = rev.groupBy("band").agg(F.sum("revenue").alias("band_rev"))
    ba, bb = band_tot.alias("ba"), band_tot.alias("bb")
    # offset of a band = total revenue of all HIGHER bands (they sort first
    # in descending revenue order); bounded self-join over <=51 rows
    offsets = (
        ba.join(F.broadcast(bb), F.col("bb.band") > F.col("ba.band"), "left")
        .groupBy(F.col("ba.band").alias("band"))
        .agg(
            F.coalesce(F.sum("bb.band_rev"), F.lit(0).cast("decimal(38,2)")).alias(
                "offset"
            )
        )
    )
    w_in = (
        Window.partitionBy("band")
        .orderBy(F.col("revenue").desc(), F.col("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        rev.join(F.broadcast(offsets), "band")
        .withColumn("cum_rev", F.col("offset") + F.sum("revenue").over(w_in))
        .crossJoin(F.broadcast(tot))
    )
    share = F.col("cum_rev") / F.col("total")
    classed = cum.select(
        "revenue",
        F.when(share <= ABC_A_CUT, "A")
        .when(share <= ABC_B_CUT, "B")
        .otherwise("C")
        .alias("abc_class"),
        "total",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("revenue"), 2).cast("double").alias("class_revenue"),
            F.round(
                (F.sum("revenue") / F.first("total")).cast("double"), 4
            ).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


# ------------------------------------------------ exact weighted median


# price band width for the two-level prefix sum (l_extendedprice spans
# roughly [900, 110k] -> ~55 populated bands, capped at 61)
_WMED_BUCKET = 2_000

@register(
    "agg_weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag,
             l_extendedprice AS price,
             CAST(l_quantity AS BIGINT) AS wt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, price, wt,
             sum(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY price, l_orderkey, l_linenumber
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cw,
             sum(wt) OVER (PARTITION BY l_returnflag) AS tw
      FROM w
    ),
    med AS (
      SELECT l_returnflag, price, cw, tw,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY cw, price) AS rn
      FROM cum WHERE 2 * cw >= tw
    )
    SELECT l_returnflag,
           CAST(tw AS BIGINT) AS total_weight,
           round(price, 2) AS weighted_median_price
    FROM med WHERE rn = 1
    ORDER BY l_returnflag
    """,
    tags=("aggregation", "weighted-median", "order-statistics", "window"),
)
def agg_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median: the price at which half the total QUANTITY
    (not half the rows) sits on either side — the order statistic a pricing
    or inventory analysis actually wants when line items carry different
    volumes, and one Spark has no built-in for (``percentile`` is
    row-weighted). All comparisons are exact integers (quantities) and the
    median is a DATA value, not an interpolation — nothing rounds before
    selection, so the result is engine-exact by construction.

    Scale shape: the two-level banded prefix sum of ``customers_pareto_abc``
    — l_returnflag has only 3 distinct values, so a raw-data cumulative
    window partitioned on it would funnel a third of the fact table through
    one task. Instead the fact table only pays a map-side-combinable
    groupBy on (flag, price-band); the bounded band-totals relation
    (3 x <=61 rows) locates the ONE band per group whose cumulative weight
    crosses half the total, and only THAT band's rows (~1/bands of the
    group) flow through the ordered scan, entering with the exact integer
    weight offset of all lower bands. The oracle states the semantics as
    the plain partitioned-window formulation; hash equality proves the
    decomposition exact."""
    (li,) = _t(spark, sf_dir, "lineitem")
    w = (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").cast("bigint").alias("wt"),
            "l_orderkey",
            "l_linenumber",
        )
        .withColumn(
            "band",
            F.least(
                F.floor(F.col("price") / _WMED_BUCKET).cast("bigint"), F.lit(60)
            ),
        )
        .localCheckpoint()  # feeds the band totals AND the median-band scan
    )
    band_tot = w.groupBy("l_returnflag", "band").agg(F.sum("wt").alias("band_wt"))
    ba, bb = band_tot.alias("ba"), band_tot.alias("bb")
    # offset of a band = total weight of all LOWER price bands; bounded
    # self-join over 3 x <=61 rows
    offsets = (
        ba.join(
            F.broadcast(bb),
            (F.col("bb.l_returnflag") == F.col("ba.l_returnflag"))
            & (F.col("bb.band") < F.col("ba.band")),
            "left",
        )
        .groupBy(
            F.col("ba.l_returnflag").alias("l_returnflag"),
            F.col("ba.band").alias("band"),
            F.col("ba.band_wt").alias("band_wt"),
        )
        .agg(F.coalesce(F.sum("bb.band_wt"), F.lit(0)).alias("offset"))
    )
    tw = band_tot.groupBy("l_returnflag").agg(F.sum("band_wt").alias("tw"))
    # the unique band whose cumulative weight crosses tw/2: weight before it
    # is strictly under half, weight through it reaches half
    med_band = (
        offsets.join(F.broadcast(tw), "l_returnflag")
        .where(
            (2 * F.col("offset") < F.col("tw"))
            & (2 * (F.col("offset") + F.col("band_wt")) >= F.col("tw"))
        )
        .select("l_returnflag", "band", "offset", "tw")
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("price", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = w.join(F.broadcast(med_band), ["l_returnflag", "band"]).select(
        "l_returnflag",
        "price",
        (F.col("offset") + F.sum("wt").over(w_cum)).alias("cw"),
        "tw",
    )
    w_pick = Window.partitionBy("l_returnflag").orderBy("cw", "price")
    return (
        cum.where(2 * F.col("cw") >= F.col("tw"))
        .withColumn("rn", F.row_number().over(w_pick))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("tw").alias("total_weight"),
            F.round("price", 2).alias("weighted_median_price"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------------ cohort LTV curves

LTV_HORIZONS = 3  # months after the cohort month (k = 0..3)


@register(
    "customers_cohort_ltv",
    oracle=f"""
    WITH first_order AS (
      SELECT o_custkey,
             min(date_trunc('month', CAST(o_orderdate AS DATE))) AS cohort_m
      FROM orders GROUP BY o_custkey
    ),
    cohort_sz AS (
      SELECT cohort_m, count(*) AS cohort_customers
      FROM first_order GROUP BY cohort_m
    ),
    rev AS (
      SELECT f.cohort_m,
             datediff('month', f.cohort_m,
                      date_trunc('month', CAST(o.o_orderdate AS DATE))) AS offs,
             CAST(o.o_totalprice AS DECIMAL(38,2)) AS price
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
    ),
    expanded AS (
      SELECT r.cohort_m, t.k, r.price
      FROM rev r CROSS JOIN range(0, {LTV_HORIZONS + 1}) t(k)
      WHERE r.offs <= t.k
    )
    SELECT strftime(e.cohort_m, '%Y-%m') AS cohort_month,
           CAST(e.k AS BIGINT) AS months_out,
           CAST(s.cohort_customers AS BIGINT) AS cohort_customers,
           CAST(round(sum(e.price), 2) AS DOUBLE) AS total_revenue,
           round(CAST(sum(e.price) AS DOUBLE) / s.cohort_customers, 2)
             AS avg_ltv
    FROM expanded e JOIN cohort_sz s USING (cohort_m)
    GROUP BY e.cohort_m, e.k, s.cohort_customers
    ORDER BY cohort_month, months_out
    """,
    tags=("aggregation", "cohort", "ltv", "explode-contribution"),
)
def customers_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers cohorted by first-order
    month; for each horizon k = 0..{LTV_HORIZONS} months, the cohort's
    cumulative revenue and average LTV per customer — the revenue twin of
    ``events_cohort_retention`` (retention counts WHO came back, LTV counts
    WHAT they spent), and the curve a growth model calibrates payback
    windows against. Denominators are FULL cohort sizes, so customers who
    never re-ordered correctly drag the average (survivor bias is the
    classic LTV mistake). Revenue accumulates in DECIMAL; the average is a
    single division of exact totals.

    Scale shape: the horizon expansion is the explode-contribution rewrite
    (each order row contributes to every horizon it belongs to, then ONE
    map-side-combined aggregation on (cohort, k)) — no per-horizon rescan,
    no window over raw orders; cohort sizes are a bounded relation joined
    back by broadcast."""
    (od,) = _t(spark, sf_dir, "orders")
    # customer-grain relation feeds the cohort sizes AND the revenue join —
    # pin so the orders scan + first-order aggregation runs once, not twice
    first_order = (
        od.groupBy("o_custkey")
        .agg(F.date_trunc("month", F.min(F.to_date("o_orderdate"))).alias("cohort_m"))
        .localCheckpoint(eager=False)
    )
    cohort_sz = first_order.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    rev = od.join(first_order, "o_custkey").select(
        "cohort_m",
        F.months_between(
            F.date_trunc("month", F.to_date("o_orderdate")), F.col("cohort_m")
        )
        .cast("bigint")
        .alias("offs"),
        F.col("o_totalprice").cast("decimal(38,2)").alias("price"),
    )
    ks = F.array(*[F.lit(k) for k in range(LTV_HORIZONS + 1)])
    expanded = (
        rev.select("cohort_m", "offs", "price", F.explode(ks).alias("k"))
        .where(F.col("offs") <= F.col("k"))
    )
    return (
        expanded.groupBy("cohort_m", "k")
        .agg(F.sum("price").alias("total"))
        .join(F.broadcast(cohort_sz), "cohort_m")
        .select(
            F.date_format("cohort_m", "yyyy-MM").alias("cohort_month"),
            F.col("k").cast("bigint").alias("months_out"),
            F.col("cohort_customers").cast("bigint").alias("cohort_customers"),
            F.round(F.col("total"), 2).cast("double").alias("total_revenue"),
            F.round(
                F.col("total").cast("double") / F.col("cohort_customers"), 2
            ).alias("avg_ltv"),
        )
        .orderBy("cohort_month", "months_out")
    )
