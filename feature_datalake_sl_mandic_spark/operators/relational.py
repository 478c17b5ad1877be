"""Relational core: scan -> filter -> project -> aggregate -> sort pipelines.

These are the engine's flagship analytics queries (TPC-H-shaped, adapted to
the fixture schemas in FIXTURES.md §1). The reference outsources all of this
to BigQuery (SURVEY.md §2.1 S4 is its only aggregation); here each is a
declarative DataFrame plan so Catalyst performs predicate pushdown, column
pruning, partial aggregation and AQE re-planning automatically (SURVEY.md §4).

Scale notes (100 TB design point):
- groupBy on low-cardinality keys => partial (map-side) aggregation shrinks
  shuffle to |groups| x partitions rows; safe at any input size.
- filters/projections are pushed into the parquet scan (verified in
  tests/test_plans.py via PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.catalog import load_table
from feature_datalake_sl_mandic_spark.registry import register


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      round(sum(l_quantity), 2)                                        AS sum_qty,
      round(sum(l_extendedprice), 2)                                   AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_charge,
      round(avg(l_quantity), 4)                                        AS avg_qty,
      round(avg(l_extendedprice), 4)                                   AS avg_price,
      round(avg(l_discount), 6)                                        AS avg_disc,
      count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("scan", "filter", "groupby-agg", "sort"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary (TPC-H Q1 shape): wide aggregate over filtered scan.

    Single shuffle on a 6-ish-key groupBy; partial aggregation makes the
    shuffle O(groups), so the plan is scan-bound at any scale.
    """
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            # per-row double product -> DECIMAL accumulation -> DECIMAL round:
            # order-independent and .005-boundary-exact vs the oracle
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice")
                        * (1 - F.col("l_discount"))
                        * (1 + F.col("l_tax"))
                    ).cast("decimal(38,6)")
                ),
                2,
            )
            .cast("double")
            .alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
      l.l_orderkey,
      CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
      strftime(o.o_orderdate, '%Y-%m-%d')                   AS orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 20
    """,
    tags=("join", "broadcast-join", "groupby-agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): dim⋈fact⋈fact + top-k.

    customer (filtered) broadcasts into orders, which then joins lineitem on
    the shuffle key l_orderkey; final TakeOrderedAndProject avoids a global
    sort. At 100 TB the only full shuffle is orders⋈lineitem on orderkey.
    """
    cu, od, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
        .join(
            od.where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            cu.where(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
    tags=("join", "multi-join", "broadcast-join", "groupby-agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way star join.

    region/nation/supplier/customer are dims → all broadcast; the only
    shuffle joins are on the fact keys. Catalyst + AQE pick broadcast-hash
    for every dim side under the 64 MB threshold.
    """
    cu, od, li, su, na, re = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        li.join(
            od.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            su,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(re.where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year,
           -- per-row double product, DECIMAL accumulation, DECIMAL rounding:
           -- order-independent and boundary-exact on both engines (prices
           -- land on exact .x05 sums; rounding through a double would flip)
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "multi-join", "groupby-agg", "self-dim-join"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): nation-pair trade flows — the nation
    dim joins TWICE (supplier side and customer side), both broadcast."""
    su, li, od, cu, na = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = na.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = na.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
           n.n_name AS nation,
           round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "groupby-agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): who returned the most
    revenue — fact⋈fact shuffle on orderkey, dims broadcast, top-k finish."""
    cu, od, li, na = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(
            od.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"), "c_acctbal")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "nation",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    tags=("join", "semi-join", "exists-subquery", "groupby-agg"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (TPC-H Q4 shape): EXISTS as a LEFT SEMI join
    with an extra theta condition — lineitem contributes existence only."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    filtered = od.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return (
        filtered.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT
      CAST(round(sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END), 2) AS DOUBLE) AS promo_revenue,
      CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE)
        AS total_revenue,
      round(CAST(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END)
            / sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
            AS DOUBLE), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("join", "broadcast-join", "conditional-agg", "global-agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): global conditional aggregate over
    a fact⋈broadcast-dim join; DECIMAL accumulation keeps the ratio exact."""
    li, pt = _t(spark, sf_dir, "lineitem", "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo), 2).cast("double").alias("promo_revenue"),
            F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
            F.round(
                (F.lit(100.0) * F.sum(promo) / F.sum(rev)).cast("double"), 6
            ).alias("promo_pct"),
        )
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 2) AS totalprice,
           round(sum(l.l_quantity), 2) AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING sum(l.l_quantity) > 150
    ORDER BY totalprice DESC, o_orderkey
    LIMIT 50
    """,
    tags=("join", "groupby-agg", "having", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): HAVING over a grouped join
    (post-aggregation filter — Catalyst runs it after the final aggregate,
    so the shuffle still carries only partial sums)."""
    cu, od, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .where(F.col("total_qty") > 150)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_type = 'ECONOMY' AND l.l_discount < 0.03)
    """,
    tags=("join", "disjunctive-predicate", "global-agg"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): OR-of-ANDs predicate across both
    join sides — planned as a single join with a residual disjunction, not a
    union of three joins."""
    li, pt = _t(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | ((F.col("p_type") == "ECONOMY") & (F.col("l_discount") < 0.03))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    return (
        li.join(pt, F.col("p_partkey") == F.col("l_partkey"))
        .where(cond)
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit", "topk"),
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, never a full sort."""
    (od,) = _t(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice")
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "set_ops_nations",
    oracle="""
    WITH cust_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'both' AS src FROM (SELECT * FROM cust_n INTERSECT SELECT * FROM supp_n)
    UNION ALL
    SELECT nationkey, 'cust_only' AS src FROM (SELECT * FROM cust_n EXCEPT SELECT * FROM supp_n)
    ORDER BY src, nationkey
    """,
    tags=("set-ops", "distinct"),
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over distinct key sets."""
    cu, su = _t(spark, sf_dir, "customer", "supplier")
    cust_n = cu.select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_n = su.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = cust_n.intersect(supp_n).withColumn("src", F.lit("both"))
    cust_only = cust_n.exceptAll(supp_n).withColumn("src", F.lit("cust_only"))
    return both.unionAll(cust_only).select("nationkey", "src").orderBy("src", "nationkey")


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(round(CAST(sum(CAST(l_extendedprice * l_discount
                                    AS DECIMAL(38,6))) AS DECIMAL(38,6)), 2)
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("scan", "filter", "global-agg", "pushdown"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global aggregate, zero joins — the pushdown
    showcase. All four predicates reach the parquet scan as PushedFilters and
    the ReadSchema is 4 columns of 11, so at 100 TB the job reads only the
    row groups whose min/max stats survive the date range. Revenue goes
    through DECIMAL(38,6) per the engine-parity discipline (2-decimal price x
    discount products are exact there, so the global sum is
    order-independent)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(38,6)"))
            .cast("decimal(38,6)"),
            2,
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "left-outer-join", "groupby-agg", "distribution"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (priority filter standing in for the comment LIKE):
    the distribution-of-a-distribution — LEFT OUTER join keeps zero-order
    customers (count(o_orderkey) counts only matches, so they land in the
    c_count=0 bucket), then a second tiny aggregation over O(distinct counts)
    groups. Two shuffles: one on custkey, one on the bounded count key."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cu.join(
            od.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(38,6)))
                           AS DECIMAL(38,6)) / 7.0, 2) AS DOUBLE)
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_threshold
    """,
    tags=("join", "correlated-subquery", "window-decorrelation", "global-agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders. The correlated
    per-part average decorrelates into a WINDOW over partkey rather than an
    aggregate + join-back: one lineitem scan, one shuffle on partkey, and
    every line compares against its part's average in the same pass (the
    join-back form scans the brand-pruned fact twice — once to aggregate,
    once to probe). A per-part window partition is a handful of lines at
    any scale (partkey cardinality grows with the corpus), so nothing
    funnels. The brand semi-join broadcasts and prunes ~96% of lineitem
    BEFORE the shuffle; DECIMAL accumulation keeps the /7 division
    engine-exact, and the per-part avg is exact decimal division on both
    engines (quantities are decimals)."""
    li, pt = _t(spark, sf_dir, "lineitem", "part")
    brand_parts = pt.where(F.col("p_brand") == "Brand#1").select("p_partkey")
    # semi-join first: the per-part average only matters for Brand#1 parts
    # (~1/25 of them), so don't aggregate the other 96% of lineitem
    li_brand = li.join(
        F.broadcast(brand_parts),
        F.col("p_partkey") == F.col("l_partkey"),
        "left_semi",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey")
    return (
        li_brand.withColumn(
            "qty_threshold", F.avg("l_quantity").over(w) * 0.2
        )
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                .cast("decimal(38,6)")
                / 7.0,
                2,
            )
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q21_sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
    ),
    all_supp AS (
      SELECT l_orderkey, l_suppkey FROM lineitem
    )
    SELECT s.s_name,
           CAST(count(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_supp a
        WHERE a.l_orderkey = l1.l_orderkey AND a.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    tags=("join", "exists-subquery", "decorrelated-conditional-agg", "groupby-agg"),
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness = shipped >90 days after order date, since
    the fixture has no receipt/commit dates): suppliers who were the ONLY
    late supplier on a multi-supplier order. The EXISTS / NOT EXISTS pair
    collapses to per-order conditional aggregation over ONE lineitem scan:
    an order qualifies iff it has >=2 distinct suppliers and exactly 1
    distinct late supplier, and that late supplier is max(late suppkey)
    (well-defined because there is exactly one). Both aggregations —
    (orderkey, suppkey) pair dedup, then per-order counts — group on a
    superset/prefix of the li⋈od join's orderkey partitioning, so
    EnsureRequirements adds NO exchange for either; the whole query
    shuffles lineitem's 3 key columns once (was 3 lineitem scans + two
    exists-chain joins shuffling the pair relation twice more)."""
    li, od, su = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    flagged = (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
    )
    pair = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    per_order = pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("late").cast("int")).alias("n_late"),
        F.max(F.when(F.col("late"), F.col("l_suppkey"))).alias("late_supp"),
    )
    qualifying = per_order.where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    return (
        qualifying.join(F.broadcast(su), F.col("s_suppkey") == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
               AS volume,
             n.n_name AS nation
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_2' THEN volume
                               ELSE 0 END) AS DOUBLE)
                 / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM rev
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "multi-join", "conditional-agg", "market-share", "groupby-agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue per year. The
    share is a conditional sum over the SAME grouped pass (numerator and
    denominator in one aggregate — no second scan, no self-join); volumes
    accumulate as DECIMAL so the division is engine-exact. Region filter
    prunes through the broadcast nation⋈region dims before the fact shuffle."""
    li, od, cu, na, re = _t(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region"
    )
    # dims first: customer⋈nation⋈region-ASIA broadcasts prune ~80% of
    # customers BEFORE the expensive fact shuffles (li⋈od then ⋈cust)
    cust_asia = (
        cu.join(F.broadcast(na), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(
            F.broadcast(re.where(F.col("r_name") == "ASIA")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("c_custkey", "n_name")
    )
    rev = (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust_asia, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(38,6)")
            .alias("volume"),
            F.col("n_name").alias("nation"),
        )
    )
    return (
        rev.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(
                        F.lit(0).cast("decimal(38,6)")
                    )
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .select(F.col("o_year").cast("bigint").alias("o_year"), "mkt_share")
        .orderBy("o_year")
    )


@register(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_size IN (1, 5, 9, 13, 17)
    GROUP BY p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_type, p.p_size
    """,
    tags=("join", "distinct-agg", "groupby-agg", "anti-predicate"),
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier diversity per part class, lineitem standing
    in for partsupp which the fixture lacks): COUNT(DISTINCT supplier) after
    a fact join. The distinct-aggregate expands once on (type, size, suppkey)
    then counts — two shuffles total; the negative brand predicate and the
    IN-list both push to the part scan."""
    pt, li = _t(spark, sf_dir, "part", "lineitem")
    return (
        pt.where(
            (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13, 17)
        )
        .join(li, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_type", "p_size")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT round(s.s_acctbal, 2) AS acctbal, s.s_name, n.n_name AS nation,
           p.p_partkey, p.p_type, round(c.unit_cost, 4) AS unit_cost
    FROM part p
    JOIN cost c     ON c.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE p.p_size = 5 AND r.r_name = 'ASIA'
      AND c.unit_cost = (
        SELECT min(c2.unit_cost)
        FROM cost c2
        JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
        JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
        WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'ASIA'
      )
    ORDER BY acctbal DESC, nation, s.s_name, p.p_partkey
    LIMIT 100
    """,
    tags=("join", "correlated-subquery", "min-cost", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part in a region (TPC-H Q2 shape; lineitem's
    min unit price stands in for partsupp.ps_supplycost, which the fixture
    lacks — reference has no analog, this is SQL-surface parity).

    The correlated `= (SELECT min(...))` is expressed as a window MIN over
    the region-filtered cost relation — one shuffle on partkey, no
    re-execution per row, and Catalyst sees a single scan of lineitem.
    `min(price/qty)` (not avg) keeps the equality engine-portable: same IEEE
    division, order-independent min, no rounding at the compare.
    At 100 TB the cost aggregation is the only big shuffle; part/supplier/
    nation/region are schema-bounded dims and broadcast.
    """
    from pyspark.sql import Window

    pt, li, sup, nat, reg = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "nation", "region"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    asia_sup = (
        sup.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n_regionkey"))
        .where(F.col("r_name") == "ASIA")
    )
    regional = cost.join(
        F.broadcast(asia_sup.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
        F.col("s_suppkey") == F.col("l_suppkey"),
    )
    best = regional.withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("unit_cost") == F.col("min_cost"))
    return (
        best.join(
            F.broadcast(pt.where(F.col("p_size") == 5)),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            "p_partkey",
            "p_type",
            F.round("unit_cost", 4).alias("unit_cost"),
        )
        .orderBy(F.col("acctbal").desc(), "nation", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - 0.6 * p.p_retailprice * l.l_quantity
                               AS DECIMAL(38,6))), 2) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "multi-join", "groupby-agg", "derived-measure"),
)
def q9_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product profit by nation and order year (TPC-H Q9 shape; supply cost
    proxied as 0.6 * p_retailprice because the fixture has no partsupp).

    Five-way join where only orders⋈lineitem shuffles — part/supplier/nation
    broadcast. The LIKE filter prunes part before the join (pushed to the
    scan), shrinking the build side. DECIMAL accumulation keeps the sum
    order-independent so the oracle hash matches.
    """
    li, o, pt, sup, nat = _t(
        spark, sf_dir, "lineitem", "orders", "part", "supplier", "nation"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(38,6)")
    return (
        li.join(F.broadcast(pt.where(F.col("p_name").like("%gear%"))),
                F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_part_value",
    oracle="""
    WITH val AS (
      SELECT l.l_partkey,
             sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, CAST(round(value, 2) AS DOUBLE) AS value
    FROM val
    WHERE value > (SELECT sum(value) * 0.001 FROM val)
    ORDER BY value DESC, l_partkey
    """,
    tags=("join", "scalar-subquery", "having", "groupby-agg"),
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from one nation's suppliers exceeds a
    fraction of that nation's total (TPC-H Q11 shape; lineitem value stands
    in for partsupp stock value).

    The uncorrelated scalar subquery is a 1-row aggregate that Spark
    broadcasts into the filter — the per-part relation is computed once and
    reused for both sides (cached), so lineitem is scanned once. DECIMAL
    sums make the threshold compare exact on both engines.
    At 100 TB: one shuffle on partkey; the threshold is a second pass over
    the small per-part aggregate, not the fact table.
    """
    li, sup, nat = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    china_sup = (
        sup.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .where(F.col("n_name") == "NATION_7")
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(china_sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("value")
        )
        .localCheckpoint()
    )
    threshold = val.agg((F.sum("value") * F.lit(0.001)).alias("thr"))
    return (
        val.crossJoin(F.broadcast(threshold))
        .where(F.col("value") > F.col("thr"))
        .select(
            "l_partkey", F.round("value", 2).cast("double").alias("value")
        )
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    ORDER BY l.l_linestatus
    """,
    tags=("join", "conditional-agg", "groupby-agg"),
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority class counts per line status (TPC-H Q12 shape;
    l_linestatus stands in for l_shipmode which the fixture lacks).

    CASE-WHEN conditional aggregation — one shuffle on a 2-value key after
    map-side partial agg, so the output is bounded regardless of input size.
    The shipdate range filter pushes to the lineitem scan.
    """
    o, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(round(r.total_revenue, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_revenue >= (SELECT max(total_revenue) FROM revenue) * 0.9
    ORDER BY s.s_suppkey
    """,
    tags=("cte-reuse", "scalar-subquery", "join", "argmax"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers within 10% of the maximum quarterly revenue (TPC-H Q15
    shape — the view-plus-scalar-max pattern).

    The revenue relation is computed once and cached, reused for both the
    max scalar and the equality filter (the CTE-reuse the original Q15
    expresses with a VIEW). DECIMAL revenue makes the `= max` equality
    exact on both engines; the >= 0.9*max band keeps the equality-
    with-scalar shape while returning the whole leading cohort.
    """
    li, sup = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(38,6)"
                )
            ).alias("total_revenue")
        )
        .localCheckpoint()
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") >= F.col("max_revenue") * F.lit(0.9))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_revenue", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q20_excess_supply_share",
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    tot AS (
      SELECT l_partkey, sum(qty) AS total_qty FROM per_ps GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_name, n.n_name AS nation
    FROM per_ps ps
    JOIN tot t      ON t.l_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE ps.qty > 0.5 * t.total_qty
      AND ps.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    ORDER BY s.s_name
    """,
    tags=("join", "semi-join", "nested-subquery", "distinct"),
)
def q20_excess_supply_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than half a part's annual volume, for a
    part-name family (TPC-H Q20 shape — nested IN + correlated half-of-sum
    threshold, re-keyed to lineitem because the fixture has no partsupp).

    The per-(part,supplier) and per-part aggregates share one lineitem scan
    (cached); the name-family filter becomes a broadcast semi join that
    prunes BEFORE the heavy aggregation. Quantities are whole numbers, so
    double sums are exact and the > compare is engine-portable.
    """
    li, sup, nat, pt = _t(spark, sf_dir, "lineitem", "supplier", "nation", "part")
    red_parts = pt.where(F.col("p_name").like("red%")).select("p_partkey")
    per_ps = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"),
              "leftsemi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .localCheckpoint()
    )
    tot = per_ps.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    return (
        per_ps.join(tot.withColumnRenamed("l_partkey", "t_partkey"),
                    F.col("t_partkey") == F.col("l_partkey"))
        .where(F.col("qty") > 0.5 * F.col("total_qty"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"))
        .distinct()
        .orderBy("s_name")
    )
