"""One-pass column profiler (data-quality / catalog statistics).

Engine feature the reference lacks entirely: its ingest copies tables blind
(``spark_ingest_slmandicprd.py:63`` reads, ``:99-103`` writes; the only
statistic it ever computes is a row count). A lake needs per-column stats
for pruning decisions, skew detection, and data-quality monitoring.

``profile_table`` computes nulls / exact distinct / min / max for every
requested column in ONE aggregation pass (Catalyst expands the multi-distinct
into a single Expand+partial-agg plan — still one scan of the input), then
unpivots driver-side literals into the long (column, stat) format catalogs
store. At 100 TB swap ``countDistinct`` for ``approx_count_distinct`` — the
plan shape is otherwise identical; the exact form is kept here so the oracle
can hash-match.

Values are stringified for the uniform long schema; doubles in the fixture
are 2-decimal so double->string formatting agrees between engines (the
profiler is for humans/catalogs, not further float math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_datalake_sl_mandic_spark.functions.hashing import (
    md5_bucket_col,
    md5_bucket_sql,
    md5_int60_col,
    md5_int60_sql,
)
from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with row/null/distinct counts
    and stringified min/max.

    Plan shape (round 11): the n DISTINCT counts and the scalar aggregates
    (count/nulls/min/max) run as TWO branches crossJoined on their
    single-row results, not one agg. Mixed, RewriteDistinctAggregates'
    Expand (x n+1 rows) makes every scalar aggregate ride every Expand
    slot — measured 1.82 s vs 0.44 s noop at sf0.1 over 6 orders columns
    (the same composition pathology as agg_approx_sketches, milder because
    all buffers here are codegen-friendly). Two pruned scans beat one
    Expand-multiplied pass at any scale."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    scalar_aggs = [F.count(F.lit(1)).alias("__n_rows")]
    distinct_aggs = []
    for c in cols:
        scalar_aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
        distinct_aggs.append(F.countDistinct(c).alias(f"__distinct_{c}"))
    wide = df.agg(*scalar_aggs).crossJoin(F.broadcast(df.agg(*distinct_aggs)))
    # Unpivot the single wide row with stack() — one generator projection,
    # so the aggregation runs ONCE (a per-column union would re-execute the
    # agg subtree once per column).
    stack_args = ", ".join(
        f"'{c}', '{dtypes[c]}', __nulls_{c}, __distinct_{c}, __min_{c}, __max_{c}"
        for c in cols
    )
    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, dtype, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        F.col("col_name").alias("column"),
        "dtype",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "min_value",
        "max_value",
    )


_PROFILE_COLS = [
    ("o_orderkey", "bigint"),
    ("o_custkey", "bigint"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp_ntz"),  # Spark 4 parquet inference (inferTimestampNTZ)
    ("o_orderpriority", "string"),
]

_ORACLE_ROWS = "\n      UNION ALL\n".join(
    f"""
      SELECT '{c}' AS "column", '{t}' AS dtype,
             count(*) AS n_rows,
             count(*) - count({c}) AS n_nulls,
             count(DISTINCT {c}) AS n_distinct,
             CAST(min({c}) AS VARCHAR) AS min_value,
             CAST(max({c}) AS VARCHAR) AS max_value
      FROM orders"""
    for c, t in _PROFILE_COLS
)


@register(
    "profile_orders_columns",
    oracle=f"""
    SELECT * FROM ({_ORACLE_ROWS})
    ORDER BY "column"
    """,
    tags=("profiling", "statistics", "data-quality", "groupby-agg"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile every orders column (counts, nulls, exact distinct, min/max)
    in a single scan; long-format output, one row per column."""
    (od,) = _t(spark, sf_dir, "orders")
    return profile_table(od, [c for c, _ in _PROFILE_COLS]).orderBy("column")


# --------------------------------------------- content checksums (anti-entropy)


@register(
    "checksum_orders_content",
    oracle=f"""
    WITH rows_h AS (
      SELECT o_orderstatus,
             {md5_int60_sql(
                 "o_orderkey::VARCHAR || '|' || o_custkey::VARCHAR || '|' || "
                 "o_orderstatus || '|' || "
                 "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS VARCHAR)"
                 " || '|' || strftime(o_orderdate, '%Y-%m-%d') || '|' || "
                 "o_orderpriority"
             )} AS h
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           bit_xor(h) AS content_xor,
           CAST(sum(h % 1000000007) AS BIGINT) AS content_sum_mod
    FROM rows_h
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("profile", "checksum", "anti-entropy", "reconciliation"),
)
def checksum_orders_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive content checksum per partition group: every row
    serializes to a canonical string (doubles as integer cents, dates as
    ISO), hashes to a 60-bit md5 integer, and the group fingerprint is the
    XOR plus a modular sum of row hashes — two commutative aggregates, so
    the checksum is independent of row order and partitioning.

    This is the anti-entropy primitive replica reconciliation is built on:
    comparing per-group (n_rows, content_xor, content_sum_mod) between a
    source and a sink detects any divergence without moving the data — a
    strict upgrade over the reference's row_count-only ingest audit
    (Sites/DataProc_Script/spark_ingest_slmandicprd.py:108 records only
    df.count()). At 100 TB it is one partial-aggregated shuffle carrying
    three longs per group. XOR alone is blind to duplicated-pair anomalies
    (x XOR x = 0), which is why the modular sum rides along."""
    (od,) = _t(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        F.date_format("o_orderdate", "yyyy-MM-dd"),
        "o_orderpriority",
    )
    h = md5_int60_col(canon)
    return (
        od.select("o_orderstatus", h.alias("h"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("h").alias("content_xor"),
            F.sum(F.col("h") % 1000000007).alias("content_sum_mod"),
        )
        .orderBy("o_orderstatus")
    )


# ------------------------------------------- chi-square independence matrix


@register(
    "stats_chi2_segment_priority",
    oracle="""
    WITH joint AS (
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
             count(*) AS observed
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT sum(observed)::BIGINT AS n FROM joint),
    rows_t AS (SELECT seg, sum(observed)::BIGINT AS row_n FROM joint GROUP BY seg),
    cols_t AS (SELECT prio, sum(observed)::BIGINT AS col_n FROM joint GROUP BY prio)
    SELECT j.seg, j.prio, j.observed,
           round(r.row_n * c.col_n * 1.0 / t.n, 4) AS expected,
           round(pow(j.observed - r.row_n * c.col_n * 1.0 / t.n, 2)
                 / (r.row_n * c.col_n * 1.0 / t.n), 6) AS chi2_term
    FROM joint j
    JOIN rows_t r USING (seg)
    JOIN cols_t c USING (prio)
    CROSS JOIN tot t
    ORDER BY seg, prio
    """,
    tags=("profile", "statistics", "chi-square", "independence"),
)
def stats_chi2_segment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test-of-independence matrix between customer market
    segment and order priority: observed vs expected-under-independence
    counts and each cell's chi2 contribution (their sum is the statistic,
    dof = (|seg|-1)(|prio|-1)) — the categorical-association check a data
    profiler runs before trusting a segmentation.

    One fact-side shuffle builds the joint contingency table; marginals and
    the grand total are aggregations OVER THE TABLE (25 rows), never the
    data, then broadcast back — the sufficient-statistics shape again."""
    (od, cu) = _t(spark, sf_dir, "orders", "customer")
    joint = (
        od.join(cu, od["o_custkey"] == cu["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("observed"))
        .localCheckpoint()  # 25 rows feeding three aggregations + final join
    )
    tot = joint.agg(F.sum("observed").alias("n"))
    rows_t = joint.groupBy("seg").agg(F.sum("observed").alias("row_n"))
    cols_t = joint.groupBy("prio").agg(F.sum("observed").alias("col_n"))
    expected = F.col("row_n") * F.col("col_n") / F.col("n")
    return (
        joint.join(F.broadcast(rows_t), "seg")
        .join(F.broadcast(cols_t), "prio")
        .crossJoin(F.broadcast(tot))
        .select(
            "seg",
            "prio",
            "observed",
            F.round(expected, 4).alias("expected"),
            F.round(
                F.pow(F.col("observed") - expected, 2) / expected, 6
            ).alias("chi2_term"),
        )
        .orderBy("seg", "prio")
    )


# --------------------------------------------- mutual information (lang, source)


@register(
    "stats_mutual_info_lang_source",
    oracle="""
    WITH joint AS (
      SELECT lang, source, count(*) AS nxy FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT sum(nxy)::BIGINT AS n FROM joint),
    px AS (SELECT lang, sum(nxy)::BIGINT AS nx FROM joint GROUP BY lang),
    py AS (SELECT source, sum(nxy)::BIGINT AS ny FROM joint GROUP BY source)
    SELECT j.lang, j.source, j.nxy,
           round((j.nxy * 1.0 / t.n)
                 * ln((j.nxy * 1.0 / t.n)
                      / ((x.nx * 1.0 / t.n) * (y.ny * 1.0 / t.n))), 6)
             AS mi_term
    FROM joint j
    JOIN px x USING (lang)
    JOIN py y USING (source)
    CROSS JOIN tot t
    ORDER BY lang, source
    """,
    tags=("profile", "statistics", "mutual-information", "entropy"),
)
def stats_mutual_info_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual-information matrix between document language and
    source: each cell's contribution p(x,y)·ln(p(x,y)/(p(x)p(y))) — their
    sum is the mutual information, the entropy-based association measure
    that (unlike chi-square) is directly comparable across tables and is
    what a curation pipeline checks before treating source as a language
    proxy. Same sufficient-statistics shape as the chi-square matrix: one
    shuffle builds the joint table, marginals aggregate over its few rows
    and broadcast back; every probability is an exact integer ratio, so
    both engines compute identical doubles before the final rounding."""
    (dc,) = _t(spark, sf_dir, "documents")
    joint = (
        dc.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("nxy"))
        .localCheckpoint()  # few rows feeding three aggregations + final join
    )
    tot = joint.agg(F.sum("nxy").alias("n"))
    px = joint.groupBy("lang").agg(F.sum("nxy").alias("nx"))
    py = joint.groupBy("source").agg(F.sum("nxy").alias("ny"))
    pxy = F.col("nxy") / F.col("n")
    mi = pxy * F.log(pxy / ((F.col("nx") / F.col("n")) * (F.col("ny") / F.col("n"))))
    return (
        joint.join(F.broadcast(px), "lang")
        .join(F.broadcast(py), "source")
        .crossJoin(F.broadcast(tot))
        .select("lang", "source", "nxy", F.round(mi, 6).alias("mi_term"))
        .orderBy("lang", "source")
    )


# ------------------------------------------------------- Gini coefficient

# price-band width (cents) for the two-level prefix sum over distinct order
# values: o_totalprice spans ~[900, 560k] dollars -> ~56 populated bands
_GINI_BAND_CENTS = 1_000_000


@register(
    "stats_gini_order_values",
    oracle="""
    WITH cents AS (
      SELECT o.o_orderkey, c.c_mktsegment AS seg,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS v
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    ranked AS (
      SELECT seg, v,
             row_number() OVER (PARTITION BY seg ORDER BY v, o_orderkey) AS i
      FROM cents
    ),
    agg AS (
      SELECT seg,
             CAST(count(*) AS BIGINT) AS n,
             sum(v)::BIGINT AS total,
             sum(i * v)::BIGINT AS weighted
      FROM ranked GROUP BY seg
    )
    SELECT seg, n,
           round(total / 100.0, 2) AS total_value,
           round((2.0 * weighted) / (n * 1.0 * total) - (n + 1.0) / n, 6)
             AS gini
    FROM agg
    ORDER BY seg
    """,
    tags=("profile", "statistics", "gini", "inequality", "window"),
)
def stats_gini_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of order values per market segment — the inequality
    summary (0 = all orders equal, →1 = one order dominates) that answers
    'is this segment's revenue concentration healthy'. Computed by the
    sorted-rank formula G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over integer cents.

    Scale shape (round-6 sweep: this was the last fact-scale rank window on
    a low-cardinality key — 5-value mktsegment over every order). The rank
    only ever feeds Σ(i·v), and tied rows share v, so the rank order among
    ties is immaterial: grouping to DISTINCT (seg, v) with multiplicity k
    makes each value's rank-sum pure arithmetic — ranks off+1..off+k
    contribute v·(k·off + k(k+1)/2). The fact table pays one map-side
    combinable groupBy(seg, v); the prefix sum that produces ``off`` runs
    over the distinct-VALUE relation only, two-level (price bands ->
    broadcast band offsets + per-(seg, band) running count), so no window
    partition is ever keyed on bare ``seg`` and none touches O(rows) data.
    All rank-weighted sums accumulate as exact decimal(38,0) (the per-value
    products overflow int64 at large SF; a double sum would be
    order-dependent); the only floats are the final IEEE divisions, same as
    the oracle's. The oracle states the per-row window semantics — hash
    equality proves the tie-arithmetic decomposition."""
    (od, cu) = _t(spark, sf_dir, "orders", "customer")
    cents = (
        od.join(cu, od["o_custkey"] == cu["c_custkey"])
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("v"),
        )
    )
    by_val = (
        cents.groupBy("seg", "v")
        .agg(F.count(F.lit(1)).alias("k"))
        .withColumn("pband", F.expr(f"v DIV {_GINI_BAND_CENTS}"))
        # distinct-value relation feeds band offsets AND the per-value pass;
        # pin it so the fact join+aggregation runs once, not per subtree
        .localCheckpoint(eager=False)
    )
    w_band = (
        Window.partitionBy("seg")
        .orderBy("pband")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    band_off = (
        by_val.groupBy("seg", "pband")
        .agg(F.sum("k").alias("bk"))
        .withColumn("boff", F.coalesce(F.sum("bk").over(w_band), F.lit(0)))
        .select("seg", "pband", "boff")
    )
    w_in = (
        Window.partitionBy("seg", "pband")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.col("boff") + F.coalesce(F.sum("k").over(w_in), F.lit(0))
    # ranks off+1..off+k give Σ i = k·off + k(k+1)/2 (triangular part is an
    # exact bigint; the cross terms go decimal to survive n² at large SF)
    tri = F.expr("k * (k + 1) DIV 2").cast("decimal(38,0)")
    contrib = F.col("v").cast("decimal(38,0)") * (
        F.col("k").cast("decimal(38,0)") * F.col("off") + tri
    )
    per_val = by_val.join(F.broadcast(band_off), ["seg", "pband"]).withColumn(
        "off", off.cast("decimal(38,0)")
    )
    agg = per_val.groupBy("seg").agg(
        F.sum("k").alias("n"),
        F.sum(F.col("v") * F.col("k")).alias("total"),
        F.sum(contrib).cast("double").alias("weighted"),
    )
    # n * total likewise in double (mirrors the oracle's n*1.0*total).
    gini = (2.0 * F.col("weighted")) / (F.col("n").cast("double") * F.col("total")) - (
        F.col("n") + 1.0
    ) / F.col("n")
    return agg.select(
        "seg",
        "n",
        F.round(F.col("total") / 100.0, 2).alias("total_value"),
        F.round(gini, 6).alias("gini"),
    ).orderBy("seg")


SKEW_N_BUCKETS = 32  # model partition count for the skew pre-flight


@register(
    "profile_partition_skew",
    oracle=f"""
    WITH buckets AS (
      SELECT {md5_bucket_sql("user_id::VARCHAR", SKEW_N_BUCKETS)} AS bucket,
             count(*) AS n_rows
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT sum(n_rows) AS total, max(n_rows) AS mx,
             sum(n_rows) * 1.0 / {SKEW_N_BUCKETS} AS avg_rows
      FROM buckets
    )
    SELECT b.bucket, b.n_rows,
           round(b.n_rows * 1.0 / s.total, 6) AS share,
           round(s.mx / s.avg_rows, 4) AS skew_ratio
    FROM buckets b CROSS JOIN stats s
    ORDER BY b.bucket
    """,
    tags=("profile", "skew", "partitioning", "pre-flight"),
)
def profile_partition_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew pre-flight: model how ``events`` would distribute over
    {SKEW_N_BUCKETS} hash partitions of ``user_id`` — per-bucket row counts,
    shares, and the max/avg skew ratio (the straggler multiplier a shuffle
    on this key would pay). This is the diagnostic that decides between a
    plain ``groupBy(user_id)`` and the salted variant
    (``events_salted_user_totals``/``functions/skew.py``): ratio ~1 means
    hash-partitioning balances, >>1 means a hot key owns a partition.

    Scale shape: one map-side-combined aggregation to {SKEW_N_BUCKETS}
    cells; the stats row broadcasts back. The md5 bucket stands in for
    Spark's internal hash so the oracle computes the identical assignment."""
    (ev,) = _t(spark, sf_dir, "events")
    buckets = (
        ev.select(
            md5_bucket_col(F.col("user_id").cast("string"), SKEW_N_BUCKETS).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .localCheckpoint(eager=False)
        # ^ bounded bucket relation feeding the totals AND the share join —
        # pinned so the events scan runs once, not per branch
    )
    stats = buckets.agg(
        F.sum("n_rows").alias("total"),
        F.max("n_rows").alias("mx"),
        (F.sum("n_rows") / SKEW_N_BUCKETS).alias("avg_rows"),
    )
    return (
        buckets.crossJoin(F.broadcast(stats))
        .select(
            "bucket",
            "n_rows",
            F.round(F.col("n_rows") / F.col("total"), 6).alias("share"),
            F.round(F.col("mx") / F.col("avg_rows"), 4).alias("skew_ratio"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------------------- Welch's t-test

WELCH_T_CRIT_05 = 1.96  # large-sample two-sided 5% critical value, fixed


@register(
    "stats_welch_ttest_priority",
    oracle=f"""
    WITH labeled AS (
      SELECT o_orderstatus AS status,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'hi'
                  WHEN o_orderpriority IN ('4-NOT SPECIFIED', '5-LOW') THEN 'lo'
             END AS grp,
             o_totalprice AS v
      FROM orders
      WHERE o_orderpriority NOT IN ('3-MEDIUM')
    ), sidewise AS (
      SELECT status,
             count(*) FILTER (grp = 'hi') AS n_hi,
             count(*) FILTER (grp = 'lo') AS n_lo,
             avg(v) FILTER (grp = 'hi') AS m_hi,
             avg(v) FILTER (grp = 'lo') AS m_lo,
             var_samp(v) FILTER (grp = 'hi') AS v_hi,
             var_samp(v) FILTER (grp = 'lo') AS v_lo
      FROM labeled GROUP BY status
    )
    SELECT status,
           CAST(n_hi AS BIGINT) AS n_hi, CAST(n_lo AS BIGINT) AS n_lo,
           round(m_hi, 4) AS mean_hi, round(m_lo, 4) AS mean_lo,
           CASE WHEN v_hi / n_hi + v_lo / n_lo > 0 THEN
             round((m_hi - m_lo) / sqrt(v_hi / n_hi + v_lo / n_lo), 4) END
             AS t_stat,
           CASE WHEN v_hi / n_hi + v_lo / n_lo > 0 THEN
             round(pow(v_hi / n_hi + v_lo / n_lo, 2)
                   / (pow(v_hi / n_hi, 2) / (n_hi - 1)
                      + pow(v_lo / n_lo, 2) / (n_lo - 1)), 2) END AS welch_dof,
           CASE WHEN v_hi / n_hi + v_lo / n_lo > 0 THEN
             abs((m_hi - m_lo) / sqrt(v_hi / n_hi + v_lo / n_lo))
               > {WELCH_T_CRIT_05} ELSE FALSE END AS reject_05
    FROM sidewise
    WHERE n_hi >= 2 AND n_lo >= 2
    ORDER BY status
    """,
    tags=("statistics", "hypothesis-test", "welch", "groupby-agg"),
)
def stats_welch_ttest_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test per order status: does mean order
    value differ between high-priority (1-URGENT/2-HIGH) and low-priority
    (4-NOT SPECIFIED/5-LOW) orders? Emits the t statistic, the
    Welch–Satterthwaite effective degrees of freedom, and a reject flag at
    the fixed large-sample 5% critical value (same fixed-critical-value
    contract as the KS and Mann-Kendall tests — no t CDF needed).

    Scale shape: one conditional aggregation pass per status (FILTER-style
    conditional aggregates, map-side combined) — counts, means and sample
    variances for both arms in a single shuffle; the test statistic is
    closed-form arithmetic over the six aggregates."""
    (od,) = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lo = F.col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW")
    labeled = od.where(F.col("o_orderpriority") != "3-MEDIUM").select(
        F.col("o_orderstatus").alias("status"),
        F.when(hi, "hi").when(lo, "lo").alias("grp"),
        F.col("o_totalprice").alias("v"),
    )

    def _arm(agg, arm):
        return agg(F.when(F.col("grp") == arm, F.col("v")))

    side = labeled.groupBy("status").agg(
        F.count(F.when(F.col("grp") == "hi", 1)).alias("n_hi"),
        F.count(F.when(F.col("grp") == "lo", 1)).alias("n_lo"),
        _arm(F.avg, "hi").alias("m_hi"),
        _arm(F.avg, "lo").alias("m_lo"),
        _arm(F.var_samp, "hi").alias("v_hi"),
        _arm(F.var_samp, "lo").alias("v_lo"),
    )
    se2 = F.col("v_hi") / F.col("n_hi") + F.col("v_lo") / F.col("n_lo")
    t = (F.col("m_hi") - F.col("m_lo")) / F.sqrt(se2)
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v_hi") / F.col("n_hi"), 2) / (F.col("n_hi") - 1)
        + F.pow(F.col("v_lo") / F.col("n_lo"), 2) / (F.col("n_lo") - 1)
    )
    # Degenerate arms (both variances zero -> se2 = 0, found by the
    # degenerate-input crash audit): the statistic is undefined — emit NULL
    # on both engines instead of dividing by zero under ANSI mode.
    defined = se2 > 0
    return (
        side.where((F.col("n_hi") >= 2) & (F.col("n_lo") >= 2))
        .select(
            "status",
            F.col("n_hi").cast("bigint").alias("n_hi"),
            F.col("n_lo").cast("bigint").alias("n_lo"),
            F.round("m_hi", 4).alias("mean_hi"),
            F.round("m_lo", 4).alias("mean_lo"),
            F.when(defined, F.round(t, 4)).alias("t_stat"),
            F.when(defined, F.round(dof, 2)).alias("welch_dof"),
            F.when(defined, F.abs(t) > WELCH_T_CRIT_05)
            .otherwise(F.lit(False))
            .alias("reject_05"),
        )
        .orderBy("status")
    )


# ------------------------------------------------------ one-way ANOVA F-test

ANOVA_F_CRIT_05 = 2.37  # upper 5% critical value of F(dof1=4, dof2=inf), fixed


@register(
    "stats_anova_order_priority",
    oracle=f"""
    WITH g AS (
      SELECT o_orderpriority AS grp, count(*) AS n, avg(o_totalprice) AS m,
             sum(o_totalprice) AS s, sum(o_totalprice * o_totalprice) AS ss
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT sum(n) AS n_all, sum(s) / sum(n) AS grand_mean,
             count(*) AS k FROM g
    ), parts AS (
      SELECT sum(n * (m - grand_mean) * (m - grand_mean)) AS ss_between,
             sum(ss - n * m * m) AS ss_within,
             max(k) AS k, max(n_all) AS n_all
      FROM g, tot
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n_all AS BIGINT) AS n_rows,
           CASE WHEN k > 1 THEN round(ss_between / (k - 1), 4) END
             AS ms_between,
           CASE WHEN n_all > k THEN round(ss_within / (n_all - k), 4) END
             AS ms_within,
           CASE WHEN k > 1 AND n_all > k AND ss_within > 0 THEN
             round((ss_between / (k - 1)) / (ss_within / (n_all - k)), 4) END
             AS f_stat,
           CASE WHEN k > 1 AND n_all > k AND ss_within > 0 THEN
             (ss_between / (k - 1)) / (ss_within / (n_all - k))
               > {ANOVA_F_CRIT_05} ELSE FALSE END AS reject_05
    FROM parts
    """,
    tags=("statistics", "hypothesis-test", "anova", "groupby-agg"),
)
def stats_anova_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean order value differ across the five order
    priorities? F = MS_between / MS_within from per-group sufficient
    statistics (n, sum, sum-of-squares) — the same fixed-critical-value
    contract as the Welch/KS/Mann-Kendall tests (dof1=4, large-sample dof2).

    Scale shape: ONE map-side-combining aggregation collapses the fact table
    to one row per group (5 rows); grand totals and both sums of squares are
    arithmetic over that tiny relation — a second corpus pass never happens,
    and sum/sum-of-squares make SS_within computable without re-touching
    rows (Koenig-Huygens decomposition)."""
    (od,) = _t(spark, sf_dir, "orders")
    # localCheckpoint so the fact scan runs once: g (5 rows) feeds both the
    # grand totals and the sums of squares.
    g = (
        od.groupBy(F.col("o_orderpriority").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("o_totalprice").alias("m"),
            F.sum("o_totalprice").alias("s"),
            F.sum(F.col("o_totalprice") * F.col("o_totalprice")).alias("ss"),
        )
        .localCheckpoint()
    )
    tot = g.agg(
        F.sum("n").alias("n_all"),
        (F.sum("s") / F.sum("n")).alias("grand_mean"),
        F.count(F.lit(1)).alias("k"),
    )
    parts = (
        g.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n") * (F.col("m") - F.col("grand_mean")) * (F.col("m") - F.col("grand_mean"))
            ).alias("ss_between"),
            F.sum(F.col("ss") - F.col("n") * F.col("m") * F.col("m")).alias("ss_within"),
            F.max("k").alias("k"),
            F.max("n_all").alias("n_all"),
        )
    )
    ms_between = F.col("ss_between") / (F.col("k") - 1)
    ms_within = F.col("ss_within") / (F.col("n_all") - F.col("k"))
    # Degenerate designs (one group -> k-1 = 0; one row per group ->
    # n_all = k; identical rows -> ss_within = 0; found by the
    # degenerate-input crash audit): each undefined statistic is NULL on
    # both engines instead of an ANSI divide-by-zero.
    has_between = F.col("k") > 1
    has_within = F.col("n_all") > F.col("k")
    f_defined = has_between & has_within & (F.col("ss_within") > 0)
    return parts.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("n_all").cast("bigint").alias("n_rows"),
        F.when(has_between, F.round(ms_between, 4)).alias("ms_between"),
        F.when(has_within, F.round(ms_within, 4)).alias("ms_within"),
        F.when(f_defined, F.round(ms_between / ms_within, 4)).alias("f_stat"),
        F.when(f_defined, ms_between / ms_within > ANOVA_F_CRIT_05)
        .otherwise(F.lit(False))
        .alias("reject_05"),
    )


# ------------------------------------------------ bootstrap CI (half-sample)

BOOT_B = 20  # bootstrap replicates
_BOOT_RES = 1 << 30


@register(
    "stats_bootstrap_ci_mean",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS cents,
             ('0x' || substr(md5(coalesce(event_type, '__null__') || '|'
                 || coalesce(CAST(user_id AS VARCHAR), '__null__')
                 || '|' || CAST(CAST(round(value * 100, 0) AS BIGINT) AS VARCHAR)),
                 1, 15))::BIGINT AS hk
      FROM events WHERE value IS NOT NULL
    ),
    reps AS (
      SELECT b.b, base.event_type,
             CAST(round(CAST(sum(base.cents) AS DOUBLE) * 100.0
                        / CAST(count(*) AS DOUBLE), 0) AS BIGINT) AS rep_m4
      FROM base CROSS JOIN range(0, {BOOT_B}) b(b)
      WHERE ('0x' || substr(md5(CAST(b.b AS VARCHAR) || '#'
               || CAST(base.hk AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
      GROUP BY b.b, base.event_type
    ),
    summ AS (
      SELECT event_type,
             count(*) AS n_reps,
             round(quantile_cont(CAST(rep_m4 AS DOUBLE) / 10000.0, 0.05), 4)
               AS ci_lo,
             round(quantile_cont(CAST(rep_m4 AS DOUBLE) / 10000.0, 0.95), 4)
               AS ci_hi,
             round(sqrt(CAST(CAST(count(*) AS HUGEINT) * sum(CAST(rep_m4 AS HUGEINT) * rep_m4)
                             - CAST(sum(rep_m4) AS HUGEINT) * sum(rep_m4) AS DOUBLE)
                        / (CAST(count(*) AS DOUBLE) * (count(*) - 1.0)))
                   / 10000.0, 6) AS se_boot
      FROM reps GROUP BY event_type
    ),
    pt AS (
      SELECT event_type,
             round(CAST(sum(cents) AS DOUBLE)
                   / (CAST(count(*) AS DOUBLE) * 100.0), 4) AS mean_full,
             count(*) AS n_rows
      FROM base GROUP BY event_type
    )
    SELECT p.event_type, CAST(p.n_rows AS BIGINT) AS n_rows, p.mean_full,
           CAST(s.n_reps AS BIGINT) AS n_reps, s.ci_lo, s.ci_hi, s.se_boot,
           p.mean_full BETWEEN s.ci_lo AND s.ci_hi AS ci_covers_mean
    FROM pt p JOIN summ s USING (event_type)
    ORDER BY p.event_type
    """,
    tags=("stats", "bootstrap", "confidence-interval", "resampling"),
)
def stats_bootstrap_ci_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the per-stratum mean, built from
    B = 20 DETERMINISTIC half-sample replicates: replicate b keeps the rows
    whose md5(b # row-key) is even — an m-out-of-n (m = n/2) subsample
    bootstrap whose every replicate is reproducible across engines and runs
    (swap the hash for a real RNG to deploy). Emits the full-sample mean,
    the 5th/95th percentile band of replicate means, and the bootstrap SE —
    the uncertainty a metrics pipeline should attach to every mean it
    publishes, computed without any distributional assumption.

    Scale shape: the replicate fan-out is a broadcast range-join (B small
    ints) that partial-aggregates per (replicate, stratum) in the same map
    pass — B x |strata| rows reach the shuffle, NOT B x |rows|. The
    percentile runs over B values per stratum. Nothing here is driver-side.
    Determinism: replicate sums accumulate exact integer cents (any
    partition order), each replicate mean is fixed to 4dp micro-units
    (bigint) by two IEEE ops on exact operands, and the bootstrap SE comes
    from exact integer sums of those micro-means — so percentile inputs and
    the SE are bit-identical across runs and engines. Membership keys
    coalesce NULL parts to '__null__' on BOTH engines (concat_ws drops
    NULLs silently; the oracle's || nulls the whole key, which would desync
    replicate membership on nullable lakes)."""
    from feature_datalake_sl_mandic_spark.functions.hashing import md5_int60_col

    (ev,) = _t(spark, sf_dir, "events")
    base = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        md5_int60_col(
            F.concat_ws(
                "|",
                F.coalesce(F.col("event_type"), F.lit("__null__")),
                F.coalesce(F.col("user_id").cast("string"), F.lit("__null__")),
                F.round(F.col("value") * 100, 0).cast("bigint").cast("string"),
            )
        ).alias("hk"),
    ).localCheckpoint(eager=False)  # feeds the replicate fan-out AND the
    # full-sample mean — pinned so the events scan + projection run once
    bs = spark.range(BOOT_B).select(F.col("id").alias("b"))
    keep = (
        md5_int60_col(
            F.concat(F.col("b").cast("string"), F.lit("#"), F.col("hk").cast("string"))
        )
        % 2
        == 0
    )
    reps = (
        base.crossJoin(F.broadcast(bs))
        .where(keep)
        .groupBy("b", "event_type")
        .agg(
            F.round(
                F.sum("cents").cast("double") * 100.0
                / F.count(F.lit(1)).cast("double"),
                0,
            )
            .cast("bigint")
            .alias("rep_m4")
        )
    )
    n_reps = F.count(F.lit(1))
    var_num = (
        n_reps.cast("decimal(38,0)")
        * F.sum(F.col("rep_m4").cast("decimal(38,0)") * F.col("rep_m4"))
        - F.sum("rep_m4").cast("decimal(38,0)") * F.sum("rep_m4")
    )
    summ = reps.groupBy("event_type").agg(
        n_reps.alias("n_reps"),
        F.round(F.expr("percentile(CAST(rep_m4 AS DOUBLE) / 10000.0, 0.05)"), 4).alias(
            "ci_lo"
        ),
        F.round(F.expr("percentile(CAST(rep_m4 AS DOUBLE) / 10000.0, 0.95)"), 4).alias(
            "ci_hi"
        ),
        F.round(
            F.sqrt(
                var_num.cast("double")
                / (n_reps.cast("double") * (n_reps - F.lit(1.0)))
            )
            / 10000.0,
            6,
        ).alias("se_boot"),
    )
    pt = base.groupBy("event_type").agg(
        F.round(
            F.sum("cents").cast("double")
            / (F.count(F.lit(1)).cast("double") * 100.0),
            4,
        ).alias("mean_full"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return (
        pt.join(summ, "event_type")
        .select(
            "event_type",
            "n_rows",
            "mean_full",
            "n_reps",
            "ci_lo",
            "ci_hi",
            F.col("mean_full").between(F.col("ci_lo"), F.col("ci_hi")).alias(
                "ci_covers_mean"
            ),
            "se_boot",
        )
        .orderBy("event_type")
    )


# --------------------------------------------- A/B two-proportion z-test

AB_CONVERT_VALUE = 590.0  # ~median per-user purchase total -> mid-range rates


@register(
    "events_ab_test_proportions",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2
               AS variant,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END)
                       > {AB_CONVERT_VALUE}
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT variant, count(*) AS n, sum(converted) AS conv
      FROM users GROUP BY variant
    ),
    wide AS (
      SELECT max(CASE WHEN variant = 0 THEN n END) AS n_a,
             max(CASE WHEN variant = 0 THEN conv END) AS conv_a,
             max(CASE WHEN variant = 1 THEN n END) AS n_b,
             max(CASE WHEN variant = 1 THEN conv END) AS conv_b
      FROM arms
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           round(conv_a * 1.0 / n_a, 6) AS rate_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           round(conv_b * 1.0 / n_b, 6) AS rate_b,
           CASE WHEN se > 0 THEN
             round((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a) / se, 4) END AS z,
           coalesce(CASE WHEN se > 0 THEN
             abs((conv_b * 1.0 / n_b - conv_a * 1.0 / n_a) / se) > 1.96 END,
             FALSE) AS significant_95
    FROM (
      SELECT *, sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))
                     * (1 - (conv_a + conv_b) * 1.0 / (n_a + n_b))
                     * (1.0 / n_a + 1.0 / n_b)) AS se
      FROM wide
    )
    """,
    tags=("stats", "ab-test", "two-proportion", "z-test", "events"),
)
def events_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between hash-assigned experiment arms: users
    split A/B by md5 parity (the standard deterministic bucketing an
    experimentation platform uses), conversion = total purchase value above
    a threshold, pooled-variance z with 95% significance. On the fixture
    this is an A/A test by construction — the z-stat's job is to correctly
    FAIL to reject, which is exactly what a healthy assignment hash must
    show before any real experiment is trusted (the sanity check every
    experimentation system runs continuously).

    Scale shape: one per-user aggregation (map-side combined), one 2-row
    arm aggregation, then literal arithmetic on a single row. The user
    grain, not the event grain, crosses the shuffle."""
    from feature_datalake_sl_mandic_spark.functions.hashing import md5_int60_col

    (ev,) = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.when(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            )
            > AB_CONVERT_VALUE,
            1,
        )
        .otherwise(0)
        .alias("converted")
    ).select(
        (md5_int60_col(F.col("user_id").cast("string")) % 2).alias("variant"),
        "converted",
    )
    arms = users.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("converted").alias("conv")
    )
    wide = arms.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("conv_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("conv_b"),
    )
    p_pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(p_pool * (1 - p_pool) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    # degenerate experiments (a missing arm; all users converting or none,
    # so the pooled variance is zero) have no defined z — NULL z, FALSE
    # significance on both engines (degenerate-lake oracle audit, round 6)
    z = F.when(
        se > 0,
        (F.col("conv_b") / F.col("n_b") - F.col("conv_a") / F.col("n_a")) / se,
    )
    return wide.select(
        "n_a",
        "conv_a",
        F.round(F.col("conv_a") / F.col("n_a"), 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(F.col("conv_b") / F.col("n_b"), 6).alias("rate_b"),
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > 1.96, F.lit(False)).alias("significant_95"),
    )
