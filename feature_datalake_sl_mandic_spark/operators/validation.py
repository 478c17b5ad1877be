"""Rule-based row validation with quarantine (expectations, deequ-style).

Engine feature the reference lacks: its pipeline loads whatever the JDBC
cursor yields — a bad upstream batch lands in the lake unflagged. This
operator evaluates a declarative rule set per row and splits the input into
a clean stream and a quarantine stream carrying WHICH rules failed, the
standard expectations pattern (Delta Live Tables / Great Expectations /
Deequ) expressed as pure Catalyst columns:

- every rule is one boolean expression — all rules evaluate in a single
  projection, no extra scans, no UDFs;
- ``failed_rules`` concatenates the violated rule names in declaration
  order (deterministic, hash-checkable);
- the quarantine stream is just ``filter(n_failed > 0)`` over the annotated
  frame — at 100 TB both streams stay one narrow map over the scan, and the
  clean/quarantine split writes as two partition-pruned sinks.

The registered query quarantines orders under three rules that real fixture
rows violate (price cap, freshness horizon, known-status whitelist) plus one
format rule that holds everywhere — exercising both the failing and the
passing path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Annotate ``df`` with per-rule booleans, ``failed_rules`` (comma-joined
    names in declaration order) and ``n_failed``. NULL rule results count as
    failures (a rule that cannot evaluate did not pass)."""
    failed_flags = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name)) for name, cond in rules.items()
    ]
    annotated = df.withColumn(
        "failed_rules",
        F.concat_ws(",", *[f for f in failed_flags]),
    )
    return annotated.withColumn(
        "n_failed",
        F.when(F.col("failed_rules") == "", 0)
        .otherwise(F.size(F.split("failed_rules", ",")))
        .cast("bigint"),
    )


def quarantine(df: DataFrame, rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """Split into (clean, quarantined-with-reasons)."""
    annotated = validate(df, rules)
    clean = annotated.where(F.col("n_failed") == 0).drop("failed_rules", "n_failed")
    bad = annotated.where(F.col("n_failed") > 0)
    return clean, bad


_PRICE_CAP = 400_000
_FRESH_SINCE = "1996-01-01"


def _order_rules() -> dict[str, Column]:
    return {
        "price_range": (F.col("o_totalprice") > 0) & (F.col("o_totalprice") <= _PRICE_CAP),
        "fresh_order": F.col("o_orderdate") >= F.lit(_FRESH_SINCE).cast("timestamp"),
        "status_known": F.col("o_orderstatus").isin("O", "F"),
        "priority_format": F.col("o_orderpriority").rlike("^[1-5]-"),
    }


@register(
    "validate_quarantine_orders",
    oracle=f"""
    WITH annotated AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             concat_ws(',',
               CASE WHEN NOT coalesce(o_totalprice > 0 AND o_totalprice <= {_PRICE_CAP}, FALSE)
                    THEN 'price_range' END,
               CASE WHEN NOT coalesce(o_orderdate >= TIMESTAMP '{_FRESH_SINCE}', FALSE)
                    THEN 'fresh_order' END,
               CASE WHEN NOT coalesce(o_orderstatus IN ('O', 'F'), FALSE)
                    THEN 'status_known' END,
               CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE)
                    THEN 'priority_format' END
             ) AS failed_rules
      FROM orders
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice, failed_rules,
           CAST(len(string_split(failed_rules, ',')) AS BIGINT) AS n_failed
    FROM annotated
    WHERE failed_rules <> ''
    ORDER BY o_orderkey
    """,
    tags=("validation", "quarantine", "expectations", "data-quality"),
)
def validate_quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarantined orders under the 4-rule expectation set, with the exact
    violated-rule list per row. Single projection + filter over the scan."""
    (od,) = _t(spark, sf_dir, "orders")
    _, bad = quarantine(od, _order_rules())
    return bad.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "failed_rules", "n_failed"
    ).orderBy("o_orderkey")


# ---------------------------------------------------- k-anonymous release

KANON_K = 5


@register(
    "kanon_release_customers",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment, n.n_name AS nation, count(*) AS n_rows,
             round(sum(c_acctbal), 2) AS total_balance
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment,
           CASE WHEN n_rows >= {KANON_K} THEN nation ELSE '__suppressed__' END
             AS nation,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           round(sum(total_balance), 2) AS total_balance,
           CAST(count(*) AS BIGINT) AS n_cells_merged
    FROM cells
    GROUP BY 1, 2
    ORDER BY c_mktsegment, nation
    """,
    tags=("validation", "privacy", "k-anonymity", "suppression"),
)
def kanon_release_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymous aggregate release: cells of the (segment, nation)
    quasi-identifier grid with fewer than k members are suppressed — merged
    into one '__suppressed__' bucket per segment so their totals still
    publish without isolating small groups. The minimum-viable privacy gate
    a training-data pipeline applies before releasing grouped statistics.

    Scale: two bounded-key aggregations (the cell grid is
    |segments| x |nations|, constant); suppression is a projection over the
    first aggregate's result, so the data is scanned once."""
    (cu, na) = _t(spark, sf_dir, "customer", "nation")
    cells = (
        cu.join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("c_mktsegment", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
    )
    released_nation = F.when(
        F.col("n_rows") >= KANON_K, F.col("nation")
    ).otherwise("__suppressed__")
    return (
        cells.select(
            "c_mktsegment",
            released_nation.alias("nation"),
            "n_rows",
            "total_balance",
        )
        .groupBy("c_mktsegment", "nation")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.round(F.sum("total_balance"), 2).alias("total_balance"),
            F.count(F.lit(1)).alias("n_cells_merged"),
        )
        .orderBy("c_mktsegment", "nation")
    )


L_DIVERSITY = 3  # distinct sensitive values required per released cell
_BAL_BAND = 2000  # sensitive attribute: account-balance band of this width


@register(
    "kanon_l_diversity",
    oracle=f"""
    WITH cells AS (
      SELECT c_mktsegment, n.n_name AS nation,
             count(*) AS n_rows,
             count(DISTINCT CAST(floor(c_acctbal / {_BAL_BAND}) AS BIGINT))
               AS n_sensitive
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, nation,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_sensitive AS BIGINT) AS n_sensitive,
           n_rows >= {KANON_K} AS k_anonymous,
           n_sensitive >= {L_DIVERSITY} AS l_diverse,
           n_rows >= {KANON_K} AND n_sensitive >= {L_DIVERSITY} AS releasable
    FROM cells
    ORDER BY c_mktsegment, nation
    """,
    tags=("validation", "privacy", "l-diversity", "k-anonymity"),
)
def kanon_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit on top of k-anonymity: a quasi-identifier cell can
    satisfy k-anonymity (>= k members) yet still leak its sensitive
    attribute when every member SHARES one sensitive value — the homogeneity
    attack k-anonymity cannot see. Per (segment, nation) cell this emits
    member count AND the number of distinct sensitive values (account-balance
    band), with both gates and the combined release decision, so the privacy
    reviewer sees exactly which cells fail which test.
    Complements ``kanon_release_customers`` (suppression) and
    ``privacy_dp_noisy_counts`` (perturbation): the three standard release
    mechanisms side by side.

    Scale: one aggregation over the broadcast-dim join; count(DISTINCT) of
    the banded sensitive value partial-aggregates per cell. The cell grid is
    |segments| x |nations| — bounded output regardless of input size."""
    (cu, na) = _t(spark, sf_dir, "customer", "nation")
    band = F.floor(F.col("c_acctbal") / _BAL_BAND).cast("bigint")
    cells = (
        cu.join(F.broadcast(na), cu["c_nationkey"] == na["n_nationkey"])
        .groupBy("c_mktsegment", F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(band).alias("n_sensitive"),
        )
    )
    return cells.select(
        "c_mktsegment",
        "nation",
        "n_rows",
        "n_sensitive",
        (F.col("n_rows") >= KANON_K).alias("k_anonymous"),
        (F.col("n_sensitive") >= L_DIVERSITY).alias("l_diverse"),
        (
            (F.col("n_rows") >= KANON_K) & (F.col("n_sensitive") >= L_DIVERSITY)
        ).alias("releasable"),
    ).orderBy("c_mktsegment", "nation")


# Benford first-digit expectation log10(1 + 1/d), d = 1..9, inlined as
# literals so both engines compare against the identical constants.
import math as _math

_BENFORD = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


@register(
    "validate_benford_order_values",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ),
    tot AS (SELECT sum(n) AS total FROM obs),
    expected AS (
      {" UNION ALL ".join(f"SELECT {d} AS digit, {_BENFORD[d]!r} AS p_benford" for d in range(1, 10))}
    )
    SELECT CAST(e.digit AS BIGINT) AS digit,
           coalesce(o.n, 0) AS n_observed,
           round(coalesce(o.n, 0) * 1.0 / t.total, 6) AS p_observed,
           round(e.p_benford, 6) AS p_benford,
           round(pow(coalesce(o.n, 0) - t.total * e.p_benford, 2)
                 / (t.total * e.p_benford), 4) AS chi2_term
    FROM expected e
    LEFT JOIN obs o ON e.digit = o.digit
    CROSS JOIN tot t
    ORDER BY e.digit
    """,
    tags=("validation", "benford", "fraud-detection", "distribution"),
)
def validate_benford_order_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law conformance audit of order values: observed
    first-significant-digit shares vs log10(1+1/d), with per-digit chi-square
    contributions — the classic anomaly/fraud screen for financial columns
    (fabricated or systematically-generated amounts flunk it; the synthetic
    fixture's uniform-ish prices visibly do, which is the point of emitting
    per-digit terms instead of one p-value). All 9 digits are emitted even
    at zero count so the audit provably covered the full support.

    Scale shape: one map-side-combined aggregation to <= 9 cells; totals and
    expectations broadcast. The digit extraction is string head of the
    integer part — identical arithmetic both engines."""
    (orders,) = _t(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    obs = (
        orders.where(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
        # ^ <=9 rows feeding the total AND the expected join — pinned so the
        # orders scan runs once, not per branch
    )
    tot = obs.agg(F.sum("n").alias("total"))
    expected = spark.createDataFrame(
        [(d, _BENFORD[d]) for d in range(1, 10)], "digit bigint, p_benford double"
    )
    n_obs = F.coalesce(F.col("n"), F.lit(0))
    return (
        expected.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            n_obs.alias("n_observed"),
            F.round(n_obs / F.col("total"), 6).alias("p_observed"),
            F.round("p_benford", 6).alias("p_benford"),
            F.round(
                F.pow(n_obs - F.col("total") * F.col("p_benford"), 2)
                / (F.col("total") * F.col("p_benford")),
                4,
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


DP_EPSILON = 1.0  # Laplace scale b = sensitivity / epsilon = 1.0 for counts
_DP_U_RES = 1_000_000  # resolution of the deterministic uniform draw


@register(
    "privacy_dp_noisy_counts",
    oracle=f"""
    WITH cells AS (
      SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             count(*) AS true_n
      FROM events GROUP BY 1, 2
    ), drawn AS (
      SELECT event_type, day, true_n,
             ((('0x' || substr(md5(coalesce(event_type, '__null__') || '|'
                 || coalesce(CAST(day AS VARCHAR), '__null__')), 1, 15))::BIGINT
               % {_DP_U_RES}) + 0.5) / {_DP_U_RES} AS u
      FROM cells
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day,
           round(true_n + (-1.0 / {DP_EPSILON}) * sign(u - 0.5)
                 * ln(1 - 2 * abs(u - 0.5)), 4) AS noisy_count
    FROM drawn
    ORDER BY event_type, day
    """,
    tags=("validation", "privacy", "differential-privacy", "laplace"),
)
def privacy_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-(event_type, day) event
    counts with Laplace(b = 1/epsilon) noise, the standard mechanism for
    count queries (sensitivity 1). The noise draw inverts the Laplace CDF at
    a DETERMINISTIC uniform derived from md5 of the cell key — reproducible
    across engines, so the release is hash-checkable while exercising the
    exact production formula (swap the md5 uniform for a real RNG to deploy).
    Complements ``kanon_release_customers``: suppression vs perturbation.

    Scale: one partial-aggregating groupBy on a bounded key grid; the noise
    is a pure projection over the aggregate — no second pass, no UDF."""
    from feature_datalake_sl_mandic_spark.functions.hashing import md5_int60_col

    (ev,) = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("true_n"))
    # coalesce each key part to an explicit sentinel: concat_ws silently DROPS
    # a NULL part (key degenerates to just the day) while the oracle's `||`
    # would null the whole key — the sentinel makes both engines agree on
    # null-keyed cells.
    key = F.concat_ws(
        "|",
        F.coalesce(F.col("event_type"), F.lit("__null__")),
        F.coalesce(F.col("day").cast("string"), F.lit("__null__")),
    )
    u = ((md5_int60_col(key) % _DP_U_RES) + F.lit(0.5)) / F.lit(_DP_U_RES)
    noise = (
        F.lit(-1.0 / DP_EPSILON)
        * F.signum(u - F.lit(0.5))
        * F.log(F.lit(1) - F.lit(2) * F.abs(u - F.lit(0.5)))
    )
    return cells.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.round(F.col("true_n") + noise, 4).alias("noisy_count"),
    ).orderBy("event_type", "day")


_FK_EDGES = [
    # (child table, fk col, parent table, pk col)
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
]


@register(
    "validate_referential_integrity",
    oracle="\nUNION ALL\n".join(
        # NOT EXISTS, not NOT IN: a NULL parent pk would turn NOT IN into
        # NULL (orphans silently count as 0) while the Spark side's
        # left-join + __pk IS NULL counts them — EXISTS matches the
        # anti-join semantics on dirty parents, which is exactly the data
        # this audit targets.
        f"""
    SELECT '{child}.{fk} -> {parent}.{pk}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_child_rows,
           CAST(sum(CASE WHEN ch.{fk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null_fk,
           CAST(sum(CASE WHEN ch.{fk} IS NOT NULL
                          AND NOT EXISTS (SELECT 1 FROM {parent} par
                                          WHERE par.{pk} = ch.{fk})
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
    FROM {child} ch"""
        for child, fk, parent, pk in _FK_EDGES
    )
    + "\nORDER BY fk_edge",
    tags=("validation", "referential-integrity", "anti-join", "audit"),
)
def validate_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every foreign-key edge of the star
    schema: per edge, total child rows, NULL foreign keys, and orphans
    (non-NULL keys with no parent). The lake has no FK enforcement — this is
    the post-load audit that catches a truncated parent load or an
    out-of-order ingest before downstream joins silently drop rows. The
    reference pipeline (SURVEY §0 census) ingests parent and child tables
    independently and would land exactly this failure mode unflagged.

    Scale shape: ALL SIX edges share ONE aggregation and ONE join, and each
    physical table is SCANNED ONCE PER ROLE: a table carrying several edges
    (lineitem is the child of three; nation the parent of two) reads all
    its key columns in one column-pruned scan and explodes a literal
    (fk_edge, key) struct array — one output row per edge — instead of one
    scan per edge (was 3 lineitem scans; at fact scale the extra scans ARE
    the audit's cost). Every edge's child keys then union into a single
    tall (fk_edge, key) relation that collapses to (fk_edge, key, count)
    via one map-side-combined aggregation; every edge's parent keys union
    into a tall distinct relation keyed the same way; the existence check
    is one left join on (fk_edge, key) — and because both aggregations
    leave their outputs hash-partitioned on exactly that pair, the join
    adds NO exchange (EnsureRequirements reuses both partitionings). The
    whole audit is 4 exchanges total regardless of how many edges the
    schema has (child agg, parent distinct, 6-row final agg, output sort),
    versus ~6 per edge in the row-level formulation (was 36 in PLANS.md
    units). Unioning before aggregating also load-balances: one edge's
    skewed fk domain shares the shuffle with all others."""
    tables = sorted({t for e in _FK_EDGES for t in (e[0], e[2])})
    dfs = dict(zip(tables, _t(spark, sf_dir, *tables)))

    def _label(child, fk, parent, pk):
        return f"{child}.{fk} -> {parent}.{pk}"

    def _tall(edges_by_table: dict, out_key: str) -> DataFrame:
        """One scan per table: explode its [(edge label, key)] pairs."""
        parts = []
        for table, pairs in sorted(edges_by_table.items()):
            entry = F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(label).alias("fk_edge"),
                            F.col(key_col).cast("bigint").alias(out_key),
                        )
                        for label, key_col in pairs
                    ]
                )
            ).alias("e")
            parts.append(dfs[table].select(entry).select("e.fk_edge", f"e.{out_key}"))
        tall = parts[0]
        for part in parts[1:]:
            tall = tall.unionAll(part)
        return tall

    child_edges: dict[str, list] = {}
    parent_edges: dict[str, list] = {}
    for child, fk, parent, pk in _FK_EDGES:
        child_edges.setdefault(child, []).append((_label(child, fk, parent, pk), fk))
        parent_edges.setdefault(parent, []).append((_label(child, fk, parent, pk), pk))

    cnt = (
        _tall(child_edges, "__fk")
        .groupBy("fk_edge", "__fk")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    keys = _tall(parent_edges, "__pk").distinct()

    joined = cnt.join(
        keys,
        (cnt["fk_edge"] == keys["fk_edge"]) & (F.col("__fk") == F.col("__pk")),
        "left",
    )
    return (
        joined.groupBy(cnt["fk_edge"].alias("fk_edge"))
        .agg(
            F.sum("__n").alias("n_child_rows"),
            F.sum(F.when(F.col("__fk").isNull(), F.col("__n")).otherwise(0)).alias(
                "n_null_fk"
            ),
            F.sum(
                F.when(
                    F.col("__fk").isNotNull() & F.col("__pk").isNull(),
                    F.col("__n"),
                ).otherwise(0)
            ).alias("n_orphans"),
        )
        .orderBy("fk_edge")
    )
