"""Streaming-style sketch operators, made deterministic and oracle-checkable.

Extension surface (BASELINE.json "approximate ops"). Unlike
``agg_approx_sketches`` (HLL/approx-percentile, whose internals are
engine-specific and checked via an error-band contract), both operators here
are built from md5 — the one hash both engines compute identically — so their
FULL output is value-hash-checked, overestimates and false positives
included:

- **Count-min sketch**: d=4 hash rows × w=64 buckets; ``estimate(key) =
  min_j cell[j][h_j(key)]``. Build is one groupBy over (row, bucket) — d·w
  cells total regardless of input size, the textbook bounded-memory
  frequency sketch. CMS guarantees estimate >= exact; the query emits both
  so the error is visible.
- **Bloom-filter join prefilter**: k=3 hashes into m=64 bits, the bitset
  relationalized as (hash_row, bit) pairs. The small build side broadcasts;
  the probe side keeps only rows matching all k bits — the classic
  shuffle-avoiding semi-join prefilter (Spark's own runtime bloom pushdown,
  spelled out). m is sized small here so false positives actually occur in
  the fixture and the FP-handling path is exercised, not just compiled.

Scale shape: both sketches are O(constant) state after one map-side-combined
aggregation; probe sides never shuffle more than the prefiltered stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.functions.hashing import md5_int60_col, md5_int60_sql
from feature_datalake_sl_mandic_spark.functions.ranking import topk_with_rank
from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register

CMS_DEPTH = 4
CMS_WIDTH = 64  # < distinct-key count, so bucket collisions (and visible
                # overestimates) actually occur in the fixture
CMS_TOP = 20

BLOOM_K = 3
BLOOM_M = 64  # undersized on purpose: ~50% fill -> real false positives
BLOOM_NATIONS = 5  # member set: suppliers with s_nationkey < 5


def _cms_bucket_col(j, key) -> F.Column:
    return md5_int60_col(F.concat_ws(":", j.cast("string"), key.cast("string"))) % CMS_WIDTH


def _cms_bucket_sql(j_expr: str, key_expr: str) -> str:
    h = md5_int60_sql(f"CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)")
    return f"{h} % {CMS_WIDTH}"


@register(
    "cms_heavy_hitters_events",
    oracle=f"""
    WITH hashes AS (
      SELECT user_id, t.j, {_cms_bucket_sql("t.j", "user_id")} AS b
      FROM events CROSS JOIN range(0, {CMS_DEPTH}) t(j)
    ), cells AS (
      SELECT j, b, count(*) AS n FROM hashes GROUP BY j, b
    ), exact AS (
      SELECT user_id, count(*) AS exact_count FROM events GROUP BY user_id
    ), candidates AS (
      SELECT user_id, exact_count,
             row_number() OVER (ORDER BY exact_count DESC, user_id) AS rnk
      FROM exact
    ), probes AS (
      SELECT c.user_id, c.exact_count, c.rnk, t.j,
             {_cms_bucket_sql("t.j", "c.user_id")} AS b
      FROM candidates c CROSS JOIN range(0, {CMS_DEPTH}) t(j)
      WHERE c.rnk <= {CMS_TOP}
    )
    SELECT p.user_id, p.exact_count, CAST(p.rnk AS BIGINT) AS rnk,
           min(cells.n) AS cms_estimate
    FROM probes p JOIN cells ON p.j = cells.j AND p.b = cells.b
    GROUP BY p.user_id, p.exact_count, p.rnk
    ORDER BY rnk
    """,
    tags=("sketch", "count-min", "heavy-hitters", "events"),
)
def cms_heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the event stream keyed by user: build d×w cells
    in one aggregation, probe the exact top-20 users, emit exact vs CMS
    estimate (estimate >= exact by construction; equality when no bucket
    collision)."""
    (ev,) = _t(spark, sf_dir, "events")
    js = spark.range(CMS_DEPTH).select(F.col("id").alias("j"))
    hashes = ev.select("user_id").crossJoin(F.broadcast(js)).select(
        "j", _cms_bucket_col(F.col("j"), F.col("user_id")).alias("b")
    )
    cells = hashes.groupBy("j", "b").agg(F.count(F.lit(1)).alias("n"))
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_count"))
    candidates = topk_with_rank(
        exact, [("exact_count", "desc"), ("user_id", "asc")], CMS_TOP
    )
    probes = candidates.crossJoin(F.broadcast(js)).select(
        "user_id",
        "exact_count",
        "rnk",
        "j",
        _cms_bucket_col(F.col("j"), F.col("user_id")).alias("b"),
    )
    return (
        probes.join(F.broadcast(cells), on=["j", "b"])
        .groupBy("user_id", "exact_count", "rnk")
        .agg(F.min("n").alias("cms_estimate"))
        .orderBy("rnk")
    )


def _bloom_bit_sql(j_expr: str, key_expr: str) -> str:
    h = md5_int60_sql(f"'b' || CAST({j_expr} AS VARCHAR) || ':' || CAST({key_expr} AS VARCHAR)")
    return f"{h} % {BLOOM_M}"


def _bloom_bit_col(j, key) -> F.Column:
    return (
        md5_int60_col(
            F.concat(F.lit("b"), j.cast("string"), F.lit(":"), key.cast("string"))
        )
        % BLOOM_M
    )


@register(
    "bloom_prefilter_supplier_join",
    oracle=f"""
    WITH members AS (
      SELECT s_suppkey FROM supplier WHERE s_nationkey < {BLOOM_NATIONS}
    ), bits AS (
      SELECT DISTINCT {_bloom_bit_sql("t.j", "s_suppkey")} AS bit
      FROM members CROSS JOIN range(0, {BLOOM_K}) t(j)
    ), probe AS (
      SELECT s.s_suppkey, t.j, {_bloom_bit_sql("t.j", "s.s_suppkey")} AS bit
      FROM supplier s CROSS JOIN range(0, {BLOOM_K}) t(j)
    ), passed AS (
      SELECT p.s_suppkey
      FROM probe p JOIN bits USING (bit)
      GROUP BY p.s_suppkey HAVING count(*) = {BLOOM_K}
    )
    SELECT p.s_suppkey,
           (m.s_suppkey IS NOT NULL) AS actual_member,
           coalesce(li.n, 0) AS n_lineitem_rows
    FROM passed p
    LEFT JOIN members m ON p.s_suppkey = m.s_suppkey
    LEFT JOIN (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey) li
      ON p.s_suppkey = li.l_suppkey
    ORDER BY p.s_suppkey
    """,
    tags=("sketch", "bloom-filter", "join-prefilter", "broadcast-join"),
)
def bloom_prefilter_supplier_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join prefilter: build k=3/m=64 bits over the member
    supplier set, prefilter the supplier probe side, then join lineitem
    counts only for survivors. False positives (actual_member = false) are
    part of the checked output — the filter is intentionally undersized so
    the FP path is real."""
    su, li = _t(spark, sf_dir, "supplier", "lineitem")
    js = spark.range(BLOOM_K).select(F.col("id").alias("j"))
    members = su.where(F.col("s_nationkey") < BLOOM_NATIONS).select("s_suppkey")
    # Unpartitioned bitset: all k hash rows share one bit array (a probe's
    # hash j may match a bit set by any member hash) — the classic Bloom.
    bits = (
        members.crossJoin(F.broadcast(js))
        .select(_bloom_bit_col(F.col("j"), F.col("s_suppkey")).alias("bit"))
        .distinct()
    )
    probe = su.select("s_suppkey").crossJoin(F.broadcast(js)).select(
        "s_suppkey", "j", _bloom_bit_col(F.col("j"), F.col("s_suppkey")).alias("bit")
    )
    passed = (
        probe.join(F.broadcast(bits), on=["bit"])
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("k_hits"))
        .where(F.col("k_hits") == BLOOM_K)
        .select("s_suppkey")
    )
    li_counts = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        passed.join(members.withColumn("is_m", F.lit(True)), on="s_suppkey", how="left")
        .join(li_counts, on="s_suppkey", how="left")
        .select(
            "s_suppkey",
            F.coalesce(F.col("is_m"), F.lit(False)).alias("actual_member"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_lineitem_rows"),
        )
        .orderBy("s_suppkey")
    )
