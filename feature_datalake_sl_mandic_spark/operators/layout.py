"""Data-layout optimization: Z-order clustering + zone-map skipping scorecard.

Extension surface (no analog in the reference — its sinks write unsorted
full-refresh parquet, SURVEY.md §2.1 S10). At 100 TB the dominant cost of a
selective query is how many FILES its predicate can skip via min/max zone
maps (parquet row-group stats / Delta-style file stats). Which rows land in
which file is therefore a first-class operator:

- ``layout_zorder_files``: assign each row a file by (a) hash-partitioning on
  one dimension (the default layout every naive writer produces) and (b) the
  Z-order (Morton) interleave of two dimensions — then emit per-file min/max
  zone maps for BOTH dimensions under both layouts. The single-dim layout
  gives perfect stats on its own key and useless full-range stats on the
  other; Z-order bounds both, which is the entire trick.
- ``layout_skipping_scorecard``: evaluate those zone maps — for every point
  probe on each dimension, count the files whose [min, max] must be scanned;
  report the average scanned fraction per (layout, dimension). This is the
  number a table-maintenance job watches to decide when to re-cluster.

Scale shape: both operators are pure projections + one bounded groupBy on
(layout, file_id) — ≤ 2·N_FILES cells regardless of input size; the
scorecard joins that bounded relation with a literal probe dimension. The
Morton code itself is integer shift/mask arithmetic inside whole-stage
codegen, the same expression a real ``OPTIMIZE ... ZORDER BY`` writer would
sort by before splitting into 128 MiB files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register

Z_BITS = 4  # bits per dimension -> 16x16 grid, 256 Morton codes
N_FILES = 16


def _morton_col(x: Column, y: Column) -> Column:
    z: Column = F.lit(0)
    for i in range(Z_BITS):
        z = z + ((x / (1 << i)).cast("bigint") % 2) * (1 << (2 * i))
        z = z + ((y / (1 << i)).cast("bigint") % 2) * (1 << (2 * i + 1))
    return z


def _morton_sql(x: str, y: str) -> str:
    terms = []
    for i in range(Z_BITS):
        terms.append(f"(({x} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({y} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_DUCK_FILES = f"""
    WITH dims AS (
      SELECT (o_custkey % {1 << Z_BITS}) AS x,
             (day(o_orderdate) % {1 << Z_BITS}) AS y
      FROM orders
    ),
    assigned AS (
      SELECT x, y,
             x AS hash_file,
             ({_morton_sql("x", "y")}) // {(1 << (2 * Z_BITS)) // N_FILES}
               AS z_file
      FROM dims
    ),
    both_layouts AS (
      SELECT 'hash_x' AS layout, hash_file AS file_id, x, y FROM assigned
      UNION ALL
      SELECT 'zorder' AS layout, z_file AS file_id, x, y FROM assigned
    )
    SELECT layout, file_id, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM both_layouts
    GROUP BY layout, file_id
"""


@register(
    "layout_zorder_files",
    oracle=f"""
    {_DUCK_FILES}
    ORDER BY layout, file_id
    """,
    tags=("layout", "zorder", "zone-maps", "data-skipping"),
)
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file zone maps for two rival file layouts of ``orders`` clustered
    on (customer bucket, order day-of-month): hash-on-one-dim vs Z-order on
    both. The emitted min/max stats ARE the skipping index; see
    ``layout_skipping_scorecard`` for the derived scan-fraction metric."""
    return _files_relation(spark, sf_dir).orderBy("layout", "file_id")


def _files_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    grid = 1 << Z_BITS
    dims = orders.select(
        (F.col("o_custkey") % grid).cast("bigint").alias("x"),
        (F.dayofmonth("o_orderdate") % grid).cast("bigint").alias("y"),
    )
    z = _morton_col(F.col("x"), F.col("y"))
    assigned = dims.select(
        "x",
        "y",
        F.col("x").alias("hash_file"),
        (z / ((1 << (2 * Z_BITS)) // N_FILES)).cast("bigint").alias("z_file"),
    )
    both = assigned.select(
        F.lit("hash_x").alias("layout"), F.col("hash_file").alias("file_id"), "x", "y"
    ).unionAll(
        assigned.select(
            F.lit("zorder").alias("layout"), F.col("z_file").alias("file_id"), "x", "y"
        )
    )
    return both.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("x_min"),
        F.max("x").alias("x_max"),
        F.min("y").alias("y_min"),
        F.max("y").alias("y_max"),
    )


@register(
    "layout_skipping_scorecard",
    oracle=f"""
    WITH files AS ({_DUCK_FILES}),
    probes AS (SELECT t.p FROM range(0, {1 << Z_BITS}) t(p)),
    x_scan AS (
      SELECT f.layout, 'x' AS dim, p.p,
             sum(CASE WHEN p.p BETWEEN f.x_min AND f.x_max THEN 1 ELSE 0 END)
               AS files_scanned
      FROM files f CROSS JOIN probes p
      GROUP BY f.layout, p.p
    ),
    y_scan AS (
      SELECT f.layout, 'y' AS dim, p.p,
             sum(CASE WHEN p.p BETWEEN f.y_min AND f.y_max THEN 1 ELSE 0 END)
               AS files_scanned
      FROM files f CROSS JOIN probes p
      GROUP BY f.layout, p.p
    ),
    all_scans AS (SELECT * FROM x_scan UNION ALL SELECT * FROM y_scan),
    n AS (SELECT layout, count(*) AS n_files FROM files GROUP BY layout)
    SELECT s.layout, s.dim, n.n_files,
           round(avg(s.files_scanned / n.n_files), 4) AS avg_scan_fraction
    FROM all_scans s JOIN n USING (layout)
    GROUP BY s.layout, s.dim, n.n_files
    ORDER BY s.layout, s.dim
    """,
    tags=("layout", "zorder", "data-skipping", "scorecard"),
)
def layout_skipping_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness per (layout, probe dimension): for every point
    probe ``dim = p`` (p over the full 16-value grid), the fraction of files
    whose [min, max] admits p — i.e. cannot be skipped — averaged over
    probes. ``hash_x`` scans 1/16 of files for x-probes but ~all files for
    y-probes; ``zorder`` lands in between on BOTH dims, which is why
    re-clustering by Z-order is the standard answer when a table serves
    selective queries on two keys. Everything after the bounded per-file
    aggregation is literal-sized arithmetic."""
    # 2·N_FILES zone-map rows feed four probe subtrees — truncate lineage so
    # the orders scan runs once, not per (dim, aggregate) subtree.
    files = _files_relation(spark, sf_dir).localCheckpoint(eager=False)
    grid = 1 << Z_BITS
    probes = spark.range(grid).select(F.col("id").alias("p"))
    scans = None
    for dim in ("x", "y"):
        hit = F.col("p").between(F.col(f"{dim}_min"), F.col(f"{dim}_max"))
        s = (
            files.crossJoin(F.broadcast(probes))
            .groupBy("layout", "p")
            .agg(F.sum(hit.cast("int")).alias("files_scanned"))
            .select("layout", F.lit(dim).alias("dim"), "p", "files_scanned")
        )
        scans = s if scans is None else scans.unionAll(s)
    n = files.groupBy("layout").agg(F.count(F.lit(1)).alias("n_files"))
    return (
        scans.join(F.broadcast(n), "layout")
        .groupBy("layout", "dim", "n_files")
        .agg(
            F.round(
                F.avg(F.col("files_scanned") / F.col("n_files")), 4
            ).alias("avg_scan_fraction")
        )
        .select("layout", "dim", "n_files", "avg_scan_fraction")
        .orderBy("layout", "dim")
    )
