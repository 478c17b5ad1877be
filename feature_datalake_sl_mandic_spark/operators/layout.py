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
# Deliberately NOT a power of 4: rows-per-file = 256//12 = 21 makes file
# boundaries cross quadrant seams, which is where Z-order's discontinuous
# jumps widen bounding boxes and Hilbert's seam-free walk keeps them tight
# (measured on the 4x4 box probes: z 0.226 vs hilbert 0.144 scan fraction).
# Power-of-4 file counts align every file with a quadtree block and the two
# curves become indistinguishable — real tables don't get that luck.
N_FILES = 12
_BOX = 4  # side of the aligned 2-D box probes in the skipping scorecard


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


# Hilbert curve: the standard xy->d walk (one rotate-and-reflect step per
# bit, most-significant first), UNROLLED over the Z_BITS levels so both
# engines compute it as a chain of pure CASE projections — no lookup table,
# no UDF. Per step with side s: quadrant bits rx = (hx//s)%2, ry = (hy//s)%2;
# d += s^2 * ((3*rx) xor ry)  [spelled as a 4-way CASE for portability];
# then rotate: ry=0 -> (reflect across the FULL grid, n-1-coord, if rx=1,
# then swap axes), else identity.

_GRID = 1 << Z_BITS


def _hilbert_step_cols(hx: Column, hy: Column, hd: Column, s: int):
    rx = (hx / s).cast("bigint") % 2
    ry = (hy / s).cast("bigint") % 2
    quad = (
        F.when((rx == 0) & (ry == 0), 0)
        .when((rx == 0) & (ry == 1), 1)
        .when((rx == 1) & (ry == 1), 2)
        .otherwise(3)
    )
    nd = hd + F.lit(s * s) * quad
    nx = F.when(
        ry == 0, F.when(rx == 1, F.lit(_GRID - 1) - hy).otherwise(hy)
    ).otherwise(hx)
    ny = F.when(
        ry == 0, F.when(rx == 1, F.lit(_GRID - 1) - hx).otherwise(hx)
    ).otherwise(hy)
    return nx, ny, nd


def _hilbert_df(df: DataFrame, x: str, y: str, out: str) -> DataFrame:
    """Append Hilbert index ``out`` of (``x``, ``y``) via chained projections."""
    df = df.withColumn("__hx", F.col(x)).withColumn("__hy", F.col(y)).withColumn(
        "__hd", F.lit(0).cast("bigint")
    )
    for i in reversed(range(Z_BITS)):
        nx, ny, nd = _hilbert_step_cols(
            F.col("__hx"), F.col("__hy"), F.col("__hd"), 1 << i
        )
        df = df.withColumns({"__hx2": nx, "__hy2": ny, "__hd2": nd}).select(
            *[c for c in df.columns if not c.startswith("__h")],
            F.col("__hx2").alias("__hx"),
            F.col("__hy2").alias("__hy"),
            F.col("__hd2").alias("__hd"),
        )
    return df.withColumnRenamed("__hd", out).drop("__hx", "__hy")


def _hilbert_sql_ctes(src: str) -> str:
    """DuckDB chain: CTE per bit level over relation ``src`` (must expose
    x, y); final relation ``hil`` adds column hd."""
    ctes = [f"h{Z_BITS} AS (SELECT *, x AS hx, y AS hy, 0 AS hd FROM {src})"]
    for i in reversed(range(Z_BITS)):
        s = 1 << i
        prev = f"h{i + 1}"
        ctes.append(f"""h{i} AS (
      SELECT * EXCLUDE (hx, hy, hd),
             CASE WHEN (hy // {s}) % 2 = 0
                  THEN CASE WHEN (hx // {s}) % 2 = 1 THEN {_GRID - 1} - hy ELSE hy END
                  ELSE hx END AS hx,
             CASE WHEN (hy // {s}) % 2 = 0
                  THEN CASE WHEN (hx // {s}) % 2 = 1 THEN {_GRID - 1} - hx ELSE hx END
                  ELSE hy END AS hy,
             hd + {s * s} * (CASE WHEN (hx // {s}) % 2 = 0 AND (hy // {s}) % 2 = 0 THEN 0
                                  WHEN (hx // {s}) % 2 = 0 AND (hy // {s}) % 2 = 1 THEN 1
                                  WHEN (hx // {s}) % 2 = 1 AND (hy // {s}) % 2 = 1 THEN 2
                                  ELSE 3 END) AS hd
      FROM {prev})""")
    ctes.append(f"hil AS (SELECT * EXCLUDE (hx, hy) FROM h0)")
    return ",\n    ".join(ctes)


_ROWS_PER_FILE = (1 << (2 * Z_BITS)) // N_FILES

_DUCK_FILES = f"""
    WITH dims AS (
      SELECT (o_custkey % {1 << Z_BITS}) AS x,
             (day(o_orderdate) % {1 << Z_BITS}) AS y
      FROM orders
    ),
    {{hilbert_ctes}},
    assigned AS (
      SELECT x, y,
             x AS hash_file,
             ({_morton_sql("x", "y")}) // {_ROWS_PER_FILE} AS z_file,
             hd // {_ROWS_PER_FILE} AS h_file
      FROM hil
    ),
    all_layouts AS (
      SELECT 'hash_x' AS layout, hash_file AS file_id, x, y FROM assigned
      UNION ALL
      SELECT 'zorder' AS layout, z_file AS file_id, x, y FROM assigned
      UNION ALL
      SELECT 'hilbert' AS layout, h_file AS file_id, x, y FROM assigned
    )
    SELECT layout, file_id, count(*) AS n_rows,
           min(x) AS x_min, max(x) AS x_max,
           min(y) AS y_min, max(y) AS y_max
    FROM all_layouts
    GROUP BY layout, file_id
"""
_DUCK_FILES = _DUCK_FILES.format(hilbert_ctes=_hilbert_sql_ctes("dims"))


@register(
    "layout_zorder_files",
    oracle=f"""
    {_DUCK_FILES}
    ORDER BY layout, file_id
    """,
    tags=("layout", "zorder", "zone-maps", "data-skipping"),
)
def layout_zorder_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-file zone maps for three rival file layouts of ``orders``
    clustered on (customer bucket, order day-of-month): hash-on-one-dim,
    Z-order (Morton) on both, and Hilbert-curve on both — the layout real
    OPTIMIZE implementations moved to after Z-order (Hilbert has no Morton
    "seams", so its per-file bounding boxes are tighter on average). The
    emitted min/max stats ARE the skipping index; see
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
    assigned = _hilbert_df(dims, "x", "y", "hd").select(
        "x",
        "y",
        F.col("x").alias("hash_file"),
        (z / _ROWS_PER_FILE).cast("bigint").alias("z_file"),
        (F.col("hd") / _ROWS_PER_FILE).cast("bigint").alias("h_file"),
    )
    layouts = [("hash_x", "hash_file"), ("zorder", "z_file"), ("hilbert", "h_file")]
    # all three layouts ride ONE exploded scan (a per-layout unionAll would
    # re-run the scan + curve computation once per layout)
    tall = assigned.select(
        "x",
        "y",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("layout"), F.col(col).alias("file_id")
                    )
                    for name, col in layouts
                ]
            )
        ).alias("e"),
    ).select(F.col("e.layout").alias("layout"), F.col("e.file_id").alias("file_id"), "x", "y")
    return tall.groupBy("layout", "file_id").agg(
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
    box AS (
      SELECT bx.b * {_BOX} AS px, bq.b * {_BOX} AS py
      FROM range(0, {(1 << Z_BITS) // _BOX}) bx(b)
      CROSS JOIN range(0, {(1 << Z_BITS) // _BOX}) bq(b)
    ),
    box_scan AS (
      SELECT f.layout, 'xy_box' AS dim, b.px * 100 + b.py AS p,
             sum(CASE WHEN b.px <= f.x_max AND b.px + {_BOX - 1} >= f.x_min
                       AND b.py <= f.y_max AND b.py + {_BOX - 1} >= f.y_min
                      THEN 1 ELSE 0 END) AS files_scanned
      FROM files f CROSS JOIN box b
      GROUP BY f.layout, b.px, b.py
    ),
    all_scans AS (
      SELECT * FROM x_scan UNION ALL SELECT * FROM y_scan
      UNION ALL SELECT * FROM box_scan
    ),
    n AS (SELECT layout, count(*) AS n_files FROM files GROUP BY layout)
    SELECT s.layout, s.dim, n.n_files,
           round(avg(s.files_scanned / n.n_files), 4) AS avg_scan_fraction
    FROM all_scans s JOIN n USING (layout)
    GROUP BY s.layout, s.dim, n.n_files
    ORDER BY s.layout, s.dim
    """,
    tags=("layout", "zorder", "hilbert", "data-skipping", "scorecard"),
)
def layout_skipping_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map effectiveness per (layout, probe shape): for every point
    probe ``dim = p`` (p over the full 16-value grid) and every aligned
    4x4 box probe (``xy_box`` — the two-dimensional range query multi-dim
    clustering exists for), the fraction of files whose [min, max] ranges
    intersect the probe — i.e. cannot be skipped — averaged over probes.
    ``hash_x`` scans 1/16 of files for x-probes but ~all files for y-probes;
    ``zorder`` and ``hilbert`` land in between on BOTH dims, and on the 2-D
    box probes Hilbert's seam-free locality gives it the (slightly) tightest
    bounding boxes — the reason OPTIMIZE implementations moved from Z-order
    to Hilbert. Everything after the bounded per-file aggregation is
    literal-sized arithmetic."""
    # 3·N_FILES zone-map rows feed the probe subtrees — truncate lineage so
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
    nb = grid // _BOX
    boxes = (
        spark.range(nb)
        .select((F.col("id") * _BOX).alias("px"))
        .crossJoin(spark.range(nb).select((F.col("id") * _BOX).alias("py")))
    )
    box_hit = (
        (F.col("px") <= F.col("x_max"))
        & (F.col("px") + (_BOX - 1) >= F.col("x_min"))
        & (F.col("py") <= F.col("y_max"))
        & (F.col("py") + (_BOX - 1) >= F.col("y_min"))
    )
    s = (
        files.crossJoin(F.broadcast(boxes))
        .groupBy("layout", "px", "py")
        .agg(F.sum(box_hit.cast("int")).alias("files_scanned"))
        .select(
            "layout",
            F.lit("xy_box").alias("dim"),
            (F.col("px") * 100 + F.col("py")).alias("p"),
            "files_scanned",
        )
    )
    scans = scans.unionAll(s)
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
