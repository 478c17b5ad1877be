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

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-format profile: one row per column with row/null/distinct counts
    and stringified min/max. Single aggregation pass over ``df``."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__distinct_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
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
