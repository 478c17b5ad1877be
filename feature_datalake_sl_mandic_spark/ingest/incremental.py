"""Incremental maintenance of materialized aggregates.

The reference recomputes everything it loads from scratch (full-refresh
overwrite, ``spark_ingest_slmandicprd.py:99-103``); the standard upgrade is
to maintain downstream aggregates INCREMENTALLY: aggregate only the arriving
batch, then merge the partial aggregates into the stored view — touched
groups update, untouched groups are carried over unread. For distributive
aggregates (count/sum, and avg as sum/count) the merge is a full-outer join
plus coalesced addition; retractions are just negative deltas.

Scale shape: the delta aggregation shuffles ONLY the batch (not the 100 TB
history); the merge join shuffles the view and the tiny per-group delta on
the group key — with the view bucketed by group key (``write_bucketed``)
even that shuffle disappears. Sums run over DECIMAL so partial + merge is
bit-exact — the incremental result equals a from-scratch recompute exactly,
which is precisely what the registered oracle asserts (Spark maintains
incrementally; DuckDB recomputes from all rows; hashes must match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.relational import _t
from feature_datalake_sl_mandic_spark.registry import register


def aggregate_batch(batch: DataFrame, keys: list[str], sums: dict[str, str]) -> DataFrame:
    """Partial aggregate of one batch: count + exact decimal sums."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for out, col in sums.items():
        aggs.append(F.sum(F.col(col).cast("decimal(38,6)")).alias(out))
    return batch.groupBy(*keys).agg(*aggs)


def incremental_refresh(
    matview: DataFrame, delta: DataFrame, keys: list[str], measure_cols: list[str]
) -> DataFrame:
    """Merge per-group partial aggregates into the stored view: full-outer
    join on the group keys, additive coalesce per measure. Groups absent
    from the delta pass through; groups new to the view appear."""
    mv = matview.alias("mv")
    dl = delta.alias("dl")
    merged = mv.join(dl, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for m in ["n_rows", *measure_cols]:
        out_cols.append(
            (
                F.coalesce(F.col(f"mv.{m}"), F.lit(0))
                + F.coalesce(F.col(f"dl.{m}"), F.lit(0))
            ).alias(m)
        )
    return merged.select(*out_cols)


@register(
    "incremental_agg_refresh",
    oracle="""
    SELECT CAST(o_orderdate AS DATE)::VARCHAR AS day,
           count(*) AS n_rows,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY day
    """,
    tags=("ingest", "incremental", "materialized-view", "merge"),
)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintain a daily-revenue view incrementally: the view is built from
    the 'already loaded' slice (orderkey % 7 != 0), the remaining rows
    arrive as a batch, only the batch is re-aggregated and merged. The
    oracle recomputes from ALL rows — hash equality proves the incremental
    path is exact, not approximately right."""
    (od,) = _t(spark, sf_dir, "orders")
    day = F.to_date("o_orderdate").alias("day")
    loaded = od.where(F.col("o_orderkey") % 7 != 0).select(day, "o_totalprice")
    arriving = od.where(F.col("o_orderkey") % 7 == 0).select(day, "o_totalprice")

    matview = aggregate_batch(loaded, ["day"], {"revenue": "o_totalprice"})
    delta = aggregate_batch(arriving, ["day"], {"revenue": "o_totalprice"})
    refreshed = incremental_refresh(matview, delta, ["day"], ["revenue"])
    return refreshed.select(
        F.col("day").cast("string").alias("day"),
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.round(F.col("revenue"), 2).cast("double").alias("revenue"),
    ).orderBy("day")
