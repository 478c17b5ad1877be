"""Change detection: which tables need re-ingestion.

Re-expresses the reference's driver-side Python delta loop
(``Sites/DataProc_Script/verifica_carga_slmandicprd.py:91-100``) as a real
DataFrame join, preserving its null semantics exactly (FIXTURES.md §2 truth
table):

- no history row (never loaded)        -> RELOAD
- source ``update_time`` IS NULL       -> SKIP
- ``update_time`` >  ``last_exec``     -> RELOAD (strictly greater)
- ``update_time`` <= ``last_exec``     -> SKIP

The reference materializes both sides into Python dicts via ``collect()``
(``verifica_carga_slmandicprd.py:63,82``); here the comparison is a
left-outer join + filter, so it scales to catalogs of any size and Catalyst
broadcasts the (small) history side automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.registry import register


def detect_changes(catalog: DataFrame, history: DataFrame) -> DataFrame:
    """Tables to reload, with reason.

    ``catalog``: (table_name, update_time) — source freshness (the reference's
    information_schema / sys.tables scan, S2/S3).
    ``history``: (table_name, last_exec) — latest successful run per table
    (the reference's MAX…GROUP BY over Historico_Execucao, S4).

    Returns (table_name, reason) with reason in {'never_loaded', 'stale'}.
    """
    joined = catalog.join(history, "table_name", "left_outer")
    return (
        joined.where(
            F.col("update_time").isNotNull()
            & (F.col("last_exec").isNull() | (F.col("update_time") > F.col("last_exec")))
        )
        .select(
            "table_name",
            F.when(F.col("last_exec").isNull(), "never_loaded")
            .otherwise("stale")
            .alias("reason"),
        )
    )


def derive_fixture_inputs(ev: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Deterministic catalog/history pair derived from ``events`` so change
    detection is exercisable (and oracle-checkable) on driver fixtures alone.

    catalog: one row per event_type; 'error' gets NULL update_time (the
    "skip" case). history: only 'click' (stale: last_exec 1h before
    update_time) and 'view' (fresh: 1h after); other types have no row
    (the "never loaded" case)."""
    catalog = ev.groupBy(F.col("event_type").alias("table_name")).agg(
        F.when(F.col("table_name") == "error", F.lit(None).cast("timestamp"))
        .otherwise(F.max("ts"))
        .alias("update_time")
    )
    history = (
        ev.where(F.col("event_type").isin("click", "view"))
        .groupBy(F.col("event_type").alias("table_name"))
        .agg(
            F.when(
                F.col("table_name") == "click",
                F.max("ts") - F.expr("INTERVAL 1 HOUR"),
            )
            .otherwise(F.max("ts") + F.expr("INTERVAL 1 HOUR"))
            .alias("last_exec")
        )
    )
    return catalog, history


@register(
    "change_detection",
    oracle="""
    WITH catalog AS (
      SELECT event_type AS table_name,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE max(CAST(ts AS TIMESTAMP)) END AS update_time
      FROM events GROUP BY event_type
    ),
    history AS (
      SELECT event_type AS table_name,
             CASE WHEN event_type = 'click'
                  THEN max(CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR
                  ELSE max(CAST(ts AS TIMESTAMP)) + INTERVAL 1 HOUR END AS last_exec
      FROM events WHERE event_type IN ('click', 'view') GROUP BY event_type
    )
    SELECT c.table_name,
           CASE WHEN h.last_exec IS NULL THEN 'never_loaded' ELSE 'stale' END AS reason
    FROM catalog c LEFT JOIN history h ON c.table_name = h.table_name
    WHERE c.update_time IS NOT NULL
      AND (h.last_exec IS NULL OR c.update_time > h.last_exec)
    ORDER BY c.table_name
    """,
    tags=("ingest", "change-detection", "anti-join", "null-semantics"),
)
def change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 change detection as DataFrames over fixture-derived inputs —
    exercises all four rows of the null-semantics truth table."""
    from feature_datalake_sl_mandic_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    catalog, history = derive_fixture_inputs(ev)
    return detect_changes(catalog, history).orderBy("table_name")
