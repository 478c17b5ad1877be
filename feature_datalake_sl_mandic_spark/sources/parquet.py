"""Lake source/sink: parquet tables with overwrite/append semantics.

Replaces the reference's BigQuery-via-GCS-staging sink
(``spark_ingest_slmandicprd.py:99-103`` overwrite; ``:136-141`` append) with
direct lake writes — schema propagation is native (the write carries the
DataFrame's StructType; no hand-rolled DDL, SURVEY.md §1.3), and the naming
convention ``<database>_raw/<table>`` mirrors the reference's dataset layout
(``spark_ingest_slmandicprd.py:23,89,99-101``).

Scale notes: writers repartition to a target file count so 100 TB tables
produce sanely-sized files (no tiny-file explosion, no single-writer
bottleneck); readers are plain ``spark.read.parquet`` so Catalyst gets
pushdown + pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def table_path(lake_dir: str, database: str, table: str) -> str:
    return os.path.join(lake_dir, f"{database}_raw", table)


def read_table(spark: SparkSession, lake_dir: str, database: str, table: str) -> DataFrame:
    return spark.read.parquet(table_path(lake_dir, database, table))


def write_table(
    df: DataFrame,
    lake_dir: str,
    database: str,
    table: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Full-refresh (overwrite) or append write — S10/S11 parity.

    ``target_files`` caps output file count for small/medium tables; leave
    None at scale to keep one file per shuffle partition."""
    if target_files:
        df = df.repartition(target_files)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table_path(lake_dir, database, table))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by ``hash(bucket_col) %
    n_buckets`` at WRITE time, so equi-joins and aggregations on the bucket
    key later run with NO shuffle on the bucketed side — the write-once,
    join-many layout for 100 TB fact tables (the join's Exchange disappears
    from the plan; asserted in tests/test_plans.py). Requires saveAsTable
    (bucket metadata lives in the session catalog, not the parquet files).
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)
