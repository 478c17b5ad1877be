"""Spark→external-DDL type mapping (sink schema propagation shim).

The reference hand-rolls BigQuery DDL from the inferred Spark schema
(``Sites/DataProc_Script/spark_ingest_slmandicprd.py:68-97``). The engine
itself never needs this — ``df.write.parquet/saveAsTable`` propagates schemas
natively (SURVEY.md §1.3) — but the mapping is kept as a shim for emitting
DDL to external warehouses, preserving the reference's exact semantics
(SURVEY.md §1.2): int family -> INT64, float family -> FLOAT64, and
**anything unknown degrades to STRING** (the reference's default branch at
``spark_ingest_slmandicprd.py:81``, which sends DECIMAL/arrays/maps/structs
to STRING).
"""

from __future__ import annotations

from pyspark.sql import types as T

_SCALAR_MAP: list[tuple[type, str]] = [
    (T.StringType, "STRING"),
    (T.IntegerType, "INT64"),
    (T.LongType, "INT64"),
    (T.ShortType, "INT64"),
    (T.DoubleType, "FLOAT64"),
    (T.FloatType, "FLOAT64"),
    (T.BooleanType, "BOOL"),
    (T.TimestampType, "TIMESTAMP"),
    (T.DateType, "DATE"),
    (T.BinaryType, "BYTES"),
]

DEFAULT_TYPE = "STRING"


def spark_to_target_type(dt: T.DataType) -> str:
    """Map one Spark type to target DDL type; unknown -> STRING (reference
    default-branch semantics)."""
    for klass, ddl in _SCALAR_MAP:
        if type(dt) is klass:  # exact match: subclasses are "unknown" types
            return ddl
    return DEFAULT_TYPE


def schema_to_ddl(schema: T.StructType, dataset: str, table: str) -> str:
    """CREATE TABLE IF NOT EXISTS DDL for a Spark schema — idempotent-create
    parity with ``spark_ingest_slmandicprd.py:84-97``."""
    cols = ", ".join(
        f"{f.name} {spark_to_target_type(f.dataType)}" for f in schema.fields
    )
    return f"CREATE TABLE IF NOT EXISTS {dataset}.{table} ({cols})"
