"""Central registry: every operator lands here as a (spark_fn, oracle_sql) pair.

This is the engine's public query surface and the driver contract's backbone:
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry. Each entry is a named query with

- ``fn(spark, sf_dir) -> DataFrame``  — the PySpark (DataFrame/SQL) plan,
- ``oracle``                          — equivalent ANSI SQL DuckDB can run on
  the same parquet tables (None for non-SQL-expressible ops: the driver then
  records a weaker rows-only check),
- ``tags``                            — coverage bookkeeping vs SURVEY.md §2.

Column-name discipline: every computed column is aliased identically in the
DataFrame plan and the oracle SQL (the driver sorts columns by name before
hashing). Float aggregates are rounded on BOTH sides to absorb summation-order
differences between engines.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = ()
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import.
_QUERY_MODULES = [
    "feature_datalake_sl_mandic_spark.operators.relational",
    "feature_datalake_sl_mandic_spark.operators.misc",
    "feature_datalake_sl_mandic_spark.operators.joins",
    "feature_datalake_sl_mandic_spark.operators.windows",
    "feature_datalake_sl_mandic_spark.operators.aggregates",
    "feature_datalake_sl_mandic_spark.operators.scalars",
    "feature_datalake_sl_mandic_spark.operators.events",
    "feature_datalake_sl_mandic_spark.operators.dedup",
    "feature_datalake_sl_mandic_spark.operators.similarity",
    "feature_datalake_sl_mandic_spark.operators.text",
    "feature_datalake_sl_mandic_spark.ingest.change_detection",
    "feature_datalake_sl_mandic_spark.multimodal.media",
]


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tags, fn.__doc__ or "")
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            pass  # module not built yet (incremental rounds)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in load_all().items() if s.oracle is not None}
