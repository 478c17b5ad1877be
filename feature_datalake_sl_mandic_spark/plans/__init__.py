"""Plan inspection helpers: assert the physical plan is the one we want.

"Correct but 10x slower" is still a bug at 100 TB — these helpers make plan
quality testable: filters must reach the parquet scan (PushedFilters),
projections must prune the read schema (ReadSchema), dim joins must
broadcast, and hot paths must stay inside WholeStageCodegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans in the formatted plan."""
    plan = formatted_plan(df)
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)
        if m.group(1).strip()
    ]


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan)]


def count_broadcast_joins(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")


def has_whole_stage_codegen(df: DataFrame) -> bool:
    """AQE assigns codegen ids only once stages execute — run the plan, then
    inspect the final adaptive plan."""
    df.collect()  # count() would execute a derived plan, not this one
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "simple"
    )
    # codegen'd operators render as "*(n) NodeName" in the final plan
    return re.search(r"\*\(\d+\)", plan) is not None
