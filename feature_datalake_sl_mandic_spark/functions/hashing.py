"""Engine-portable deterministic hashing.

md5 is the one hash both Spark and DuckDB compute identically, which makes
it the backbone of every oracle-checked randomized algorithm here (MinHash
signatures, hash-bucket sampling). The 60-bit integer form (first 15 hex
chars) exists exactly ONCE per engine in this module — the Spark Column and
the DuckDB SQL fragment are built side by side so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int60_col(col: Column) -> Column:
    """60-bit integer from md5(col) — Spark side."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_int60_sql(expr: str) -> str:
    """60-bit integer from md5(expr) — DuckDB oracle side (same bits)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def md5_bucket_col(col: Column, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) — Spark side."""
    return md5_int60_col(col) % n_buckets


def md5_bucket_sql(expr: str, n_buckets: int) -> str:
    """Stable bucket id in [0, n_buckets) — DuckDB oracle side."""
    return f"{md5_int60_sql(expr)} % {n_buckets}"
