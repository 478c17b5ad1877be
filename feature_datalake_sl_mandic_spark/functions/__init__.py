"""Shared column-expression utilities and skew-handling primitives."""

from feature_datalake_sl_mandic_spark.functions.skew import (
    salted_aggregate,
    salted_broadcast_left_join,
)

__all__ = ["salted_aggregate", "salted_broadcast_left_join"]
