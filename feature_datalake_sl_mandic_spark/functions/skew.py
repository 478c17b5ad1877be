"""Skew-handling primitives: salting for hot keys.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime, but two shapes still need explicit salting at 100 TB:

- aggregations where one key dominates (a viral user_id, an empty-string
  default): ``salted_aggregate`` does a two-phase partial/final aggregate
  over (key, salt), bounding any single reducer's input at input/salt.
- joins of a skewed fact against a small dim where the dim must be
  replicated per salt: ``salted_broadcast_left_join`` explodes the dim
  across salts so each salted fact key still finds its match. (With an
  actually-broadcastable dim, plain broadcast is better — this is the
  pattern for when the dim is just over the broadcast threshold.)

Salts are deterministic (hash of the row's unique columns mod n_salts) so
results are reproducible and testable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, unique_cols: list[str], n_salts: int) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a hash of ``unique_cols``."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in unique_cols]), F.lit(n_salts))
    )


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: Callable[[], list[Column]],
    merge: Callable[[DataFrame], DataFrame],
    unique_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over (group_cols, salt) then group_cols.

    ``aggs()`` builds the partial aggregate columns; ``merge`` reduces the
    per-salt partials to finals (e.g. sum of partial counts). Each phase is a
    plain hash aggregate, so Catalyst still applies map-side combine within
    each phase — salting only caps the worst reducer's share of a hot key."""
    partial = (
        with_salt(df, unique_cols, n_salts)
        .groupBy(*group_cols, SALT_COL)
        .agg(*aggs())
    )
    return merge(partial.drop(SALT_COL).groupBy(*group_cols))


def salted_broadcast_left_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    fact_unique_cols: list[str] | None = None,
) -> DataFrame:
    """Left join a skewed fact to a dim by salting the fact key and exploding
    the dim across all salts, so the shuffle spreads each hot key over
    ``n_salts`` reducers."""
    fact_s = with_salt(fact, fact_unique_cols or [key], n_salts)
    dim_s = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return fact_s.join(dim_s, [key, SALT_COL], "left").drop(SALT_COL)
