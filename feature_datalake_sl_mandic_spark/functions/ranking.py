"""Distributed top-k with exact global ranks — no global Window.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the entire
input through ONE task (Spark warns "No Partition Defined for Window
operation"), which serializes at 100 TB no matter how small the final
output is. Every top-k site in this repo routes through here instead:

- ``orderBy(...).limit(k)`` plans as ``TakeOrderedAndProject``: each input
  partition keeps a local k-heap and the driver merges k-sized heaps —
  fully parallel scan, O(k) driver memory, no single-task shuffle.
- When the rank ordinal must appear in the OUTPUT, the k survivors
  (bounded by construction, k <= a few hundred at every call site) are
  ranked by a broadcast nested-loop self-count: rank(a) = 1 + |{b : b
  sorts strictly before a}|. k^2 comparisons on k rows is trivial and the
  plan contains no Window at all, so the rewrite is scale-safe AND keeps
  plan audits warning-free.

The sort spec must be a total order (include a unique tie-break column)
for ranks to be deterministic — the same requirement ``row_number`` has
for reproducible results.

Equivalence to the single-window ``row_number`` formulation is pinned by
property tests in ``tests/test_ranking_properties.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (column name, "asc" | "desc") — lexicographic, first spec most significant.
OrderSpec = list[tuple[str, str]]


def _sort_cols(order: OrderSpec) -> list[Column]:
    return [
        F.col(name).desc() if direction == "desc" else F.col(name).asc()
        for name, direction in order
    ]


def _strictly_before(order: OrderSpec, left: str, right: str) -> Column:
    """Predicate: row aliased ``left`` sorts strictly before row ``right``
    under the lexicographic ``order``."""
    pred = F.lit(False)
    # Build right-to-left: ties on every earlier key fall through to the
    # comparison of the next key.
    for name, direction in reversed(order):
        lcol = F.col(f"{left}.{name}")
        rcol = F.col(f"{right}.{name}")
        this_key = lcol > rcol if direction == "desc" else lcol < rcol
        pred = this_key | (lcol.eqNullSafe(rcol) & pred)
    return pred


def topk(df: DataFrame, order: OrderSpec, k: int) -> DataFrame:
    """Top-k rows of ``df`` under ``order`` via TakeOrdered (no Window)."""
    return df.orderBy(*_sort_cols(order)).limit(k)


def topk_with_rank(
    df: DataFrame, order: OrderSpec, k: int, rank_col: str = "rnk"
) -> DataFrame:
    """Top-k rows plus their exact global rank ordinal (1-based BIGINT).

    Result columns: ``df``'s columns + ``rank_col``, sorted by rank. The
    ``order`` must be a total order over ``df``'s rows (unique tie-break),
    exactly as ``row_number`` would require for determinism, and the first
    order column must be non-null (it is the count probe in the rank
    self-join).
    """
    out_cols = df.columns
    # localCheckpoint: the k-row result feeds BOTH sides of the rank
    # self-join below; materializing it once keeps the (possibly huge)
    # upstream scan from running twice. Bounded at k rows.
    top = topk(df, order, k).localCheckpoint()
    a = top.alias("a")
    b = top.alias("b")
    rnk = (F.count(F.col(f"b.{order[0][0]}")) + 1).cast("bigint")
    return (
        a.join(F.broadcast(b), _strictly_before(order, "b", "a"), "left_outer")
        .groupBy(*[F.col(f"a.{c}") for c in out_cols])
        .agg(rnk.alias(rank_col))
        .orderBy(rank_col)
    )
