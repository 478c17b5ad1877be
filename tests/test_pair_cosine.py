"""Bit-exactness of ``similarity.pair_cosine_filtered`` vs the JVM fold.

Round 11 moved the per-pair cosine of the three pair-join queries
(semdedup_cluster_cosine, semdedup_scaled_k_pairs, dedup_embedding_cosine)
from the interpreted per-pair HOF fold to a batch-vectorized Arrow kernel.
The optimization contract is BIT-identical output: the kernel accumulates
one dimension at a time across the batch, reproducing the fold's exact
float-op sequence, and its degenerate-input exclusions (nulls, NaN, length
mismatch, empty arrays) must coincide with the fold's null/NaN semantics.
These tests pin that equivalence on adversarial rows the fixtures and
degenerate lakes may not combine in one relation.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.similarity import (
    _dot,
    pair_cosine_filtered,
)

THR = 0.35

ROWS = [
    # (pid, ea, eb, nn)
    (0, [1.0, 2.0, 3.0], [1.0, 1.0, 1.0], 2.0),  # plain width-3 pair
    (1, [0.1] * 64, [0.2] * 64, 1.0),  # plain width-64 pair
    (2, [1.0, 2.0], [1.0, 2.0, 3.0], 1.0),  # length mismatch -> excluded
    (3, [], [], 1.0),  # empty: fold = 0.0, fails thr -> excluded
    (4, [1.0, None, 2.0], [1.0, 1.0, 1.0], 1.0),  # null element -> excluded
    (5, [float("nan"), 1.0], [1.0, 1.0], 1.0),  # NaN element -> excluded
    (6, None, [1.0, 1.0], 1.0),  # null array -> excluded
    (7, [0.35, 0.0], [1.0, 5.0], 1.0),  # exactly at the threshold -> kept
    (8, [0.3499999, 0.0], [1.0, 0.0], 1.0),  # just below -> excluded
    (9, [-1.0] * 64, [-1.0] * 64, 64.0),  # negatives, cos = 1.0
    # catastrophic-cancellation shape: the fold's sequential order and a
    # pairwise/NumPy-sum order give DIFFERENT doubles here, so the test
    # fails if the kernel ever switches to numpy.sum / dot
    (10, [1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0], 1.0),
]
SCHEMA = "pid bigint, ea array<double>, eb array<double>, nn double"


def _jvm_reference(df):
    # mirrors the replaced fold-form filter MINUS Spark's NaN total order
    # (``NaN >= thr`` is TRUE in Spark SQL): the kernel deliberately
    # excludes NaN cosines — see pair_cosine_filtered's docstring; real
    # callers guard non-finite vectors upstream so NaN is unreachable there
    cos = _dot("ea", "eb") / F.col("nn")
    return {
        r["pid"]: r["cos_raw"]
        for r in df.where((cos >= THR) & ~F.isnan(cos))
        .select("pid", cos.alias("cos_raw"))
        .collect()
    }


def _arrow_result(df):
    return {
        r["pid"]: r["cos_raw"]
        for r in pair_cosine_filtered(df, THR).select("pid", "cos_raw").collect()
    }


def test_kernel_matches_jvm_fold_bitwise(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    ref, got = _jvm_reference(df), _arrow_result(df)
    assert set(got) == set(ref)
    for pid, cos in ref.items():
        # exact float equality — the contract is bit-identity, not tolerance
        assert got[pid] == cos and not math.isnan(cos), (pid, got[pid], cos)


def test_kernel_survivor_set(spark):
    """The adversarial rows land on the intended side of the filter — in
    particular row 5 (NaN element): the raw JVM fold KEEPS it under Spark's
    NaN total order, the kernel excludes it (the documented divergence,
    unreachable in real callers behind their finite guards)."""
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = _arrow_result(df)
    assert set(got) == {0, 1, 7, 9, 10}
    cos = _dot("ea", "eb") / F.col("nn")
    jvm_raw = {r["pid"] for r in df.where(cos >= THR).select("pid").collect()}
    assert 5 in jvm_raw  # Spark's NaN >= thr is TRUE — the trap, pinned


def test_kernel_empty_input(spark):
    df = spark.createDataFrame([], SCHEMA)
    assert _arrow_result(df) == {}


def test_kernel_passthrough_columns_and_types(spark):
    """Extra columns pass through unchanged with their original types."""
    df = spark.createDataFrame(
        [(1, "x", 7, [1.0, 1.0], [1.0, 1.0], 1.0)],
        "pid bigint, tag string, grp int, ea array<double>, eb array<double>, nn double",
    )
    out = pair_cosine_filtered(df, THR)
    assert [f.name for f in out.schema.fields] == ["pid", "tag", "grp", "cos_raw"]
    row = out.collect()[0]
    assert (row["pid"], row["tag"], row["grp"]) == (1, "x", 7)
    assert row["cos_raw"] == 2.0


def test_kernel_rejects_nonpositive_threshold(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        pair_cosine_filtered(df, 0.0)
