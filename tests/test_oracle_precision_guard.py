"""Mechanical guard for the REAL-precision oracle fold class (r7 ask #7).

Round 6 found that DuckDB squares REAL[] (float32) embedding elements in
REAL precision when the ::DOUBLE cast sits outside the product, silently
underflowing subnormal entries to 0.0 and desyncing the engines' nonzero
sets. Every site was fixed, but nothing stopped a NEW oracle from
reintroducing `(x*x)::DOUBLE` — these tests do: red on a seeded violation,
green over the whole registry.
"""

from __future__ import annotations

import pytest

from feature_datalake_sl_mandic_spark.oracle import real_precision_folds
from feature_datalake_sl_mandic_spark.registry import oracle_sql

SEEDED_VIOLATIONS = [
    # the original round-6 bug spelling: cast after the product
    "SELECT list_sum(list_transform(embedding, x -> (x * x)::DOUBLE)) FROM embeddings",
    # un-cast self-product in a lambda
    "SELECT list_sum(list_transform(embedding, x -> x * x)) FROM embeddings",
    # two-variable zip product, both operands un-cast
    "SELECT list_sum(list_zip_with(a.embedding, b.embedding, (x, y) -> x * y)) FROM e",
    # first operand un-cast (REAL*DOUBLE promotes, but the spelling is banned
    # uniformly so reviews never need to reason about promotion order)
    "SELECT list_transform(embedding, x -> x * x::DOUBLE) FROM embeddings",
]

CLEAN_TEXTS = [
    # the prescribed spelling: each operand cast BEFORE multiplying
    "SELECT list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)) FROM embeddings",
    "SELECT list_sum(list_zip_with(ea, eb, (x, y) -> x::DOUBLE * y::DOUBLE)) FROM embeddings e",
    # non-embedding arithmetic is out of scope (DECIMAL/DOUBLE columns)
    "SELECT (l_extendedprice * l_discount) AS rev FROM lineitem",
    "SELECT sum((price * qty)::DOUBLE) FROM orders",
]


@pytest.mark.parametrize("sql", SEEDED_VIOLATIONS)
def test_guard_is_red_on_seeded_violation(sql):
    assert real_precision_folds(sql), f"guard missed a known-bad spelling: {sql}"


@pytest.mark.parametrize("sql", CLEAN_TEXTS)
def test_guard_passes_prescribed_spellings(sql):
    assert real_precision_folds(sql) == []


def test_registry_oracles_have_no_real_precision_folds():
    offenders = {
        name: hits
        for name, sql in oracle_sql().items()
        if (hits := real_precision_folds(sql))
    }
    assert not offenders, (
        "REAL-precision fold in registered oracle text(s) — cast each "
        f"operand to DOUBLE BEFORE multiplying: {offenders}"
    )
