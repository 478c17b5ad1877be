"""Null-injection robustness: every registered query must execute against a
lake whose non-key columns are ~10% NULL without raising. Catalyst built-ins
null-propagate for free; the risk is the Python boundary (collected rows,
pandas/Arrow kernels, UDTFs) and map construction — NaN group keys, ragged
numpy matrices, NULL map keys, and None.split() were all real bugs this
sweep caught. Guards are IS NOT NULL filters (no-ops on the null-free
fixture, so oracle parity is untouched) plus defensive kernels.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark import catalog, registry
from tests.conftest import SF_SMALL

SPECS = registry.load_all()

# Join/grouping keys stay non-null (a schema-level invariant the lake's
# ingest layer owns); every other column gets deterministic ~10% nulls.
_KEY_COLS = {
    "doc_id", "vec_id", "event_id", "o_orderkey", "l_orderkey", "c_custkey",
    "s_suppkey", "p_partkey", "n_nationkey", "r_regionkey", "l_linenumber",
}


@pytest.fixture(scope="session")
def null_sf_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("null_sf"))
    for t in catalog.TABLE_NAMES:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        df = catalog.load_table(spark, SF_SMALL, t)
        cols = [
            F.col(c)
            if c in _KEY_COLS
            else F.when(
                F.abs(F.hash(F.col(c).cast("string"), F.lit(t))) % 10 == 0, None
            )
            .otherwise(F.col(c))
            .alias(c)
            for c in df.columns
        ]
        df.select(*cols).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_survives_null_injection(name, spark, null_sf_dir):
    n = SPECS[name].fn(spark, null_sf_dir).count()
    assert n >= 0
