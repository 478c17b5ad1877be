"""Degenerate-input oracle parity for the statistical test queries.

A 100 TB job must not die because one segment of the data is statistically
degenerate. The round-6 audit found three queries whose test statistic
divided by zero under ANSI mode on plausible inputs — every stratum
zero-variance (``sample_stratified_neyman``, fixed by exact-integer
proportional fallback; pinned by its hypothesis test in
test_banded_properties.py), both Welch arms constant, and single-group /
one-row-per-group / all-constant ANOVA designs. These tests pin the fixed
contract: undefined statistics are NULL (floats) / FALSE (the reject flag),
identically on both engines, checked by the same comparison the driver runs.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from feature_datalake_sl_mandic_spark import registry
from feature_datalake_sl_mandic_spark.oracle import compare

SPECS = registry.load_all()

_ORDERS_SCHEMA = (
    "o_orderkey INT, o_custkey INT, o_orderpriority STRING, "
    "o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate STRING"
)

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]

CASES = {
    # one priority group, constant values: Welch has no 'lo' arm anywhere
    # (empty output); ANOVA has k=1 (ms_between undefined) and zero within
    # variance (f undefined)
    "one_group_constant": [
        (i, i % 3, "1-URGENT", "O", 100.0, f"1995-01-0{i % 9 + 1}")
        for i in range(12)
    ],
    # all five groups present, every value identical: Welch se2 = 0 (t/dof
    # undefined, reject FALSE); ANOVA ss_within = 0 (f undefined)
    "all_groups_constant": [
        (i, i % 3, _PRIOS[i % 5], "O", 100.0, f"1995-01-0{i % 9 + 1}")
        for i in range(15)
    ],
    # exactly the two Welch arms, constant values
    "two_groups_constant": [
        (i, i % 3, ["1-URGENT", "5-LOW"][i % 2], "O", 100.0, f"1995-01-0{i % 9 + 1}")
        for i in range(10)
    ],
    # one row per group: ANOVA n_all = k (ms_within undefined); Welch arms
    # have n < 2 (filtered, empty output)
    "one_row_per_group": [
        (i, 0, _PRIOS[i], "O", 100.0 + i, "1995-01-01") for i in range(3)
    ],
}


@pytest.fixture(scope="module")
def degenerate_dirs(spark, tmp_path_factory):
    dirs = {}
    for label, rows in CASES.items():
        d = str(tmp_path_factory.mktemp(f"degen_{label}"))
        spark.createDataFrame(rows, _ORDERS_SCHEMA).write.parquet(
            os.path.join(d, "orders.parquet")
        )
        dirs[label] = d
    return dirs


@pytest.mark.parametrize(
    "query", ["stats_welch_ttest_priority", "stats_anova_order_priority"]
)
@pytest.mark.parametrize("label", sorted(CASES))
def test_degenerate_design_matches_oracle(spark, degenerate_dirs, query, label):
    spec = SPECS[query]
    sf_dir = degenerate_dirs[label]
    spdf = spec.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'orders.parquet')}/*.parquet')"
    )
    dkdf = con.execute(spec.oracle).df()
    errs = [e for e in compare(spdf, dkdf, f"{query}/{label}") if "WARNING" not in e]
    assert not errs, "\n".join(errs)
