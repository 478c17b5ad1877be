"""Bounds for the approximate operators the oracle can't check:
HLL distinct within its rsd, approx percentiles within rank error, and
stratified sample rates near their fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.aggregates import agg_approx_sketches
from feature_datalake_sl_mandic_spark.operators.misc import sample_stratified_orders
from tests.conftest import SF_SMALL


def test_hll_within_rsd_bound(spark):
    approx = {r["l_returnflag"]: r for r in agg_approx_sketches(spark, SF_SMALL).collect()}
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("s"),
            F.countDistinct("l_orderkey").alias("o"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        # rsd=0.02 → allow 5 sigma
        assert abs(a["approx_suppliers"] - e["s"]) <= max(2, 0.1 * e["s"])
        assert abs(a["approx_orders"] - e["o"]) <= max(2, 0.1 * e["o"])
        # approx_percentile default accuracy: within 2% of the exact median
        assert abs(a["p50_price"] - e["p50"]) / e["p50"] < 0.02


def test_stratified_sample_rates(spark):
    got = {r["o_orderstatus"]: r["n_sampled"] for r in sample_stratified_orders(spark, SF_SMALL).collect()}
    od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    totals = {r["o_orderstatus"]: r["count"] for r in od.groupBy("o_orderstatus").count().collect()}
    fracs = {"O": 0.2, "F": 0.2, "P": 0.5}
    for status, frac in fracs.items():
        if totals.get(status, 0) < 30:
            continue  # too small for a rate assertion
        rate = got.get(status, 0) / totals[status]
        assert abs(rate - frac) < 0.12, (status, rate)
