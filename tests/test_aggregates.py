"""Bounds for the approximate operators the oracle can't check:
HLL distinct within its rsd, approx percentiles within rank error, and
stratified sample rates near their fractions."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.operators.aggregates import agg_approx_sketches
from feature_datalake_sl_mandic_spark.operators.misc import sample_stratified_orders
from tests.conftest import SF_SMALL


def test_hll_within_rsd_bound(spark):
    """Raw sketch error bounds (the check the oracle can't express), plus the
    registered query's error-band contract holding on real data."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    raw = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_suppkey", rsd=0.02).alias("a_s"),
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_o"),
            F.expr("approx_percentile(l_extendedprice, 0.5)").alias("a_p50"),
            F.countDistinct("l_suppkey").alias("s"),
            F.countDistinct("l_orderkey").alias("o"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
        )
        .collect()
    }
    for r in raw.values():
        # rsd=0.02 → allow 5 sigma
        assert abs(r["a_s"] - r["s"]) <= max(2, 0.1 * r["s"])
        assert abs(r["a_o"] - r["o"]) <= max(2, 0.1 * r["o"])
        # approx_percentile default accuracy: within 2% of the exact median
        assert abs(r["a_p50"] - r["p50"]) / r["p50"] < 0.02

    # Registered error-band contract: exact counts match, all bands true
    for a in agg_approx_sketches(spark, SF_SMALL).collect():
        e = raw[a["l_returnflag"]]
        assert a["exact_suppliers"] == e["s"] and a["exact_orders"] == e["o"]
        assert a["approx_suppliers_ok"] and a["approx_orders_ok"] and a["p50_price_ok"]


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


def test_shingle_df_cap(spark):
    """DF-capped shingles: subset of uncapped, and every survivor's document
    frequency is within the cap (the 100 TB pair-blowup guard)."""
    from feature_datalake_sl_mandic_spark.catalog import load_table
    from feature_datalake_sl_mandic_spark.operators import dedup
    from tests.conftest import SF_SMALL

    dc = load_table(spark, SF_SMALL, "documents")
    full = dedup._spark_shingles(dc)
    capped = dedup.shingles_with_df_cap(dc, max_df=3)

    full_rows = full.collect()
    full_set = {(r["doc_id"], r["s"]) for r in full_rows}
    capped_rows = capped.collect()
    assert {(r["doc_id"], r["s"]) for r in capped_rows} <= full_set
    assert len(capped_rows) < len(full_set)  # the cap actually bites

    from collections import Counter
    df_counts = Counter(r["s"] for r in full_rows)
    assert all(df_counts[r["s"]] <= 3 for r in capped_rows)
