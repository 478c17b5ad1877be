"""Salting utilities must give identical answers to the unsalted plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.functions import (
    salted_aggregate,
    salted_broadcast_left_join,
)
from tests.conftest import SF_SMALL


def test_salted_aggregate_matches_plain(spark):
    ev = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    plain = {
        (r["l_returnflag"]): (r["n"], round(r["qty"], 2))
        for r in ev.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("qty"))
        .collect()
    }
    salted = salted_aggregate(
        ev,
        group_cols=["l_returnflag"],
        aggs=lambda: [
            F.count(F.lit(1)).alias("pn"),
            F.sum("l_quantity").alias("pq"),
        ],
        merge=lambda g: g.agg(
            F.sum("pn").alias("n"), F.round(F.sum("pq"), 2).alias("qty")
        ),
        unique_cols=["l_orderkey", "l_linenumber"],
        n_salts=8,
    )
    got = {r["l_returnflag"]: (r["n"], round(r["qty"], 2)) for r in salted.collect()}
    assert got == plain


def test_salted_join_matches_plain(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, "o_custkey", "left")
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    want = {r["c_mktsegment"]: r["count"] for r in plain}
    salted = (
        salted_broadcast_left_join(
            orders, cust, "o_custkey", n_salts=4, fact_unique_cols=["o_orderkey"]
        )
        .groupBy("c_mktsegment")
        .count()
        .collect()
    )
    got = {r["c_mktsegment"]: r["count"] for r in salted}
    assert got == want
