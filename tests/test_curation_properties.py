"""Property tests for the banded two-level rank decompositions in curation.

``_cap_by_hash_banded`` and ``split_exact_stratified`` replace full-partition
rank windows keyed on low-cardinality columns (the scale-killer class the
round-5 verdict hunted) with band-prefix arithmetic + boundary-band-only
ranking. Their oracles prove equality on the fixture distribution at two
scale factors; these hypothesis tests prove it on adversarial inputs — caps
larger than a group, single-row groups, strata whose test/val boundary lands
exactly on a band edge, and band occupancies of 0/1 — the same treatment
``grouped_topk`` gets in tests/test_ranking_properties.py.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

PROP_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (doc_id, key) rows: unique ids (the helpers' contract — doc_id is a PK),
# keys from a tiny domain so single-key mega-partitions (the regime the
# banded form exists for) and empty/singleton keys all get generated.
_rows_st = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 3)),
    min_size=0,
    max_size=80,
    unique_by=lambda t: t[0],
)


@settings(**PROP_SETTINGS)
@given(rows=_rows_st, cap=st.integers(1, 10))
def test_cap_by_hash_banded_matches_global_window(spark, rows, cap):
    from feature_datalake_sl_mandic_spark.operators.curation import (
        _cap_by_hash_banded,
    )

    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id INT, source INT"
    ).where(F.col("doc_id").isNotNull())

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    want = {
        (r["source"], r["doc_id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .collect()
    }
    _, kept = _cap_by_hash_banded(df, "source", cap)
    got = {(r["source"], r["doc_id"]) for r in kept.collect()}
    assert got == want


@settings(**PROP_SETTINGS)
@given(rows=_rows_st)
def test_split_banded_matches_global_window(spark, tmp_path_factory, rows):
    """The registered banded split equals the naive global-window split on
    arbitrary synthetic corpora (exercised through its real entry point by
    writing a documents.parquet the query reads)."""
    from feature_datalake_sl_mandic_spark.operators.curation import (
        SPLIT_TEST_PCT,
        SPLIT_VAL_PCT,
        split_exact_stratified,
    )

    sf_dir = str(tmp_path_factory.mktemp("split_prop"))
    df = spark.createDataFrame(
        rows or [(None, None)], "doc_id INT, lang INT"
    ).where(F.col("doc_id").isNotNull()).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("lang").cast("string").alias("lang"),
    )
    df.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    t1, t2 = SPLIT_TEST_PCT, SPLIT_TEST_PCT + SPLIT_VAL_PCT
    naive = (
        df.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("lang")))
        .select(
            "doc_id",
            "lang",
            F.when(F.col("r") * 100 <= F.col("n") * t1, "test")
            .when(F.col("r") * 100 <= F.col("n") * t2, "val")
            .otherwise("train")
            .alias("split"),
        )
    )
    want = {tuple(r) for r in naive.collect()}
    got = {tuple(r) for r in split_exact_stratified(spark, sf_dir).collect()}
    assert got == want
