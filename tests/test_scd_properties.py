"""Property-based tests: SCD2 merge, incremental refresh, change feed.

Each property pits the distributed implementation against a brute-force
Python model over small randomized inputs — the same oracle-differential
philosophy as the DuckDB gate, but exploring the NULL/edge lattice instead
of one fixture."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# key -> (tracked1, tracked2), values may be None
_vals = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_dim_st = st.dictionaries(st.integers(0, 7), st.tuples(_vals, _vals), max_size=6)
_upd_st = st.dictionaries(st.integers(0, 9), st.tuples(_vals, _vals), max_size=6)


@settings(**PROP_SETTINGS)
@given(dim=_dim_st, upd=_upd_st)
def test_scd2_apply_matches_model(spark, dim, upd):
    from feature_datalake_sl_mandic_spark.ingest.scd import HIGH_DATE, scd2_apply
    import pyspark.sql.functions as F

    dim_df = spark.createDataFrame(
        [(k, f"n{k}", a, b) for k, (a, b) in dim.items()] or [(None, None, None, None)],
        "k INT, name STRING, t1 STRING, t2 STRING",
    ).where(F.col("k").isNotNull())
    dim_df = (
        dim_df.withColumn("valid_from", F.lit("2023-01-01").cast("date"))
        .withColumn("valid_to", F.lit(HIGH_DATE).cast("date"))
        .withColumn("is_current", F.lit(1))
    )
    upd_df = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in upd.items()] or [(None, None, None)],
        "k INT, t1 STRING, t2 STRING",
    ).where(F.col("k").isNotNull())

    out = scd2_apply(dim_df, upd_df, "k", ["t1", "t2"], "2024-06-01")
    got = {
        (r.k, str(r.valid_from), r.is_current): (r.name, r.t1, r.t2, str(r.valid_to))
        for r in out.collect()
    }

    # brute-force model
    want = {}
    for k, (a, b) in dim.items():
        if k in upd and upd[k] != (a, b):
            want[(k, "2023-01-01", 0)] = (f"n{k}", a, b, "2024-06-01")
        else:
            want[(k, "2023-01-01", 1)] = (f"n{k}", a, b, HIGH_DATE)
    for k, (a, b) in upd.items():
        if k not in dim:
            want[(k, "2024-06-01", 1)] = (None, a, b, HIGH_DATE)
        elif dim[k] != (a, b):
            want[(k, "2024-06-01", 1)] = (f"n{k}", a, b, HIGH_DATE)
    assert got == want


@settings(**PROP_SETTINGS)
@given(
    base=st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=10),
    batch=st.lists(st.tuples(st.integers(0, 4), st.integers(-50, 50)), max_size=10),
)
def test_incremental_refresh_equals_full_recompute(spark, base, batch):
    from feature_datalake_sl_mandic_spark.ingest.incremental import (
        aggregate_batch,
        incremental_refresh,
    )

    base_df = spark.createDataFrame(base or [(None, None)], "k INT, v INT").where(
        "k IS NOT NULL"
    )
    batch_df = spark.createDataFrame(batch or [(None, None)], "k INT, v INT").where(
        "k IS NOT NULL"
    )
    mv = aggregate_batch(base_df, ["k"], {"total": "v"})
    delta = aggregate_batch(batch_df, ["k"], {"total": "v"})
    got = {
        r.k: (r.n_rows, float(r.total))
        for r in incremental_refresh(mv, delta, ["k"], ["total"]).collect()
    }
    want = {}
    for k, v in [*base, *batch]:
        n, t = want.get(k, (0, 0.0))
        want[k] = (n + 1, t + v)
    assert got == want


@settings(**PROP_SETTINGS)
@given(
    before=st.dictionaries(st.integers(0, 6), _vals, max_size=6),
    after=st.dictionaries(st.integers(0, 6), _vals, max_size=6),
)
def test_change_feed_matches_dict_diff(spark, before, after, tmp_path_factory):
    from feature_datalake_sl_mandic_spark.sources.txlog import TxTable

    tmp = tmp_path_factory.mktemp("cf")
    b_df = spark.createDataFrame(
        [(k, v) for k, v in before.items()] or [(None, None)], "k INT, v STRING"
    ).where("k IS NOT NULL")
    a_df = spark.createDataFrame(
        [(k, v) for k, v in after.items()] or [(None, None)], "k INT, v STRING"
    ).where("k IS NOT NULL")
    t = TxTable.create(spark, str(tmp / "t"), b_df)
    t.overwrite(a_df)
    feed = t.change_feed(spark, key="k", from_version=0)
    got = {(r.k, r._change_type): r.v for r in feed.collect()}

    want = {}
    for k in before:
        if k not in after:
            want[(k, "delete")] = before[k]
        elif after[k] != before[k]:
            want[(k, "update_preimage")] = before[k]
            want[(k, "update_postimage")] = after[k]
    for k in after:
        if k not in before:
            want[(k, "insert")] = after[k]
    assert got == want
