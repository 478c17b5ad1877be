"""Lake maintenance: compaction preserves data; clustering produces
non-overlapping per-file ranges (the precondition for min/max file skipping)."""

from __future__ import annotations

from feature_datalake_sl_mandic_spark.sources import maintenance as mt
from tests.conftest import SF_SMALL


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    path = str(tmp_path / "lineitem")
    src.repartition(37).write.parquet(path)  # simulate small-file explosion
    assert len(mt.table_files(path)) == 37
    before = src.count()

    n = mt.compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n < 37
    after_df = spark.read.parquet(path)
    assert after_df.count() == before
    assert set(after_df.columns) == set(src.columns)


def test_compact_self_heals_crashed_swap(spark, tmp_path):
    """Crash between the two swap renames leaves data only in ``.old``;
    the next compact_table run must restore and proceed, losing nothing."""
    import os

    src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    path = str(tmp_path / "region")
    src.repartition(4).write.parquet(path)
    before = src.count()

    os.rename(path, path + ".old")  # simulate crash mid-swap: path missing
    n = mt.compact_table(spark, path, target_file_bytes=64 * 1024 * 1024)
    assert n >= 1
    assert not os.path.isdir(path + ".old")
    assert spark.read.parquet(path).count() == before


def test_cluster_table_nonoverlapping_ranges(spark, tmp_path):
    dst = str(tmp_path / "orders_clustered")
    mt.cluster_table(
        spark, f"{SF_SMALL}/orders.parquet", dst, ["o_orderdate"], n_files=6
    )
    ranges = sorted(mt.file_column_ranges(dst, "o_orderdate"))
    assert len(ranges) >= 4
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, "file key ranges must not overlap"

    # skipping actually engages: a narrow date filter reads fewer rows than a
    # full scan would from most files (sanity via row count correctness)
    clustered = spark.read.parquet(dst)
    orig = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    pred = "o_orderdate >= timestamp'1996-01-01' AND o_orderdate < timestamp'1996-02-01'"
    assert clustered.where(pred).count() == orig.where(pred).count()


class TestZOrderLayout:
    def test_zorder_skips_both_dimensions(self, spark, tmp_path):
        """Linear sort prunes only its sort column; the Morton layout prunes
        BOTH dimensions of a 2-d box predicate via the same manifest stats."""
        import pyspark.sql.functions as F
        from feature_datalake_sl_mandic_spark.functions.zorder import zorder_key
        from feature_datalake_sl_mandic_spark.sources.txlog import TxTable

        od = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .select(
                "o_orderkey",
                "o_custkey",
                F.datediff("o_orderdate", F.lit("1995-01-01")).alias("day"),
            )
        )
        lo_c, hi_c = 1, od.agg(F.max("o_custkey")).first()[0]
        lo_d, hi_d = 0, od.agg(F.max("day")).first()[0]
        n_files = 16

        linear = od.repartitionByRange(n_files, "o_custkey").sortWithinPartitions("o_custkey")
        zkey = zorder_key(
            F.col("o_custkey"), (lo_c, hi_c), F.col("day"), (lo_d, hi_d), bits=8
        )
        zord = (
            od.withColumn("zkey", zkey)
            .repartitionByRange(n_files, "zkey")
            .sortWithinPartitions("zkey")
            .drop("zkey")
        )
        t_lin = TxTable.create(spark, str(tmp_path / "lin"), linear)
        t_z = TxTable.create(spark, str(tmp_path / "zord"), zord)
        s_lin, s_z = t_lin.snapshot(), t_z.snapshot()
        assert len(s_lin.files) == n_files and len(s_z.files) == n_files

        # middle-quarter range on each dimension
        c_box = (hi_c // 2, hi_c // 2 + hi_c // 4)
        d_box = (hi_d // 2, hi_d // 2 + hi_d // 4)
        lin_c, lin_d = s_lin.prune("o_custkey", *c_box), s_lin.prune("day", *d_box)
        z_c, z_d = s_z.prune("o_custkey", *c_box), s_z.prune("day", *d_box)

        # Linear layout: custkey prunes sharply, day not AT ALL (its stats
        # span every file). Z-order: BOTH dimensions prune — it trades some
        # custkey sharpness for day skipping, winning on a mixed workload.
        assert len(lin_d) == n_files            # linear: zero day skipping
        assert len(z_d) <= n_files // 2         # z-order: real day skipping
        assert len(z_c) < n_files               # ... while custkey still prunes some
        assert len(z_c) + len(z_d) < len(lin_c) + len(lin_d)  # mixed-workload total
