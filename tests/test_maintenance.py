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
