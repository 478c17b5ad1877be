"""Lake table maintenance: small-file compaction and sort clustering.

Operational companions to the ingest sinks — the jobs that keep a 100 TB
parquet lake scannable:

- ``compact_table``: bin-packs a table's files toward a target file size
  (small-file explosion is the classic failure of append-heavy lakes; scans
  pay per-file open cost and lose vectorization runway).
- ``cluster_table``: range-repartitions + sorts by chosen columns so each
  output file covers a narrow, non-overlapping key range — parquet footer
  min/max stats then let scans skip whole files for selective predicates
  (the poor-man's Z-order, exact for 1-D clustering keys).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def compact_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = TARGET_FILE_BYTES,
) -> int:
    """Rewrite a parquet directory into ceil(size/target) files; returns the
    new file count. Uses a staging dir + atomic rename so readers never see a
    half-compacted table."""
    total = sum(os.path.getsize(f) for f in table_files(path))
    n_files = max(1, -(-total // target_file_bytes))
    staged = path.rstrip("/") + ".compacting"
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(staged)
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(staged, path)
    import shutil

    shutil.rmtree(old)
    return len(table_files(path))


def cluster_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    cluster_cols: list[str],
    n_files: int = 8,
) -> None:
    """Range-partition by ``cluster_cols`` then sort within partitions: each
    output file holds a contiguous key range, enabling min/max file skipping."""
    (
        spark.read.parquet(src_path)
        .repartitionByRange(n_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(dst_path)
    )


def file_column_ranges(path: str, column: str) -> list[tuple]:
    """(min, max) of ``column`` per file, from parquet footer statistics —
    what a scan's file-skipping decision reads."""
    import pyarrow.parquet as pq

    out = []
    for f in table_files(path):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(column)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        if mins:
            out.append((min(mins), max(maxs)))
    return out
