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
    new file count.

    Swap semantics (stated honestly): POSIX rename can't atomically exchange
    two directories, so the swap is two renames — ``path`` -> ``path.old``,
    then ``path.compacting`` -> ``path``. Readers never see a HALF-compacted
    table (the staging dir is invisible until complete), but there IS a
    sub-millisecond window where ``path`` does not exist; a reader listing at
    that instant fails and should retry. Crash safety: every state is
    recoverable — the compacted data survives in ``.compacting`` / ``.old``,
    this function self-heals a previous crash on entry, and ``.old`` is only
    deleted AFTER the new listing validates. (A table format with a
    transaction log — Delta/Iceberg — removes the window entirely; that is
    the upgrade path, not available in this container.)"""
    staged = path.rstrip("/") + ".compacting"
    old = path.rstrip("/") + ".old"
    import shutil

    # Self-heal a crash between the two renames of a previous run: the data
    # is in .old and path is missing — restore it before compacting.
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    shutil.rmtree(staged, ignore_errors=True)  # stale staging from a crash

    total = sum(os.path.getsize(f) for f in table_files(path))
    n_files = max(1, -(-total // target_file_bytes))
    spark.read.parquet(path).repartition(n_files).write.mode("overwrite").parquet(staged)
    if not table_files(staged):
        raise RuntimeError(f"compaction produced no files in {staged}; aborting swap")
    if os.path.isdir(old):
        shutil.rmtree(old)  # leftover from an interrupted post-swap cleanup
    os.rename(path, old)
    os.rename(staged, path)
    # Validate the swapped-in listing before dropping the only other copy.
    new_files = table_files(path)
    if not new_files:
        os.rename(old, path)  # roll back; keep the original intact
        raise RuntimeError(f"post-swap validation failed for {path}; rolled back")
    shutil.rmtree(old)
    return len(new_files)


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
