"""End-to-end tests for CDF-driven incremental ingest (ingest/cdf.py).

The restart-safety contract: the last ingested source version commits
ATOMICALLY with the data (inside the target's txlog op string), so replay
after a crash at any point is a version-gated no-op — never a double-MERGE,
never a lost batch. These tests simulate each crash point by simply calling
the pipeline again, including with FRESH TxTable handles (a new process).
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.ingest.cdf import (
    apply_cdf_batch,
    bootstrap_cdf,
    ingest_incremental_cdf,
    last_applied_source_version,
)
from feature_datalake_sl_mandic_spark.sources.txlog import TxTable


def _mk(prefix: str) -> str:
    return os.path.join(tempfile.mkdtemp(prefix=prefix), "t")


@pytest.fixture
def source(spark):
    """Source table with three committed versions:
    v0: keys 1..10, val = key
    v1: key 11 inserted, key 3 updated (val 300), key 7 deleted
    v2: key 12 inserted, key 11 updated (val 1100)"""
    def df(rows):
        return spark.createDataFrame(rows, "k BIGINT, val BIGINT")

    v0 = [(i, i) for i in range(1, 11)]
    t = TxTable.create(spark, _mk("cdf_src_"), df(v0))
    v1 = [(i, 300 if i == 3 else i) for i in range(1, 11) if i != 7] + [(11, 11)]
    t.overwrite(df(v1))
    v2 = [r for r in v1 if r[0] != 11] + [(11, 1100), (12, 12)]
    t.overwrite(df(v2))
    return t


def _state(spark, t: TxTable) -> dict[int, int]:
    return {r["k"]: r["val"] for r in t.read(spark).collect()}


def test_bootstrap_records_source_version(spark, source):
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    assert last_applied_source_version(tgt) == 0
    assert _state(spark, tgt) == {i: i for i in range(1, 11)}


def test_single_batch_applies_inserts_updates_deletes(spark, source):
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    s = apply_cdf_batch(spark, source, tgt, key="k", to_version=1)
    assert s["applied"] and (s["from_version"], s["to_version"]) == (0, 1)
    assert (s["n_insert"], s["n_update"], s["n_delete"]) == (1, 1, 1)
    want = {i: i for i in range(1, 11) if i != 7} | {3: 300, 11: 11}
    assert _state(spark, tgt) == want
    assert last_applied_source_version(tgt) == 1


def test_multi_version_catchup_in_one_batch(spark, source):
    """A stalled target catches up 0 -> 2 in ONE feed (net changes only:
    key 11's insert+update collapses to a single insert at val 1100)."""
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    s = apply_cdf_batch(spark, source, tgt, key="k")  # to latest (2)
    assert s["applied"] and s["to_version"] == 2
    assert s["n_insert"] == 2 and s["n_delete"] == 1 and s["n_update"] == 1
    assert _state(spark, tgt) == _state(spark, source)


def test_replay_is_versioned_noop(spark, source):
    """Crash AFTER the target commit: the retry must not double-apply."""
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    apply_cdf_batch(spark, source, tgt, key="k", to_version=1)
    v_after = tgt.latest_version()
    replay = apply_cdf_batch(spark, source, tgt, key="k", to_version=1)
    assert not replay["applied"]
    assert tgt.latest_version() == v_after  # no new commit
    want = {i: i for i in range(1, 11) if i != 7} | {3: 300, 11: 11}
    assert _state(spark, tgt) == want


def test_restart_with_fresh_handles_resumes(spark, source):
    """Crash BETWEEN batches, new process: fresh TxTable handles built from
    paths alone must resume from the committed state and apply only the
    pending tail."""
    tgt_path = _mk("cdf_tgt_")
    tgt = bootstrap_cdf(spark, source, tgt_path, source_version=0)
    apply_cdf_batch(spark, source, tgt, key="k", to_version=1)
    # "restart": rebuild both handles from their paths
    src2, tgt2 = TxTable(source.path), TxTable(tgt_path)
    assert last_applied_source_version(tgt2) == 1
    s = apply_cdf_batch(spark, src2, tgt2, key="k")
    assert s["applied"] and (s["from_version"], s["to_version"]) == (1, 2)
    assert _state(spark, tgt2) == _state(spark, source)


def test_history_row_appended_only_when_applied(spark, source):
    lake = tempfile.mkdtemp(prefix="cdf_lake_")
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    s1 = ingest_incremental_cdf(
        spark, source, tgt, key="k", lake_dir=lake, table_name="t"
    )
    assert s1["applied"]
    hist = spark.read.parquet(os.path.join(lake, "meta", "historico_execucao"))
    assert hist.count() == 1
    row = hist.collect()[0]
    assert row["table_name"] == "t"
    assert row["row_count"] == s1["n_insert"] + s1["n_update"] + s1["n_delete"]
    # crash-after-commit retry: no-op apply, NO duplicate audit row
    s2 = ingest_incremental_cdf(
        spark, source, tgt, key="k", lake_dir=lake, table_name="t"
    )
    assert not s2["applied"]
    assert spark.read.parquet(
        os.path.join(lake, "meta", "historico_execucao")
    ).count() == 1


def test_state_survives_compaction_commits(spark, source):
    """Maintenance commits layered on top must not hide the CDF state."""
    tgt = bootstrap_cdf(spark, source, _mk("cdf_tgt_"), source_version=0)
    apply_cdf_batch(spark, source, tgt, key="k", to_version=1)
    tgt.compact(spark, n_files=1)
    assert last_applied_source_version(tgt) == 1
    s = apply_cdf_batch(spark, source, tgt, key="k")
    assert s["applied"] and s["from_version"] == 1
    assert _state(spark, tgt) == _state(spark, source)


def test_bootstrap_guards(spark, source):
    path = _mk("cdf_tgt_")
    bootstrap_cdf(spark, source, path)
    with pytest.raises(FileExistsError):
        bootstrap_cdf(spark, source, path)
    empty = TxTable(_mk("cdf_empty_"))
    with pytest.raises(FileNotFoundError):
        bootstrap_cdf(spark, empty, _mk("cdf_tgt2_"))
    with pytest.raises(ValueError):
        # un-bootstrapped target has no state to resume from
        apply_cdf_batch(spark, source, TxTable(_mk("cdf_tgt3_")), key="k")


def test_null_values_round_trip(spark, source):
    """NULL value columns must survive classification (eqNullSafe feed) and
    the merge write."""
    def df(rows):
        return spark.createDataFrame(rows, "k BIGINT, val BIGINT")

    src = TxTable.create(spark, _mk("cdf_nsrc_"), df([(1, None), (2, 2)]))
    src.overwrite(df([(1, 10), (2, None), (3, None)]))
    tgt = bootstrap_cdf(spark, src, _mk("cdf_ntgt_"), source_version=0)
    s = apply_cdf_batch(spark, src, tgt, key="k")
    assert (s["n_insert"], s["n_update"], s["n_delete"]) == (1, 2, 0)
    assert _state(spark, tgt) == {1: 10, 2: None, 3: None}
