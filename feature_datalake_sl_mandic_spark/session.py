"""SparkSession construction with scale-oriented defaults.

The reference creates a bare session per job
(``Sites/DataProc_Script/spark_ingest_slmandicprd.py:49-51``). Here we
centralize session construction and turn on the features that matter at the
100 TB design point: AQE (runtime re-planning, partition coalescing, skew-join
splitting), a sane broadcast threshold, Arrow for any Python exchange, and
UTC session time so timestamp semantics match the lake.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also apply defensively to externally-provided
# sessions (e.g. the driver's) in catalog.load_tables.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # testdata events.ts is parquet TIMESTAMP(NANOS): Spark has no ns
    # timestamp; read as LongType nanos and convert (catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims (region/nation/customer/supplier/part at small SF) broadcast;
    # 64m is safe with 100 TB fact tables because the threshold gates the
    # *small* side only.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Every recursive CTE in the engine is bounded-depth by construction
    # (recursive_cte_customer_chain: |customer| x log10(maxkey) rows), but
    # Spark's default runaway-recursion guardrail (1e6 rows) fails that
    # LINEAR output on a 10x-inflated lake (found by scale_probe.py).
    # Sized to the largest legitimate use with ~30x headroom (full-registry
    # 10x sweep: 150k customers x ~11 levels ~ 1.7M rows) while keeping a
    # real runaway net — 200M would let a buggy recursion balloon 200x
    # further before failing, for no consumer that needs it.
    "spark.sql.cteRecursionRowLimit": str(50_000_000),
}


def get_spark(
    app_name: str = "feature_datalake_sl_mandic_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``); on a real cluster the caller passes none and
    spark-submit decides.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        # local mode: match core count — measured 29% faster than cores*2 on
        # the headline set (AQE coalesces post-shuffle, but the initial task
        # launch + coalesce planning still bill per partition); a cluster
        # deployment overrides via --conf (see ARCHITECTURE.md).
        shuffle_partitions = 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # UI off by default (test/bench hygiene); SPARK_GRAFT_UI=1 turns it
        # on for probes that read task-time dispersion from the status REST
        # API (skew_probe.py's straggler gate — the API is the UI's backend)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_confs(spark: SparkSession) -> None:
    """Best-effort apply runtime confs to an externally-created session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build; fallbacks handle it


def release_cached(spark: SparkSession) -> None:
    """Drop cached relations AND localCheckpoint blocks.

    ``localCheckpoint`` materializes as persisted RDD blocks that outlive the
    DataFrame that created them until the JVM ContextCleaner notices the
    reference is gone — across a 200+-query sweep (oracle parity, bench)
    those blocks accumulate in executor storage. Explicitly unpersisting
    every persistent RDD (plus clearing the relation cache and dropping
    Python-side references via GC) keeps a long sweep's memory footprint
    flat. Call between queries, never inside a timed region."""
    import gc

    gc.collect()  # release py4j refs so the JVM side is droppable
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd in list(jmap.values()):
        rdd.unpersist(False)
