"""Source/sink format coverage: CSV and JSON round-trips preserve data
(schema via explicit StructType — the production pattern; inference is for
exploration only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_csv_round_trip(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    path = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(path)
    back = spark.read.schema(src.schema).option("header", True).csv(path)
    assert sorted(back.collect()) == sorted(src.collect())


def test_json_round_trip(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    path = str(tmp_path / "customer_json")
    src.write.json(path)
    back = spark.read.schema(src.schema).json(path)
    assert back.count() == src.count()
    a = {r["c_custkey"]: r["c_acctbal"] for r in back.collect()}
    b = {r["c_custkey"]: r["c_acctbal"] for r in src.collect()}
    assert a == b


def test_partitioned_parquet_prunes(spark, tmp_path):
    """Partition-column writes + partition pruning (the layout the history
    table uses for its 30-day lookback)."""
    from feature_datalake_sl_mandic_spark import plans

    src = spark.read.parquet(f"{SF_SMALL}/orders.parquet").withColumn(
        "year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_by_year")
    src.write.partitionBy("year").parquet(path)

    df = spark.read.parquet(path).where(F.col("year") == 1996)
    plan = plans.formatted_plan(df)
    assert "PartitionFilters" in plan and "1996" in plan
    assert df.count() == src.where(F.col("year") == 1996).count()


def test_orc_round_trip(spark, tmp_path):
    src = spark.read.parquet(f"{SF_SMALL}/region.parquet")
    path = str(tmp_path / "region_orc")
    src.write.orc(path)
    back = spark.read.schema(src.schema).orc(path)
    assert sorted(back.collect()) == sorted(src.collect())


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Bucketed saveAsTable on the join key: the sort-merge join over two
    co-bucketed tables needs NO Exchange — the 100 TB co-located-join path
    (bucket pruning + shuffle-free joins for repeated fact-fact joins)."""
    import uuid

    from feature_datalake_sl_mandic_spark import plans

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        suffix = uuid.uuid4().hex[:8]
        od = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        for name, df, key in ((f"od_b_{suffix}", od, "o_orderkey"), (f"li_b_{suffix}", li, "l_orderkey")):
            df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)

        j = spark.table(f"od_b_{suffix}").join(
            spark.table(f"li_b_{suffix}"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = plans.formatted_plan(j)
        assert "SortMergeJoin" in plan
        # no shuffle on either side: bucketing pre-partitioned both tables
        assert "Exchange hashpartitioning" not in plan
        assert j.count() == li.count()
    finally:
        # restore the SESSION's 64MB threshold — unset would fall back to
        # Spark's 10MB default and leak into later broadcast-plan tests
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        for t in (f"od_b_{suffix}", f"li_b_{suffix}"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Lake schema evolution: files written before a column was added must
    coexist with newer files — mergeSchema unions the schemas and fills the
    missing column with nulls (the additive-evolution contract an ingest
    pipeline relies on when sources grow columns)."""
    path = str(tmp_path / "evolving")
    v1 = spark.read.parquet(f"{SF_SMALL}/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    v1.write.parquet(path)
    v2 = spark.read.parquet(f"{SF_SMALL}/nation.parquet").select(
        "n_nationkey", "n_name", F.lit("v2").alias("ingest_tag")
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"n_nationkey", "n_name", "ingest_tag"}
    assert merged.count() == v1.count() * 2
    # old files surface the new column as null; new files carry the value
    assert merged.where(F.col("ingest_tag").isNull()).count() == v1.count()
    assert merged.where(F.col("ingest_tag") == "v2").count() == v1.count()


class TestLiveJdbcDerby:
    """The JDBC source path EXECUTED against a real database: embedded Derby
    ships on Spark's classpath, so write -> parallel partitioned read ->
    catalog pushdown -> full ingest pipeline all run live (S1/S2/S5 parity,
    executable). MySQL/MSSQL differ only in URL + driver string."""

    def _cfg(self, tmp_path):
        from feature_datalake_sl_mandic_spark.sources.jdbc import derby_config

        return derby_config(str(tmp_path / "derbydb"))

    def test_write_partitioned_read_round_trip(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark.sources import jdbc

        cfg = self._cfg(tmp_path)
        src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        (
            src.write.format("jdbc")
            .options(**cfg.options())
            .option("dbtable", "nation")
            .mode("overwrite")
            .save()
        )
        back = jdbc.read_table(
            spark, cfg, "nation",
            partition_column="n_nationkey", lower_bound=0, upper_bound=25,
        )
        # parallel scan: numPartitions stripes of the key range, not 1 task
        assert back.rdd.getNumPartitions() == cfg.num_partitions
        assert back.count() == src.count()
        got = {(r["n_nationkey"], r["n_name"]) for r in back.collect()}
        want = {(r["n_nationkey"], r["n_name"]) for r in src.collect()}
        assert got == want

    def test_catalog_pushdown_subquery(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark.sources import jdbc

        cfg = self._cfg(tmp_path)
        for t in ("region", "nation"):
            (
                spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
                .write.format("jdbc")
                .options(**cfg.options())
                .option("dbtable", t)
                .mode("overwrite")
                .save()
            )
        cat = jdbc.read_catalog(spark, cfg, jdbc.derby_catalog_query())
        names = {r["TABLE_NAME"].lower() for r in cat.collect()}
        assert {"region", "nation"} <= names

    def test_pipeline_from_live_db(self, spark, tmp_path):
        """End-to-end reference lifecycle with a LIVE JDBC source: the OLTP
        side is a Derby database, catalog freshness comes from its system
        tables, and the lake lands as parquet with history rows."""
        import datetime as dt

        from pyspark.sql import types as T

        from feature_datalake_sl_mandic_spark.ingest import history as hist
        from feature_datalake_sl_mandic_spark.ingest.pipeline import run_pipeline
        from feature_datalake_sl_mandic_spark.sources import jdbc

        cfg = self._cfg(tmp_path)
        src = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
        (
            src.write.format("jdbc")
            .options(**cfg.options())
            .option("dbtable", "supplier")
            .mode("overwrite")
            .save()
        )
        live = jdbc.read_catalog(spark, cfg, jdbc.derby_catalog_query())
        # Derby's catalog has no modify_date: stamp 'now' as update_time (a
        # poll-based freshness default — every listed table counts as fresh)
        now = dt.datetime.now()
        catalog = spark.createDataFrame(
            [(r["TABLE_NAME"].lower(), now) for r in live.collect()],
            T.StructType(
                [
                    T.StructField("table_name", T.StringType()),
                    T.StructField("update_time", T.TimestampType()),
                ]
            ),
        )
        sources = {"supplier": jdbc.read_table(spark, cfg, "supplier")}
        lake_dir = str(tmp_path / "lake")
        results = run_pipeline(spark, catalog, sources, lake_dir, "livedb")
        assert [r.table for r in results] == ["supplier"]
        assert results[0].status == "ok"
        assert results[0].row_count == src.count()
        latest = hist.latest_runs(spark, lake_dir).collect()
        assert {r["table_name"] for r in latest} == {"supplier"}


def test_xml_round_trip(spark, tmp_path):
    """Spark 4 ships a native XML data source — round-trip a nested record.

    Completes the source-format matrix (CSV/JSON/ORC/parquet above)."""
    df = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    path = str(tmp_path / "nation_xml")
    df.write.format("xml").option("rootTag", "nations").option("rowTag", "nation").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .load(path)
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.select("n_nationkey", "n_name", "n_regionkey").collect())
    )


def test_binaryfile_source_reads_payloads(spark, tmp_path):
    """``binaryFile`` source: the ingestion front door for multimodal blobs
    (images/audio land as (path, length, content) rows that feed the
    multimodal mapInPandas decode plumbing)."""
    blobs = {"a.bin": b"\x00\x01\x02", "b.bin": b"hello-bytes"}
    for name, payload in blobs.items():
        (tmp_path / name).write_bytes(payload)
    df = spark.read.format("binaryFile").load(str(tmp_path))
    rows = {r.path.rsplit("/", 1)[-1]: (r.length, bytes(r.content)) for r in df.collect()}
    assert rows == {n: (len(p), p) for n, p in blobs.items()}
