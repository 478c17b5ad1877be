"""Python DataSource (``training_shards``) tests: parallel planning from the
manifest, lossless roundtrip, and on-read tamper detection."""

from __future__ import annotations

import glob
import json
import os

import pytest

from tests.conftest import SF_SMALL


def _export(spark, out_dir: str) -> dict:
    from feature_datalake_sl_mandic_spark.catalog import load_table
    from feature_datalake_sl_mandic_spark.operators.text import pack_shard_assignments
    from feature_datalake_sl_mandic_spark.sources.export import export_training_shards

    docs = load_table(spark, SF_SMALL, "documents")
    packed = pack_shard_assignments(docs).join(docs.select("doc_id", "text"), "doc_id")
    return export_training_shards(packed, out_dir)


class TestTrainingShardsSource:
    def test_roundtrip_rows_and_partition_columns(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_training_shards,
        )

        out = str(tmp_path / "exp")
        manifest = _export(spark, out)
        register_training_shards(spark)
        df = spark.read.format("training_shards").load(out)
        assert df.columns == ["doc_id", "n_tokens", "text", "lang", "shard_id"]
        assert df.count() == manifest["n_docs"]
        # one Spark input partition per manifest shard
        assert df.rdd.getNumPartitions() == manifest["n_shards"]
        # partition values reattached correctly: totals match the manifest
        from pyspark.sql import functions as F

        per = {
            (r["lang"], r["shard_id"]): (r["n"], r["toks"])
            for r in df.groupBy("lang", "shard_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks"))
            .collect()
        }
        for s in manifest["shards"]:
            assert per[(s["lang"], s["shard_id"])] == (
                s["n_docs"],
                s["total_tokens"],
            )

    def test_validated_read_passes_on_clean_export(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_training_shards,
        )

        out = str(tmp_path / "exp")
        manifest = _export(spark, out)
        register_training_shards(spark)
        n = (
            spark.read.format("training_shards")
            .option("validate", "true")
            .load(out)
            .count()
        )
        assert n == manifest["n_docs"]

    def test_tampered_shard_fails_validated_read(self, spark, tmp_path):
        import pyarrow.parquet as pq
        import pyarrow as pa

        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_training_shards,
        )

        out = str(tmp_path / "exp")
        _export(spark, out)
        # corrupt one row of one shard file, keeping the schema valid
        victim = sorted(glob.glob(os.path.join(out, "data", "*", "*", "*.parquet")))[0]
        tbl = pq.read_table(victim)
        texts = tbl.column("text").to_pylist()
        texts[0] = texts[0] + " TAMPERED"
        cols = {name: tbl.column(name) for name in tbl.column_names}
        cols["text"] = pa.array(texts, pa.string())
        pq.write_table(pa.table(cols), victim)

        register_training_shards(spark)
        df = (
            spark.read.format("training_shards")
            .option("validate", "true")
            .load(out)
        )
        with pytest.raises(Exception, match="checksum mismatch"):
            df.count()

    def test_missing_shard_fails_instead_of_shrinking(self, spark, tmp_path):
        import shutil

        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_training_shards,
        )

        out = str(tmp_path / "exp")
        manifest = _export(spark, out)
        shutil.rmtree(manifest["shards"][0]["path"])
        register_training_shards(spark)
        df = spark.read.format("training_shards").load(out)
        with pytest.raises(Exception):
            df.count()


class TestTrainingShardsStream:
    def test_streaming_replay_equals_batch(self, spark, tmp_path):
        """availableNow over the shard-replay stream must deliver exactly the
        batch-read rows, one micro-batch per shard (offset bookkeeping
        checked by the row totals)."""
        from pyspark.sql import functions as F

        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_training_shards,
        )

        out = str(tmp_path / "exp")
        manifest = _export(spark, out)
        register_training_shards(spark)

        import time

        sdf = spark.readStream.format("training_shards").load(out)
        q = (
            sdf.writeStream.format("memory")
            .queryName("shard_replay")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        # one shard per micro-batch (maxShardsPerBatch default 1): drain
        # until every manifest row has been delivered, then stop.
        deadline = time.time() + 120
        while time.time() < deadline:
            if (
                spark.sql("SELECT count(*) AS n FROM shard_replay").first()["n"]
                >= manifest["n_docs"]
            ):
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
        got = spark.sql(
            "SELECT lang, shard_id, count(*) AS n, sum(n_tokens) AS toks "
            "FROM shard_replay GROUP BY lang, shard_id"
        ).collect()
        per = {(r["lang"], r["shard_id"]): (r["n"], r["toks"]) for r in got}
        assert len(per) == manifest["n_shards"]
        for s in manifest["shards"]:
            assert per[(s["lang"], s["shard_id"])] == (
                s["n_docs"],
                s["total_tokens"],
            )

    def test_replay_between_offsets_deterministic(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark.sources.pyds import (
            TrainingShardsStreamReader,
        )

        out = str(tmp_path / "exp")
        _export(spark, out)
        r = TrainingShardsStreamReader({"path": out})
        it, off1 = r.read(r.initialOffset())
        batch1 = list(it)
        assert off1 == {"i": 1}
        # committed batch must replay identically
        assert list(r.readBetweenOffsets({"i": 0}, off1)) == batch1
        # rows carry the first shard's partition values
        langs = {row[3] for row in batch1}
        assert len(langs) == 1


class TestJsonlShardsWriter:
    def test_write_publishes_manifest_and_roundtrips(self, spark, tmp_path):
        import json

        from feature_datalake_sl_mandic_spark.catalog import load_table
        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_jsonl_shards,
        )

        docs = load_table(spark, SF_SMALL, "documents").select(
            "doc_id", "lang", "n_chars"
        )
        out = str(tmp_path / "jsonl")
        register_jsonl_shards(spark)
        docs.repartition(3).write.format("jsonl_shards").option("path", out).mode(
            "append"
        ).save()

        with open(f"{out}/_manifest.json") as f:
            manifest = json.load(f)
        assert manifest["n_rows"] == docs.count()
        assert len(manifest["shards"]) == 3
        for s in manifest["shards"]:
            assert s["n_rows"] > 0

        back = spark.read.json(f"{out}/*.jsonl")
        assert back.count() == docs.count()
        want = {(r.doc_id, r.lang, r.n_chars) for r in docs.collect()}
        got = {(r.doc_id, r.lang, r.n_chars) for r in back.collect()}
        assert got == want

    def test_empty_frame_commits_empty_manifest(self, spark, tmp_path):
        import json

        from feature_datalake_sl_mandic_spark.catalog import load_table
        from feature_datalake_sl_mandic_spark.sources.pyds import (
            register_jsonl_shards,
        )

        docs = load_table(spark, SF_SMALL, "documents").limit(0).select("doc_id")
        out = str(tmp_path / "jsonl_empty")
        register_jsonl_shards(spark)
        docs.write.format("jsonl_shards").option("path", out).mode("append").save()
        with open(f"{out}/_manifest.json") as f:
            assert json.load(f)["n_rows"] == 0
