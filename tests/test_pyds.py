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
