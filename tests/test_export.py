"""Training-shard export: write → manifest → consumer-side validation, plus
tamper detection — the integrity loop a trainer relies on."""

from __future__ import annotations

import json
import os

from conftest import SF_SMALL


def _packed(spark):
    from feature_datalake_sl_mandic_spark import catalog
    from feature_datalake_sl_mandic_spark.operators.text import (
        pack_shard_assignments,
    )

    docs = catalog.load_table(spark, SF_SMALL, "documents")
    return pack_shard_assignments(docs).join(
        docs.select("doc_id", "text"), "doc_id"
    )


class TestShardExport:
    def test_export_manifest_and_validate(self, spark, tmp_path):
        from feature_datalake_sl_mandic_spark import catalog
        from feature_datalake_sl_mandic_spark.sources.export import (
            export_training_shards,
            validate_export,
        )

        out = str(tmp_path / "export")
        manifest = export_training_shards(_packed(spark), out)

        # Every document landed in exactly one shard.
        n_docs = catalog.load_table(spark, SF_SMALL, "documents").count()
        assert manifest["n_docs"] == n_docs
        assert manifest["n_shards"] == len(manifest["shards"])
        assert all(s["n_docs"] > 0 for s in manifest["shards"])

        # The written manifest round-trips and the files validate against it.
        with open(os.path.join(out, "manifest.json")) as f:
            assert json.load(f) == manifest
        assert validate_export(spark, out) == []

        # Re-export into a second directory: identical manifest (stable ids,
        # order-insensitive checksums).
        out2 = str(tmp_path / "export2")
        manifest2 = export_training_shards(
            _packed(spark).repartition(13), out2
        )
        strip = lambda m: [
            {k: v for k, v in s.items() if k != "path"} for s in m["shards"]
        ]
        assert strip(manifest) == strip(manifest2)

    def test_tamper_detection(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from feature_datalake_sl_mandic_spark.sources.export import (
            export_training_shards,
            validate_export,
        )

        out = str(tmp_path / "export")
        manifest = export_training_shards(_packed(spark), out)

        # Corrupt one shard: rewrite it with one document's text mutated.
        victim = manifest["shards"][0]
        vdir = victim["path"]
        df = spark.read.parquet(vdir)
        mutated = df.withColumn(
            "text",
            F.when(
                F.col("doc_id") == df.agg(F.min("doc_id")).first()[0],
                F.concat(F.col("text"), F.lit(" TAMPERED")),
            ).otherwise(F.col("text")),
        )
        staged = vdir + ".new"
        mutated.write.mode("overwrite").parquet(staged)
        import shutil

        shutil.rmtree(vdir)
        os.rename(staged, vdir)

        problems = validate_export(spark, out)
        assert problems, "tampered shard must be reported"
        assert any("content_xor" in p or "content_sum_mod" in p for p in problems)
