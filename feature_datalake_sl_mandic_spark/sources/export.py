"""Training-shard export: the write side of the corpus pipeline.

``corpus_pack_shards`` (operators/text.py) decides WHICH shard each document
belongs to; this module materializes that decision: one parquet directory per
(lang, shard) plus a JSON manifest recording, per shard, the document count,
token total, and an order-insensitive content checksum (the same XOR +
modular-sum pair as ``checksum_orders_content``). The manifest is what a
downstream trainer validates against before consuming a shard, and what a
re-export is diffed against — the run-history idea of the reference's
``Historico_Execucao`` (``Sites/DataProc_Script/spark_ingest_slmandicprd.py:115-141``)
applied to corpus exports.

Scale notes:
- The write is one pass: ``partitionBy(lang, shard_id)`` hands placement to
  Spark's partitioned-parquet writer — no per-shard loop, no driver-side
  data movement.
- Manifest stats come from ONE aggregation over the packed assignment
  (shuffle keyed by (lang, shard_id), carrying three longs per shard), not
  from re-reading the written files.
- Checksums make the manifest self-validating: a re-export of identical
  content produces an identical manifest regardless of row order, task
  placement, or file count.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_datalake_sl_mandic_spark.functions.hashing import md5_int60_col

CHECKSUM_MOD = 1_000_000_007


def export_training_shards(packed: DataFrame, out_dir: str) -> dict:
    """Write a packed corpus (columns: doc_id, lang, shard_id, n_tokens,
    text) as parquet partitioned by (lang, shard_id) and a ``manifest.json``
    with per-shard stats + content checksums. Returns the manifest dict."""
    data_dir = os.path.join(out_dir, "data")
    (
        packed.select("doc_id", "lang", "shard_id", "n_tokens", "text")
        .write.mode("overwrite")
        .partitionBy("lang", "shard_id")
        .parquet(data_dir)
    )
    h = md5_int60_col(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))
    )
    # Stats come from reading back the WRITTEN files, not from re-executing
    # ``packed``'s lineage: two actions over a nondeterministic input would
    # otherwise publish a manifest describing data that was never written,
    # silently voiding the self-validation contract. Emptiness is likewise
    # decided from the WRITTEN output (an empty corpus writes no parquet part
    # files, only _SUCCESS, so the partitioned read-back would fail schema
    # inference) — probing ``packed`` again would be a second action over the
    # very lineage this read-back exists to avoid re-running.
    has_parts = any(
        name.endswith(".parquet")
        for _root, _dirs, files in os.walk(data_dir)
        for name in files
    )
    if not has_parts:
        os.makedirs(data_dir, exist_ok=True)
        stats = []
    else:
        written = packed.sparkSession.read.parquet(data_dir)
        stats = (
            written.select("lang", "shard_id", "n_tokens", h.alias("h"))
            .groupBy("lang", "shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("total_tokens"),
                F.bit_xor("h").alias("content_xor"),
                F.sum(F.col("h") % CHECKSUM_MOD).alias("content_sum_mod"),
            )
            .orderBy("lang", "shard_id")
            .collect()  # bounded: one row per shard
        )
    manifest = {
        "shards": [
            {
                "lang": r["lang"],
                "shard_id": int(r["shard_id"]),
                "n_docs": int(r["n_docs"]),
                "total_tokens": int(r["total_tokens"]),
                "content_xor": int(r["content_xor"]),
                "content_sum_mod": int(r["content_sum_mod"]),
                "path": os.path.join(
                    data_dir, f"lang={r['lang']}", f"shard_id={r['shard_id']}"
                ),
            }
            for r in stats
        ],
        "n_shards": len(stats),
        "n_docs": sum(int(r["n_docs"]) for r in stats),
        "total_tokens": sum(int(r["total_tokens"]) for r in stats),
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))  # atomic publish
    return manifest


def validate_export(spark, out_dir: str) -> list[str]:
    """Re-derive per-shard stats from the WRITTEN files and diff against the
    manifest — the consumer-side integrity check. Returns a list of
    discrepancy strings (empty = valid)."""
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    df = spark.read.parquet(os.path.join(out_dir, "data"))
    h = md5_int60_col(
        F.concat_ws("|", F.col("doc_id").cast("string"), F.col("text"))
    )
    actual = {
        (r["lang"], int(r["shard_id"])): r
        for r in df.select("lang", "shard_id", "n_tokens", h.alias("h"))
        .groupBy("lang", "shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.bit_xor("h").alias("content_xor"),
            F.sum(F.col("h") % CHECKSUM_MOD).alias("content_sum_mod"),
        )
        .collect()
    }
    problems: list[str] = []
    for s in manifest["shards"]:
        key = (s["lang"], s["shard_id"])
        a = actual.pop(key, None)
        if a is None:
            problems.append(f"missing shard {key}")
            continue
        for field in ("n_docs", "total_tokens", "content_xor", "content_sum_mod"):
            if int(a[field]) != s[field]:
                problems.append(f"shard {key}: {field} {a[field]} != {s[field]}")
    problems.extend(f"unexpected shard {k}" for k in actual)
    return problems
