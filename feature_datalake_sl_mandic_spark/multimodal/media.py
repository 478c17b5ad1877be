"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface (BASELINE.json: "multimodal columns"). The Spark-side
plumbing is real and tested — schema, partition-aware batch iteration,
Arrow-batched ``mapInPandas`` UDF signatures, output shapes. The actual
codec work is STUBBED (this container ships no image/audio libraries):
``decode_image_stub`` parses only the tiny deterministic header of the
synthetic payloads, and real decoders drop in behind the same interface by
replacing the one marked function.

Design for 100 TB of media:
- binary payloads stay opaque to the JVM (no codegen over blobs); all
  per-item work happens in Arrow-batched Python where the media libs live.
- ``mapInPandas`` streams record batches, so executor memory is bounded by
  batch size (``spark.sql.execution.arrow.maxRecordsPerBatch``), not
  partition size.
- metadata (width/height/duration/format) is a typed struct column, so
  filters like ``meta.format = 'png'`` prune BEFORE any Python decode —
  predicate pushdown still applies to the scalar columns of a parquet file
  carrying blobs.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# Synthetic payload layout: magic(4s) kind(B) width(I) height(I) n_frames(I)
# then deterministic filler bytes.
_MAGIC = b"SGMM"
_KINDS = ["image", "audio", "video"]


def make_synthetic_media(
    spark: SparkSession, n: int = 64, partitions: int = 4
) -> DataFrame:
    """Deterministic fake media table — stands in for a real binary-column
    parquet table; payload headers are parseable by the stub decoder."""
    rows = []
    for i in range(n):
        kind = _KINDS[i % 3]
        w, h, fr = 16 + (i % 8) * 4, 16 + (i % 5) * 4, 1 + (i % 10)
        payload = struct.pack("<4sBIII", _MAGIC, i % 3, w, h, fr) + bytes(
            (i * 7 + j) % 256 for j in range(64)
        )
        rows.append(
            (i, kind, payload, {"format": kind[:3], "width": w, "height": h, "n_frames": fr})
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def decode_image_stub(payload: bytes) -> dict:
    """STUB decoder: parses the synthetic header only.

    Replace with e.g. PIL/libvips in production:
        raise NotImplementedError("real codecs not available in this container")
    The surrounding Spark plumbing (batching, schema, partitioning) is the
    part under test and does not change."""
    magic, kind, w, h, fr = struct.unpack_from("<4sBIII", payload)
    if magic != _MAGIC:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present here"
        )
    return {"width": int(w), "height": int(h), "n_frames": int(fr), "kind": int(kind)}


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
        T.StructField("aspect_ratio", T.DoubleType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("sampled_frames", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame, frame_stride: int = 3) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas``.

    Frame sampling (every ``frame_stride``-th frame) happens inside the same
    batch pass — the shape a video pipeline uses, minus the codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "decoded_width": decoded.map(lambda d: d["width"]),
                    "decoded_height": decoded.map(lambda d: d["height"]),
                    "aspect_ratio": decoded.map(
                        lambda d: round(d["width"] / d["height"], 6)
                    ),
                    "payload_bytes": pdf["payload"].map(len),
                    "sampled_frames": decoded.map(
                        lambda d: len(range(0, d["n_frames"], frame_stride))
                    ),
                }
            )

    return media.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, max_dim: int = 16) -> DataFrame:
    """Resize plumbing via ``mapInPandas``: payloads whose decoded dims exceed
    ``max_dim`` are rewritten with scaled-down header dims (STUB: a real
    implementation resamples pixels with PIL/vips behind this exact
    signature). Output schema == input schema, so resize composes with any
    downstream decode stage; the meta struct is updated in the same pass so
    metadata pruning stays truthful after resize."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def shrink(row):
                d = decode_image_stub(row["payload"])
                w, h = d["width"], d["height"]
                scale = max(w, h) / max_dim
                if scale <= 1.0:
                    return row["payload"], row["meta"]
                nw, nh = max(int(w / scale), 1), max(int(h / scale), 1)
                body = row["payload"][struct.calcsize("<4sBIII"):]
                payload = struct.pack("<4sBIII", _MAGIC, d["kind"], nw, nh, d["n_frames"]) + body
                meta = dict(row["meta"])
                meta["width"], meta["height"] = nw, nh
                return payload, meta

            out = pdf.apply(shrink, axis=1, result_type="expand")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": out[0],
                    "meta": out[1],
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def filter_before_decode(media: DataFrame, kind: str = "image") -> DataFrame:
    """Metadata-first filtering: prune on the typed struct column so the
    Python decode path only ever sees surviving rows."""
    return media.where(
        (F.col("kind") == kind) & (F.col("meta.width") >= 16)
    )


from feature_datalake_sl_mandic_spark.registry import register  # noqa: E402


@register(
    "multimodal_feature_extract",
    oracle=None,  # binary decode via mapInPandas: not SQL-expressible
    tags=("multimodal", "binary", "mapInPandas", "pandas-udf"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the synthetic media table:
    metadata-prune -> Arrow-batched decode -> per-kind feature aggregate.
    (Deterministic synthetic payloads; sf_dir unused — media isn't part of
    the fixture lake. Rows-only driver check; exact checks in
    tests/test_multimodal.py.)"""
    media = make_synthetic_media(spark, n=256, partitions=8)
    feats = extract_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.avg("aspect_ratio"), 6).alias("avg_aspect"),
            F.sum("sampled_frames").alias("total_sampled_frames"),
            F.sum("payload_bytes").alias("total_bytes"),
        )
        .orderBy("kind")
    )
