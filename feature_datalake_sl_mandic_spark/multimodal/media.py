"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Extension surface (BASELINE.json: "multimodal columns"). The Spark-side
plumbing is real and tested — schema, partition-aware batch iteration,
Arrow-batched ``mapInPandas`` UDF signatures, output shapes. Codec status,
honestly: PPM (P6) decode / resize / pixel-level feature extraction is REAL
(pure numpy — ``decode_ppm``/``resize_ppm``/``extract_image_features``);
JPEG/PNG/audio/video stay STUBBED because this container ships no media
libraries — ``decode_image_stub`` parses only the deterministic synthetic
header, and real decoders drop in behind the same interfaces.

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


# --------------------------------------------------------------- real codec
# PPM (P6) is decodable with stdlib + numpy alone, so it is the ONE real,
# non-stubbed codec path in this container: header parse, full pixel decode,
# nearest-neighbor resize. JPEG/PNG/audio/video remain behind the stub above
# (their codecs aren't installed here) — same interfaces, so they drop in.


def encode_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary P6 image: pixel (x, y, c) = (3x + 7y + 11c + seed) % 256."""
    import numpy as np

    y, x, c = np.mgrid[0:height, 0:width, 0:3]
    pixels = ((3 * x + 7 * y + 11 * c + seed) % 256).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + pixels.tobytes()


def decode_ppm(payload: bytes):
    """Real decode of a binary P6 PPM -> (width, height, HxWx3 uint8 array).

    Handles the format's whitespace/comment grammar; raises ValueError on
    anything that isn't P6 with maxval 255."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixel data
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    n = width * height * 3
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos).reshape(
        height, width, 3
    )
    return width, height, pixels


def resize_ppm(payload: bytes, max_dim: int) -> bytes:
    """Real nearest-neighbor downscale of a P6 payload (aspect preserved);
    returns the input unchanged when it already fits."""
    import numpy as np

    w, h, px = decode_ppm(payload)
    scale = max(w, h) / max_dim
    if scale <= 1.0:
        return payload
    nw, nh = max(int(w / scale), 1), max(int(h / scale), 1)
    yi = (np.arange(nh) * (h / nh)).astype(int)
    xi = (np.arange(nw) * (w / nw)).astype(int)
    out = px[yi][:, xi]
    return f"P6\n{nw} {nh}\n255\n".encode() + out.tobytes()


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luminance", T.DoubleType()),
        T.StructField("n_pixels", T.LongType()),
    ]
)


def make_ppm_media(spark: SparkSession, n: int = 32, partitions: int = 4) -> DataFrame:
    """MEDIA_SCHEMA table whose payloads are REAL binary PPM images."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 5) * 4, 8 + (i % 3) * 4
        rows.append(
            (
                i,
                "image",
                encode_ppm(w, h, seed=i),
                {"format": "ppm", "width": w, "height": h, "n_frames": 1},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(partitions)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Real pixel-level feature extraction (Rec.601 mean luminance) over
    Arrow-streamed batches — the non-stubbed decode path."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"media_id": [], "width": [], "height": [], "mean_luminance": [], "n_pixels": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                lum = (
                    0.299 * px[:, :, 0].astype("float64")
                    + 0.587 * px[:, :, 1]
                    + 0.114 * px[:, :, 2]
                ).mean()
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luminance"].append(round(float(lum), 6))
                out["n_pixels"].append(w * h)
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


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
                p = bytes(row["payload"])
                if p.startswith(b"P6"):  # real codec path: resample pixels
                    resized = resize_ppm(p, max_dim)
                    w, h, _ = decode_ppm(resized)
                    meta = dict(row["meta"])
                    meta["width"], meta["height"] = w, h
                    return resized, meta
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


# Closed-form oracle for the real PPM path: DuckDB re-derives every pixel
# from the generator formula (3x + 7y + 11c + seed) % 256 and aggregates the
# SAME integer luminance sum — an independent reconstruction, not a golden
# file. All columns are exact integers, so the value hash is bit-stable.
_PPM_ORACLE = """
    WITH imgs AS (
      SELECT i AS media_id,
             CAST(8 + (i % 5) * 4 AS BIGINT) AS width,
             CAST(8 + (i % 3) * 4 AS BIGINT) AS height
      FROM range(16) t(i)
    ),
    xs AS (SELECT media_id, width, height, unnest(range(width)) AS x FROM imgs),
    cells AS (SELECT media_id, width, height, x, unnest(range(height)) AS y FROM xs)
    SELECT media_id, width, height,
           width * height AS n_pixels,
           CAST(sum(
               299 * ((3*x + 7*y + media_id) % 256)
             + 587 * ((3*x + 7*y + 11 + media_id) % 256)
             + 114 * ((3*x + 7*y + 22 + media_id) % 256)) AS BIGINT) AS lum_sum_milli
    FROM cells GROUP BY media_id, width, height ORDER BY media_id
"""


@register(
    "multimodal_ppm_decode",
    oracle=_PPM_ORACLE,
    tags=("multimodal", "binary", "mapInPandas", "real-codec"),
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stubbed) codec path: binary P6 PPM payloads decoded to
    pixels in Arrow-streamed batches, per-image integer luminance sums
    (299R + 587G + 114B, Rec.601 ×1000 — exact int64, no float summation
    order to disagree on). The oracle reconstructs the same pixels from the
    generator's closed form in pure SQL, so this is two independent
    implementations of the ground truth, hash-compared. (sf_dir unused —
    payloads are deterministic synthetic media, not fixture-lake tables.)"""
    df = make_ppm_media(spark, n=16, partitions=3)
    out_schema = (
        "media_id long, width long, height long, n_pixels long, lum_sum_milli long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in ("media_id", "width", "height", "n_pixels", "lum_sum_milli")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                p = px.astype("int64")
                lum = int((299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]).sum())
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_pixels"].append(w * h)
                out["lum_sum_milli"].append(lum)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=out_schema).orderBy("media_id")


def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal pipeline on the synthetic media table:
    metadata-prune -> Arrow-batched decode -> per-kind feature aggregate.
    (Deterministic synthetic payloads; sf_dir unused — media isn't part of
    the fixture lake.)

    Deliberately NOT registered as a driver query: its JPEG/PNG decode stubs
    make it permanently rows-only, and the registry guarantees every entry
    is hash-checkable against an oracle. The family's hash-green
    representatives are ``multimodal_ppm_decode`` / ``multimodal_wav_decode``
    / ``multimodal_video_frame_sample``; this chain is pinned exactly by
    tests/test_multimodal.py instead."""
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


# ----------------------------------------------------- real WAV (PCM16) codec

# Deterministic PCM sample law, exact in integer math on both engines:
#   s(i, t) = ((1 + 7919*i + 104729*t) mod 65536) - 32768
_WAV_A, _WAV_B = 7919, 104729


def encode_wav(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Real RIFF/WAVE container around PCM16 mono samples from the closed
    form above. Includes a junk LIST chunk before ``data`` on odd seeds so
    the decoder's chunk-walking (not just a fixed 44-byte offset) is
    exercised."""
    import struct

    import numpy as np

    t = np.arange(n_samples, dtype=np.int64)
    s = ((1 + _WAV_A * seed + _WAV_B * t) % 65536 - 32768).astype("<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = [b"fmt " + struct.pack("<I", len(fmt)) + fmt]
    if seed % 2 == 1:
        junk = b"junkdata"
        chunks.append(b"LIST" + struct.pack("<I", len(junk)) + junk)
    chunks.append(b"data" + struct.pack("<I", len(data)) + data)
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes):
    """Real RIFF parse -> (sample_rate, int16 numpy array). Walks chunks,
    validates PCM16 mono; raises ValueError on anything else."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError("only PCM supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError("only 16-bit mono supported")
    return rate, np.frombuffer(data, dtype="<i2")


_WAV_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_samples", T.IntegerType()),
                ]
            ),
        ),
    ]
)


def make_wav_media(spark: SparkSession, n: int = 12, partitions: int = 3) -> DataFrame:
    """Audio table whose payloads are REAL RIFF/WAVE PCM16 bytes."""
    rows = []
    for i in range(n):
        n_samples = 256 + (i % 4) * 128
        rate = 8000 if i % 2 == 0 else 16000
        rows.append(
            (
                i,
                encode_wav(n_samples, rate, seed=i),
                {"format": "wav", "sample_rate": rate, "n_samples": n_samples},
            )
        )
    return spark.createDataFrame(rows, _WAV_SCHEMA).repartition(partitions)


_WAV_N = 12


@register(
    "multimodal_wav_decode",
    oracle=f"""
    WITH clips AS (
      SELECT i AS media_id,
             256 + (i % 4) * 128 AS n_samples,
             CASE WHEN i % 2 = 0 THEN 8000 ELSE 16000 END AS sample_rate
      FROM range(0, {_WAV_N}) t(i)
    ),
    samples AS (
      SELECT c.media_id, c.n_samples, c.sample_rate, s.t,
             ((1 + {_WAV_A} * c.media_id + {_WAV_B} * s.t) % 65536) - 32768 AS v
      FROM clips c CROSS JOIN range(0, 1024) s(t)
      WHERE s.t < c.n_samples
    ),
    feats AS (
      SELECT media_id, n_samples, sample_rate,
             sum(abs(v)) AS abs_sum,
             sum(CASE WHEN t > 0 AND v * lag_v < 0 THEN 1 ELSE 0 END) AS n_zero_cross
      FROM (SELECT *, lag(v) OVER (PARTITION BY media_id ORDER BY t) AS lag_v
            FROM samples)
      GROUP BY 1, 2, 3
    )
    SELECT media_id, CAST(n_samples AS BIGINT) AS n_samples,
           CAST(sample_rate AS BIGINT) AS sample_rate,
           CAST(n_samples * 1000 / sample_rate AS BIGINT) AS duration_ms,
           CAST(abs_sum AS BIGINT) AS abs_sum,
           CAST(n_zero_cross AS BIGINT) AS n_zero_cross
    FROM feats
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "audio", "codec", "mapInPandas"),
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second REAL codec path (audio): binary RIFF/WAVE PCM16 payloads
    decoded with a hand-rolled chunk-walking parser + numpy, per-clip
    integer features (abs-amplitude sum, strict zero crossings, duration).
    Like ``multimodal_ppm_decode``, the oracle reconstructs the same samples
    from the generator's closed form in pure SQL — two independent
    implementations of the ground truth, hash-compared, junk chunks and all.
    (sf_dir unused — payloads are deterministic synthetic media.)

    Scale shape: decode is Arrow-batched ``mapInPandas``; per clip the
    features are integer reductions over the sample buffer, so the shuffle
    carries five longs per clip, never audio bytes."""
    df = make_wav_media(spark, n=_WAV_N, partitions=3)
    out_schema = (
        "media_id long, n_samples long, sample_rate long, duration_ms long, "
        "abs_sum long, n_zero_cross long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = {
                k: []
                for k in (
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "duration_ms",
                    "abs_sum",
                    "n_zero_cross",
                )
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, s = decode_wav(bytes(payload))
                v = s.astype("int64")
                out["media_id"].append(int(mid))
                out["n_samples"].append(len(v))
                out["sample_rate"].append(int(rate))
                out["duration_ms"].append(len(v) * 1000 // rate)
                out["abs_sum"].append(int(np.abs(v).sum()))
                out["n_zero_cross"].append(int(((v[1:] * v[:-1]) < 0).sum()))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=out_schema).orderBy("media_id")


# ------------------------------------------------- real video container codec
# A minimal-but-real video container ("PVID"): a fixed header
# (magic, version, n_frames, fps) followed by n_frames CONCATENATED P6 PPM
# frames, each self-describing. This is the MJPEG shape — independent
# intra-coded frames — so frame sampling can walk headers and skip the pixel
# blocks of unsampled frames without decoding them, which is exactly the
# access pattern a real frame sampler wants (decode cost proportional to
# frames KEPT, not frames stored).

_PVID_MAGIC = b"PVID"
_VIDEO_SEED_A, _VIDEO_SEED_B = 31, 5  # frame f of video i: PPM seed = 31*i + 5*f


def encode_video(media_id: int, width: int, height: int, n_frames: int, fps: int = 4) -> bytes:
    """Real PVID container: header + concatenated deterministic P6 frames."""
    header = _PVID_MAGIC + struct.pack("<BII", 1, n_frames, fps)
    frames = [
        encode_ppm(width, height, seed=_VIDEO_SEED_A * media_id + _VIDEO_SEED_B * f)
        for f in range(n_frames)
    ]
    return header + b"".join(frames)


def _ppm_header_end(payload: bytes, pos: int):
    """Parse one P6 header starting at ``pos``; return (width, height,
    pixel_data_start). Mirrors decode_ppm's grammar without decoding."""
    if payload[pos : pos + 2] != b"P6":
        raise ValueError("PVID frame is not a P6 PPM")
    p, fields = pos + 2, []
    while len(fields) < 3:
        while payload[p : p + 1].isspace():
            p += 1
        if payload[p : p + 1] == b"#":
            while payload[p : p + 1] != b"\n":
                p += 1
            continue
        start = p
        while not payload[p : p + 1].isspace():
            p += 1
        fields.append(int(payload[start:p]))
    return fields[0], fields[1], p + 1


def sample_video_frames(payload: bytes, stride: int = 1):
    """Real frame sampling over a PVID payload: walks every frame's header
    but decodes pixels ONLY for frame indices divisible by ``stride``.
    Yields (frame_index, width, height, HxWx3 uint8 array)."""
    import numpy as np

    if payload[:4] != _PVID_MAGIC:
        raise ValueError("not a PVID payload")
    version, n_frames, _fps = struct.unpack_from("<BII", payload, 4)
    if version != 1:
        raise ValueError(f"unsupported PVID version {version}")
    pos = 4 + 9
    for f in range(n_frames):
        w, h, data_start = _ppm_header_end(payload, pos)
        n = w * h * 3
        if f % stride == 0:
            px = np.frombuffer(payload, dtype=np.uint8, count=n, offset=data_start)
            yield f, w, h, px.reshape(h, w, 3)
        pos = data_start + n


def video_frame_count(payload: bytes) -> int:
    if payload[:4] != _PVID_MAGIC:
        raise ValueError("not a PVID payload")
    return struct.unpack_from("<BII", payload, 4)[1]


_VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                    T.StructField("fps", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_VIDEO_N = 12
_VIDEO_STRIDE = 3


def make_video_media(spark: SparkSession, n: int = _VIDEO_N, partitions: int = 3) -> DataFrame:
    """Video table whose payloads are REAL PVID containers of P6 frames."""
    rows = []
    for i in range(n):
        w, h = 8 + (i % 4) * 4, 8 + (i % 3) * 4
        fr = 2 + (i % 5) * 2
        rows.append(
            (
                i,
                encode_video(i, w, h, fr),
                {"format": "pvid", "width": w, "height": h, "n_frames": fr, "fps": 4},
            )
        )
    return spark.createDataFrame(rows, _VIDEO_SCHEMA).repartition(partitions)


@register(
    "multimodal_video_frame_sample",
    oracle=f"""
    WITH vids AS (
      SELECT i AS media_id,
             CAST(8 + (i % 4) * 4 AS BIGINT) AS width,
             CAST(8 + (i % 3) * 4 AS BIGINT) AS height,
             CAST(2 + (i % 5) * 2 AS BIGINT) AS n_frames
      FROM range({_VIDEO_N}) t(i)
    ),
    sampled AS (
      SELECT v.*, f.f
      FROM vids v CROSS JOIN range(10) f(f)
      WHERE f.f < v.n_frames AND f.f % {_VIDEO_STRIDE} = 0
    ),
    xs AS (SELECT media_id, width, height, n_frames, f,
                  unnest(range(width)) AS x FROM sampled),
    cells AS (SELECT media_id, width, height, n_frames, f, x,
                     unnest(range(height)) AS y FROM xs)
    SELECT media_id, width, height, n_frames,
           CAST((n_frames + {_VIDEO_STRIDE} - 1) // {_VIDEO_STRIDE} AS BIGINT)
             AS sampled_frames,
           CAST(sum(
               299 * ((3*x + 7*y + {_VIDEO_SEED_A}*media_id + {_VIDEO_SEED_B}*f) % 256)
             + 587 * ((3*x + 7*y + 11 + {_VIDEO_SEED_A}*media_id + {_VIDEO_SEED_B}*f) % 256)
             + 114 * ((3*x + 7*y + 22 + {_VIDEO_SEED_A}*media_id + {_VIDEO_SEED_B}*f) % 256)
           ) AS BIGINT) AS lum_sum_milli
    FROM cells
    GROUP BY media_id, width, height, n_frames
    ORDER BY media_id
    """,
    tags=("multimodal", "binary", "video", "codec", "frame-sampling", "mapInPandas"),
)
def multimodal_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third REAL codec path (video): PVID containers of concatenated P6
    frames, frame-sampled at stride 3 inside an Arrow-batched
    ``mapInPandas`` — the sampler walks every frame header but decodes pixels
    only for kept frames, so decode cost scales with frames KEPT. Per video:
    exact integer luminance sum over the sampled frames (Rec.601 ×1000). The
    oracle reconstructs the same sampled pixels from the generator's closed
    form in pure SQL — two independent implementations, hash-compared.
    (sf_dir unused — payloads are deterministic synthetic media.)

    Scale shape: stride lives in the decoder, so the shuffle carries six
    longs per video, never frames; ``meta.n_frames`` supports metadata-first
    pruning before any payload byte is touched."""
    df = make_video_media(spark, n=_VIDEO_N, partitions=3)
    out_schema = (
        "media_id long, width long, height long, n_frames long, "
        "sampled_frames long, lum_sum_milli long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("media_id", "width", "height", "n_frames", "sampled_frames", "lum_sum_milli")
        for pdf in it:
            out = {k: [] for k in cols}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload)
                lum, kept, w, h = 0, 0, 0, 0
                for _f, fw, fh, px in sample_video_frames(payload, stride=_VIDEO_STRIDE):
                    p = px.astype("int64")
                    lum += int((299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]).sum())
                    kept += 1
                    w, h = fw, fh
                out["media_id"].append(int(mid))
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(video_frame_count(payload))
                out["sampled_frames"].append(kept)
                out["lum_sum_milli"].append(lum)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=out_schema).orderBy("media_id")


# ------------------------------- perceptual image hash + near-dup pairs

PHASH_GRID = 8  # 8x8 block-mean hash -> 64 bits
PHASH_NEAR = 12  # hamming distance at or under this -> near-duplicate
PHASH_BANDS = 16  # 4 bits/band: any pair with hamming <= 12 < 16 shares a band


def _phash_bits(spark: SparkSession):
    """(media_id, k, bit) relation of 8x8 block-mean perceptual-hash bits,
    Arrow-batched over the real PPM decoder — shared by the all-pairs
    verifier and the banded-LSH scale path. Bit k is an exact integer
    cross-multiplication test, so the relation is deterministic."""
    import numpy as np
    import pandas as pd

    df = make_ppm_media(spark, n=16, partitions=3)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = PHASH_GRID
        for pdf in it:
            out_id, out_k, out_bit = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_ppm(bytes(payload))
                p = px.astype("int64")
                lum = 299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]
                tsum = int(lum.sum())
                npx = w * h
                xs = (np.arange(w) * g) // w
                ys = (np.arange(h) * g) // h
                for by in range(g):
                    rows_mask = ys == by
                    for bx in range(g):
                        cols_mask = xs == bx
                        block = lum[np.ix_(rows_mask, cols_mask)]
                        bsum = int(block.sum())
                        bnpx = int(block.size)
                        out_id.append(int(mid))
                        out_k.append(by * g + bx)
                        out_bit.append(bsum * npx > tsum * bnpx)
            yield pd.DataFrame(
                {"media_id": out_id, "k": out_k, "bit": out_bit}
            )

    return df.mapInPandas(batches, schema="media_id long, k long, bit boolean")


@register(
    "multimodal_image_phash_pairs",
    oracle=f"""
    WITH imgs AS MATERIALIZED (
      SELECT i AS media_id,
             CAST(8 + (i % 5) * 4 AS BIGINT) AS w,
             CAST(8 + (i % 3) * 4 AS BIGINT) AS h
      FROM range(16) t(i)
    ),
    px AS MATERIALIZED (
      SELECT media_id, w, h, xs.x, ys.y,
             (x * {PHASH_GRID}) // w AS bx, (y * {PHASH_GRID}) // h AS by,
               299 * ((3*x + 7*y + media_id) % 256)
             + 587 * ((3*x + 7*y + 11 + media_id) % 256)
             + 114 * ((3*x + 7*y + 22 + media_id) % 256) AS lum
      FROM imgs,
           LATERAL (SELECT unnest(range(w)) AS x) xs,
           LATERAL (SELECT unnest(range(h)) AS y) ys
    ),
    tot AS MATERIALIZED (
      SELECT media_id, sum(lum) AS tsum, count(*) AS npx FROM px GROUP BY media_id
    ),
    bits AS MATERIALIZED (
      SELECT p.media_id, p.by * {PHASH_GRID} + p.bx AS k,
             (sum(p.lum) * t.npx > t.tsum * count(*)) AS bit
      FROM px p JOIN tot t USING (media_id)
      GROUP BY p.media_id, p.by, p.bx, t.npx, t.tsum
    ),
    ham AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
      FROM bits a JOIN bits b ON a.k = b.k AND a.media_id < b.media_id
      GROUP BY 1, 2
    )
    SELECT media_a, media_b, CAST(hamming AS BIGINT) AS hamming,
           hamming <= {PHASH_NEAR} AS near_dup
    FROM ham
    ORDER BY media_a, media_b
    """,
    tags=("multimodal", "phash", "near-dup", "image", "real-codec"),
)
def multimodal_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup over REAL binary payloads: each P6 PPM decodes
    (real chunk-walking codec) to pixels, grayscales to integer milli-
    luminance, and hashes as an 8x8 block-mean signature — bit k is an EXACT
    integer cross-multiplication test (block_sum * total_pixels >
    total_sum * block_pixels), so no float mean ever decides a bit and the
    hash is reproducible across engines, partitionings, and runs. All image
    pairs then compare by Hamming distance with a near-dup threshold — the
    standard pHash screen a multimodal corpus runs to kill re-encoded /
    resized copies that byte-level hashing can't see. The oracle re-derives
    every pixel from the generator's closed form in SQL, so Spark's real
    decoder and DuckDB's arithmetic reconstruction must agree bit-for-bit
    on every one of the 64 x 16 hash bits to hash-match. (sf_dir unused —
    payloads are deterministic synthetic media, not fixture-lake tables.)

    Scale shape: hashing is Arrow-batched mapInPandas (decode + 64 integer
    block sums per image, emitted as 64-bit rows — the image bytes never
    shuffle); the pair comparison here is all-pairs over 16 images for
    exhaustive checking, but the emitted (media_id, k, bit) relation is
    exactly what a banded-LSH join would bucket on (split the 64 bits into
    bands, equi-join on band value — the dedup_minhash_lsh shape) when the
    corpus outgrows all-pairs (that banded variant is registered as
    ``multimodal_phash_banded_pairs``, which this query's output verifies)."""
    bits = _phash_bits(spark)
    a = bits.select(
        F.col("media_id").alias("media_a"), "k", F.col("bit").alias("bit_a")
    )
    b = bits.select(
        F.col("media_id").alias("media_b"), "k", F.col("bit").alias("bit_b")
    )
    return (
        a.join(b, ["k"])
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(
            F.sum(
                F.when(F.col("bit_a") != F.col("bit_b"), 1).otherwise(0)
            ).alias("hamming")
        )
        .select(
            "media_a",
            "media_b",
            "hamming",
            (F.col("hamming") <= PHASH_NEAR).alias("near_dup"),
        )
        .orderBy("media_a", "media_b")
    )


# ----------------------------- audio energy-fingerprint near-dup pairs

AFP_BLOCKS = 8  # energy-profile blocks per clip -> 8-bit fingerprint
AFP_NEAR = 2  # hamming distance at or under this -> near-duplicate
AFP_BANDS = 4  # 2 bits/band: any pair with hamming <= 2 < 4 shares a band


def _afp_bits(spark: SparkSession):
    """(media_id, k, bit) relation of energy-profile fingerprint bits,
    Arrow-batched over the real RIFF/WAVE decoder — shared by the
    all-pairs verifier and the banded-LSH scale path. Bit k is an exact
    integer cross-multiplication test (sum-of-squares), so the relation
    is deterministic."""
    import numpy as np
    import pandas as pd

    df = make_wav_media(spark, n=_WAV_N, partitions=3)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g = AFP_BLOCKS
        for pdf in it:
            out_id, out_k, out_bit = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                _rate, s = decode_wav(bytes(payload))
                sq = s.astype("int64") ** 2
                n = len(sq)
                tsum = int(sq.sum())
                blk = (np.arange(n) * g) // n
                for k in range(g):
                    bsum = int(sq[blk == k].sum())
                    out_id.append(int(mid))
                    out_k.append(k)
                    out_bit.append(bsum * g > tsum)
            yield pd.DataFrame({"media_id": out_id, "k": out_k, "bit": out_bit})

    return df.mapInPandas(batches, schema="media_id long, k long, bit boolean")


@register(
    "multimodal_audio_fingerprint_pairs",
    oracle=f"""
    WITH clips AS MATERIALIZED (
      SELECT i AS media_id, CAST(256 + (i % 4) * 128 AS BIGINT) AS n
      FROM range({_WAV_N}) t(i)
    ),
    samples AS MATERIALIZED (
      SELECT media_id, n, ts.t,
             (ts.t * {AFP_BLOCKS}) // n AS blk,
             ((1 + {_WAV_A} * media_id + {_WAV_B} * ts.t) % 65536 - 32768) AS s
      FROM clips, LATERAL (SELECT unnest(range(n)) AS t) ts
    ),
    tot AS MATERIALIZED (
      SELECT media_id, sum(s * s) AS tsum FROM samples GROUP BY media_id
    ),
    bits AS MATERIALIZED (
      SELECT sa.media_id, sa.blk AS k,
             (sum(sa.s * sa.s) * {AFP_BLOCKS} > t.tsum) AS bit
      FROM samples sa JOIN tot t USING (media_id)
      GROUP BY sa.media_id, sa.blk, t.tsum
    ),
    ham AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
      FROM bits a JOIN bits b ON a.k = b.k AND a.media_id < b.media_id
      GROUP BY 1, 2
    )
    SELECT media_a, media_b, CAST(hamming AS BIGINT) AS hamming,
           hamming <= {AFP_NEAR} AS near_dup
    FROM ham
    ORDER BY media_a, media_b
    """,
    tags=("multimodal", "audio", "fingerprint", "near-dup", "real-codec"),
)
def multimodal_audio_fingerprint_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup by energy-profile fingerprint over REAL RIFF/WAVE
    payloads — the audio member of the multimodal dedup triad (image
    ``multimodal_image_phash_pairs``, this, and text MinHash): each clip's
    PCM16 samples (real chunk-walking decode) split into {AFP_BLOCKS}
    time blocks, bit k = block energy above the clip mean — decided by
    exact integer cross-multiplication (sum-of-squares x block count vs
    total, all int64), so the fingerprint is reproducible bit-for-bit.
    All clip pairs compare by Hamming distance: the shape a catalog runs to
    catch re-encoded/trimmed copies that byte hashing misses. The oracle
    re-derives every sample from the generator's closed form in SQL —
    Spark's real decoder and DuckDB's arithmetic must agree on all
    {AFP_BLOCKS} x {_WAV_N} bits to hash-match.

    Scale shape: fingerprinting is Arrow-batched mapInPandas emitting
    {AFP_BLOCKS} bit-rows per clip (audio bytes never shuffle); the
    all-pairs comparison here is exhaustive-check sized, and the
    (media_id, k, bit) relation is exactly what a banded equi-join buckets
    on at catalog scale (registered as
    ``multimodal_audio_fp_banded_pairs``, which this query's output
    verifies)."""
    bits = _afp_bits(spark)
    a = bits.select(
        F.col("media_id").alias("media_a"), "k", F.col("bit").alias("bit_a")
    )
    b = bits.select(
        F.col("media_id").alias("media_b"), "k", F.col("bit").alias("bit_b")
    )
    return (
        a.join(b, ["k"])
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(
            F.sum(
                F.when(F.col("bit_a") != F.col("bit_b"), 1).otherwise(0)
            ).alias("hamming")
        )
        .select(
            "media_a",
            "media_b",
            "hamming",
            (F.col("hamming") <= AFP_NEAR).alias("near_dup"),
        )
        .orderBy("media_a", "media_b")
    )


# --------------------------- banded-LSH pair generation (the scale path)


def _banded_hamming_pairs(bits: DataFrame, n_bits: int, n_bands: int, near: int) -> DataFrame:
    """Banded equi-join near-dup pairs over a (media_id, k, bit) relation —
    the ``dedup_minhash_lsh`` shape applied to fixed-width binary
    fingerprints. The signature packs into <=2 longs and each band's bits
    into a small int in ONE groupBy; banding is an explode of a literal
    array (one pass, no per-band re-aggregation); candidates come from the
    (band, value) equi-join; verification is two XOR+popcount ops on the
    carried packed signature — no per-bit join, no all-pairs stage.

    EXACT by pigeonhole, not approximate: a pair within Hamming distance
    ``near`` differs in at most ``near`` bands, so with ``n_bands > near``
    at least one band matches exactly and the pair MUST surface as a
    candidate — recall is 100% by construction, which is why the all-pairs
    oracle filtered to near-dups can hash-check this plan. The band-width
    knob is a pure bucket-occupancy/candidate-volume trade: property tests
    (tests/test_multimodal.py::TestBandedHammingPairs) pin that MULTIPLE
    widths above the threshold all reproduce the all-pairs result exactly,
    so production can widen bands for 100 TB catalogs without a recall
    audit. (With ``n_bits % n_bands != 0`` the tail bits are simply
    unbanded — candidates become a superset and true-Hamming verification
    still makes the output exact; dividing widths keep buckets uniform.)"""
    assert n_bands > near, "pigeonhole exactness needs more bands than the threshold"
    bpb = n_bits // n_bands
    sig_cols = [
        F.expr(
            "sum(CASE WHEN k < 32 AND bit THEN shiftleft(1L, CAST(k AS INT)) "
            "ELSE 0L END)"
        ).alias("lo"),
        F.expr(
            "sum(CASE WHEN k >= 32 AND bit THEN shiftleft(1L, CAST(k - 32 AS INT)) "
            "ELSE 0L END)"
        ).alias("hi"),
    ] + [
        F.expr(
            f"sum(CASE WHEN k div {bpb} = {b} AND bit "
            f"THEN shiftleft(1L, CAST(k % {bpb} AS INT)) ELSE 0L END)"
        ).alias(f"bv{b}")
        for b in range(n_bands)
    ]
    # one narrow row per media (2 packed longs + n_bands band values) — pin
    # it so the band SELF-join below reads one materialization instead of
    # re-running the decode/fingerprint chain behind ``bits`` per side
    sig = bits.groupBy("media_id").agg(*sig_cols).localCheckpoint(eager=False)
    bands = sig.select(
        "media_id",
        "lo",
        "hi",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"bv{b}").alias("bv"))
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(
        "media_id", "lo", "hi", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.lo").alias("lo_a"),
            F.col("a.hi").alias("hi_a"),
            F.col("b.lo").alias("lo_b"),
            F.col("b.hi").alias("hi_b"),
        )
        .dropDuplicates(["media_a", "media_b"])
    )
    ham = F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b"))) + F.bit_count(
        F.col("hi_a").bitwiseXOR(F.col("hi_b"))
    )
    return (
        cand.withColumn("hamming", ham.cast("bigint"))
        .where(F.col("hamming") <= near)
        .select("media_a", "media_b", "hamming")
        .orderBy("media_a", "media_b")
    )


from feature_datalake_sl_mandic_spark.registry import _REGISTRY as _MEDIA_REG  # noqa: E402


@register(
    "multimodal_phash_banded_pairs",
    oracle=f"""
    WITH allp AS ({{PHASH_ALLPAIRS}})
    SELECT media_a, media_b, hamming FROM allp WHERE near_dup
    ORDER BY media_a, media_b
    """,
    tags=("multimodal", "phash", "near-dup", "lsh", "banded", "image"),
)
def multimodal_phash_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-scale form of ``multimodal_image_phash_pairs``: the 64-bit
    perceptual hash splits into 16 bands of 4 bits, candidates
    come from a (band, value) equi-join, and Hamming verification is two
    XOR+popcount ops on the packed signature carried through the join —
    NO all-pairs stage anywhere in the plan. Because a pair within the
    Hamming threshold (12) can differ in at most 12 < 16 of the
    bands, pigeonhole guarantees at least one exactly-matching
    band: recall vs exhaustive comparison is 100% BY CONSTRUCTION, and the
    oracle (the all-pairs formulation filtered to near-dups) hash-checks
    that claim end to end. (sf_dir unused — payloads are deterministic
    synthetic media.)

    Scale shape: pair-generation cost is governed by band-bucket occupancy
    (4-bit values here for fixture-sized buckets; production widens bands
    to keep buckets small), the image bytes never shuffle, and the decode
    runs once per image inside Arrow batches."""
    return _banded_hamming_pairs(
        _phash_bits(spark), PHASH_GRID * PHASH_GRID, PHASH_BANDS, PHASH_NEAR
    )


@register(
    "multimodal_audio_fp_banded_pairs",
    oracle=f"""
    WITH allp AS ({{AFP_ALLPAIRS}})
    SELECT media_a, media_b, hamming FROM allp WHERE near_dup
    ORDER BY media_a, media_b
    """,
    tags=("multimodal", "audio", "fingerprint", "near-dup", "lsh", "banded"),
)
def multimodal_audio_fp_banded_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-scale form of ``multimodal_audio_fingerprint_pairs``: the
    8-bit energy fingerprint splits into 4 bands of 2 bits with a
    (band, value) equi-join generating candidates and XOR+popcount
    verifying them — same pigeonhole-exact recall argument as
    ``multimodal_phash_banded_pairs`` (hamming <= 2 < 4 bands), hash-checked against the all-pairs oracle filtered to
    near-dups. (sf_dir unused — payloads are deterministic synthetic
    media.)"""
    return _banded_hamming_pairs(_afp_bits(spark), AFP_BLOCKS, AFP_BANDS, AFP_NEAR)


# The banded oracles wrap the registered all-pairs oracles so the two
# formulations can never drift: patch the placeholders now that both exist.
_MEDIA_REG["multimodal_phash_banded_pairs"].oracle = _MEDIA_REG[
    "multimodal_phash_banded_pairs"
].oracle.format(PHASH_ALLPAIRS=_MEDIA_REG["multimodal_image_phash_pairs"].oracle)
_MEDIA_REG["multimodal_audio_fp_banded_pairs"].oracle = _MEDIA_REG[
    "multimodal_audio_fp_banded_pairs"
].oracle.format(AFP_ALLPAIRS=_MEDIA_REG["multimodal_audio_fingerprint_pairs"].oracle)
