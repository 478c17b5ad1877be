"""Multimodal plumbing tests: schema, Arrow batch shapes, partitioning,
metadata-first pruning; the codec itself is stubbed by design."""

from __future__ import annotations

import pytest

from feature_datalake_sl_mandic_spark.multimodal import media


@pytest.fixture(scope="module")
def media_df(spark):
    return media.make_synthetic_media(spark, n=64, partitions=4).cache()


def test_schema_and_partitioning(media_df):
    assert media_df.schema == media.MEDIA_SCHEMA
    assert media_df.rdd.getNumPartitions() == 4
    assert media_df.count() == 64


def test_extract_features_shapes(media_df):
    feats = media.extract_features(media_df)
    assert feats.schema == media.FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 64
    by_id = {r["media_id"]: r for r in rows}
    # header round-trip: decoded dims equal the synthetic metadata
    src = {r["media_id"]: r for r in media_df.collect()}
    for i, r in by_id.items():
        assert r["decoded_width"] == src[i]["meta"]["width"]
        assert r["decoded_height"] == src[i]["meta"]["height"]
        assert r["payload_bytes"] == 17 + 64
        assert r["aspect_ratio"] == round(
            src[i]["meta"]["width"] / src[i]["meta"]["height"], 6
        )


def test_frame_sampling(media_df):
    feats = media.extract_features(media_df, frame_stride=3).collect()
    src = {r["media_id"]: r["meta"]["n_frames"] for r in media_df.collect()}
    for r in feats:
        assert r["sampled_frames"] == len(range(0, src[r["media_id"]], 3))


def test_filter_before_decode_prunes(media_df):
    imgs = media.filter_before_decode(media_df, "image")
    assert imgs.count() == 22  # ids 0,3,6,... (i % 3 == 0)
    assert set(r["kind"] for r in imgs.collect()) == {"image"}


def test_stub_raises_on_real_media(media_df):
    with pytest.raises(NotImplementedError):
        media.decode_image_stub(b"\x89PNG\r\n\x1a\n" + bytes(32))


def test_resize_media_schema_and_dims(spark):
    from feature_datalake_sl_mandic_spark.multimodal import media as mm

    src = mm.make_synthetic_media(spark, n=32, partitions=2)
    resized = mm.resize_media(src, max_dim=16)
    assert resized.schema == src.schema  # composes with downstream decode
    feats = mm.extract_features(resized).collect()
    assert len(feats) == 32
    assert all(max(r["decoded_width"], r["decoded_height"]) <= 16 for r in feats)
    # meta struct updated in the same pass: pruning stays truthful
    metas = resized.select("meta.width", "meta.height").collect()
    assert all(max(r["width"], r["height"]) <= 16 for r in metas)
