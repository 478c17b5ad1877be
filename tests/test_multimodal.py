"""Multimodal tests: plumbing (schema, Arrow batch shapes, partitioning,
metadata-first pruning) plus the ONE real codec path — PPM decode, resize,
and pixel-level features; other codecs are stubbed by design."""

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


class TestRealPpmCodec:
    """Non-stubbed decode: real binary P6 images through the full path."""

    def test_round_trip(self):
        import numpy as np

        payload = media.encode_ppm(12, 8, seed=3)
        w, h, px = media.decode_ppm(payload)
        assert (w, h) == (12, 8)
        assert px.shape == (8, 12, 3)
        # spot-check the deterministic pixel formula
        assert px[2, 5, 1] == (3 * 5 + 7 * 2 + 11 * 1 + 3) % 256
        assert px.dtype == np.uint8

    def test_comment_and_whitespace_grammar(self):
        raw = b"P6\n# a comment\n 4\t3 # trailing\n255\n" + bytes(4 * 3 * 3)
        w, h, px = media.decode_ppm(raw)
        assert (w, h) == (4, 3) and px.sum() == 0

    def test_non_p6_rejected(self):
        with pytest.raises(ValueError):
            media.decode_ppm(b"P5\n2 2\n255\n" + bytes(4))

    def test_resize_downscales_pixels(self):
        payload = media.encode_ppm(16, 8, seed=0)
        out = media.resize_ppm(payload, max_dim=4)
        w, h, px = media.decode_ppm(out)
        assert (w, h) == (4, 2)
        # nearest-neighbor: output pixel (0, 1) samples input (0, 4)
        _, _, src = media.decode_ppm(payload)
        assert (px[0, 1] == src[0, 4]).all()
        # already-fitting payloads pass through untouched
        assert media.resize_ppm(out, max_dim=4) == out

    def test_extract_image_features_matches_numpy(self, spark):
        df = media.make_ppm_media(spark, n=16, partitions=3)
        feats = {r["media_id"]: r for r in media.extract_image_features(df).collect()}
        assert len(feats) == 16
        for i in range(16):
            w, h, px = media.decode_ppm(media.encode_ppm(8 + (i % 5) * 4, 8 + (i % 3) * 4, seed=i))
            lum = (0.299 * px[:, :, 0].astype("float64") + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]).mean()
            assert feats[i]["width"] == w and feats[i]["height"] == h
            assert feats[i]["n_pixels"] == w * h
            assert abs(feats[i]["mean_luminance"] - lum) < 1e-5

    def test_resize_media_dispatches_real_codec(self, spark):
        df = media.make_ppm_media(spark, n=8, partitions=2)
        resized = media.resize_media(df, max_dim=8)
        assert resized.schema == df.schema
        for r in resized.collect():
            w, h, _ = media.decode_ppm(bytes(r["payload"]))
            assert max(w, h) <= 8
            assert (r["meta"]["width"], r["meta"]["height"]) == (w, h)


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


class TestRealWavCodec:
    def test_encode_decode_roundtrip(self):
        import numpy as np

        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        for seed in (0, 1, 5):
            n, rate = 256 + (seed % 4) * 128, 8000 if seed % 2 == 0 else 16000
            rate_out, s = mm.decode_wav(mm.encode_wav(n, rate, seed))
            assert rate_out == rate
            assert len(s) == n
            t = np.arange(n, dtype=np.int64)
            want = (1 + mm._WAV_A * seed + mm._WAV_B * t) % 65536 - 32768
            assert (s.astype(np.int64) == want).all()

    def test_junk_chunk_walked_not_assumed(self):
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        # odd seeds embed a LIST chunk before data; decode must skip it
        payload = mm.encode_wav(256, 16000, seed=1)
        assert b"LIST" in payload
        rate, s = mm.decode_wav(payload)
        assert rate == 16000 and len(s) == 256

    def test_rejects_garbage_and_non_pcm(self):
        import struct

        import pytest as _pytest

        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        with _pytest.raises(ValueError):
            mm.decode_wav(b"not a wav at all")
        # PCM float format id (3) must be refused
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        bad = b"RIFF" + struct.pack("<I", len(body)) + body
        with _pytest.raises(ValueError):
            mm.decode_wav(bad)

    def test_registered_query_features_exact(self, spark):
        import numpy as np

        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        rows = mm.multimodal_wav_decode(spark, "unused").collect()
        assert len(rows) == mm._WAV_N
        for r in rows:
            t = np.arange(r["n_samples"], dtype=np.int64)
            v = (1 + mm._WAV_A * r["media_id"] + mm._WAV_B * t) % 65536 - 32768
            assert r["abs_sum"] == int(np.abs(v).sum())
            assert r["n_zero_cross"] == int(((v[1:] * v[:-1]) < 0).sum())
            assert r["duration_ms"] == r["n_samples"] * 1000 // r["sample_rate"]


class TestRealVideoCodec:
    def test_container_roundtrip_all_frames(self):
        import numpy as np

        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        payload = mm.encode_video(3, width=8, height=4, n_frames=5)
        frames = list(mm.sample_video_frames(payload, stride=1))
        assert [f for f, *_ in frames] == [0, 1, 2, 3, 4]
        for f, w, h, px in frames:
            assert (w, h) == (8, 4)
            y, x, c = np.mgrid[0:h, 0:w, 0:3]
            expect = (3 * x + 7 * y + 11 * c + mm._VIDEO_SEED_A * 3 + mm._VIDEO_SEED_B * f) % 256
            assert (px == expect.astype(np.uint8)).all()

    def test_stride_keeps_every_kth_frame(self):
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        payload = mm.encode_video(0, width=4, height=4, n_frames=10)
        assert [f for f, *_ in mm.sample_video_frames(payload, stride=3)] == [0, 3, 6, 9]
        assert [f for f, *_ in mm.sample_video_frames(payload, stride=4)] == [0, 4, 8]
        assert mm.video_frame_count(payload) == 10

    def test_rejects_garbage(self):
        import pytest as _pytest

        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        with _pytest.raises(ValueError):
            list(mm.sample_video_frames(b"not a video", stride=1))
        # wrong version byte
        bad = mm._PVID_MAGIC + b"\x02" + b"\x00" * 8
        with _pytest.raises(ValueError):
            list(mm.sample_video_frames(bad, stride=1))

    def test_registered_query_matches_full_decode(self, spark):
        """Sampled luminance from the registered query == independently
        recomputed luminance over the SAME sampled frames via stride=1
        decode + Python-side filtering."""
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        rows = {r["media_id"]: r for r in mm.multimodal_video_frame_sample(spark, "unused").collect()}
        assert len(rows) == mm._VIDEO_N
        for i in range(mm._VIDEO_N):
            payload = mm.encode_video(
                i, 8 + (i % 4) * 4, 8 + (i % 3) * 4, 2 + (i % 5) * 2
            )
            lum = 0
            kept = 0
            for f, w, h, px in mm.sample_video_frames(payload, stride=1):
                if f % mm._VIDEO_STRIDE:
                    continue
                p = px.astype("int64")
                lum += int((299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]).sum())
                kept += 1
            r = rows[i]
            assert (r["lum_sum_milli"], r["sampled_frames"]) == (lum, kept)
            assert r["n_frames"] == 2 + (i % 5) * 2


class TestBandedHammingPairs:
    """Banded-LSH pair generation must have exactly 100% recall of the
    all-pairs near-dups (pigeonhole: n_bands > threshold), emit NOTHING
    beyond them, and agree on every Hamming distance."""

    def _allpairs_neardups(self, df):
        return {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in df.collect()
            if r["near_dup"]
        }

    def test_phash_banded_equals_allpairs_neardups(self, spark):
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        truth = self._allpairs_neardups(
            mm.multimodal_image_phash_pairs(spark, "unused")
        )
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in mm.multimodal_phash_banded_pairs(spark, "unused").collect()
        }
        assert banded == truth
        assert len(truth) > 0  # fixture must actually exercise the join

    def test_audio_banded_equals_allpairs_neardups(self, spark):
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        truth = self._allpairs_neardups(
            mm.multimodal_audio_fingerprint_pairs(spark, "unused")
        )
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in mm.multimodal_audio_fp_banded_pairs(spark, "unused").collect()
        }
        assert banded == truth

    @pytest.mark.parametrize("n_bands", [16, 32, 64])
    def test_phash_any_bandwidth_above_threshold_keeps_full_recall(
        self, spark, n_bands
    ):
        """Pigeonhole property (round-6 verdict ask #7): for ANY band count
        n_bands > hamming threshold (12), the banded join's recall vs the
        all-pairs oracle is exactly 100% — a near-dup pair differs in at
        most 12 bands, so at least one band matches exactly. Production
        widens bands (fewer bits per band -> more bands) to shrink bucket
        occupancy; this pins that the width knob cannot cost recall, only
        candidate volume. Verification by true Hamming keeps precision
        exact at every width, so the full pair DICT (with distances) must
        be identical."""
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        truth = self._allpairs_neardups(
            mm.multimodal_image_phash_pairs(spark, "unused")
        )
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in mm._banded_hamming_pairs(
                mm._phash_bits(spark),
                mm.PHASH_GRID * mm.PHASH_GRID,
                n_bands,
                mm.PHASH_NEAR,
            ).collect()
        }
        assert banded == truth and len(truth) > 0

    @pytest.mark.parametrize("n_bands", [4, 8])
    def test_audio_any_bandwidth_above_threshold_keeps_full_recall(
        self, spark, n_bands
    ):
        """Same pigeonhole property for the 8-bit audio fingerprint: any
        n_bands > 2 (the Hamming threshold) keeps recall exactly 100%."""
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        truth = self._allpairs_neardups(
            mm.multimodal_audio_fingerprint_pairs(spark, "unused")
        )
        banded = {
            (r["media_a"], r["media_b"]): r["hamming"]
            for r in mm._banded_hamming_pairs(
                mm._afp_bits(spark), 8, n_bands, mm.AFP_NEAR
            ).collect()
        }
        assert banded == truth

    def test_banded_plan_has_no_allpairs_stage(self, spark):
        """The banded plan's only join condition is the (band, value)
        equality + id ordering — no cross-product of media ids. Checked
        structurally: the physical plan contains a SortMergeJoin or
        ShuffledHashJoin / BroadcastHashJoin with equi-keys, not a
        BroadcastNestedLoopJoin or CartesianProduct."""
        from feature_datalake_sl_mandic_spark.multimodal import media as mm

        plan = mm.multimodal_phash_banded_pairs(spark, "unused")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
