"""Multimodal plumbing: schema/batch shapes are real, the codec is a
deterministic stub (no image libs in this container)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark, geo001):
    from geowave_spark.functions.multimodal import synth_media_table

    docs = spark.read.parquet(str(geo001 / "docs.parquet"))
    return synth_media_table(spark, docs).cache()


class TestMultimodal:
    def test_media_table_covers_all_refs(self, spark, geo001, media):
        docs = spark.read.parquet(str(geo001 / "docs.parquet"))
        n_refs = (
            docs.select(F.explode("spans").alias("s"))
            .filter(F.col("s.kind") == "media")
            .select("s.media_ref")
            .distinct()
            .count()
        )
        assert media.count() == n_refs > 0
        assert media.schema["content"].dataType.simpleString() == "binary"

    def test_fake_decode_is_deterministic(self, spark, media):
        from geowave_spark.functions.multimodal import FAKE_DECODE_DIM, decode_media

        a = {r.media_ref: tuple(r.pixels[:4]) for r in decode_media(media).collect()}
        b = {r.media_ref: tuple(r.pixels[:4]) for r in decode_media(media).collect()}
        assert a == b
        n_px = FAKE_DECODE_DIM * FAKE_DECODE_DIM
        one = decode_media(media).limit(1).collect()[0]
        assert len(one.pixels) == n_px

    def test_real_codec_is_an_explicit_stub(self, media):
        from geowave_spark.functions.multimodal import decode_media

        with pytest.raises(NotImplementedError):
            decode_media(media, codec="real")

    def test_feature_extraction_shapes(self, spark, media):
        from geowave_spark.functions.multimodal import decode_media, extract_features

        feats = extract_features(decode_media(media), dim=8).collect()
        assert all(len(r.feature) == 8 for r in feats)
        assert all(r.feat_norm >= 0 for r in feats)

    def test_frame_sample(self, spark, media):
        from geowave_spark.functions.multimodal import decode_media, frame_sample

        decoded = decode_media(media)
        sampled = frame_sample(decoded, every_nth=2)
        # single-frame fakes: every row keeps exactly frame 0
        assert sampled.count() == decoded.count()
        assert sampled.filter(F.col("frame_idx") != 0).count() == 0


class TestResize:
    def test_downscale_is_block_mean(self, spark, geo001):
        import numpy as np

        from geowave_spark.functions.multimodal import (
            FAKE_DECODE_DIM,
            decode_media,
            resize_pixels,
            synth_media_table,
        )

        docs = spark.read.parquet(str(geo001 / "docs.parquet")).limit(200)
        media = synth_media_table(spark, docs)
        decoded = decode_media(media).limit(5).cache()
        out = {r.media_ref: r for r in resize_pixels(decoded, FAKE_DECODE_DIM // 2).collect()}
        for r in decoded.collect():
            img = np.asarray(r.pixels, dtype=np.float64).reshape(r.height, r.width)
            half = FAKE_DECODE_DIM // 2
            want = img.reshape(half, 2, half, 2).mean(axis=(1, 3)).astype(np.float32)
            got = np.asarray(out[r.media_ref].pixels, dtype=np.float32).reshape(half, half)
            assert out[r.media_ref].width == half and out[r.media_ref].height == half
            assert np.allclose(got, want)

    def test_upscale_nearest(self, spark, geo001):
        import numpy as np

        from geowave_spark.functions.multimodal import (
            FAKE_DECODE_DIM,
            decode_media,
            resize_pixels,
            synth_media_table,
        )

        docs = spark.read.parquet(str(geo001 / "docs.parquet")).limit(50)
        decoded = decode_media(synth_media_table(spark, docs)).limit(2)
        up = resize_pixels(decoded, FAKE_DECODE_DIM * 2).collect()
        for r in up:
            assert r.width == FAKE_DECODE_DIM * 2
            assert len(r.pixels) == (FAKE_DECODE_DIM * 2) ** 2
