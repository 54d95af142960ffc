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

    def test_real_codec_rejects_unknown_payloads(self, spark, media):
        """The fake table's payloads are sha256 bytes, not images — the real
        codec must refuse them loudly, never emit garbage pixels."""
        from pyspark.errors.exceptions.captured import PythonException

        from geowave_spark.functions.multimodal import decode_media

        with pytest.raises(PythonException, match="unrecognized image payload"):
            decode_media(media, codec="real").collect()

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


class TestImageCodec:
    """Dependency-free BMP/PPM codecs: numpy round-trips + the real decode
    path end-to-end through mapInPandas."""

    def test_bmp_roundtrip_including_row_padding(self):
        import numpy as np

        from geowave_spark.functions.imagecodec import bmp_bytes, bmp_decode

        for h, w in ((8, 8), (5, 3), (2, 7)):  # odd widths exercise padding
            rgb = np.random.RandomState(h * 10 + w).randint(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            buf = bmp_bytes(rgb)
            assert buf[:2] == b"BM"
            assert (bmp_decode(buf) == rgb).all()

    def test_bmp_topdown_and_bad_inputs(self):
        import struct

        import numpy as np

        from geowave_spark.functions.imagecodec import bmp_bytes, bmp_decode

        rgb = np.random.RandomState(0).randint(0, 256, (4, 4, 3), dtype=np.uint8)
        buf = bytearray(bmp_bytes(rgb))
        # flip to top-down (negative height) and pre-invert the body rows
        struct.pack_into("<i", buf, 14 + 8, -4)
        body = bytes(buf[54:])
        rows = [body[i * 12 : (i + 1) * 12] for i in range(4)]
        buf[54:] = b"".join(reversed(rows))
        assert (bmp_decode(bytes(buf)) == rgb).all()
        with pytest.raises(ValueError):
            bmp_decode(b"XX" + bytes(60))
        with pytest.raises(ValueError):
            bmp_decode(bmp_bytes(rgb)[:30])

    def test_ppm_roundtrip_and_comments(self):
        import numpy as np

        from geowave_spark.functions.imagecodec import ppm_bytes, ppm_decode

        rgb = np.random.RandomState(1).randint(0, 256, (6, 5, 3), dtype=np.uint8)
        assert (ppm_decode(ppm_bytes(rgb)) == rgb).all()
        # header comments are legal PPM
        commented = b"P6\n# synthetic\n5 6\n255\n" + rgb.tobytes()
        assert (ppm_decode(commented) == rgb).all()
        with pytest.raises(ValueError):
            ppm_decode(b"P5\n1 1\n255\n\x00")

    @pytest.mark.parametrize("fmt", ["bmp", "ppm"])
    def test_real_decode_end_to_end(self, spark, geo001, fmt):
        """codec='real' over genuinely-encoded payloads: header dims win,
        pixels equal the known grayscale of the synthesized image."""
        import hashlib

        import numpy as np

        from geowave_spark.functions.multimodal import (
            decode_media,
            synth_image_media_table,
        )

        docs = spark.read.parquet(str(geo001 / "docs.parquet"))
        table = synth_image_media_table(spark, docs, fmt=fmt, dim=8)
        rows = decode_media(table, codec="real").collect()
        assert rows
        for r in rows[:10]:
            assert (r.width, r.height) == (8, 8)
            seed = int.from_bytes(hashlib.md5(r.media_ref.encode()).digest()[:4], "big")
            rgb = np.random.RandomState(seed).randint(0, 256, (8, 8, 3), dtype=np.uint8)
            want = (rgb.mean(axis=2, dtype=np.float64) / 255.0).astype(np.float32).ravel()
            assert np.allclose(np.asarray(r.pixels, dtype=np.float32), want)


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
