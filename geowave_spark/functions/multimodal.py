"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata — the
pattern the docs table's ``media`` spans point at via ``media_ref``.  The
Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partitioning) is real and tested end-to-end:

- ``decode_media(..., codec="fake")`` produces a deterministic fake decode
  (seeded by the payload hash) with the same schema a real decoder would
  emit — tests and downstream feature extraction run against it;
- ``codec="real"`` ACTUALLY decodes, via dependency-free codecs:
  images — BMP, PPM, PNG (1/2/4/8/16-bit grey/truecolor/palette, Adam7),
  GIF (still + animated), TIFF (none/PackBits/LZW/Deflate strips,
  predictor, palette, JPEG-in-TIFF, 1-bit CCITT Group 3/4 fax strips),
  JPEG (baseline + progressive, EXIF GPS); audio — WAV (PCM, G.711
  A-law/mu-law, IMA ADPCM) and FLAC; video — Y4M, MJPEG-in-AVI, animated
  GIF.  Only entropy-coded psychoacoustic/motion formats (MP3/AAC,
  H.264/VP9) remain library-bound, raising with the PIL/libav
  integration point documented at each dispatch.

Scale shape: decode and feature extraction run in ``mapInPandas`` so one
Arrow batch amortizes per-batch model/codec setup; media rows are
repartitioned by ``media_ref`` hash so any per-ref cache locality is
preserved and no executor sees a skewed share of the (large) binary column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_type string, content binary, "
    "width int, height int, n_frames int"
)

DECODED_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "n_frames int, pixels array<float>"
)

FEATURES_SCHEMA = "media_ref string, feature array<float>, feat_norm double"

AUDIO_DECODED_SCHEMA = (
    "media_ref string, media_type string, sample_rate int, n_channels int, "
    "n_samples int, samples array<float>"
)

FAKE_DECODE_DIM = 16  # fake decodes are FAKE_DECODE_DIM^2 "pixels"

FAKE_AUDIO_SAMPLES = 256  # fake audio decodes are this many mono samples


def _fake_pixels(content: bytes, n: int) -> np.ndarray:
    """Deterministic stand-in decode: pixels derived from the payload hash —
    stable across engines/runs, so downstream tests are exact."""
    seed = int.from_bytes(hashlib.md5(content or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.uniform(0.0, 1.0, n).astype(np.float32)


def decode_media(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Binary payload -> pixel array rows (mapInPandas, Arrow-batched).

    ``codec="real"`` decodes actual image payloads — BMP, PPM, PNG (all
    depths/color types/Adam7), GIF, TIFF (incl. LZW/Deflate/predictor/
    palette/JPEG strips), and JPEG (baseline + progressive) via the
    dependency-free numpy/zlib codecs in
    :mod:`geowave_spark.functions.imagecodec` and friends, dispatched on
    magic bytes.  Pixels come out as grayscale floats in [0, 1]
    (RGB mean / 255) and width/height are taken from the image header,
    overriding the metadata columns.  Formats genuinely needing a library
    raise with the integration point documented (plug PIL/libav into
    ``imagecodec.decode_image`` — same schema, same batching).
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    n_px = FAKE_DECODE_DIM * FAKE_DECODE_DIM

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geowave_spark.functions.imagecodec import decode_image

        for pdf in batches:
            out = pdf[["media_ref", "media_type", "width", "height", "n_frames"]].copy()
            if codec == "fake":
                out["pixels"] = [_fake_pixels(c, n_px) for c in pdf["content"]]
            else:
                px, ws, hs = [], [], []
                for ref, c in zip(pdf["media_ref"], pdf["content"]):
                    if c is None:
                        raise ValueError(f"null media content for media_ref={ref!r}")
                    rgb = decode_image(bytes(c))
                    px.append(
                        (rgb.mean(axis=2, dtype=np.float64) / 255.0)
                        .astype(np.float32)
                        .ravel()
                    )
                    hs.append(rgb.shape[0])
                    ws.append(rgb.shape[1])
                out["pixels"] = px
                out["width"] = np.asarray(ws, dtype=np.int32)
                out["height"] = np.asarray(hs, dtype=np.int32)
            yield out

    return media.repartition(F.col("media_ref")).mapInPandas(_decode_batch, DECODED_SCHEMA)


def extract_features(decoded: DataFrame, dim: int = 8) -> DataFrame:
    """Decoded pixels -> fixed-dim feature vector (mean-pooled blocks) +
    L2 norm.  Vectorized numpy per Arrow batch; the real model swap-in point
    keeps this exact signature."""

    def _feat_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            norms = []
            for px in pdf["pixels"]:
                v = np.asarray(px, dtype=np.float64)
                blocks = np.array_split(v, dim)
                f = np.array([b.mean() if len(b) else 0.0 for b in blocks], dtype=np.float32)
                feats.append(f)
                norms.append(float(np.sqrt((f.astype(np.float64) ** 2).sum())))
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "feature": feats, "feat_norm": norms}
            )

    return decoded.mapInPandas(_feat_batch, FEATURES_SCHEMA)


def resize_pixels(decoded: DataFrame, out_dim: int) -> DataFrame:
    """Square resize of decoded pixel grids to out_dim x out_dim via block
    mean-pooling (downscale) or nearest-neighbor (upscale).  The resampling
    math is real and codec-independent — only the decode that produced the
    pixels is stubbed.  Same schema out as in (width/height updated)."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_px = []
            for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"]):
                img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w))
                # nearest-neighbor index maps (exact for any ratio); block
                # mean when an output cell covers >1 source pixel per axis
                ys = np.floor((np.arange(out_dim) + 0.5) * h / out_dim).astype(int)
                xs = np.floor((np.arange(out_dim) + 0.5) * w / out_dim).astype(int)
                if out_dim < h and out_dim < w and h % out_dim == 0 and w % out_dim == 0:
                    fy, fx = h // out_dim, w // out_dim
                    res = img.reshape(out_dim, fy, out_dim, fx).mean(axis=(1, 3))
                else:
                    res = img[np.clip(ys, 0, h - 1)][:, np.clip(xs, 0, w - 1)]
                out_px.append(res.astype(np.float32).ravel())
            out = pdf.copy()
            out["pixels"] = out_px
            out["width"] = out_dim
            out["height"] = out_dim
            yield out[["media_ref", "media_type", "width", "height", "n_frames", "pixels"]]

    return decoded.mapInPandas(_resize_batch, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 2) -> DataFrame:
    """Video-style frame sampling: keep every n-th frame index row.

    Over :func:`decode_video` output (one row per genuinely-decoded frame,
    ``frame_idx`` present) this is a pure Catalyst filter.  Over
    :func:`decode_media` output (single-frame images) the frame index is
    synthesized from ``n_frames`` first — the explode -> filter plumbing a
    frames-array layout would need."""
    if "frame_idx" not in decoded.columns:
        decoded = decoded.withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)))),
        )
    return decoded.filter(F.col("frame_idx") % every_nth == 0)


def synth_media_table(spark, docs: DataFrame) -> DataFrame:
    """Deterministic media table for every media_ref in the docs corpus:
    payload bytes derived from the ref (opaque but stable)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    return refs.select(
        "media_ref",
        F.lit("image/fake").alias("media_type"),
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("content"),
        F.lit(FAKE_DECODE_DIM).cast("int").alias("width"),
        F.lit(FAKE_DECODE_DIM).cast("int").alias("height"),
        F.lit(1).cast("int").alias("n_frames"),
    )


def media_gps_for_seed(seed: int) -> tuple[float, float]:
    """Deterministic (lat, lon) for a geotagged fixture, 1e-3-degree grid
    (well inside the EXIF writer's 1e-6 rational precision)."""
    lon = (seed % 360_000) / 1000.0 - 180.0
    lat = ((seed >> 8) % 170_000) / 1000.0 - 85.0
    return lat, lon


def synth_image_media_table(
    spark, docs: DataFrame, fmt: str = "bmp", dim: int = 8, gps: bool = False
) -> DataFrame:
    """Media table whose payloads are REAL encoded images (BMP, PPM, PNG,
    GIF, baseline TIFF, or baseline JPEG), deterministic per media_ref —
    fixtures for the ``codec="real"`` path.  PNG payloads rotate through
    all five scanline filters, GIF rotates interlacing, TIFF rotates
    PackBits, and JPEG rotates subsampling (4:4:4 / 4:2:0), restart
    intervals, and baseline/progressive (SOF0/SOF2) framing (keyed on the
    ref hash) so a corpus-scale decode exercises every path.  Encoding runs Arrow-batched in mapInPandas, same as
    decode."""
    from geowave_spark.functions.gifcodec import gif_bytes
    from geowave_spark.functions.imagecodec import bmp_bytes, png_bytes, ppm_bytes
    from geowave_spark.functions.jpegcodec import jpeg_bytes
    from geowave_spark.functions.tiffcodec import tiff_bytes

    if fmt not in ("bmp", "ppm", "png", "jpeg", "gif", "tiff", "mixed"):
        raise ValueError(f"unknown format {fmt!r}")
    if gps and fmt not in ("jpeg", "tiff"):
        raise ValueError("gps=True requires an EXIF-capable format (jpeg/tiff)")
    _gps = (lambda seed: media_gps_for_seed(seed)) if gps else (lambda seed: None)
    _jpeg = lambda rgb, seed: jpeg_bytes(
        rgb,
        quality=90,
        subsample="420" if seed % 2 else "444",
        restart_interval=(seed >> 1) % 3,  # 0 (none), 1, or 2 MCUs
        progressive=bool((seed >> 3) & 1),  # rotate SOF0 / SOF2 streams
        gps=_gps(seed),
    )
    def _gif(rgb, seed):
        # gif_bytes refuses >256 distinct colors; random fixtures above
        # ~16x16 exceed that, so quantize to the 6-6-6 cube ONLY when
        # needed (dim<=16 corpora keep their exact pinned pixels)
        if len(np.unique(rgb.reshape(-1, 3), axis=0)) > 256:
            rgb = (rgb // 51) * 51
        return gif_bytes(rgb, interlace=bool(seed % 2))

    def _bmp(rgb, seed):
        # rotate truecolor / palette / RLE8 when the palette bound allows
        from geowave_spark.functions.imagecodec import bmp_bytes_indexed

        variant = (seed >> 11) % 3
        if variant:
            try:  # bmp_bytes_indexed does the distinct-color scan itself
                return bmp_bytes_indexed(rgb, rle=variant == 2)
            except ValueError:
                pass  # >256 colors: fall back to truecolor
        return bmp_bytes(rgb)

    if fmt == "bmp":
        enc = _bmp
    elif fmt == "ppm":
        enc = lambda rgb, seed: ppm_bytes(rgb)
    elif fmt == "jpeg":
        enc = _jpeg
    elif fmt == "png":
        # rotate scanline filters, Adam7 interlace, and 8/16-bit depth
        enc = lambda rgb, seed: png_bytes(
            rgb,
            filter_type=seed % 5,
            interlace=bool((seed >> 9) & 1),
            depth=16 if (seed >> 10) & 1 else 8,
        )
    elif fmt == "gif":
        enc = _gif
    elif fmt == "tiff":
        # rotate the lossless compressions (jpeg-in-tiff is lossy, pytest-only)
        enc = lambda rgb, seed: tiff_bytes(
            rgb,
            compression=("none", "packbits", "lzw", "deflate")[(seed >> 2) % 4],
            predictor=bool((seed >> 5) & 1) and (seed >> 2) % 4 >= 2,
            gps=_gps(seed),
        )
    else:
        # a realistic heterogeneous corpus: format varies per ref, one
        # decode pass dispatches on magic bytes across all six
        def enc(rgb, seed):
            choice = (seed >> 8) % 6
            if choice == 0:
                return _bmp(rgb, seed)
            if choice == 1:
                return ppm_bytes(rgb)
            if choice == 2:
                return png_bytes(
                    rgb,
                    filter_type=seed % 5,
                    interlace=bool((seed >> 9) & 1),
                    depth=16 if (seed >> 10) & 1 else 8,
                )
            if choice == 3:
                return _gif(rgb, seed)
            if choice == 4:
                return tiff_bytes(
                    rgb,
                    compression=("none", "packbits", "lzw", "deflate")[
                        (seed >> 2) % 4
                    ],
                    predictor=bool((seed >> 5) & 1) and (seed >> 2) % 4 >= 2,
                )
            return _jpeg(rgb, seed)

    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ref in pdf["media_ref"]:
                seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
                rgb = np.random.RandomState(seed).randint(
                    0, 256, (dim, dim, 3), dtype=np.uint8
                )
                payloads.append(enc(rgb, seed))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": f"image/{fmt}",
                    "content": payloads,
                    "width": np.int32(dim),
                    "height": np.int32(dim),
                    "n_frames": np.int32(1),
                }
            )

    return refs.mapInPandas(_encode, MEDIA_SCHEMA)


def media_geo_extract(media: DataFrame) -> DataFrame:
    """``(media_ref, lon, lat)`` from EXIF-geotagged payloads (JPEG APP1 /
    TIFF GPS IFD, via :mod:`geowave_spark.functions.exif`); untagged media
    is dropped.  This is the media half of the north star's "geometries
    extracted from interleaved text+media document spans": the output
    points feed :func:`geowave_spark.operators.spatial_join.pip_join` and
    the SFC indexing layer like any other point table.  The EXIF walk only
    parses headers (no pixel decode), so the stage is I/O-bound and
    embarrassingly parallel."""

    def _ext(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geowave_spark.functions.exif import gps_from_media

        for pdf in batches:
            refs, lons, lats = [], [], []
            for ref, c in zip(pdf["media_ref"], pdf["content"]):
                if c is None:
                    continue
                g = gps_from_media(bytes(c))
                if g is None:
                    continue
                refs.append(ref)
                lons.append(g[0])
                lats.append(g[1])
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "lon": np.asarray(lons, dtype=np.float64),
                    "lat": np.asarray(lats, dtype=np.float64),
                }
            )

    return media.mapInPandas(_ext, "media_ref string, lon double, lat double")


def decode_audio(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Binary audio payload -> waveform rows (mapInPandas, Arrow-batched).

    ``codec="real"`` decodes actual WAV (PCM 16-bit, G.711 A-law/mu-law,
    IMA ADPCM) and FLAC payloads via the dependency-free codecs in
    :mod:`geowave_spark.functions.audiocodec` /
    :mod:`geowave_spark.functions.flaccodec`; multi-channel input is mixed
    down to mono (mean across channels) and samples come out as float32 in
    [-1, 1] (int16 / 32768).  Sample rate and counts are taken from the
    payload header, overriding metadata columns.  Entropy-coded audio
    (MP3/AAC) raises with the libav/soundfile integration point documented
    in ``audiocodec.decode_audio_payload``.

    ``codec="fake"`` emits a deterministic payload-hash-seeded waveform with
    the identical schema, for pipelines tested without real fixtures.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geowave_spark.functions.audiocodec import decode_audio_payload

        for pdf in batches:
            out = pdf[["media_ref", "media_type"]].copy()
            if codec == "fake":
                waves = [
                    _fake_pixels(c, FAKE_AUDIO_SAMPLES) * 2.0 - 1.0
                    for c in pdf["content"]
                ]
                out["sample_rate"] = np.int32(16000)
                out["n_channels"] = np.int32(1)
                out["n_samples"] = np.int32(FAKE_AUDIO_SAMPLES)
                out["samples"] = [w.astype(np.float32) for w in waves]
            else:
                waves, rates, chans, counts = [], [], [], []
                for ref, c in zip(pdf["media_ref"], pdf["content"]):
                    if c is None:
                        raise ValueError(f"null media content for media_ref={ref!r}")
                    samples, rate = decode_audio_payload(bytes(c))
                    waves.append(
                        (samples.mean(axis=1, dtype=np.float64) / 32768.0)
                        .astype(np.float32)
                    )
                    rates.append(rate)
                    chans.append(samples.shape[1])
                    counts.append(samples.shape[0])
                out["sample_rate"] = np.asarray(rates, dtype=np.int32)
                out["n_channels"] = np.asarray(chans, dtype=np.int32)
                out["n_samples"] = np.asarray(counts, dtype=np.int32)
                out["samples"] = waves
            yield out

    return media.repartition(F.col("media_ref")).mapInPandas(
        _decode_batch, AUDIO_DECODED_SCHEMA
    )


def synth_audio_media_table(
    spark, docs: DataFrame, n_samples: int = 512, codec: str = "pcm"
) -> DataFrame:
    """Media table whose payloads are REAL encoded WAVs, deterministic per
    media_ref — fixtures for ``decode_audio(codec="real")``.  Channel count
    (1 or 2) and sample rate rotate on the ref hash so stereo mixdown and
    header-rate propagation are exercised corpus-wide.  ``codec`` picks the
    WAV coding: ``"pcm"`` (default, lossless), ``"ulaw"`` / ``"alaw"`` /
    ``"ima"``, ``"flac"`` (a FLAC container, not WAV — lossless like pcm),
    or ``"mixed"`` to rotate all five on the ref hash so one decode pass
    dispatches across format tags AND containers."""
    from geowave_spark.functions.audiocodec import wav_bytes
    from geowave_spark.functions.flaccodec import flac_bytes

    if codec not in ("pcm", "ulaw", "alaw", "ima", "flac", "mixed"):
        raise ValueError(f"unknown WAV codec {codec!r}")
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for ref in pdf["media_ref"]:
                seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
                rng = np.random.RandomState(seed)
                ch = 1 + seed % 2
                rate = (8000, 16000, 44100)[seed % 3]
                pcm = rng.randint(-32768, 32768, (n_samples, ch)).astype(np.int16)
                c = codec
                if codec == "mixed":
                    c = ("pcm", "ulaw", "alaw", "ima", "flac")[(seed >> 4) % 5]
                if c == "flac":
                    payloads.append(flac_bytes(pcm, sample_rate=rate, block_size=256))
                else:
                    payloads.append(wav_bytes(pcm, sample_rate=rate, codec=c))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": "audio/wav",
                    "content": payloads,
                    "width": np.int32(0),
                    "height": np.int32(0),
                    "n_frames": np.int32(1),
                }
            )

    return refs.mapInPandas(_encode, MEDIA_SCHEMA)


VIDEO_DECODED_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "n_frames int, frame_idx int, fps int, pixels array<float>"
)


def decode_video(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Binary video payload -> one row PER FRAME (mapInPandas, Arrow-batched).

    ``codec="real"`` decodes actual Y4M (YUV4MPEG2 mono/444/420/422) payloads via
    the dependency-free codec in :mod:`geowave_spark.functions.videocodec`;
    frames come out as grayscale floats in [0, 1] (RGB mean / 255) with real
    ``frame_idx``/``n_frames``/``fps`` from the stream, overriding metadata
    columns.  Compressed video (H.264/VP9) raises with the libav/PyAV
    integration point documented in ``videocodec.decode_video_payload``.

    ``codec="fake"`` synthesizes ``n_frames`` deterministic hash-seeded
    frames per payload with the identical schema.

    Exploding to frame rows at decode time (instead of carrying a frames
    array) keeps each output row bounded — a row is one frame, so Arrow
    batch memory scales with frames-per-batch, not frames-per-video, and
    downstream sampling/feature stages parallelize across frames.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r}")

    n_px = FAKE_DECODE_DIM * FAKE_DECODE_DIM

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from geowave_spark.functions.videocodec import decode_video_payload

        for pdf in batches:
            refs, types, ws, hs, nfs, idxs, fpss, px = [], [], [], [], [], [], [], []
            for ref, mt, c, w, h, nf in zip(
                pdf["media_ref"],
                pdf["media_type"],
                pdf["content"],
                pdf["width"],
                pdf["height"],
                pdf["n_frames"],
            ):
                if codec == "fake":
                    nf = max(int(nf), 1)
                    for i in range(nf):
                        refs.append(ref)
                        types.append(mt)
                        ws.append(FAKE_DECODE_DIM)
                        hs.append(FAKE_DECODE_DIM)
                        nfs.append(nf)
                        idxs.append(i)
                        fpss.append(25)
                        px.append(_fake_pixels((c or b"") + bytes([i]), n_px))
                else:
                    if c is None:
                        raise ValueError(f"null media content for media_ref={ref!r}")
                    frames, fps = decode_video_payload(bytes(c))
                    n, fh, fw = frames.shape[:3]
                    grey = (frames.mean(axis=3, dtype=np.float64) / 255.0).astype(
                        np.float32
                    )
                    for i in range(n):
                        refs.append(ref)
                        types.append(mt)
                        ws.append(fw)
                        hs.append(fh)
                        nfs.append(n)
                        idxs.append(i)
                        fpss.append(fps)
                        px.append(grey[i].ravel())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "media_type": types,
                    "width": np.asarray(ws, dtype=np.int32),
                    "height": np.asarray(hs, dtype=np.int32),
                    "n_frames": np.asarray(nfs, dtype=np.int32),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "fps": np.asarray(fpss, dtype=np.int32),
                    "pixels": px,
                }
            )

    return media.repartition(F.col("media_ref")).mapInPandas(
        _decode_batch, VIDEO_DECODED_SCHEMA
    )


def synth_video_media_table(
    spark, docs: DataFrame, dim: int = 8, fmt: str = "y4m"
) -> DataFrame:
    """Media table whose payloads are REAL encoded video streams,
    deterministic per media_ref — fixtures for ``decode_video(codec="real")``.
    ``fmt="y4m"``: frame count (2-4) and colorspace (mono/444/420) rotate on
    the ref hash so multi-frame explode and all three plane layouts are
    exercised corpus-wide.  ``fmt="avi"``: MJPEG-in-AVI payloads rotating the
    omitted-DHT convention; ``fmt="gif"``: animated GIFs rotating the
    full/patch/patch-transparent inter-frame optimizations; ``fmt="mixed"``
    rotates all three containers per ref so one decode pass dispatches
    across them."""
    from geowave_spark.functions.avicodec import avi_mjpeg_bytes
    from geowave_spark.functions.gifcodec import gif_anim_bytes
    from geowave_spark.functions.videocodec import y4m_bytes

    if fmt not in ("y4m", "avi", "gif", "mixed"):
        raise ValueError(f"unknown video format {fmt!r}")

    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def _encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, nframes = [], []
            for ref in pdf["media_ref"]:
                seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
                rng = np.random.RandomState(seed)
                nf = 2 + seed % 3
                container = fmt
                if fmt == "mixed":
                    container = ("y4m", "avi", "gif")[(seed >> 6) % 3]
                if container == "gif":
                    # palette-bounded frames (GIF needs <=255 colors total)
                    pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
                    frames = pal[rng.randint(0, 16, (nf, dim, dim))]
                    payloads.append(
                        gif_anim_bytes(
                            frames,
                            fps=20,
                            mode=("full", "patch", "patch_transparent")[
                                (seed >> 8) % 3
                            ],
                        )
                    )
                    nframes.append(nf)
                    continue
                if container == "avi":
                    frames = rng.randint(0, 256, (nf, dim, dim, 3), dtype=np.uint8)
                    payloads.append(
                        avi_mjpeg_bytes(
                            frames, fps=30, omit_dht=bool((seed >> 7) & 1)
                        )
                    )
                    nframes.append(nf)
                    continue
                variant = seed % 3
                if variant == 0:
                    frames = rng.randint(0, 256, (nf, dim, dim), dtype=np.uint8)
                    payloads.append(y4m_bytes(frames, fps=25, colorspace="mono"))
                elif variant == 1:
                    frames = rng.randint(0, 256, (nf, dim, dim, 3), dtype=np.uint8)
                    payloads.append(y4m_bytes(frames, fps=30, colorspace="444"))
                else:
                    frames = rng.randint(0, 256, (nf, dim, dim, 3), dtype=np.uint8)
                    payloads.append(y4m_bytes(frames, fps=24, colorspace="420"))
                nframes.append(nf)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": {
                        "y4m": "video/x-yuv4mpeg",
                        "avi": "video/avi",
                        "gif": "image/gif",
                        "mixed": "video/mixed",
                    }[fmt],
                    "content": payloads,
                    "width": np.int32(dim),
                    "height": np.int32(dim),
                    "n_frames": np.asarray(nframes, dtype=np.int32),
                }
            )

    return refs.mapInPandas(_encode, MEDIA_SCHEMA)
