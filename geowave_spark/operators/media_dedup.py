"""Cross-modal near-duplicate detection: audio fingerprints, video frame hashes.

Extends the training-data dedup family (``operators/dedup.py`` for text,
``operators/similarity.py`` for embeddings) to the decoded media the real
codecs produce — the reference has no audio/video operators (its media
handling stops at raster tiles, ``RasterDataAdapter.java``), so these are
beyond-reference capabilities a large-scale multimodal training pipeline
needs, built with the exact Spark shapes the text family already uses:

- one ``mapInPandas`` feature stage per modality (numpy per Arrow batch,
  no per-row Python UDFs),
- then uniform equi-join shuffles on hash keys — never an all-pairs
  crossJoin — with the same hot-key frequency caps ``max_doc_freq``
  pioneered (a silent/black segment must not become a quadratic key).

Audio: a Shazam-style spectral-peak constellation.  Each frame's per-band
peak bins are paired with the same band's peaks a few frames ahead; the
(band, bin, bin, dt) quad packs into one long.  Near-duplicates (gain
changes, mild noise, time shifts) preserve most quads, and the classic
offset-histogram vote — group candidate pairs by ``t_b - t_a`` and take
the best-aligned offset's match count — separates true alignment from
coincidence.  Everything after the feature stage is plain DataFrame
group/join algebra.

Video: per-frame difference hashes (dHash): block-mean the grayscale frame
to a (grid x grid+1) cell image, take horizontal gradient signs as bits.
Brightness shifts and small noise leave gradient signs mostly intact.
Candidates come from banding the 64-bit hash into 16-bit quarters keyed by
frame index (the transcode/quality-variant case training dedup actually
meets); verification computes the exact per-frame Hamming distance with
JVM-side ``bit_count(a ^ b)`` and keeps pairs where enough frames agree.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_FEATURES_SCHEMA = "media_ref string, features array<float>"
AUDIO_FP_SCHEMA = "media_ref string, t int, fhash long"
VIDEO_HASH_SCHEMA = "media_ref string, frame_idx int, dhash long"


def _block_cells(img: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Block-mean resize to (gh, gw) with every bin guaranteed at least one
    source pixel — array_split would yield empty (NaN) chunks whenever a
    frame dimension is smaller than the grid.  Module-level so the
    no-empty-bin invariant is unit-testable outside Spark workers."""
    h, w = img.shape
    ye = (np.arange(gh) * h) // gh
    xe = (np.arange(gw) * w) // gw
    # reduceat: a repeated start index yields that single row/col, so
    # upsampled bins nearest-sample instead of going empty
    rows = np.add.reduceat(img, ye, axis=0)
    rcnt = np.maximum(np.diff(np.append(ye, h)), 1)
    cols = np.add.reduceat(rows, xe, axis=1)
    ccnt = np.maximum(np.diff(np.append(xe, w)), 1)
    return cols / (rcnt[:, None] * ccnt[None, :])


def _frame_spectra(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(n_frames, n_fft//2+1) magnitude spectra of a mono float signal."""
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    win = np.hanning(n_fft)
    return np.abs(np.fft.rfft(x[idx] * win, axis=1))


def _band_slices(n_bins: int, n_bands: int) -> list[slice]:
    """Contiguous band slices over the positive-frequency bins (DC excluded)."""
    edges = np.linspace(1, n_bins, n_bands + 1).astype(int)
    return [slice(int(a), int(max(b, a + 1))) for a, b in zip(edges[:-1], edges[1:])]


def audio_spectral_features(
    decoded: DataFrame, n_fft: int = 256, hop: int = 128, n_bands: int = 16
) -> DataFrame:
    """Per-clip spectral feature vector: log band energies (mean + std over
    frames), L2-normalized — ``(media_ref, features)`` ready for the ANN
    operators in :mod:`geowave_spark.operators.similarity`.

    Input is :func:`geowave_spark.functions.multimodal.decode_audio` output
    (``samples`` as mono float32).  One numpy pass per clip, amortized per
    Arrow batch; the output is 2*n_bands floats per clip regardless of
    duration, so downstream joins never see the waveform.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for samples in pdf["samples"]:
                spec = _frame_spectra(
                    np.asarray(samples, dtype=np.float64), n_fft, hop
                )
                bands = np.stack(
                    [np.log1p(spec[:, sl].sum(axis=1)) for sl in _band_slices(spec.shape[1], n_bands)],
                    axis=1,
                )  # (n_frames, n_bands)
                v = np.concatenate([bands.mean(axis=0), bands.std(axis=0)])
                norm = np.linalg.norm(v)
                feats.append((v / norm if norm > 0 else v).astype(np.float32))
            yield pd.DataFrame({"media_ref": pdf["media_ref"], "features": feats})

    return decoded.mapInPandas(_feat, AUDIO_FEATURES_SCHEMA)


def audio_fingerprints(
    decoded: DataFrame,
    n_fft: int = 256,
    hop: int = 128,
    n_bands: int = 8,
    fan_out: int = 3,
) -> DataFrame:
    """Constellation fingerprints: ``(media_ref, t, fhash)`` rows.

    Per frame, the peak bin of each spectral band anchors hashes pairing it
    with the same band's peak 1..fan_out frames ahead:
    ``fhash = (((dt << 3) | band) << 12 | bin_t) << 12 | bin_t+dt``.
    Peak positions are invariant to gain and robust to mild noise; a time
    shift moves ``t`` but not the hashes, which is what the offset vote in
    :func:`audio_dedup_pairs` exploits.
    """
    if n_bands > 8 or fan_out > 7 or n_fft > 4096:
        # max peak bin is n_fft/2, which must fit the 12-bit hash fields
        raise ValueError("hash packing allows n_bands<=8, fan_out<=7, n_fft<=4096")

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, ts, hashes = [], [], []
            for ref, samples in zip(pdf["media_ref"], pdf["samples"]):
                spec = _frame_spectra(
                    np.asarray(samples, dtype=np.float64), n_fft, hop
                )
                peaks = np.stack(
                    [sl.start + spec[:, sl].argmax(axis=1) for sl in _band_slices(spec.shape[1], n_bands)],
                    axis=1,
                )  # (n_frames, n_bands) peak bin per band
                n = peaks.shape[0]
                for dt in range(1, fan_out + 1):
                    if n <= dt:
                        break
                    a, b = peaks[:-dt], peaks[dt:]
                    for band in range(n_bands):
                        h = (
                            (((dt << 3) | band) << 12 | a[:, band]) << 12
                        ) | b[:, band]
                        refs.extend([ref] * (n - dt))
                        ts.extend(range(n - dt))
                        hashes.extend(h.tolist())
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "t": np.asarray(ts, dtype=np.int32),
                    "fhash": np.asarray(hashes, dtype=np.int64),
                }
            )

    return decoded.mapInPandas(_fp, AUDIO_FP_SCHEMA)


def audio_dedup_pairs(
    fingerprints: DataFrame,
    min_matches: int = 8,
    max_hash_freq: int | None = 64,
) -> DataFrame:
    """Near-duplicate audio pairs by aligned fingerprint votes.

    Equi-join on ``fhash`` (uniform for tonal content), then the offset
    histogram: matches at a consistent ``t_b - t_a`` mean the clips align at
    that shift; coincidental hash collisions scatter across offsets.
    Returns ``(id_a, id_b, matches, offset)`` with ``id_a < id_b`` and
    ``matches`` (votes at the best offset) ``>= min_matches``.

    ``max_hash_freq`` drops hashes occurring in more rows than that
    (degenerate spectra — silence, DC hum — would otherwise make one key
    quadratic), the same bounded-explode contract as ``max_doc_freq`` in
    :func:`geowave_spark.operators.dedup.ngram_jaccard_pairs`.
    """
    fp = fingerprints
    if max_hash_freq is not None:
        hot = (
            fp.groupBy("fhash")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_hash_freq)
        )
        fp = fp.join(F.broadcast(hot.select("fhash")), "fhash", "left_anti")
    left = fp.select(F.col("media_ref").alias("id_a"), F.col("t").alias("ta"), "fhash")
    right = fp.select(F.col("media_ref").alias("id_b"), F.col("t").alias("tb"), "fhash")
    votes = (
        left.join(right, "fhash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", (F.col("tb") - F.col("ta")).alias("offset"))
        .agg(F.count("*").alias("matches"))
    )
    best = (
        votes.groupBy("id_a", "id_b")
        .agg(F.max(F.struct("matches", "offset")).alias("_m"))
        .select(
            "id_a",
            "id_b",
            F.col("_m.matches").alias("matches"),
            F.col("_m.offset").alias("offset"),
        )
    )
    return best.filter(F.col("matches") >= min_matches)


def video_frame_hashes(decoded_video: DataFrame, grid: int = 8) -> DataFrame:
    """Per-frame difference hash: ``(media_ref, frame_idx, dhash)``.

    The grayscale frame (``pixels`` from
    :func:`geowave_spark.functions.multimodal.decode_video`) is block-mean
    reduced to ``grid x (grid+1)`` cells; bit k of ``dhash`` is the sign of
    the horizontal gradient between adjacent cells.  Gradient signs survive
    brightness shifts and mild noise, which is what makes dHash the
    standard near-dup frame signature.
    """
    if grid * grid > 64:
        raise ValueError("grid*grid must fit in a 64-bit hash")

    def _dh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for w, h, px in zip(pdf["width"], pdf["height"], pdf["pixels"]):
                img = np.asarray(px, dtype=np.float64).reshape(int(h), int(w))
                cells = _block_cells(img, grid, grid + 1)  # (grid, grid+1)
                bits = (cells[:, :-1] > cells[:, 1:]).ravel()
                # bit k of the long = bits[k]; packbits avoids the signed
                # shift-by-63 overflow a power-of-two dot product would hit
                raw = np.packbits(bits.astype(np.uint8), bitorder="little")
                raw = np.pad(raw, (0, 8 - len(raw)))
                hashes.append(int.from_bytes(raw.tobytes(), "little", signed=True))
            out = pdf[["media_ref", "frame_idx"]].copy()
            out["dhash"] = np.asarray(hashes, dtype=np.int64)
            yield out

    return decoded_video.mapInPandas(_dh, VIDEO_HASH_SCHEMA)


def video_dedup_pairs(
    frame_hashes: DataFrame,
    bands: int = 4,
    ham_max: int = 10,
    min_frac: float = 0.8,
    max_band_freq: int | None = 64,
) -> DataFrame:
    """Near-duplicate video pairs from banded frame hashes.

    Candidates: band the 64-bit dHash into ``bands`` equal bit slices and
    equi-join on ``(frame_idx, band, band_value)`` — a near-duplicate frame
    pair within Hamming distance ``ham_max`` over 64 bits agrees exactly on
    at least one 16-bit quarter with high probability (pigeonhole: distance
    <= 10 cannot corrupt all 4 quarters unless spread 3/3/2/2; real frame
    noise clusters).  Verify: join both sides' full hashes per frame and
    count frames with ``bit_count(a ^ b) <= ham_max`` JVM-side; keep pairs
    where that fraction is ``>= min_frac`` of the SHORTER video's frames.
    Returns ``(id_a, id_b, close_frames, frac)`` with ``id_a < id_b``.

    ``max_band_freq`` drops band keys occurring in more rows than that
    (black/static frames shared across a corpus would otherwise be a
    quadratic hot key) — same contract as ``max_hash_freq`` above.
    """
    width = 64 // bands
    bexprs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("dhash"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("bv"),
        )
        for b in range(bands)
    ]
    keyed = frame_hashes.select(
        "media_ref", "frame_idx", F.explode(F.array(*bexprs)).alias("e")
    ).select("media_ref", "frame_idx", "e.band", "e.bv")
    if max_band_freq is not None:
        hot = (
            keyed.groupBy("frame_idx", "band", "bv")
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_band_freq)
        )
        keyed = keyed.join(
            F.broadcast(hot.select("frame_idx", "band", "bv")),
            ["frame_idx", "band", "bv"],
            "left_anti",
        )
    la = keyed.select(F.col("media_ref").alias("id_a"), "frame_idx", "band", "bv")
    rb = keyed.select(F.col("media_ref").alias("id_b"), "frame_idx", "band", "bv")
    cands = (
        la.join(rb, ["frame_idx", "band", "bv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = frame_hashes.select(
        F.col("media_ref").alias("id_a"), "frame_idx", F.col("dhash").alias("da")
    )
    hb = frame_hashes.select(
        F.col("media_ref").alias("id_b"), "frame_idx", F.col("dhash").alias("db")
    )
    per_frame = cands.join(ha, "id_a").join(hb, ["id_b", "frame_idx"])
    counts = frame_hashes.groupBy("media_ref").agg(F.count("*").alias("nf"))
    scored = (
        per_frame.groupBy("id_a", "id_b")
        .agg(
            F.sum(
                (F.bit_count(F.col("da").bitwiseXOR(F.col("db"))) <= ham_max).cast("long")
            ).alias("close_frames")
        )
        .join(counts.select(F.col("media_ref").alias("id_a"), F.col("nf").alias("na")), "id_a")
        .join(counts.select(F.col("media_ref").alias("id_b"), F.col("nf").alias("nb")), "id_b")
        .withColumn(
            "frac", F.col("close_frames") / F.least(F.col("na"), F.col("nb"))
        )
    )
    return scored.filter(F.col("frac") >= min_frac).select(
        "id_a", "id_b", "close_frames", "frac"
    )
