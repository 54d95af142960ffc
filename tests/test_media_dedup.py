"""Cross-modal near-dup operators: audio constellation fingerprints and
video dHash dedup over REAL encoded payloads (WAV / Y4M through the
dependency-free codecs), end to end through Spark.

Fixture design: per "group" a base clip/video plus near-duplicate variants
(gain scaling, time shift, mild noise, brightness shift) — the transforms
training-data dedup actually meets.  Different groups use different tonal
content / spatial patterns, so correct operators must pair every variant
with its base and never pair across groups.
"""

import numpy as np
import pytest

from geowave_spark.functions.multimodal import MEDIA_SCHEMA, decode_audio, decode_video
from geowave_spark.operators.media_dedup import (
    audio_dedup_pairs,
    audio_fingerprints,
    audio_spectral_features,
    video_dedup_pairs,
    video_frame_hashes,
)

SR = 8000
N = 4096
HOP = 128


def _tone_clip(freqs, seed, n=N, sr=SR):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / sr
    x = sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return x / len(freqs) + 0.01 * rng.randn(n)


def _wav(x):
    from geowave_spark.functions.audiocodec import wav_bytes

    pcm = np.clip(x * 20000, -32768, 32767).astype(np.int16).reshape(-1, 1)
    return wav_bytes(pcm, sample_rate=SR)


def _audio_rows():
    groups = {0: (500, 1200, 2300), 1: (700, 1500, 3100), 2: (400, 900, 1800)}
    rows = []
    for g, freqs in groups.items():
        base = _tone_clip(freqs, seed=g)
        rows.append((f"g{g}_base", _wav(base)))
        rows.append((f"g{g}_gain", _wav(0.5 * base)))
        shifted = np.concatenate([np.zeros(2 * HOP), base])[: len(base)]
        rows.append((f"g{g}_shift", _wav(shifted)))
        noisy = base + 0.02 * np.random.RandomState(100 + g).randn(len(base))
        rows.append((f"g{g}_noise", _wav(noisy)))
    return rows


def _media_df(spark, rows, media_type):
    return spark.createDataFrame(
        [(ref, media_type, bytearray(payload), 0, 0, 1) for ref, payload in rows],
        MEDIA_SCHEMA,
    )


def _group(ref):
    return ref.split("_")[0]


class TestAudioDedup:
    @pytest.fixture(scope="class")
    def decoded(self, spark):
        df = decode_audio(
            _media_df(spark, _audio_rows(), "audio/wav"), codec="real"
        )
        df.persist().count()
        yield df
        df.unpersist()

    def test_spectral_features_separate_groups(self, decoded):
        feats = {
            r.media_ref: np.asarray(r.features, dtype=np.float64)
            for r in audio_spectral_features(decoded).collect()
        }
        assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in feats.values())

        def cos(a, b):
            return float(feats[a] @ feats[b])

        for g in range(3):
            for variant in ("gain", "noise", "shift"):
                same = cos(f"g{g}_base", f"g{g}_{variant}")
                assert same > 0.98, (g, variant, same)
            other = cos(f"g{g}_base", f"g{(g + 1) % 3}_base")
            assert other < 0.95, (g, other)

    def test_fingerprint_pairs_group_variants(self, decoded):
        fp = audio_fingerprints(decoded)
        pairs = audio_dedup_pairs(fp, min_matches=8).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        # every within-group pair (4 refs -> 6 pairs x 3 groups) found
        for g in range(3):
            refs = sorted(f"g{g}_{v}" for v in ("base", "gain", "noise", "shift"))
            for i in range(len(refs)):
                for j in range(i + 1, len(refs)):
                    assert (refs[i], refs[j]) in got, (refs[i], refs[j])
        # and nothing across groups
        assert all(_group(a) == _group(b) for a, b in got)

    def test_shift_offset_is_recovered(self, decoded):
        fp = audio_fingerprints(decoded)
        rows = audio_dedup_pairs(fp, min_matches=8).collect()
        by_pair = {(r.id_a, r.id_b): r for r in rows}
        r = by_pair[("g0_base", "g0_shift")]
        # shifted by 2*HOP samples = exactly 2 frames
        assert abs(r.offset) == 2, r
        r0 = by_pair[("g0_base", "g0_gain")]
        assert r0.offset == 0 and r0.matches > r.matches

    def test_hot_hash_cap_bounds_degenerate_keys(self, spark):
        # 30 identical silence clips: every fingerprint collides; the cap
        # must drop those keys instead of building a quadratic join
        silence = np.zeros(N)
        rows = [(f"s{i}", _wav(silence)) for i in range(30)]
        decoded = decode_audio(_media_df(spark, rows, "audio/wav"), codec="real")
        fp = audio_fingerprints(decoded)
        capped = audio_dedup_pairs(fp, min_matches=1, max_hash_freq=10)
        assert capped.count() == 0

    def test_pair_plan_has_no_cartesian(self, decoded):
        plan = audio_dedup_pairs(audio_fingerprints(decoded))._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def _pattern_frames(g, n=4, dim=16):
    yy, xx = np.mgrid[0:dim, 0:dim].astype(np.float64)
    frames = []
    for f in range(n):
        img = 128 + 90 * np.sin((xx + 2 * f + 5 * g) / 2.1) + 30 * np.cos(
            (yy - f + 3 * g) / 3.3
        )
        frames.append(np.clip(img, 0, 255))
    return np.stack(frames).astype(np.uint8)


def _y4m(frames):
    from geowave_spark.functions.videocodec import y4m_bytes

    rgb = np.repeat(frames[:, :, :, None], 3, axis=3)
    return y4m_bytes(rgb, 25, colorspace="444")


def _video_rows():
    rows = []
    for g in range(3):
        base = _pattern_frames(g)
        rows.append((f"g{g}_base", _y4m(base)))
        bright = np.clip(base.astype(np.int64) + 6, 0, 255).astype(np.uint8)
        rows.append((f"g{g}_bright", _y4m(bright)))
        noise = np.random.RandomState(g).randint(-2, 3, base.shape)
        noisy = np.clip(base.astype(np.int64) + noise, 0, 255).astype(np.uint8)
        rows.append((f"g{g}_noise", _y4m(noisy)))
    return rows


class TestVideoDedup:
    @pytest.fixture(scope="class")
    def hashes(self, spark):
        decoded = decode_video(
            _media_df(spark, _video_rows(), "video/y4m"), codec="real"
        )
        df = video_frame_hashes(decoded)
        df.persist().count()
        yield df
        df.unpersist()

    def test_brightness_shift_preserves_dhash(self, hashes):
        """dHash is a gradient sign — a uniform brightness shift must leave
        every frame hash EXACTLY unchanged."""
        h = {(r.media_ref, r.frame_idx): r.dhash for r in hashes.collect()}
        for g in range(3):
            for f in range(4):
                assert h[(f"g{g}_base", f)] == h[(f"g{g}_bright", f)]

    def test_pairs_group_variants_not_across(self, hashes):
        pairs = video_dedup_pairs(hashes, ham_max=10, min_frac=0.75).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        for g in range(3):
            refs = sorted(f"g{g}_{v}" for v in ("base", "bright", "noise"))
            for i in range(len(refs)):
                for j in range(i + 1, len(refs)):
                    assert (refs[i], refs[j]) in got, (refs[i], refs[j])
        assert all(_group(a) == _group(b) for a, b in got)

    def test_hot_band_cap_bounds_static_frames(self, spark):
        # 30 identical black videos: every band key collides corpus-wide
        black = np.zeros((4, 16, 16), np.uint8)
        rows = [(f"b{i}", _y4m(black)) for i in range(30)]
        decoded = decode_video(_media_df(spark, rows, "video/y4m"), codec="real")
        capped = video_dedup_pairs(
            video_frame_hashes(decoded), min_frac=0.1, max_band_freq=10
        )
        assert capped.count() == 0

    def test_pair_plan_has_no_cartesian(self, hashes):
        plan = video_dedup_pairs(hashes)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_block_cells_never_produces_empty_bins(self):
        """Unit pin for the dHash resize kernel: frames narrower/shorter
        than the grid must yield finite cells (array_split produced NaN
        from empty chunks), exact block means when dims divide, and
        nearest-sample values when upsampling."""
        import warnings

        from geowave_spark.operators.media_dedup import _block_cells

        rng = np.random.RandomState(0)
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)
            for h, w in ((8, 8), (4, 3), (1, 1), (16, 16), (5, 9)):
                cells = _block_cells(rng.rand(h, w), 8, 9)
                assert cells.shape == (8, 9)
                assert np.isfinite(cells).all(), (h, w)
        # exact block mean when dims divide evenly
        img = np.arange(32, dtype=np.float64).reshape(4, 8)
        got = _block_cells(img, 2, 4)
        want = img.reshape(2, 2, 4, 2).mean(axis=(1, 3))
        assert np.allclose(got, want)
        # upsampling nearest-samples rows (no interpolation invented)
        up = _block_cells(np.array([[1.0, 2.0]]), 2, 2)
        assert np.allclose(up, [[1.0, 2.0], [1.0, 2.0]])

    def test_small_frames_hash_end_to_end(self, spark):
        """8-wide frames through the Spark stage: hashes are well-defined
        and keep the brightness invariance."""
        base = _pattern_frames(0, n=2, dim=8)
        bright = np.clip(base.astype(np.int64) + 5, 0, 255).astype(np.uint8)
        rows = [("s_base", _y4m(base)), ("s_bright", _y4m(bright))]
        decoded = decode_video(_media_df(spark, rows, "video/y4m"), codec="real")
        h = {
            (r.media_ref, r.frame_idx): r.dhash
            for r in video_frame_hashes(decoded).collect()
        }
        assert all(isinstance(v, int) for v in h.values())
        for f in range(2):
            assert h[("s_base", f)] == h[("s_bright", f)]
