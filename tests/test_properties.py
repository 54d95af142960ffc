"""Property-based hardening (hypothesis) of the pure-Python kernels the
whole engine stands on: SFC codecs, planner covers/range decomposition,
WKT/WKB round-trips, convexity dispatch, visibility grammar.  No Spark —
these run in milliseconds per example."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geowave_spark.sfc.hilbert import hilbert_decode, hilbert_encode
from geowave_spark.sfc.zorder import zorder_decode, zorder_encode

BITS = st.integers(min_value=1, max_value=16)


def _coords(bits: int, n: int, rnd) -> list[np.ndarray]:
    hi = 2**bits
    return [
        np.array([rnd.randrange(hi) for _ in range(n)], dtype=np.uint64)
        for _ in range(2)
    ]


class TestSFCCodecs:
    @given(bits=BITS, data=st.data())
    @settings(max_examples=100, deadline=None)
    def test_hilbert_inverse(self, bits, data):
        hi = 2**bits
        xs = data.draw(st.lists(st.integers(0, hi - 1), min_size=1, max_size=20))
        ys = data.draw(
            st.lists(st.integers(0, hi - 1), min_size=len(xs), max_size=len(xs))
        )
        cs = [np.array(xs, dtype=np.uint64), np.array(ys, dtype=np.uint64)]
        keys = hilbert_encode([c.copy() for c in cs], bits)
        assert (keys < (1 << (2 * bits))).all()
        back = hilbert_decode(keys.copy(), 2, bits)
        assert (back[0] == cs[0]).all() and (back[1] == cs[1]).all()

    @given(bits=BITS, data=st.data())
    @settings(max_examples=100, deadline=None)
    def test_zorder_inverse(self, bits, data):
        hi = 2**bits
        xs = data.draw(st.lists(st.integers(0, hi - 1), min_size=1, max_size=20))
        ys = data.draw(
            st.lists(st.integers(0, hi - 1), min_size=len(xs), max_size=len(xs))
        )
        cs = [np.array(xs, dtype=np.uint64), np.array(ys, dtype=np.uint64)]
        keys = zorder_encode(cs, bits)
        back = zorder_decode(keys.copy(), 2, bits)
        assert (back[0] == cs[0]).all() and (back[1] == cs[1]).all()

    @given(bits=st.integers(1, 10), start=st.integers(0))
    @settings(max_examples=60, deadline=None)
    def test_hilbert_unit_step_locality(self, bits, start):
        """Consecutive Hilbert keys decode to 4-neighbor grid cells — the
        locality property the tiered index leans on for range contiguity."""
        n = 1 << (2 * bits)
        s = start % (n - 1)
        ks = np.array([s, s + 1], dtype=np.uint64)
        xs, ys = hilbert_decode(ks.copy(), 2, bits)
        manhattan = abs(int(xs[1]) - int(xs[0])) + abs(int(ys[1]) - int(ys[0]))
        assert manhattan == 1


BOXES = st.tuples(
    st.floats(-180, 179, allow_nan=False),
    st.floats(-90, 89, allow_nan=False),
    st.floats(0.001, 40),
    st.floats(0.001, 40),
)


class TestPlannerCovers:
    @given(box=BOXES, bits=st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_cover_equals_bruteforce(self, box, bits):
        """cells_covering_bbox == the brute-force set of cells whose box
        intersects the query box (small tiers, exhaustive grid)."""
        from geowave_spark.sfc import DEFAULT_CONFIG
        from geowave_spark.sfc.tiered import cell_to_box, cells_covering_bbox

        minx, miny, w, h = box
        maxx, maxy = min(minx + w, 180.0), min(miny + h, 90.0)
        got = set(
            cells_covering_bbox(minx, miny, maxx, maxy, bits, wrap_lon=False).tolist()
        )
        all_keys = np.arange(1 << (2 * bits), dtype=np.uint64)
        lo_x, hi_x, lo_y, hi_y = cell_to_box(all_keys, bits, DEFAULT_CONFIG)
        hit = (lo_x <= maxx) & (hi_x >= minx) & (lo_y <= maxy) & (hi_y >= miny)
        want = set(all_keys[hit].astype(np.int64).tolist())
        # the planner cover uses inclusive bin spans: it must never MISS a
        # genuinely intersecting cell; boundary-touch cells may differ by
        # closed/half-open convention, so assert superset-of-interior
        eps = 1e-9
        strict = (
            (lo_x < maxx - eps)
            & (hi_x > minx + eps)
            & (lo_y < maxy - eps)
            & (hi_y > miny + eps)
        )
        interior = set(all_keys[strict].astype(np.int64).tolist())
        assert interior <= got <= want

    @given(box=BOXES, bits=st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_decomposed_ranges_cover_all_cells(self, box, bits):
        """K2 over-inclusive contract: every covering cell's key falls inside
        some decomposed range (never under-inclusive)."""
        from geowave_spark.sfc.tiered import cells_covering_bbox, decompose_query_ranges

        minx, miny, w, h = box
        maxx, maxy = min(minx + w, 180.0), min(miny + h, 90.0)
        cells = cells_covering_bbox(minx, miny, maxx, maxy, bits, wrap_lon=False)
        ranges = decompose_query_ranges(minx, miny, maxx, maxy, bits)
        for k in cells.tolist():
            assert any(lo <= k <= hi for lo, hi in ranges), (k, ranges)


FLOATS = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)


def _rand_ring(draw):
    """Closed ring from the convex hull of >= 3 random points."""
    from geowave_spark.operators.hull import monotone_chain

    pts = draw(
        st.lists(st.tuples(FLOATS, FLOATS), min_size=3, max_size=12, unique=True)
    )
    h = monotone_chain(np.array(pts, dtype=np.float64))
    if len(h) < 3:
        return None
    return np.vstack([h, h[:1]])


class TestGeometryRoundTrips:
    @given(data=st.data())
    @settings(max_examples=80, deadline=None)
    def test_wkt_roundtrip_polygon(self, data):
        from geowave_spark.geometry.wkt import geom_to_wkt, parse_wkt

        ring = _rand_ring(data.draw)
        if ring is None:
            return
        g = ("polygon", [ring])
        g2 = parse_wkt(geom_to_wkt(g))
        assert g2[0] == "polygon" and np.array_equal(g2[1][0], ring)

    @given(
        pts=st.lists(st.tuples(FLOATS, FLOATS), min_size=2, max_size=10),
    )
    @settings(max_examples=80, deadline=None)
    def test_wkb_roundtrip_linestring(self, pts):
        from geowave_spark.geometry.wkb import wkb_dumps, wkb_loads

        g = ("linestring", np.array(pts, dtype=np.float64))
        kind, data = wkb_loads(wkb_dumps(g))
        assert kind == "linestring" and np.array_equal(data, g[1])

    @given(x=FLOATS, y=FLOATS)
    @settings(max_examples=80, deadline=None)
    def test_wkb_roundtrip_point(self, x, y):
        from geowave_spark.geometry.wkb import wkb_dumps, wkb_loads

        kind, data = wkb_loads(wkb_dumps(("point", (x, y))))
        assert kind == "point" and data == (x, y)


DYADIC = st.integers(-2000, 2000).map(lambda v: v / 1024.0)


class TestConvexityDispatch:
    @given(
        data=st.data(),
        box=st.tuples(DYADIC, DYADIC, st.integers(1, 2048), st.integers(1, 2048)),
    )
    @settings(max_examples=120, deadline=None)
    def test_sat_equals_general_path_on_convex_rings(self, data, box):
        """For genuinely convex rings the SAT fast path and the general
        even-odd polygon-polygon test must agree on box intersects —
        including exact touch cases (both are inclusive).  Coordinates are
        dyadic (k/1024) so every projection/orientation product is exact in
        double and any tie is a TRUE geometric tie: hypothesis previously
        proved that at sub-ULP degeneracies (a 1e-38 separation at
        coordinate 1.0) the two float kernels may legitimately differ, which
        no floating-point formulation resolves."""
        from geowave_spark.geometry.predicates import (
            _box_prepared,
            convex_polygon_intersects_box,
            polygon_intersects_polygon,
            ring_is_convex,
        )
        from geowave_spark.operators.hull import monotone_chain

        pts = data.draw(
            st.lists(st.tuples(DYADIC, DYADIC), min_size=3, max_size=12, unique=True)
        )
        h = monotone_chain(np.array(pts, dtype=np.float64))
        if len(h) < 3:
            return
        ring = np.vstack([h, h[:1]])
        if not ring_is_convex(ring):
            return
        bx, by, w, h2 = box
        minx, miny, maxx, maxy = bx, by, bx + w / 1024.0, by + h2 / 1024.0
        fast = convex_polygon_intersects_box(ring, minx, miny, maxx, maxy)
        general = polygon_intersects_polygon(
            ("polygon", [ring]), _box_prepared(minx, miny, maxx, maxy)
        )
        assert fast == general

    @given(data=st.data())
    @settings(max_examples=80, deadline=None)
    def test_convexity_invariant_under_vertex_duplication(self, data):
        from geowave_spark.geometry.predicates import ring_is_convex

        ring = _rand_ring(data.draw)
        if ring is None:
            return
        i = data.draw(st.integers(0, len(ring) - 2))
        dup = np.vstack([ring[: i + 1], ring[i : i + 1], ring[i + 1 :]])
        assert ring_is_convex(dup) == ring_is_convex(ring)


class TestLexicoders:
    def test_byte_compat_pins(self):
        """Byte-level pins against the reference transforms (LongLexicoder:
        sign-bit XOR big-endian; DoubleLexicoder: raw bits, invert if
        negative else set sign bit)."""
        from geowave_spark.functions.lexicoder import (
            encode_double,
            encode_long,
        )

        assert encode_long(0) == bytes([0x80, 0, 0, 0, 0, 0, 0, 0])
        assert encode_long(-1) == bytes([0x7F, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF])
        assert encode_long(-(2**63)) == bytes(8)
        assert encode_long(2**63 - 1) == bytes([0xFF] * 8)
        # 1.0 raw bits 0x3FF0000000000000, non-negative -> XOR sign bit
        assert encode_double(1.0).hex() == "bff0000000000000"
        # -2.0 raw bits 0xC000000000000000 (negative) -> bitwise NOT
        assert encode_double(-2.0).hex() == "3fffffffffffffff"
        assert encode_double(0.0).hex() == "8000000000000000"
        assert encode_double(-0.0).hex() == "7fffffffffffffff"  # -0.0 < 0.0

    @given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=2, max_size=30))
    @settings(max_examples=100, deadline=None)
    def test_long_order_and_roundtrip(self, vals):
        from geowave_spark.functions.lexicoder import decode_long, encode_long

        encs = [encode_long(v) for v in vals]
        assert [decode_long(e) for e in encs] == vals
        assert sorted(range(len(vals)), key=lambda i: encs[i]) == sorted(
            range(len(vals)), key=lambda i: (vals[i], i)
        ) or sorted(encs) == [e for _, e in sorted(zip(vals, encs))]

    @given(
        st.lists(
            st.floats(allow_nan=False, allow_infinity=True, width=64),
            min_size=2,
            max_size=30,
        )
    )
    @settings(max_examples=100, deadline=None)
    def test_double_order_and_roundtrip(self, vals):
        from geowave_spark.functions.lexicoder import (
            decode_double,
            double_sort_keys,
            encode_double,
        )

        encs = [encode_double(v) for v in vals]
        back = [decode_double(e) for e in encs]
        for v, b in zip(vals, back):
            assert v == b or (v == 0.0 and b == 0.0)  # -0.0 round-trips as itself
            assert math_copysign(1.0, v) == math_copysign(1.0, b)
        # byte order == numeric order (ties by index keep it well-defined)
        by_bytes = sorted(encs)
        by_value = [e for _, e in sorted(zip(vals, encs), key=lambda t: (t[0], t[1]))]
        assert by_bytes == by_value
        # vectorized keys agree with the scalar encoder
        keys = double_sort_keys(np.array(vals, dtype=np.float64))
        assert [f"{k:016x}" for k in keys] == [e.hex() for e in encs]

    @given(st.integers(-(2**31), 2**31 - 1), st.integers(-(2**15), 2**15 - 1))
    @settings(max_examples=100, deadline=None)
    def test_int_short_roundtrip(self, i, s):
        from geowave_spark.functions.lexicoder import (
            decode_int,
            decode_short,
            encode_int,
            encode_short,
        )

        assert decode_int(encode_int(i)) == i
        assert decode_short(encode_short(s)) == s


def math_copysign(a, b):
    import math

    return math.copysign(a, b)


class TestVisibilityGrammar:
    LABELS = ["alpha", "bravo", "charlie", "delta"]

    @st.composite
    def _expr(draw, self=None, depth=0):
        labels = TestVisibilityGrammar.LABELS
        if depth >= 3 or draw(st.booleans()):
            name = draw(st.sampled_from(labels))
            return name, name
        op = draw(st.sampled_from(["&", "|"]))
        n = draw(st.integers(2, 3))
        parts = [draw(TestVisibilityGrammar._expr(depth=depth + 1)) for _ in range(n)]
        text = op.join(f"({t})" for t, _ in parts)
        if op == "&":
            val = ("&", [v for _, v in parts])
        else:
            val = ("|", [v for _, v in parts])
        return text, val

    @staticmethod
    def _eval_ast(ast, auths):
        if isinstance(ast, str):
            return ast in auths
        op, parts = ast
        vals = [TestVisibilityGrammar._eval_ast(p, auths) for p in parts]
        return all(vals) if op == "&" else any(vals)

    @given(data=st.data(), auth_mask=st.integers(0, 15))
    @settings(max_examples=150, deadline=None)
    def test_random_trees_match_direct_eval(self, data, auth_mask):
        from geowave_spark.functions.visibility import evaluate_visibility

        text, ast = data.draw(TestVisibilityGrammar._expr())
        auths = frozenset(
            l for i, l in enumerate(self.LABELS) if auth_mask & (1 << i)
        )
        assert evaluate_visibility(text, auths) == self._eval_ast(ast, auths)


class TestMediaCodecs:
    """Round-trip laws for the dependency-free media codecs: any image
    survives BMP/PPM/PNG (every scanline filter) bit-exact, any PCM clip
    survives WAV bit-exact, any mono clip survives Y4M bit-exact, and C444
    video is within YCbCr integer rounding."""

    def test_corrupt_payloads_keep_the_valueerror_contract(self):
        """Decoders run inside Spark tasks over untrusted corpora: every
        truncation and single-bit flip of a valid payload must either decode
        or raise ValueError — never a bare KeyError/IndexError/struct.error/
        zlib.error, and never a giant allocation from corrupt dimension
        fields.  (Seeded, deterministic; ~400 mutations per format.)"""
        import numpy as np

        from geowave_spark.functions.audiocodec import (
            decode_audio_payload,
            wav_bytes,
        )
        from geowave_spark.functions.avicodec import avi_mjpeg_bytes
        from geowave_spark.functions.exif import gps_from_media
        from geowave_spark.functions.flaccodec import flac_bytes
        from geowave_spark.functions.gifcodec import gif_anim_bytes, gif_bytes
        from geowave_spark.functions.imagecodec import (
            bmp_bytes,
            bmp_bytes_indexed,
            decode_image,
            png_bytes,
            png_bytes_indexed,
            ppm_bytes,
        )
        from geowave_spark.functions.jpegcodec import jpeg_bytes
        from geowave_spark.functions.tiffcodec import tiff_bytes
        from geowave_spark.functions.videocodec import (
            decode_video_payload,
            y4m_bytes,
        )

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (9, 7, 3)).astype(np.uint8)
        pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)[rng.randint(0, 8, (9, 7))]
        pcm = (rng.randn(500) * 3000).astype(np.int16)
        frames = rng.randint(0, 256, (3, 8, 8, 3)).astype(np.uint8)
        payloads = {
            "bmp": (bmp_bytes(img), decode_image),
            "ppm": (ppm_bytes(img), decode_image),
            "png": (png_bytes(img, filter_type=4), decode_image),
            "gif": (gif_bytes(pal, interlace=True), decode_image),
            "tiff": (tiff_bytes(img, packbits=True), decode_image),
            "jpeg": (jpeg_bytes(img, restart_interval=1), decode_image),
            "jpeg_prog": (jpeg_bytes(img, progressive=True), decode_image),
            "wav": (wav_bytes(pcm, 8000), decode_audio_payload),
            "wav_ulaw": (wav_bytes(pcm, 8000, codec="ulaw"), decode_audio_payload),
            "wav_ima": (wav_bytes(pcm, 8000, codec="ima"), decode_audio_payload),
            "y4m": (y4m_bytes(frames, 25, colorspace="444"), decode_video_payload),
            "jpeg_gps": (jpeg_bytes(img, gps=(37.77, -122.42)), gps_from_media),
            "tiff_gps": (tiff_bytes(img, gps=(-33.87, 151.21)), gps_from_media),
            "flac": (
                flac_bytes(pcm, 8000, stereo="independent", lpc_order=4),
                decode_audio_payload,
            ),
            "avi_mjpeg": (
                avi_mjpeg_bytes(
                    np.repeat(img[None], 2, axis=0), fps=10, omit_dht=True
                ),
                decode_video_payload,
            ),
            "gif_anim": (
                gif_anim_bytes(
                    np.repeat((img // 51 * 51)[None], 3, axis=0),
                    fps=20,
                    mode="patch_transparent",
                ),
                decode_video_payload,
            ),
            "png_adam7_16": (
                png_bytes(img, filter_type=3, interlace=True, depth=16),
                decode_image,
            ),
            "png_palette2": (
                png_bytes_indexed(
                    np.array(
                        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]],
                        np.uint8,
                    )[img[:, :, 0] // 64],
                    depth=2,
                    interlace=True,
                ),
                decode_image,
            ),
            "tiff_lzw": (
                tiff_bytes(img, compression="lzw", predictor=True),
                decode_image,
            ),
            "bmp_rle8": (
                bmp_bytes_indexed((img // 64) * 64, rle=True),
                decode_image,
            ),
        }
        for name, (buf, dec) in payloads.items():
            cases = [buf[:cut] for cut in range(1, len(buf), max(1, len(buf) // 50))]
            for _ in range(300):
                b = bytearray(buf)
                b[rng.randint(0, len(b))] ^= 1 << rng.randint(0, 8)
                cases.append(bytes(b))
            for payload in cases:
                try:
                    dec(payload)
                except ValueError:
                    pass  # the contract
                # anything else propagates and fails the test, naming `name`
                except Exception as e:  # pragma: no cover - diagnostic
                    raise AssertionError(
                        f"{name} decoder broke the ValueError contract: "
                        f"{type(e).__name__}: {e}"
                    ) from e

    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        filter_type=st.integers(0, 4),
    )
    @settings(max_examples=60, deadline=None)
    def test_image_roundtrips(self, h, w, seed, filter_type):
        from geowave_spark.functions.imagecodec import (
            bmp_bytes,
            bmp_decode,
            png_bytes,
            png_decode,
            ppm_bytes,
            ppm_decode,
        )

        rgb = np.random.RandomState(seed).randint(0, 256, (h, w, 3), dtype=np.uint8)
        assert (bmp_decode(bmp_bytes(rgb)) == rgb).all()
        assert (ppm_decode(ppm_bytes(rgb)) == rgb).all()
        assert (png_decode(png_bytes(rgb, filter_type=filter_type)) == rgb).all()

    @given(
        n=st.integers(1, 200),
        ch=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip(self, n, ch, rate, seed):
        from geowave_spark.functions.audiocodec import wav_bytes, wav_decode

        pcm = (
            np.random.RandomState(seed)
            .randint(-32768, 32768, (n, ch))
            .astype(np.int16)
        )
        samples, r = wav_decode(wav_bytes(pcm, rate))
        assert r == rate and samples.shape == (n, ch) and (samples == pcm).all()

    @given(
        n=st.integers(1, 5),
        h=st.integers(1, 10),
        w=st.integers(1, 10),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_y4m_mono_exact_and_444_within_rounding(self, n, h, w, seed):
        from geowave_spark.functions.videocodec import y4m_bytes, y4m_decode

        rnd = np.random.RandomState(seed)
        luma = rnd.randint(0, 256, (n, h, w), dtype=np.uint8)
        frames, _ = y4m_decode(y4m_bytes(luma, colorspace="mono"))
        assert (frames == luma[:, :, :, None]).all()
        rgb = rnd.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
        frames, _ = y4m_decode(y4m_bytes(rgb, colorspace="444"))
        assert np.abs(frames.astype(int) - rgb.astype(int)).max() <= 2

    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        r=st.integers(0, 255),
        g=st.integers(0, 255),
        b=st.integers(0, 255),
        subsample=st.sampled_from(["444", "420"]),
        quality=st.integers(85, 100),
    )
    @settings(max_examples=60, deadline=None)
    def test_jpeg_flat_color_law(self, h, w, r, g, b, subsample, quality):
        """A flat-color image quantizes to DC-only blocks, so the
        reconstruction error is bounded by the DC quantizer alone:
        q_dc/16 in luma plus up to 1.772x the chroma DC error through the
        inverse color transform — ≤ 1 grey level for ANY color at
        quality >= 85, any dimensions (incl. non-multiple-of-MCU), any
        subsampling.  (Exactness for every color is NOT a theorem — a
        channel landing on a .5 rounding boundary can flip by one; the
        deterministic test pins exact round-trips for representative
        colors at q90.)"""
        from geowave_spark.functions.jpegcodec import jpeg_bytes, jpeg_decode

        img = np.full((h, w, 3), (r, g, b), np.uint8)
        out = jpeg_decode(jpeg_bytes(img, quality=quality, subsample=subsample))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    @given(
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
        subsample=st.sampled_from(["444", "420"]),
        restart=st.integers(0, 3),
    )
    @settings(max_examples=40, deadline=None)
    def test_jpeg_structural_laws(self, h, w, seed, subsample, restart):
        """For arbitrary content: shape/dtype preserved, decode is
        deterministic, restart markers never change pixels, and the luma
        plane stays within a lossy bound at quality 90 (chroma is
        legitimately destroyed by 4:2:0 on noise)."""
        from geowave_spark.functions.jpegcodec import jpeg_bytes, jpeg_decode

        img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
        buf = jpeg_bytes(img, quality=90, subsample=subsample, restart_interval=restart)
        out = jpeg_decode(buf)
        assert out.shape == img.shape and out.dtype == np.uint8
        assert (jpeg_decode(buf) == out).all()
        plain = jpeg_decode(jpeg_bytes(img, quality=90, subsample=subsample))
        assert (out == plain).all()
        prog = jpeg_decode(
            jpeg_bytes(
                img,
                quality=90,
                subsample=subsample,
                restart_interval=restart,
                progressive=True,
            )
        )
        assert (prog == out).all()  # SOF2 scans carry identical coefficients

        def luma(x):
            return 0.299 * x[:, :, 0] + 0.587 * x[:, :, 1] + 0.114 * x[:, :, 2]

        err = np.abs(luma(out.astype(np.float64)) - luma(img.astype(np.float64)))
        assert err.max() <= 40.0  # q90 luma worst-case on noise; typical ~10
