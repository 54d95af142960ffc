"""GeoTIFF georeferencing codec + ingest (functions/geotiff.py,
sources/formats.read_geotiff_coverages).

Pins: bit-exact round-trips across the compression/predictor/byte-order/
geo-tag matrix; the GeoTIFF 1.1 placement math for both tag encodings;
honesty refusals (rotation, missing georeferencing, truncation as
ValueError); and — the contract that matters — Spark ingest of the GeoTIFF
fixture reproduces coverages.parquet byte-identically, so the whole raster
pipeline downstream is already oracle-covered.
"""

from __future__ import annotations

import numpy as np
import pytest

from geowave_spark.functions import geotiff as G


def _grid(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(-1, 256, size=(h, w)).astype(np.int16)


@pytest.mark.parametrize(
    "comp,pred",
    [("none", False), ("packbits", False), ("lzw", False), ("deflate", False),
     ("lzw", True), ("deflate", True)],
)
@pytest.mark.parametrize("transform_tag", [False, True])
@pytest.mark.parametrize("byteorder", ["<", ">"])
def test_roundtrip_matrix(comp, pred, transform_tag, byteorder):
    g = _grid(37, 23)
    bounds = (-12.5, 3.25, -12.5 + 23 * 0.01, 3.25 + 37 * 0.01)
    buf = G.geotiff_bytes(
        g, bounds, compression=comp, predictor=pred,
        transform_tag=transform_tag, byteorder=byteorder, rows_per_strip=8,
    )
    g2, b2, nd = G.geotiff_decode(buf)
    assert np.array_equal(g2, g.astype(np.int32))
    assert b2 == pytest.approx(bounds, abs=1e-12)
    assert nd == -1


def test_single_strip_inline_offsets():
    g = _grid(4, 4)
    buf = G.geotiff_bytes(g, (0.0, 0.0, 1.0, 1.0), rows_per_strip=64)
    g2, b2, _ = G.geotiff_decode(buf)
    assert np.array_equal(g2, g.astype(np.int32))
    assert b2 == (0.0, 0.0, 1.0, 1.0)


def test_tag_encodings_agree():
    """Tiepoint+PixelScale and ModelTransformation place identically."""
    g = _grid(16, 8)
    bounds = (100.0, -40.0, 102.0, -36.0)
    _, b1, _ = G.geotiff_decode(G.geotiff_bytes(g, bounds, transform_tag=False))
    _, b2, _ = G.geotiff_decode(G.geotiff_bytes(g, bounds, transform_tag=True))
    assert b1 == b2 == bounds


def test_nonzero_tiepoint_placement():
    """A tiepoint anchored at an interior raster pixel still places the
    envelope correctly (geo = tie_xy offset by pixel distance x scale)."""
    tags = {
        G.MODEL_TIEPOINT: [2.0, 3.0, 0.0, 10.0, 50.0, 0.0],
        G.MODEL_PIXEL_SCALE: [0.5, 0.25, 0.0],
    }
    # raster (2,3) sits at geo (10,50): minx=10-2*0.5=9, maxy=50+3*0.25=50.75
    assert G._bounds_from_tags(tags, w=8, h=4) == (9.0, 49.75, 13.0, 50.75)


def test_refusals():
    g = _grid(4, 4)
    buf = G.geotiff_bytes(g, (0.0, 0.0, 1.0, 1.0))
    with pytest.raises(ValueError, match="truncated|overruns"):
        G.geotiff_decode(buf[:20])
    with pytest.raises(ValueError, match="not a TIFF"):
        G.geotiff_decode(b"PNG\x00" + buf[4:])
    with pytest.raises(ValueError, match="rotated"):
        G._bounds_from_tags(
            {G.MODEL_TRANSFORMATION: [1, 0.5, 0, 0, 0, -1, 0, 4, 0, 0, 0, 0, 0, 0, 0, 1]},
            4, 4,
        )
    with pytest.raises(ValueError, match="no georeferencing"):
        G._bounds_from_tags({}, 4, 4)
    with pytest.raises(ValueError, match="single-band"):
        from geowave_spark.functions.tiffcodec import tiff_bytes

        rgb = np.zeros((4, 4, 3), dtype=np.uint8)
        G.geotiff_decode(tiff_bytes(rgb))
    with pytest.raises(ValueError, match="empty envelope"):
        G.geotiff_bytes(g, (1.0, 0.0, 1.0, 1.0))


def test_nodata_tag_optional():
    g = _grid(4, 4)
    buf = G.geotiff_bytes(g, (0.0, 0.0, 1.0, 1.0), nodata=None)
    _, _, nd = G.geotiff_decode(buf)
    assert nd is None


def test_predictor_wraps_mod_2_16():
    """Horizontal differencing on int16 is mod-2^16; extremes survive."""
    g = np.array([[-32768, 32767, -1, 0, 255]], dtype=np.int16)
    for comp in ("lzw", "deflate"):
        buf = G.geotiff_bytes(g, (0.0, 0.0, 5.0, 1.0), compression=comp, predictor=True)
        g2, _, _ = G.geotiff_decode(buf)
        assert np.array_equal(g2, g.astype(np.int32))


def test_ingest_reproduces_parquet_coverages(spark):
    """The Spark GeoTIFF ingest emits coverage rows byte-identical to the
    parquet source it was encoded from — every field, every pixel."""
    from geowave_spark.datagen import ensure_geotiffs
    from geowave_spark.sources.formats import read_geotiff_coverages

    d = ensure_geotiffs("sf0.001")
    src = {
        r["coverage_id"]: r
        for r in spark.read.parquet(str(d / "coverages.parquet")).collect()
    }
    got = read_geotiff_coverages(
        spark.read.parquet(str(d / "geotiffs.parquet"))
    ).collect()
    assert len(got) == len(src)
    for r in got:
        s = src[r["coverage_id"]]
        assert (r["width"], r["height"]) == (s["width"], s["height"])
        for f in ("minx", "miny", "maxx", "maxy"):
            assert r[f] == s[f], (r["coverage_id"], f)
        assert r["pixels"] == s["pixels"], r["coverage_id"]


def test_geotiff_tiles_match_parquet_tiles(spark):
    """End-to-end: the tile pyramid built from GeoTIFF binaries equals the
    one built from the parquet coverages (same tiers, cells, checksums)."""
    from geowave_spark.queries import q_geotiff_ingest_tiles, q_raster_tiling

    a = sorted(map(tuple, q_raster_tiling(spark, "/root/testdata/sf0.001").collect()))
    b = sorted(map(tuple, q_geotiff_ingest_tiles(spark, "/root/testdata/sf0.001").collect()))
    assert a == b and len(a) > 0
