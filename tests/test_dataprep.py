"""Geodesy + GeoTIFF reader tests (the rasterio/pyproj replacements)."""
import os

import numpy as np
import pytest

from multimodal_auv_tpu.dataprep.geodesy import (
    ddmm_to_decimal,
    latlon_to_utm,
    utm_zone,
)
from multimodal_auv_tpu.dataprep.geotiff import (
    GeoTiff,
    extract_grid_patch,
    get_pixel_resolution,
    write_geotiff,
)


def test_utm_zone_formula():
    # floor((lon+180)/6)+1 — reference Example_data_preparation.py:352-366
    assert utm_zone(7.5) == 32
    assert utm_zone(-0.1278) == 30
    assert utm_zone(-180.0) == 1
    assert utm_zone(179.9) == 60


def test_latlon_to_utm_known_vector():
    # canonical vector from the `utm` package README:
    # utm.from_latlon(51.2, 7.5) == (395201.31, 5673135.24, 32, 'U')
    e, n, z, letter = latlon_to_utm(51.2, 7.5)
    assert z == 32 and letter == "U"
    assert e == pytest.approx(395201.31, abs=1.0)
    assert n == pytest.approx(5673135.24, abs=1.0)


def test_latlon_to_utm_southern_hemisphere():
    e, n, z, letter = latlon_to_utm(-33.92, 18.42)  # Cape Town
    assert z == 34
    assert n > 6e6  # 10,000,000 false northing applied
    assert 0 < e < 1e6


def test_ddmm_to_decimal():
    # 5530.123' N == 55 deg + 30.123/60
    assert ddmm_to_decimal(5530.123, "N") == pytest.approx(55 + 30.123 / 60)
    assert ddmm_to_decimal(617.5, "W") == pytest.approx(-(6 + 17.5 / 60))
    assert ddmm_to_decimal("5530.123", "S") < 0


@pytest.fixture
def bathy_tiff(tmp_path):
    """100x80 single-band float32 raster, 0.5 m/px, origin (1000, 2000)."""
    h, w = 80, 100
    data = (np.arange(h * w, dtype=np.float32).reshape(h, w)) / 100.0
    path = str(tmp_path / "survey_Bathy.tif")
    write_geotiff(path, data, transform=(1000.0, 0.5, 0.0, 2000.0, 0.0, -0.5),
                  nodata=-9999.0)
    return path, data


def test_geotiff_roundtrip_and_tags(bathy_tiff):
    path, data = bathy_tiff
    g = GeoTiff.open(path)
    assert (g.width, g.height, g.count) == (100, 80, 1)
    assert g.dtype == np.float32
    assert g.res == (0.5, 0.5)
    assert g.nodata == -9999.0
    np.testing.assert_array_equal(g.read(0), data)
    assert get_pixel_resolution(path) == (0.5, 0.5)


def test_geotiff_window_read(bathy_tiff):
    path, data = bathy_tiff
    g = GeoTiff.open(path)
    win = g.read_window(10, 20, 30, 40)
    np.testing.assert_array_equal(win, data[10:40, 20:60])
    # boundless read pads with fill
    win2 = g.read_window(-5, -5, 10, 10, boundless=True, fill_value=0.0)
    assert win2.shape == (10, 10)
    np.testing.assert_array_equal(win2[5:, 5:], data[:5, :5])
    assert (win2[:5, :] == 0).all()


def test_extract_grid_patch_center_and_clip(bathy_tiff):
    path, data = bathy_tiff
    # center of raster: easting 1000+50*0.5=1025, northing 2000-40*0.5=1980
    patch, center, kind = extract_grid_patch(path, 1025.0, 1980.0, 10.0)
    assert kind == "Bathy"
    assert patch.shape == (1, 20, 20)  # 10 m / 0.5 m/px
    np.testing.assert_array_equal(patch[0], data[30:50, 40:60])
    assert center[0] == pytest.approx(1025.0, abs=0.5)
    assert center[1] == pytest.approx(1980.0, abs=0.5)

    # near the corner -> clipped but non-empty
    patch2, _, _ = extract_grid_patch(path, 1000.5, 1999.5, 10.0)
    assert patch2 is not None and patch2.shape[1] <= 20

    # fully outside -> None
    patch3, c3, _ = extract_grid_patch(path, 5000.0, 5000.0, 10.0)
    assert patch3 is None and c3 is None

    # SSS kind detection
    import shutil

    sss_path = path.replace("Bathy", "SSS")
    shutil.copy(path, sss_path)
    _, _, kind2 = extract_grid_patch(sss_path, 1025.0, 1980.0, 10.0)
    assert kind2 == "SSS"


def test_geotiff_multiband_and_memmap(tmp_path):
    h, w = 16, 24
    data = np.stack([np.full((h, w), i, np.uint8) for i in (10, 20)], axis=-1)
    path = str(tmp_path / "two_band_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    g = GeoTiff.open(path)
    assert g.count == 2
    np.testing.assert_array_equal(g.read(0), data[:, :, 0])
    np.testing.assert_array_equal(g.read(1), data[:, :, 1])
    mm = g.to_memmap(str(tmp_path / "cache"))
    assert mm.shape == (h, w, 2)
    np.testing.assert_array_equal(np.asarray(mm[:, :, 1]), data[:, :, 1])


def test_geotiff_planar2_matches_chunky(tmp_path):
    """PlanarConfiguration 2 (plane-major strips, TIFF 6.0): full reads,
    windowed reads, and negative-offset boundless windows must be
    pixel-identical to the same raster in the default chunky layout.
    Round 5: was a NotImplementedError guard; rasterio (the reference's
    reader, functions/functions.py) handles these files, so ours must."""
    rng = np.random.default_rng(7)
    h, w, c = 21, 17, 3   # odd sizes: exercises the ragged last strip
    data = rng.integers(0, 255, (h, w, c), dtype=np.uint8)
    tf = (5.0, 0.5, 0.0, 40.0, 0.0, -0.5)
    p1 = str(tmp_path / "chunky_Bathy.tif")
    p2 = str(tmp_path / "planar_Bathy.tif")
    write_geotiff(p1, data, transform=tf)
    write_geotiff(p2, data, transform=tf, planar=2, rows_per_strip=4)
    g1, g2 = GeoTiff.open(p1), GeoTiff.open(p2)
    assert g2.planar == 2 and g2.count == c
    assert g2.transform == g1.transform
    for b in range(c):
        np.testing.assert_array_equal(g2.read(b), data[:, :, b])
        np.testing.assert_array_equal(g2.read_window(5, 3, 9, 11, band=b),
                                      g1.read_window(5, 3, 9, 11, band=b))
        np.testing.assert_array_equal(
            g2.read_window(-4, -2, 12, 10, band=b, boundless=True,
                           fill_value=9),
            g1.read_window(-4, -2, 12, 10, band=b, boundless=True,
                           fill_value=9))
    with np.testing.assert_raises(ValueError):
        g2.read_window(0, 0, 4, 4, band=c)   # out-of-range band


def test_geotiff_planar2_multistrip_float_and_memmap(tmp_path):
    """planar-2 float32 bathymetry with several strips per plane: values
    survive exactly, and the to_memmap pre-pack (the patch-sweep fast
    path) equals the decode path."""
    rng = np.random.default_rng(11)
    h, w = 13, 9
    data = rng.normal(size=(h, w, 2)).astype(np.float32)
    path = str(tmp_path / "planar_f32_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  planar=2, rows_per_strip=3)
    g = GeoTiff.open(path)
    for b in range(2):
        np.testing.assert_array_equal(g.read(b), data[:, :, b])
    mm = g.to_memmap(str(tmp_path / "cache"))
    np.testing.assert_array_equal(np.asarray(mm), data)


def test_geotiff_tiled_matches_stripped(tmp_path):
    """The tiled decode branch (read_window's TileWidth path) against the
    stripped layout of the same pixels — full reads, interior windows, and
    boundless negative-offset windows, in both planar configurations and
    with edge tiles that are zero-padded on disk (TIFF 6.0 requires full
    tiles; the pad must never leak into the output)."""
    rng = np.random.default_rng(13)
    h, w, c = 19, 26, 2   # not multiples of the tile size
    data = rng.integers(0, 255, (h, w, c), dtype=np.uint8)
    tf = (1.0, 0.25, 0.0, 2.0, 0.0, -0.25)
    ref = str(tmp_path / "strip_Bathy.tif")
    write_geotiff(ref, data, transform=tf)
    g_ref = GeoTiff.open(ref)
    for planar in (1, 2):
        p = str(tmp_path / f"tiled_p{planar}_Bathy.tif")
        write_geotiff(p, data, transform=tf, planar=planar, tile=(8, 6))
        g = GeoTiff.open(p)
        assert (g.tile_width, g.tile_height) == (8, 6)
        assert g.planar == planar
        for b in range(c):
            np.testing.assert_array_equal(g.read(b), data[:, :, b])
            np.testing.assert_array_equal(
                g.read_window(4, 5, 11, 13, band=b),
                g_ref.read_window(4, 5, 11, 13, band=b))
            np.testing.assert_array_equal(
                g.read_window(-3, 20, 10, 12, band=b, boundless=True,
                              fill_value=7),
                g_ref.read_window(-3, 20, 10, 12, band=b, boundless=True,
                                  fill_value=7))


def test_geotiff_zstd_and_deflate_roundtrip(tmp_path):
    """zstd (tag 50000, the modern GDAL default) and deflate compressed
    output/input across layout combinations: every decode path must be
    pixel-identical to the uncompressed raster, windowed reads included."""
    rng = np.random.default_rng(17)
    h, w, c = 23, 31, 2
    data = rng.integers(0, 64, (h, w, c), dtype=np.uint8)  # compressible
    tf = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    ref = str(tmp_path / "plain_Bathy.tif")
    write_geotiff(ref, data, transform=tf)
    g_ref = GeoTiff.open(ref)
    for comp in ("zstd", "deflate"):
        for planar in (1, 2):
            for tile in (None, (8, 8)):
                kw = {"tile": tile} if tile else {"rows_per_strip": 6}
                p = str(tmp_path / f"{comp}_p{planar}_"
                                   f"{'t' if tile else 's'}_Bathy.tif")
                write_geotiff(p, data, transform=tf, planar=planar,
                              compression=comp, **kw)
                g = GeoTiff.open(p)
                assert g.compression == (50000 if comp == "zstd" else 8)
                for b in range(c):
                    np.testing.assert_array_equal(g.read(b), data[:, :, b])
                    np.testing.assert_array_equal(
                        g.read_window(7, 5, 9, 14, band=b),
                        g_ref.read_window(7, 5, 9, 14, band=b))


def test_geotiff_predictor3_float_roundtrip(tmp_path):
    """PREDICTOR=3 (floating-point byte-plane differencing) — GDAL's
    recommended setting for compressed float rasters, i.e. exactly the
    survey bathymetry case. Previously an unknown predictor was silently
    ignored, which would have decoded such files to garbage pixels; now
    it decodes exactly (and unknown predictors are refused — see below).
    Bit-exact round-trip across strips/tiles, chunky/planar-2, and both
    compressions."""
    rng = np.random.default_rng(23)
    h, w, c = 18, 27, 2
    data = rng.normal(-30.0, 5.0, (h, w, c)).astype(np.float32)
    tf = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    for comp in ("zstd", "deflate"):
        for planar in (1, 2):
            for tile in (None, (8, 8)):
                kw = {"tile": tile} if tile else {"rows_per_strip": 5}
                p = str(tmp_path / f"p3_{comp}_p{planar}_"
                                   f"{'t' if tile else 's'}_Bathy.tif")
                write_geotiff(p, data, transform=tf, planar=planar,
                              compression=comp, predictor=3, **kw)
                g = GeoTiff.open(p)
                assert g.predictor == 3
                for b in range(c):
                    np.testing.assert_array_equal(g.read(b), data[:, :, b])
                    np.testing.assert_array_equal(
                        g.read_window(3, 4, 11, 13, band=b),
                        data[3:14, 4:17, b])
    # smooth data + predictor 3 must actually help the codec (the point
    # of the predictor): compare compressed sizes on a gradient raster
    smooth = np.linspace(0, 1, h * w, dtype=np.float32).reshape(h, w)
    pa = str(tmp_path / "sm_p1_Bathy.tif")
    pb = str(tmp_path / "sm_p3_Bathy.tif")
    write_geotiff(pa, smooth, transform=tf, compression="zstd")
    write_geotiff(pb, smooth, transform=tf, compression="zstd", predictor=3)
    assert os.path.getsize(pb) < os.path.getsize(pa)


def test_geotiff_predictor3_matches_libtiff_reference_encoding(tmp_path):
    """The writer's predictor-3 encoding against an independent scalar
    transcription of libtiff tif_predict.c::fpDiff (byte-plane split
    MSB-first, then byte differencing with stride=spp, per scanline).
    Round-trip alone can't catch a shared encoder/decoder misunderstanding
    (the same trap the LZW golden guards, tests/lzw_ref.py) — this pins
    the on-disk bytes to the spec, so GDAL-written PREDICTOR=3 files
    decode correctly."""
    def fp_diff_ref(row_vals: np.ndarray, spp: int) -> bytes:
        bps = row_vals.dtype.itemsize
        n = len(row_vals)
        src = row_vals.tobytes()  # little-endian host == 'II' file order
        tmp = bytearray(n * bps)
        for i in range(n):                      # byte-plane split, MSB first
            for byte in range(bps):
                tmp[byte * n + i] = src[bps * i + (bps - byte - 1)]
        out = bytearray(tmp)                    # stride-spp byte differencing
        for j in range(n * bps - 1, spp - 1, -1):
            out[j] = (out[j] - out[j - spp]) & 0xFF
        return bytes(out)

    rng = np.random.default_rng(31)
    h, w, c = 5, 7, 2
    data = rng.normal(size=(h, w, c)).astype(np.float32)
    path = str(tmp_path / "p3_plain_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  predictor=3)   # uncompressed single strip at offset 8
    blob = open(path, "rb").read()
    payload = blob[8:8 + h * w * c * 4]
    want = b"".join(fp_diff_ref(data[r].reshape(-1), spp=c)
                    for r in range(h))
    assert payload == want
    # and the reader inverts the spec encoding exactly
    g = GeoTiff.open(path)
    for b in range(c):
        np.testing.assert_array_equal(g.read(b), data[:, :, b])


def test_geotiff_predictor2_int_roundtrip(tmp_path):
    """PREDICTOR=2 write side (the decode side was already exercised by
    LZW goldens): modular-wrap integer differencing must round-trip
    bit-exactly for uint8 and int16 in both planar layouts."""
    rng = np.random.default_rng(29)
    tf = (0.0, 1.0, 0.0, 0.0, 0.0, -1.0)
    for dt in (np.uint8, np.int16):
        data = rng.integers(np.iinfo(dt).min, np.iinfo(dt).max, (14, 19, 2),
                            endpoint=True).astype(dt)
        for planar in (1, 2):
            p = str(tmp_path / f"p2_{np.dtype(dt).name}_p{planar}_Bathy.tif")
            write_geotiff(p, data, transform=tf, compression="deflate",
                          predictor=2, planar=planar, rows_per_strip=4)
            g = GeoTiff.open(p)
            for b in range(2):
                np.testing.assert_array_equal(g.read(b), data[:, :, b])


def test_geotiff_bigtiff_roundtrip(tmp_path):
    """BigTIFF (magic 43, 8-byte offsets, LONG8 block tables) — the
    container GDAL switches to for >4 GB survey mosaics. The reader's
    BigTIFF branch previously had no fixture at all. Pixel equality with
    the classic container across layouts/codecs, plus transform and
    nodata tag parity."""
    rng = np.random.default_rng(37)
    h, w, c = 17, 25, 2
    data = rng.normal(size=(h, w, c)).astype(np.float32)
    tf = (5.0, 0.5, 0.0, 40.0, 0.0, -0.5)
    for planar in (1, 2):
        for tile in (None, (8, 8)):
            kw = {"tile": tile} if tile else {"rows_per_strip": 4}
            pb = str(tmp_path / f"big_p{planar}"
                                f"{'t' if tile else 's'}_Bathy.tif")
            write_geotiff(pb, data, transform=tf, planar=planar,
                          compression="zstd", predictor=3, nodata=-9999.0,
                          bigtiff=True, **kw)
            assert open(pb, "rb").read(4) == b"II+\x00"
            g = GeoTiff.open(pb)
            assert g.transform == tf and g.nodata == -9999.0
            for b in range(c):
                np.testing.assert_array_equal(g.read(b), data[:, :, b])
                np.testing.assert_array_equal(
                    g.read_window(3, 4, 9, 12, band=b),
                    data[3:12, 4:16, b])


def test_geotiff_wide_dimensions_use_long_tags(tmp_path):
    """Dimensions beyond 65535 (BigTIFF-scale mosaics) need LONG tags —
    the SHORT-only writer crashed with struct.error (round-5 review)."""
    data = (np.arange(2 * 70000, dtype=np.int64) % 251).astype(np.uint8)
    data = data.reshape(2, 70000)
    path = str(tmp_path / "wide_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  bigtiff=True)
    g = GeoTiff.open(path)
    assert (g.width, g.height) == (70000, 2)
    np.testing.assert_array_equal(g.read(0), data)


def test_geotiff_deflate_bomb_bounded(tmp_path):
    """A deflate strip that inflates far past the block's declared size
    (a decompression bomb) must be truncated at the expected byte count —
    same bound the zstd branch enforces — not ballooned into memory."""
    import struct as _struct
    import zlib as _zlib

    data = np.arange(64, dtype=np.uint8).reshape(8, 8)
    path = str(tmp_path / "d_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  compression="deflate")
    raw = bytearray(open(path, "rb").read())
    honest = _zlib.compress(data.tobytes())
    bomb = _zlib.compress(data.tobytes() + b"\x00" * (64 << 20))
    assert raw[8:8 + len(honest)] == honest
    # splice the bomb over the strip and fix StripByteCounts; the strip
    # region grows, so rebuild the file: header + bomb + original IFD
    # (offsets in the IFD still point at 8, which is where the bomb sits)
    ifd = raw[8 + len(honest):]
    cnt_tag = _struct.pack("<HHI", 279, 4, 1)
    i = ifd.find(cnt_tag)
    assert i >= 0
    ifd[i + 8:i + 12] = _struct.pack("<I", len(bomb))
    blob = raw[:4] + _struct.pack("<I", 8 + len(bomb)) + bomb + ifd
    bad = str(tmp_path / "bomb.tif")
    open(bad, "wb").write(bytes(blob))
    import tracemalloc

    tracemalloc.start()
    try:
        out = GeoTiff.open(bad).read(0)
        _, peak = tracemalloc.get_traced_memory()
    finally:
        tracemalloc.stop()
    np.testing.assert_array_equal(out, data)
    # the bound is the point: the unbounded zlib.decompress path inflates
    # the full 64 MiB before the length check and passes the value
    # assertion anyway — only the allocation ceiling distinguishes them
    assert peak < 8 << 20, f"deflate bomb inflated {peak} bytes"


def test_geotiff_model_transformation_tag(tmp_path):
    """The ModelTransformation (34264) georeferencing branch — preferred
    over PixelScale+Tiepoint when present — parsed from a real file,
    including rotation terms PixelScale cannot express. Previously only
    the scale+tiepoint branch had fixtures."""
    data = np.arange(12 * 10, dtype=np.uint8).reshape(12, 10)
    tf = (400000.0, 0.5, 0.01, 6200000.0, -0.02, -0.5)  # rotated grid
    pm = str(tmp_path / "matrix_Bathy.tif")
    write_geotiff(pm, data, transform=tf, transform_matrix=True)
    g = GeoTiff.open(pm)
    assert g.transform == tf
    np.testing.assert_array_equal(g.read(0), data)
    # axis-aligned case: both encodings must parse to the same transform
    tf2 = (400000.0, 0.5, 0.0, 6200000.0, 0.0, -0.5)
    pa = str(tmp_path / "scale_Bathy.tif")
    pb = str(tmp_path / "matrix2_Bathy.tif")
    write_geotiff(pa, data, transform=tf2)
    write_geotiff(pb, data, transform=tf2, transform_matrix=True)
    assert GeoTiff.open(pa).transform == GeoTiff.open(pb).transform == tf2


def test_geotiff_unknown_predictor_rejected(tmp_path):
    """A predictor the reader does not implement must raise TiffError at
    open — silently ignoring it decodes to garbage pixels, the one
    failure mode worse than a crash."""
    import struct as _struct

    from multimodal_auv_tpu.dataprep.geotiff import TiffError

    data = np.zeros((8, 8), np.float32)
    path = str(tmp_path / "p_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  compression="deflate", predictor=3)
    raw = bytearray(open(path, "rb").read())
    tag = _struct.pack("<HHI", 317, 3, 1)
    i = raw.find(tag)
    assert i >= 0
    raw[i + 8:i + 10] = _struct.pack("<H", 34892)  # bogus predictor
    bad = str(tmp_path / "bad.tif")
    open(bad, "wb").write(bytes(raw))
    with np.testing.assert_raises(TiffError):
        GeoTiff.open(bad)
    # predictor 3 on integer samples is structurally invalid too
    raw[i + 8:i + 10] = _struct.pack("<H", 3)
    fmt_tag = _struct.pack("<HHI", 339, 3, 1)
    j = raw.find(fmt_tag)
    assert j >= 0
    raw[j + 8:j + 10] = _struct.pack("<H", 1)  # claim unsigned-int samples
    bad2 = str(tmp_path / "bad2.tif")
    open(bad2, "wb").write(bytes(raw))
    with np.testing.assert_raises(TiffError):
        GeoTiff.open(bad2)


def test_geotiff_corrupt_zstd_block_degrades_cleanly(tmp_path):
    """A zstd strip whose frame bytes are garbled must raise TiffError
    (skippable by the survey sweep), never a raw zstandard exception or a
    memory blowout from a lying decompressed size."""
    from multimodal_auv_tpu.dataprep.geotiff import TiffError

    data = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    path = str(tmp_path / "z_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  compression="zstd")
    g = GeoTiff.open(path)
    np.testing.assert_array_equal(g.read(0), data)
    raw = bytearray(open(path, "rb").read())
    # destroy the zstd frame magic (frame starts at offset 8): guaranteed
    # decode failure -> must surface as TiffError
    bad = str(tmp_path / "bad_magic.tif")
    b = bytearray(raw)
    b[8:12] = b"\x00\x00\x00\x00"
    open(bad, "wb").write(bytes(b))
    with np.testing.assert_raises(TiffError):
        GeoTiff.open(bad).read(0)
    # garble mid-frame bytes: zstd frames carry no checksum by default, so
    # this may decode to garbage/short output — the contract is a clean
    # outcome either way (TiffError, or a right-shaped degraded array)
    b = bytearray(raw)
    for i in range(20, 40):
        b[i] ^= 0xFF
    bad2 = str(tmp_path / "bad_body.tif")
    open(bad2, "wb").write(bytes(b))
    try:
        out = GeoTiff.open(bad2).read(0)
        assert out.shape == (16, 16)
    except TiffError:
        pass


def test_geotiff_planar2_wrong_block_count_rejected(tmp_path):
    """A planar-2 file whose strip table does not hold spp x
    strips-per-plane entries is structurally broken — must raise TiffError
    at open, not misindex planes at read time."""
    import struct as _struct

    from multimodal_auv_tpu.dataprep.geotiff import TiffError

    data = np.zeros((8, 8, 2), np.uint8)
    path = str(tmp_path / "bad_planar_Bathy.tif")
    write_geotiff(path, data, transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0),
                  planar=2, rows_per_strip=4)
    raw = bytearray(open(path, "rb").read())
    # flip SamplesPerPixel 2 -> 3: the strip table now disagrees with
    # spp x strips-per-plane
    tag_spp = _struct.pack("<HHI", 277, 3, 1)
    i = raw.find(tag_spp)
    assert i >= 0
    raw[i + 8:i + 10] = _struct.pack("<H", 3)
    bad = str(tmp_path / "bad.tif")
    open(bad, "wb").write(bytes(raw))
    with np.testing.assert_raises(TiffError):
        GeoTiff.open(bad)


def test_lzw_decode_roundtrip():
    """LZW decoder against the shared reference encoder (tests/lzw_ref.py,
    libtiff early-change semantics; the real-file golden is
    test_lzw_decode_matches_libtiff_written_file)."""
    from multimodal_auv_tpu.dataprep.geotiff import _lzw_decode

    from tests.lzw_ref import lzw_encode

    rng = np.random.default_rng(0)
    payload = bytes(rng.integers(0, 8, size=5000, dtype=np.uint8))
    assert _lzw_decode(lzw_encode(payload), len(payload)) == payload


def test_clahe_matches_cv2_on_gray():
    """Our from-scratch Zuiderveld CLAHE (skimage equalize_adapthist
    parameter semantics) against cv2's independent implementation at
    matched parameters (clip 0.01*tile_px == cv2 clipLimit 2.56, 8x8
    tiles): the two classic-CLAHE implementations agree to a few of 255
    intensity levels (measured mean ~3.7, max 15 — PARITY.md)."""
    cv2 = pytest.importorskip("cv2")
    from multimodal_auv_tpu.dataprep.optical import clahe_u8

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:256, 0:256]
    base = 80 + 60 * np.sin(x / 40.0) * np.cos(y / 60.0) \
        + rng.normal(0, 12, (256, 256))
    gray = np.clip(base, 0, 255).astype(np.uint8)

    ours = clahe_u8(gray, clip_limit=0.01)
    ref = cv2.createCLAHE(clipLimit=0.01 * 256,
                          tileGridSize=(8, 8)).apply(gray)
    d = np.abs(ours.astype(int) - ref.astype(int))
    assert d.mean() < 6 and d.max() < 30, (d.mean(), d.max())

    # constant image is (nearly) a fixed point
    const = np.full((256, 256), 100, np.uint8)
    out = clahe_u8(const)
    assert int(out.min()) == int(out.max())
    assert abs(int(out[0, 0]) - 100) <= 4


def test_clahe_reference_color_semantics():
    """VERDICT r2 #7 quantified: the reference's equalize_adapthist on RGB
    equalizes the HSV VALUE channel and keeps color; the cv2
    gray-replicate path collapses the image to gray. On a color-cast
    textured fixture the divergence measures mean ~24 / max ~93 of 255
    (PARITY.md) — gross, so the color-preserving implementation
    (equalize_adapthist_rgb) is the pipeline default for 'CLAHE'."""
    from multimodal_auv_tpu.dataprep.optical import (
        apply_clahe_rgb,
        equalize_adapthist_rgb,
    )

    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:256, 0:256]
    base = 80 + 60 * np.sin(x / 40.0) * np.cos(y / 60.0) \
        + rng.normal(0, 12, (256, 256))
    rgb = np.stack([np.clip(base * 1.2, 0, 255),
                    np.clip(base * 0.9, 0, 255),
                    np.clip(base * 0.6, 0, 255)], axis=2).astype(np.uint8)

    faithful = equalize_adapthist_rgb(rgb)
    gray_rep = apply_clahe_rgb(rgb)

    # the faithful path preserves the color cast (distinct channel means,
    # same ordering as the input); the cv2 path collapses channels
    fm = faithful.mean(axis=(0, 1))
    assert fm[0] > fm[1] > fm[2], fm
    assert np.array_equal(gray_rep[..., 0], gray_rep[..., 1])

    # hue preservation: channel ratios unchanged where defined (value
    # scaling keeps H and S exactly)
    mx_in = rgb.max(axis=2).astype(float)
    mx_out = faithful.max(axis=2).astype(float)
    sel = (mx_in > 30) & (mx_out > 30)
    rin = rgb[..., 2].astype(float) / np.maximum(mx_in, 1)
    rout = faithful[..., 2].astype(float) / np.maximum(mx_out, 1)
    assert np.abs(rin[sel] - rout[sel]).mean() < 0.03

    # measured divergence between the two paths is gross (documented)
    d = np.abs(faithful.astype(int) - gray_rep.astype(int))
    assert d.mean() > 10


def test_clahe_scalar_kernel_size_matches_tuple():
    """skimage equalize_adapthist accepts a scalar kernel_size (same tile
    size on both axes); the docstring promises its parameter semantics, so
    the int form must work and equal the explicit 2-tuple."""
    from multimodal_auv_tpu.dataprep.optical import clahe_u8

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 48), dtype=np.uint8)
    np.testing.assert_array_equal(clahe_u8(img, kernel_size=16),
                                  clahe_u8(img, kernel_size=(16, 16)))


def test_lzw_decode_matches_libtiff_written_file(tmp_path):
    """Golden against a REAL libtiff-written LZW stream (via PIL), not the
    in-repo encoder: the decoders' early-change widen point was off by one
    ((1<<nbits)-2 instead of -1), corrupting every real LZW raster from
    table entry 510 on — masked by the matching off-by-one the test
    encoder used to have. Covers the 9->10 bit switch."""
    from PIL import Image

    from multimodal_auv_tpu.dataprep.geotiff import GeoTiff

    arr = (np.arange(200 * 300, dtype=np.uint32) % 251).astype(
        np.uint8).reshape(200, 300)
    p = str(tmp_path / "lzw.tif")
    Image.fromarray(arr).save(p, compression="tiff_lzw")
    got = GeoTiff.open(p).read()
    got2d = got[0] if got.ndim == 3 else got
    np.testing.assert_array_equal(got2d, np.asarray(Image.open(p)))


def test_big_endian_tiff_samples_not_byteswapped(tmp_path):
    """'MM' (big-endian) rasters with multi-byte samples must decode to
    the written values: frombuffer with the native-order dtype read every
    uint16 byte-swapped (0,1000,2000 -> 0,59395,53255)."""
    import struct

    from multimodal_auv_tpu.dataprep.geotiff import GeoTiff

    vals = ((np.arange(64, dtype=np.uint32) * 1000) % 65536).astype(
        np.uint16).reshape(8, 8)
    ents = []

    def ent(tag, typ, cnt, val):
        ents.append(struct.pack(">HHII", tag, typ, cnt, val))

    data = vals.astype(">u2").tobytes()
    data_off = 8 + 2 + 12 * 9 + 4
    ent(256, 3, 1, 8 << 16)
    ent(257, 3, 1, 8 << 16)
    ent(258, 3, 1, 16 << 16)
    ent(259, 3, 1, 1 << 16)
    ent(262, 3, 1, 1 << 16)
    ent(273, 4, 1, data_off)
    ent(277, 3, 1, 1 << 16)
    ent(278, 3, 1, 8 << 16)
    ent(279, 4, 1, len(data))
    p = str(tmp_path / "be.tif")
    with open(p, "wb") as f:
        f.write(b"MM" + struct.pack(">H", 42) + struct.pack(">I", 8))
        f.write(struct.pack(">H", len(ents)))
        for e in ents:
            f.write(e)
        f.write(struct.pack(">I", 0))
        f.write(data)
    g = GeoTiff.open(p)
    assert g.byteorder == ">"
    got = g.read()
    got2d = got[0] if got.ndim == 3 else got
    np.testing.assert_array_equal(got2d, vals)
    assert got2d.dtype.byteorder in ("=", "|", "<")  # native for consumers


def test_memmap_fast_path_matches_decode_and_index_floors(tmp_path):
    """to_memmap attaches the pre-packed raster so read_window serves pure
    slices — results must equal the strip/tile decode path bit-for-bit.
    Also pins index() flooring: a point one pixel west/north of the origin
    maps to -1 (rasterio parity), not 0 via int() truncation."""
    h, w = 40, 50
    data = (np.arange(h * w, dtype=np.float32).reshape(h, w)) / 7.0
    path = str(tmp_path / "m_Bathy.tif")
    write_geotiff(path, data, transform=(100.0, 0.5, 0.0, 200.0, 0.0, -0.5))

    g_decode = GeoTiff.open(path)
    ref = g_decode.read_window(5, 7, 20, 30)
    g_mm = GeoTiff.open(path)
    g_mm.to_memmap(str(tmp_path / "cache"))
    assert g_mm._mm is not None
    np.testing.assert_array_equal(g_mm.read_window(5, 7, 20, 30), ref)
    # boundless read through the memmap path
    np.testing.assert_array_equal(
        g_mm.read_window(-3, -3, 10, 10, boundless=True),
        g_decode.read_window(-3, -3, 10, 10, boundless=True))

    # index(): 0.2 m west of the origin is OUTSIDE -> col -1, not 0
    assert g_decode.index(99.8, 200.0) == (0, -1)
    assert g_decode.index(100.0, 200.2) == (-1, 0)
    assert g_decode.index(100.3, 199.8) == (0, 0)


def test_to_memmap_cache_no_collision_across_dirs(tmp_path):
    """Two same-named rasters in different directories sharing one
    cache_dir must not collide (basename+mtime keys did: the second open
    silently returned the first raster's pixels)."""
    import shutil

    a = tmp_path / "surveyA"; a.mkdir()
    b = tmp_path / "surveyB"; b.mkdir()
    da = np.full((8, 8), 1.0, np.float32)
    db = np.full((8, 8), 2.0, np.float32)
    write_geotiff(str(a / "Bathy.tif"), da,
                  transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    write_geotiff(str(b / "Bathy.tif"), db,
                  transform=(0.0, 1.0, 0.0, 0.0, 0.0, -1.0))
    # force identical mtimes (the old collision trigger)
    import os

    st = os.stat(str(a / "Bathy.tif"))
    os.utime(str(b / "Bathy.tif"), ns=(st.st_atime_ns, st.st_mtime_ns))
    cache = str(tmp_path / "cache")
    ma = GeoTiff.open(str(a / "Bathy.tif")).to_memmap(cache)
    mb = GeoTiff.open(str(b / "Bathy.tif")).to_memmap(cache)
    np.testing.assert_array_equal(np.asarray(ma)[:, :, 0], da)
    np.testing.assert_array_equal(np.asarray(mb)[:, :, 0], db)


def test_utilities_reference_degradation():
    """utilities parity (reference utilities.py:5-35): is_geotiff accepts
    exactly .tif/.tiff; filter_csv_by_image_names returns an EMPTY frame
    for a missing CSV (the reference pipelines continue, not crash)."""
    from multimodal_auv_tpu.dataprep.utilities import (
        filter_csv_by_image_names,
        is_geotiff,
    )

    assert is_geotiff("a.TIF") and is_geotiff("b.tiff")
    assert not is_geotiff("c.gtiff") and not is_geotiff("d.png")
    out = filter_csv_by_image_names("/nonexistent/coords.csv", "/nonexistent")
    assert out.empty


def test_utilities_missing_column_degradation(tmp_path):
    """Reference utilities.py:37-43,46-90: a CSV without the expected
    column degrades (unfiltered frame / untouched file), never raises."""
    import pandas as pd

    from multimodal_auv_tpu.dataprep.utilities import (
        filter_csv_by_image_names,
        update_csv_path,
    )

    csv = tmp_path / "coords.csv"
    pd.DataFrame({"other": [1, 2]}).to_csv(csv, index=False)
    out = filter_csv_by_image_names(str(csv), str(tmp_path))
    assert list(out["other"]) == [1, 2]  # returned UNFILTERED

    assert update_csv_path(str(csv), "/a", "/b") is None  # no 'path' column
    assert update_csv_path(str(tmp_path / "nope.csv"), "/a", "/b") is None
    pd.DataFrame({"path": ["/a/x.jpg"], "Image_Name": ["x.jpg"]}).to_csv(
        csv, index=False)
    df = update_csv_path(str(csv), "/a", "/b")
    assert df["path"][0] == "/b/x.jpg"
    assert pd.read_csv(csv)["path"][0] == "/b/x.jpg"  # rewritten in place
