"""Corruption/fuzz hardening of the hand-written GeoTIFF reader.

A survey sweep feeds thousands of rasters through dataprep; a truncated IFD,
lying strip counts, or an overrunning LZW stream must degrade to a cleanly
skippable error (TiffError / ValueError / NotImplementedError), never an
uncaught struct/index/memory error or a native crash — the robustness role
rasterio plays in the reference (geospatial.py:61-98).
"""
import os
import struct

import numpy as np
import pytest

from multimodal_auv_tpu.dataprep.geotiff import (
    GeoTiff,
    TiffError,
    _lzw_decode,
    extract_grid_patch,
    write_geotiff,
)

CLEAN = (TiffError, ValueError, NotImplementedError, FileNotFoundError)


@pytest.fixture(scope="module")
def valid_tiff(tmp_path_factory):
    d = tmp_path_factory.mktemp("fuzz")
    path = str(d / "valid.tif")
    rng = np.random.default_rng(0)
    data = rng.integers(0, 255, size=(40, 56), dtype=np.uint8).astype(np.uint8)
    write_geotiff(path, data, (500000.0, 1.0, 0.0, 6000000.0, 0.0, -1.0))
    return path


def _read_all(path):
    g = GeoTiff.open(path)
    return g.read(0)


def test_valid_roundtrip(valid_tiff):
    out = _read_all(valid_tiff)
    assert out.shape == (40, 56)


def test_truncations_fail_cleanly(valid_tiff, tmp_path):
    blob = open(valid_tiff, "rb").read()
    for frac in (0.01, 0.05, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99):
        p = str(tmp_path / f"trunc_{frac}.tif")
        with open(p, "wb") as f:
            f.write(blob[: max(1, int(len(blob) * frac))])
        try:
            out = _read_all(p)
            assert out.shape == (40, 56)  # padded-strip degrade is fine
        except CLEAN:
            pass  # clean skip


def test_random_byte_corruption_fails_cleanly(valid_tiff, tmp_path):
    blob = bytearray(open(valid_tiff, "rb").read())
    rng = np.random.default_rng(1)
    for trial in range(60):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        p = str(tmp_path / f"corrupt_{trial}.tif")
        with open(p, "wb") as f:
            f.write(bytes(b))
        try:
            _read_all(p)
        except CLEAN:
            pass


def test_random_byte_corruption_planar2_fails_cleanly(tmp_path):
    """Same fuzz discipline over the round-5 planar-2 path: corrupted
    plane-major files must degrade cleanly (including corrupted
    PlanarConfiguration / SamplesPerPixel / strip-table bytes, which
    exercise the new plane-index arithmetic)."""
    rng = np.random.default_rng(5)
    data = rng.integers(0, 255, (24, 30, 3), dtype=np.uint8)
    path = str(tmp_path / "planar_valid.tif")
    write_geotiff(path, data, (500000.0, 1.0, 0.0, 6000000.0, 0.0, -1.0),
                  planar=2, rows_per_strip=5)
    np.testing.assert_array_equal(_read_all(path), data[:, :, 0])
    blob = bytearray(open(path, "rb").read())
    for trial in range(60):
        b = bytearray(blob)
        for _ in range(rng.integers(1, 8)):
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        p = str(tmp_path / f"pcorrupt_{trial}.tif")
        with open(p, "wb") as f:
            f.write(bytes(b))
        try:
            g = GeoTiff.open(p)
            for band in range(min(g.count, 4)):
                g.read(band)
        except CLEAN:
            pass


def test_lying_dimensions_rejected(valid_tiff, tmp_path):
    """Patch the width tag to a huge value: must raise TiffError, not
    attempt a giant allocation."""
    blob = bytearray(open(valid_tiff, "rb").read())
    # classic TIFF little-endian: find the IFD and the width tag (256)
    off = struct.unpack("<I", blob[4:8])[0]
    n = struct.unpack("<H", blob[off:off + 2])[0]
    for i in range(n):
        e = off + 2 + 12 * i
        tag = struct.unpack("<H", blob[e:e + 2])[0]
        if tag == 256:  # ImageWidth, LONG
            blob[e + 8:e + 12] = struct.pack("<I", 1 << 30)
    p = str(tmp_path / "lying_width.tif")
    open(p, "wb").write(bytes(blob))
    with pytest.raises(CLEAN):
        _read_all(p)


def test_lying_strip_counts_degrade(valid_tiff, tmp_path):
    """StripByteCounts pointing past EOF: the read pads with zeros or fails
    cleanly — never crashes."""
    blob = bytearray(open(valid_tiff, "rb").read())
    off = struct.unpack("<I", blob[4:8])[0]
    n = struct.unpack("<H", blob[off:off + 2])[0]
    for i in range(n):
        e = off + 2 + 12 * i
        tag = struct.unpack("<H", blob[e:e + 2])[0]
        if tag == 279:  # StripByteCounts (inline LONG for one strip)
            blob[e + 8:e + 12] = struct.pack("<I", 0x7FFFFFFF)
    p = str(tmp_path / "lying_counts.tif")
    open(p, "wb").write(bytes(blob))
    try:
        out = _read_all(p)
        assert out.shape == (40, 56)
    except CLEAN:
        pass


def test_corrupt_lzw_streams_never_crash():
    rng = np.random.default_rng(2)
    for trial in range(40):
        junk = rng.integers(0, 256, size=rng.integers(1, 400),
                            dtype=np.uint8).tobytes()
        out = _lzw_decode(junk, 1024)  # degrades: early stop, short output
        assert isinstance(out, bytes) and len(out) <= 1024


def test_native_lzw_corrupt_streams_never_crash():
    from multimodal_auv_tpu.native import lib

    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    for trial in range(40):
        junk = rng.integers(0, 256, size=rng.integers(1, 400),
                            dtype=np.uint8).tobytes()
        try:
            out = lib.lzw_decode(junk, 1024)
            # short reads surface as short bytes (like the Python path),
            # never silently zero-padded to `expected`
            assert isinstance(out, bytes) and len(out) <= 1024
        except ValueError:
            pass  # detected corruption


def test_native_lzw_short_read_matches_python():
    """A valid stream decoded with an oversized `expected` must return the
    ACTUAL decoded length from both the native and Python decoders — the
    geotiff caller pads deliberately and must be able to see the shortfall
    (a zero-padded return would hide truncated strips as black rows)."""
    from tests.lzw_ref import lzw_encode

    from multimodal_auv_tpu.native import lib

    if lib is None:
        pytest.skip("native library unavailable")
    payload = bytes(range(256)) * 2
    raw = lzw_encode(payload)
    got_native = lib.lzw_decode(raw, 4096)  # expected >> actual
    got_py = _lzw_decode(raw, 4096)
    assert got_native == payload == got_py


def test_extract_grid_patch_on_corrupt_raster_is_skippable(tmp_path):
    p = str(tmp_path / "garbage.tif")
    open(p, "wb").write(b"II*\x00" + os.urandom(64))
    with pytest.raises(CLEAN):
        extract_grid_patch(p, 500010.0, 5999990.0, 10.0)


def test_empty_and_tiny_files(tmp_path):
    for name, content in (("empty.tif", b""), ("two.tif", b"II"),
                          ("hdr.tif", b"II*\x00"), ("png.tif", b"\x89PNG\r\n")):
        p = str(tmp_path / name)
        open(p, "wb").write(content)
        with pytest.raises(CLEAN):
            GeoTiff.open(p)
