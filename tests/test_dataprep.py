"""Geodesy + GeoTIFF reader tests (the rasterio/pyproj replacements)."""
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


def test_lzw_decode_roundtrip():
    """LZW decoder against a stream produced by a tiny TIFF-LZW encoder."""
    from multimodal_auv_tpu.dataprep.geotiff import _lzw_decode

    def lzw_encode(data: bytes) -> bytes:
        CLEAR, EOI = 256, 257
        table = {bytes([i]): i for i in range(256)}
        next_code = 258
        nbits = 9
        out_bits = []

        def emit(code, nb):
            out_bits.append((code, nb))

        emit(CLEAR, nbits)
        w = b""
        for ch in data:
            wc = w + bytes([ch])
            if wc in table or len(wc) == 1:
                w = wc
            else:
                emit(table[w], nbits)
                table[wc] = next_code
                next_code += 1
                if next_code == (1 << nbits) - 1:
                    nbits += 1
                if next_code >= 4094:
                    emit(CLEAR, nbits)
                    table = {bytes([i]): i for i in range(256)}
                    next_code = 258
                    nbits = 9
                w = bytes([ch])
        if w:
            emit(table[w], nbits)
        emit(EOI, nbits)
        # pack MSB-first
        acc, accn, out = 0, 0, bytearray()
        for code, nb in out_bits:
            acc = (acc << nb) | code
            accn += nb
            while accn >= 8:
                accn -= 8
                out.append((acc >> accn) & 0xFF)
        if accn:
            out.append((acc << (8 - accn)) & 0xFF)
        return bytes(out)

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
