"""C++ native library tests (build + numerical parity with Python paths)."""
import numpy as np
import pytest

from multimodal_auv_tpu import native


@pytest.fixture(scope="module")
def lib():
    if native.lib is None:
        pytest.skip("native toolchain unavailable")
    return native.lib


def test_resize_matches_cv2(lib):
    import cv2

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, 64, 48, 3), np.uint8)
    out = lib.resize_batch(imgs, 256, 256)
    assert out.shape == (3, 256, 256, 3)
    ref = cv2.resize(imgs[0], (256, 256), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert diff.mean() < 1.0 and diff.max() <= 2  # rounding-level agreement


def test_normalize(lib):
    from multimodal_auv_tpu.config import OPTICAL_MEAN, OPTICAL_STD

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    out = lib.normalize(img, OPTICAL_MEAN, OPTICAL_STD)
    ref = (img.astype(np.float32) / 255.0 - np.asarray(OPTICAL_MEAN,
                                                       np.float32)) / \
        np.asarray(OPTICAL_STD, np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_accumulate(lib):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (8, 8, 3), np.uint8) for _ in range(5)]
    acc = np.zeros((8, 8, 3), np.float64)
    for im in imgs:
        lib.accumulate(im, acc)
    np.testing.assert_allclose(acc, np.sum([i.astype(np.float64)
                                            for i in imgs], axis=0))


def test_window_copy_clipping(lib):
    src = np.arange(100, dtype=np.float32).reshape(10, 10)
    dst = np.full((6, 6), -1.0, np.float32)
    lib.window_copy(src, dst, -2, 7)
    # rows -2..3 clip to 0..3 -> dst rows 2..5; cols 7..12 clip to 7..9
    assert (dst[:2] == -1).all() and (dst[:, 3:] == -1).all()
    np.testing.assert_array_equal(dst[2:, :3], src[:4, 7:])


def test_lzw_matches_python(lib):
    from multimodal_auv_tpu.dataprep.geotiff import _lzw_decode
    from tests.lzw_ref import lzw_encode

    import numpy as np

    rng = np.random.default_rng(2)
    payload = bytes(rng.integers(0, 16, size=20000, dtype=np.uint8))
    enc = lzw_encode(payload)
    assert lib.lzw_decode(enc, len(payload)) == payload
    assert _lzw_decode(enc, len(payload)) == payload


def test_lzw_differential_across_code_widths(lib):
    """Randomized differential: C++ and Python decoders must agree with
    the shared encoder on payloads whose string tables cross every code
    width (9->10->11->12 bits and the 4096 clear) — the early-change
    off-by-one class lives exactly at those boundaries."""
    from multimodal_auv_tpu.dataprep.geotiff import _lzw_decode
    from tests.lzw_ref import lzw_encode

    import numpy as np

    rng = np.random.default_rng(7)
    for trial, (alphabet, n) in enumerate(
            [(2, 3000),      # low entropy: long strings, fast table growth
             (256, 30000),   # high entropy: slow growth, exercises 12-bit
             (8, 120000),    # long: forces table full + CLEAR cycles
             (1, 9000)]):    # degenerate runs
        payload = bytes(rng.integers(0, alphabet, size=n, dtype=np.uint8))
        enc = lzw_encode(payload)
        got_c = lib.lzw_decode(enc, n)
        got_py = _lzw_decode(enc, n)
        assert got_c == payload, f"C++ decoder diverged (trial {trial})"
        assert got_py == payload, f"python decoder diverged (trial {trial})"


class TestNativeDecode:
    """decode_image_u8: the native JPEG/PNG fast path must be PIL-pixel-
    EXACT (same libjpeg decode, PIL's L24 luma, convert-then-resize
    order), so packed caches built with either path hold identical bytes."""

    @pytest.fixture(scope="class")
    def decode_lib(self):
        if native.lib is None or not getattr(native.lib, "has_decode", False):
            pytest.skip("native decode unavailable (lib not linked with "
                        "libjpeg/libpng)")
        return native.lib

    def _pil_chain(self, path, mode, dh, dw, lib):
        """The PIL fallback chain of transforms.load_image_u8 (decode +
        convert, then the SAME native bilinear resize)."""
        from PIL import Image

        with Image.open(path) as img:
            arr = np.asarray(img.convert(mode), np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.shape[:2] != (dh, dw):
            arr = lib.resize_batch(arr[None], dh, dw, nthreads=1)[0]
        return arr

    @pytest.mark.parametrize("mode", ["RGB", "L"])
    def test_jpeg_exact(self, decode_lib, tmp_path, mode):
        from PIL import Image

        rng = np.random.default_rng(3)
        src = rng.integers(0, 256, (96, 80, 3), np.uint8)
        p = str(tmp_path / "img.jpg")
        Image.fromarray(src).save(p, quality=90)
        data = open(p, "rb").read()
        for dh, dw in [(96, 80), (64, 64)]:  # native size + resized
            got = decode_lib.decode_image(data, mode, dh, dw)
            want = self._pil_chain(p, mode, dh, dw, decode_lib)
            np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("pil_mode,mode", [
        ("RGB", "RGB"), ("L", "L"), ("L", "RGB"), ("RGBA", "RGB"),
        ("P", "RGB"),
    ])
    def test_png_exact(self, decode_lib, tmp_path, pil_mode, mode):
        from PIL import Image

        rng = np.random.default_rng(4)
        if pil_mode == "L":
            src = Image.fromarray(
                rng.integers(0, 256, (50, 40), np.uint8), "L")
        elif pil_mode == "RGBA":
            src = Image.fromarray(
                rng.integers(0, 256, (50, 40, 4), np.uint8), "RGBA")
        elif pil_mode == "P":
            src = Image.fromarray(
                rng.integers(0, 256, (50, 40, 3), np.uint8)).quantize(64)
        else:
            src = Image.fromarray(rng.integers(0, 256, (50, 40, 3), np.uint8))
        p = str(tmp_path / "img.png")
        src.save(p)
        data = open(p, "rb").read()
        got = decode_lib.decode_image(data, mode, 32, 32)
        want = self._pil_chain(p, mode, 32, 32, decode_lib)
        np.testing.assert_array_equal(got, want)

    def test_garbage_and_unsupported_return_none(self, decode_lib):
        assert decode_lib.decode_image(b"not an image", "RGB", 8, 8) is None
        assert decode_lib.decode_image(b"\xff\xd8\xff garbage", "RGB",
                                       8, 8) is None
        assert decode_lib.decode_image(b"x", "CMYK", 8, 8) is None

    def test_load_image_u8_uses_native_and_matches_pil(self, decode_lib,
                                                       tmp_path,
                                                       monkeypatch):
        """The public dispatch must produce identical pixels with the
        native path enabled and disabled (the no-divergence guarantee)."""
        from PIL import Image

        from multimodal_auv_tpu.data import transforms as T

        rng = np.random.default_rng(5)
        p = str(tmp_path / "s.jpg")
        Image.fromarray(rng.integers(0, 256, (70, 66, 3), np.uint8)).save(p)
        native_out = T.load_image_u8(p, "RGB", (256, 256))

        class NoDecode:
            has_decode = False

            def __getattr__(self, k):
                return getattr(decode_lib, k)

        monkeypatch.setattr(T, "_native_lib", lambda: NoDecode())
        pil_out = T.load_image_u8(p, "RGB", (256, 256))
        np.testing.assert_array_equal(native_out, pil_out)

    def test_missing_file_still_raises(self, decode_lib, tmp_path):
        from multimodal_auv_tpu.data import transforms as T

        with pytest.raises(OSError):
            T.load_image_u8(str(tmp_path / "nope.jpg"), "RGB", (8, 8))
