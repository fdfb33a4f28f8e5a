"""ctypes bindings for the C++ native runtime (csrc/auvnative.cpp).

Built lazily with make/g++ on first import; every consumer treats ``lib``
as optional (None => numpy/PIL fallbacks), so the framework works without a
toolchain and faster with one.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libauvnative.so")
_lock = threading.Lock()


class NativeLib:
    def __init__(self, cdll: ctypes.CDLL):
        self._c = cdll
        c = cdll
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        f64p = ctypes.POINTER(ctypes.c_double)
        i = ctypes.c_int
        i64 = ctypes.c_int64

        c.resize_bilinear_u8_batch.argtypes = [u8p, i, i, i, i, u8p, i, i, i]
        c.normalize_u8_to_f32.argtypes = [u8p, i64, i, f32p, f32p, f32p]
        c.accumulate_u8_f64.argtypes = [u8p, i64, f64p]
        c.window_copy.argtypes = [u8p, i, i, i, u8p, i, i, i, i]
        c.lzw_decode.argtypes = [u8p, i64, u8p, i64]
        c.lzw_decode.restype = i64
        # decode_image_u8 exists only in .so builds linked against
        # libjpeg/libpng (round 3); older prebuilt libs stay usable
        try:
            c.decode_image_u8.argtypes = [u8p, i64, u8p, i, i, i]
            c.decode_image_u8.restype = i
            self.has_decode = True
        except AttributeError:
            self.has_decode = False

    # -- numpy-facing wrappers ---------------------------------------------

    def resize_batch(self, images: np.ndarray, dh: int, dw: int,
                     nthreads: int = 0) -> np.ndarray:
        """images: (N, H, W, C) uint8 -> (N, dh, dw, C) uint8."""
        images = np.ascontiguousarray(images, np.uint8)
        n, sh, sw, ch = images.shape
        out = np.empty((n, dh, dw, ch), np.uint8)
        if nthreads <= 0:
            nthreads = min(max((os.cpu_count() or 2) - 2, 1), n)
        self._c.resize_bilinear_u8_batch(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, sh, sw,
            ch, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw,
            nthreads)
        return out

    def normalize(self, img: np.ndarray, mean, std) -> np.ndarray:
        """(..., C) uint8 -> float32, x/255 then (x-mean)/std per channel."""
        img = np.ascontiguousarray(img, np.uint8)
        c = img.shape[-1]
        mean = np.ascontiguousarray(mean, np.float32)
        std = np.ascontiguousarray(std, np.float32)
        out = np.empty(img.shape, np.float32)
        self._c.normalize_u8_to_f32(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            img.size // c, c,
            mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out

    def accumulate(self, img: np.ndarray, acc: np.ndarray) -> None:
        img = np.ascontiguousarray(img, np.uint8)
        assert acc.dtype == np.float64 and acc.size == img.size
        self._c.accumulate_u8_f64(
            img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), img.size,
            acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))

    def window_copy(self, src: np.ndarray, dst: np.ndarray,
                    row_off: int, col_off: int) -> None:
        """Clipped copy of src[(row_off:…, col_off:…)] into dst (2-D)."""
        src = np.ascontiguousarray(src)
        assert dst.flags["C_CONTIGUOUS"] and src.dtype == dst.dtype
        self._c.window_copy(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            src.shape[0], src.shape[1], src.dtype.itemsize,
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            dst.shape[0], dst.shape[1], row_off, col_off)

    def decode_image(self, data: bytes, mode: str, dh: int,
                     dw: int) -> Optional[np.ndarray]:
        """Decode a JPEG/PNG byte buffer straight to (dh, dw, C) uint8,
        converting to ``mode`` ("RGB" or "L") and resizing — PIL-pixel-
        exact (same libjpeg decode, PIL's L24 luma, convert-then-resize
        order; csrc comments). Returns None for anything the C path does
        not handle (caller falls back to PIL)."""
        if not self.has_decode or mode not in ("RGB", "L"):
            return None
        ch = 1 if mode == "L" else 3
        src = np.frombuffer(data, np.uint8)
        out = np.empty((dh, dw, ch), np.uint8)
        rc = self._c.decode_image_u8(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dh, dw, ch)
        return out if rc == 0 else None

    def lzw_decode(self, data: bytes, expected: int) -> bytes:
        src = np.frombuffer(data, np.uint8)
        dst = np.zeros(expected, np.uint8)
        n = self._c.lzw_decode(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
            dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), expected)
        if n < 0:
            raise ValueError("corrupt LZW stream")
        # return the ACTUAL decoded length: a truncated strip that decodes
        # to fewer than `expected` bytes must surface as a short read (the
        # pure-Python fallback returns short bytes), not be silently
        # zero-padded into black raster rows
        return dst.tobytes()[:n]


def _build() -> bool:
    try:
        res = subprocess.run(["make", "-C", _DIR, "-s"], capture_output=True,
                             text=True, timeout=120)
        if res.returncode != 0:
            logger.warning("native build failed: %s", res.stderr[-500:])
        return res.returncode == 0 and os.path.exists(_SO)
    except Exception as e:
        logger.warning("native build unavailable: %s", e)
        return False


def _load() -> Optional[NativeLib]:
    with _lock:
        cpp = os.path.join(_DIR, "csrc", "auvnative.cpp")
        # a deployment may ship the built .so without csrc/ — a prebuilt
        # lib with no sources is current by definition, and this loader
        # must never crash the importing module (lib is optional)
        stale = (os.path.exists(cpp)
                 and os.path.exists(_SO)
                 and os.path.getmtime(_SO) < os.path.getmtime(cpp))
        if not os.path.exists(_SO) or stale:
            if not _build():
                return None
        try:
            return NativeLib(ctypes.CDLL(_SO))
        except OSError as e:
            logger.warning("could not load %s: %s", _SO, e)
            return None


lib: Optional[NativeLib] = _load()
