"""Host-side image decode / resize / normalize.

Matches the reference's torchvision transform stack
(/root/reference/src/Multimodal_AUV/data/datasets.py:239-250):
Resize((256,256)) bilinear -> ToTensor (/255) -> optional per-channel
Normalize with the survey-wide optical constants.

Arrays are **NHWC float32** (TPU-native layout) instead of torch's CHW.
A C++ fast path (native/) handles batch resize+normalize when available;
PIL is the reference-faithful fallback.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image

from multimodal_auv_tpu.config import IMAGE_SIZE, OPTICAL_MEAN, OPTICAL_STD

_MEAN = np.asarray(OPTICAL_MEAN, np.float32)
_STD = np.asarray(OPTICAL_STD, np.float32)


def _native_lib():
    try:
        from multimodal_auv_tpu.native import lib

        return lib
    except Exception:
        return None


def load_image_u8(path: str, mode: str = "RGB",
                  size: Tuple[int, int] = (IMAGE_SIZE, IMAGE_SIZE)
                  ) -> np.ndarray:
    """Decode + bilinear resize to uint8 (H, W, C); grayscale ('L') keeps
    a trailing channel dim of 1.

    This is the SINGLE decode/resize dispatch shared by the unpacked
    loader (``load_image`` wraps it with /255) and the packed caches
    (data/packing.py stores its output verbatim) — one code path, so the
    two loaders can never feed different pixels. When the C++ native
    runtime is built, the WHOLE chain (libjpeg/libpng decode -> PIL-L24
    convert -> bilinear resize) runs in one GIL-free C call, pixel-exact
    with the PIL fallback (tests/test_native.py pins equality); exotic
    formats fall through to PIL transparently."""
    lib = _native_lib()
    if lib is not None and getattr(lib, "has_decode", False) \
            and mode in ("RGB", "L"):
        try:
            with open(path, "rb") as f:
                data = f.read()
            out = lib.decode_image(data, mode, size[0], size[1])
            if out is not None:
                return out
        except OSError:
            raise  # unreadable file: same error contract as Image.open
        except Exception:
            pass  # any native surprise -> PIL fallback below
    with Image.open(path) as img:
        img = img.convert(mode)
        if img.size != (size[1], size[0]):
            lib = _native_lib()
            if lib is not None:
                arr = np.asarray(img, np.uint8)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                return lib.resize_batch(arr[None], size[0], size[1],
                                        nthreads=1)[0]
            img = img.resize((size[1], size[0]), Image.BILINEAR)
        arr = np.asarray(img, np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def load_image(path: str, mode: str = "RGB",
               size: Tuple[int, int] = (IMAGE_SIZE, IMAGE_SIZE)) -> np.ndarray:
    """Decode + bilinear resize + scale to [0,1]. Returns (H, W, C) f32;
    grayscale ('L') keeps a trailing channel dim of 1."""
    return load_image_u8(path, mode, size).astype(np.float32) / 255.0


def normalize_optical(arr: np.ndarray) -> np.ndarray:
    """Per-channel (x - mean) / std for the main optical image."""
    return (arr - _MEAN) / _STD


def load_main_image(path: str,
                    size: Tuple[int, int] = (IMAGE_SIZE, IMAGE_SIZE)
                    ) -> np.ndarray:
    return normalize_optical(load_image(path, "RGB", size))


def zeros(channels: int, size: int = IMAGE_SIZE) -> np.ndarray:
    return np.zeros((size, size, channels), np.float32)


def image_nonzero_count(path: str, mode: Optional[str] = None) -> int:
    with Image.open(path) as img:
        if mode:
            img = img.convert(mode)
        return int(np.count_nonzero(np.asarray(img)))


def image_sum(path: str) -> float:
    with Image.open(path) as img:
        return float(np.asarray(img).sum())
