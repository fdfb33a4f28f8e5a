"""On-chip preprocessing: ship uint8, normalize on the TPU.

The reference normalizes in torchvision transforms on the CPU and ships
float32 tensors to the device (4 bytes/px). Here batches cross the host->
device boundary as uint8 (1 byte/px — 4x less transfer) and the
/255 + per-channel (x-mean)/std runs on-chip, where XLA fuses it into the
first convolution's input pipeline.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from multimodal_auv_tpu.config import OPTICAL_MEAN, OPTICAL_STD


@partial(jax.jit, static_argnames=("dtype",))
def _normalize(u8, mean, std, dtype):
    x = u8.astype(jnp.float32) * (1.0 / 255.0)
    x = (x - mean) / std
    return x.astype(dtype)


def normalize_images(u8_batch: jax.Array,
                     mean: Optional[Sequence[float]] = None,
                     std: Optional[Sequence[float]] = None,
                     dtype=jnp.float32) -> jax.Array:
    """(..., C) uint8 on device -> normalized float. mean/std default to
    identity (plain /255, the reference's ToTensor for bathy/SSS)."""
    c = u8_batch.shape[-1]
    mean = jnp.zeros((c,), jnp.float32) if mean is None else jnp.asarray(
        mean, jnp.float32)
    std = jnp.ones((c,), jnp.float32) if std is None else jnp.asarray(
        std, jnp.float32)
    return _normalize(u8_batch, mean, std, dtype)


def normalize_optical(u8_batch: jax.Array, dtype=jnp.float32) -> jax.Array:
    """The survey-wide optical normalization constants
    (datasets.py:246-249)."""
    return normalize_images(u8_batch, OPTICAL_MEAN, OPTICAL_STD, dtype)


def normalize_multimodal(main_u8, bathy_u8, sss_u8,
                         dtype=jnp.float32) -> Tuple[jax.Array, ...]:
    return (normalize_optical(main_u8, dtype),
            normalize_images(bathy_u8, dtype=dtype),
            normalize_images(sss_u8, dtype=dtype))
