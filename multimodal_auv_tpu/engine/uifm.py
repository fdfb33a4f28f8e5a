"""Underwater Image Formation Model (UIFM) degradation — input-domain fault
injection for robustness studies.

Reference: /root/reference/src/Multimodal_AUV/Examples/
"Example training with image noise.py":55-93. Per-channel attenuation
beta = (0.8, 0.5, 0.3) * turbidity (R, G, B), ambient backscatter
B_inf = (0.1, 0.3, 0.5):

    I(x) = J(x) * exp(-beta * d) + B_inf * (1 - exp(-beta * d)),  clamp [0,1]

JAX/NHWC, jittable and vmappable — applied on-chip inside the train/eval
step rather than per batch in Python.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BETA_RGB = (0.8, 0.5, 0.3)
B_INF_RGB = (0.1, 0.3, 0.5)


@jax.jit
def simulate_underwater_degradation(
    clean_image: jax.Array,       # (B, H, W, 3); nominally in [0, 1]
    distance_map: jax.Array,      # (B, H, W, 1) or broadcastable; uniform=1.0
    turbidity_factor: jax.Array,  # scalar
    depth_value: jax.Array,       # scalar (normalized 0..1)
) -> jax.Array:
    """PARITY QUIRK: the noise study (pipelines/noise_study.py) applies
    this to mean/std-NORMALIZED images (range ~[-1.5, 4.6]), where the
    [0, 1] clip saturates below-mean pixels to 0 — exactly what the
    reference does (torch.clamp on normalized tensors, "Example training
    with image noise.py":88-93), so the degradation severity matches the
    reference's study, not a physically-calibrated UIFM on raw images."""
    beta = jnp.asarray(BETA_RGB, clean_image.dtype).reshape(1, 1, 1, 3)
    beta = beta * turbidity_factor
    b_inf = jnp.asarray(B_INF_RGB, clean_image.dtype).reshape(1, 1, 1, 3)

    d = distance_map * depth_value
    transmission = jnp.exp(-beta * d)
    degraded = clean_image * transmission + b_inf * (1.0 - transmission)
    return jnp.clip(degraded, 0.0, 1.0)


def degrade_uniform(clean_image: jax.Array, turbidity: float,
                    depth_value: float = 1.0) -> jax.Array:
    """Flat-seabed convenience wrapper (uniform unit distance map —
    broadcastable (1,1,1,1), not a full B*H*W map of ones)."""
    dmap = jnp.ones((1, 1, 1, 1), clean_image.dtype)
    return simulate_underwater_degradation(
        clean_image, dmap, jnp.asarray(turbidity, clean_image.dtype),
        jnp.asarray(depth_value, clean_image.dtype))


def sample_turbidity(key: jax.Array, turbidity_range: Tuple[float, float]) -> jax.Array:
    lo, hi = turbidity_range
    return jax.random.uniform(key, (), minval=lo, maxval=hi)
