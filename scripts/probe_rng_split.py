"""Decompose the sampling kernel's per-draw RNG cost on the real chip.

BENCH_NOTES (round 2) pinned: eps-only kernel 1.56 ms/draw marginal,
no-RNG copy floor 0.335 ms/draw => RNG + Box-Muller math ~ 1.2 ms/draw.
This probe splits that 1.2 ms into (hardware PRNG bits) vs (Box-Muller
transcendental math), and measures whether a reduced-precision Box-Muller
(~1e-3 - the noise is consumed as bf16 weights whose own rounding is
~4e-3 relative) buys anything:

  bits   : prng_random_bits + store only          -> PRNG + write floor
  bm     : current fast-math Box-Muller (prod)    -> the 1.56 ms baseline
  bmlite : short-polynomial Box-Muller (~1e-3)    -> candidate

Run ON TPU (one process at a time):  python scripts/probe_rng_split.py
"""
import functools
import os
import sys
import time

# robust to relative __file__ (Python <=3.10 does not absolutize it)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_auv_tpu.ops import sampling as S

LANES, BLOCK_ROWS = S.LANES, S.BLOCK_ROWS
_LN2 = S._LN2


def _fast_ln_lite(f):
    """ln(f) for f in [1, 2^24] to ~4e-4 rel: 2-term atanh series."""
    i = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = jax.lax.shift_right_arithmetic(i, 23) - 127
    m = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(i, jnp.int32(0x7FFFFF)),
                       jnp.int32(0x3F800000)), jnp.float32)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    return e.astype(jnp.float32) * _LN2 + 2.0 * z * (1.0 + z2 * (1.0 / 3.0))


def _fast_sincos_2pi_lite(u):
    """(sin, cos)(2*pi*u) to ~2e-3 abs: degree-3/4 polynomials."""
    x = (u - 0.5) * S._TWO_PI
    q = jnp.floor(x * (2.0 / 3.141592653589793) + 0.5)
    y = x - q * (3.141592653589793 / 2.0)
    y2 = y * y
    s = y * (1.0 + y2 * (-1.0 / 6.0 + y2 * (1.0 / 120.0)))
    c = 1.0 + y2 * (-0.5 + y2 * (1.0 / 24.0))
    qm = jnp.bitwise_and(q.astype(jnp.int32), jnp.int32(3))
    sin_x = jnp.where(qm == 0, s, jnp.where(qm == 1, c,
                                            jnp.where(qm == 2, -s, -c)))
    cos_x = jnp.where(qm == 0, c, jnp.where(qm == 1, -s,
                                            jnp.where(qm == 2, -c, s)))
    return -sin_x, -cos_x


def _normal_block_lite(shape):
    half = (shape[0] // 2, shape[1])
    b1 = pltpu.prng_random_bits(half)
    b2 = pltpu.prng_random_bits(half)
    m24 = jnp.int32(0xFFFFFF)
    f1 = ((b1 & m24) + 1).astype(jnp.float32)
    ln_u1 = _fast_ln_lite(f1) - 24.0 * _LN2
    u2 = (b2 & m24).astype(jnp.float32) * (1.0 / 16777216.0)
    r = jnp.sqrt(-2.0 * ln_u1)
    sin_t, cos_t = _fast_sincos_2pi_lite(u2)
    return jnp.concatenate([r * cos_t, r * sin_t], axis=0)


def _bits_kernel(seed_ref, out_ref):
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0] + draw * nblk + blk)
    shape = out_ref.shape[1:]
    half = (shape[0] // 2, shape[1])
    b1 = pltpu.prng_random_bits(half)
    b2 = pltpu.prng_random_bits(half)
    m24 = jnp.int32(0xFFFFFF)
    f1 = ((b1 & m24) + 1).astype(jnp.float32)
    f2 = (b2 & m24).astype(jnp.float32)
    out_ref[0] = jnp.concatenate([f1, f2], axis=0).astype(out_ref.dtype)


def _bmlite_kernel(seed_ref, out_ref):
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0] + draw * nblk + blk)
    out_ref[0] = _normal_block_lite(out_ref.shape[1:]).astype(out_ref.dtype)


def _bmfast_kernel(seed_ref, out_ref):
    """The SHIPPED fast variant (ops/sampling._normal_block_fast):
    two-word bit consumption with bf16-budget polynomial trims. A one-word
    16+16-bit split variant was measured here first at 1.76 ms/draw
    marginal — 2.5x SLOWER than prod (Mosaic lowers the in-register word
    split badly) — which is why the shipped design keeps two words."""
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0] + draw * nblk + blk)
    out_ref[0] = S._normal_block_fast(out_ref.shape[1:]).astype(out_ref.dtype)


def _launch(kernel, rows, num_draws, out_dtype=jnp.bfloat16):
    grid = (pl.cdiv(rows, BLOCK_ROWS), num_draws)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_draws, rows, LANES), out_dtype),
    )


def _time(fn, seed, iters=20):
    # axon quirk: block_until_ready can return before execution completes;
    # a device->host copy is the only real fence (BENCH_NOTES Methodology).
    # One tiny fetch AFTER the dispatch loop drains the whole queue, so the
    # ~30 ms tunnel round trip amortizes across iters.
    out = fn(seed)
    np.asarray(out[0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(seed)
    np.asarray(out[0, 0, :1])
    return (time.perf_counter() - t0) / iters


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    # Match the model scale: ~73M params, rounded to a block multiple.
    rows = (73_000_000 // LANES // BLOCK_ROWS) * BLOCK_ROWS
    numel = rows * LANES
    n = 20
    seed = jnp.asarray([12345], jnp.int32)
    print(f"numel={numel/1e6:.1f}M rows={rows} draws={n}")

    results = {}
    for name, kern in [("bits", _bits_kernel), ("bm", S._eps_kernel),
                       ("bmlite", _bmlite_kernel),
                       ("bmfast", _bmfast_kernel)]:
        f_n = jax.jit(functools.partial(_launch(kern, rows, n)))
        f_1 = jax.jit(functools.partial(_launch(kern, rows, 1)))
        t_n = _time(f_n, seed)
        t_1 = _time(f_1, seed)
        marg = (t_n - t_1) / (n - 1)
        results[name] = (t_n, t_1, marg)
        print(f"{name:7s} t({n})={t_n*1e3:8.2f} ms  t(1)={t_1*1e3:7.2f} ms  "
              f"marginal={marg*1e3:6.3f} ms/draw")

    bits, bm, lite, fast = (results[k][2]
                            for k in ("bits", "bm", "bmlite", "bmfast"))
    print(f"\nPRNG+write floor : {bits*1e3:6.3f} ms/draw")
    print(f"BM math (prod)   : {(bm - bits)*1e3:6.3f} ms/draw")
    print(f"BM math (lite)   : {(lite - bits)*1e3:6.3f} ms/draw")
    print(f"lite saves       : {(bm - lite)*1e3:6.3f} ms/draw "
          f"({(bm - lite)*n*1e3:5.1f} ms per 20-draw step)")
    print(f"fast (shipped) saves: {(bm - fast)*1e3:6.3f} ms/draw "
          f"({(bm - fast)*n*1e3:5.1f} ms per 20-draw step)")

    # Fidelity of the lite transform vs prod on identical bits (CPU interpret
    # would be slow at this size; compare moments on-chip instead).
    w_bm = jax.jit(_launch(S._eps_kernel, rows, 2, jnp.float32))(seed)
    w_lt = jax.jit(_launch(_bmlite_kernel, rows, 2, jnp.float32))(seed)
    d = np.abs(np.asarray(w_bm) - np.asarray(w_lt))
    a = np.asarray(w_lt).ravel()
    print(f"\nlite vs prod: max|d|={d.max():.2e} mean|d|={d.mean():.2e}")
    print(f"lite moments: mean={a.mean():+.2e} std={a.std():.6f} "
          f"skew={float(((a - a.mean())**3).mean() / a.std()**3):+.2e} "
          f"kurt={float(((a - a.mean())**4).mean() / a.std()**4 - 3):+.2e}")


if __name__ == "__main__":
    main()
