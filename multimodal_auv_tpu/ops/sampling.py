"""Fused Gaussian reparameterization sampling — the BNN hot op.

In the reference every MC forward re-samples ~75M posterior weights layer by
layer inside bayesian-torch modules (SURVEY.md §3.5). Here one Pallas kernel
draws the *entire packed posterior* per MC sample:

    w = mu + softplus(rho) * eps,   eps ~ N(0, 1)

with the normal noise generated **on-chip** (TPU PRNG + Box–Muller), so the
only HBM traffic is reading (mu, rho) and writing w — no eps array ever
exists in memory. A ``num_draws`` grid dimension produces a whole chunk of
MC draws in one kernel launch.

Memory-bandwidth notes (the op is HBM-bound): mu/rho can be passed as
bfloat16 and the output emitted as bfloat16 (``out_dtype``), halving the
traffic — the Box–Muller math always runs in f32. The inference path
pre-casts the posterior once and samples straight to bf16 weights for the
MXU.

Falls back to pure jnp (jax.random.normal) off-TPU; an interpret-mode path
exists so the kernel itself is unit-testable on CPU.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 512  # 512x128 f32 = 256 KiB per buffer in VMEM

_TWO_PI = 6.283185307179586



def _seed_from_key(key):
    """The ONE key->kernel-seed derivation. The sampling custom VJP
    regenerates eps in the backward from the same key (zero residuals),
    and the split/stacked/eps kernels must sample identical noise for a
    given key — all of which holds only if every call site derives the
    seed identically. Change it here or nowhere.

    TWO int32 words, consumed as prng_seed(word0, word1 + offset): a
    single 32-bit base seed plus the per-(draw, block) offset range
    (~num_draws * nblocks ≈ 2^15 for 20 draws of the 73M posterior) makes
    cross-step range overlaps likely by the birthday bound within ~10^4
    steps — two training steps would silently share part of their noise.
    The second word pushes the collision space to 2^64."""
    return jax.random.bits(key, shape=(2,), dtype=jnp.uint32).astype(jnp.int32)

def _softplus(x):
    # Stable softplus; rho is typically in [-12, 1] here.
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(jnp.minimum(x, 20.0))))


_LN2 = 0.6931471805599453


def _fast_ln(f):
    """ln(f) for f32 f in [1, 2^24] (integers exactly representable), to
    ~2e-6 relative: exponent extracted by bit twiddling, mantissa log via
    the atanh series ln(m) = 2z(1 + z²/3 + z⁴/5 + ...), z=(m-1)/(m+1),
    |z| <= 1/3. ~12 VPU ops vs ~30 for the lowered builtin — the sampling
    kernel is VPU-bound on exactly these (measured 1.2 ms/draw of
    transcendentals vs a 0.34 ms/draw memory floor)."""
    i = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = jax.lax.shift_right_arithmetic(i, 23) - 127
    m = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(i, jnp.int32(0x7FFFFF)),
                       jnp.int32(0x3F800000)), jnp.float32)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    p = 1.0 + z2 * (1.0 / 3.0 + z2 * (1.0 / 5.0 + z2 * (1.0 / 7.0
                                                        + z2 * (1.0 / 9.0))))
    return e.astype(jnp.float32) * _LN2 + 2.0 * z * p


def _fast_sincos_2pi(u):
    """(sin(2πu), cos(2πu)) for u in [0,1), ~3e-7 abs error: range-reduce to
    [-π/4, π/4] with quadrant selects + degree-7/8 Taylor polynomials."""
    x = (u - 0.5) * _TWO_PI  # [-π, π)
    q = jnp.floor(x * (2.0 / 3.141592653589793) + 0.5)
    y = x - q * (3.141592653589793 / 2.0)
    y2 = y * y
    s = y * (1.0 + y2 * (-1.0 / 6.0 + y2 * (1.0 / 120.0 + y2 * (-1.0 / 5040.0))))
    c = 1.0 + y2 * (-0.5 + y2 * (1.0 / 24.0 + y2 * (-1.0 / 720.0
                                                    + y2 * (1.0 / 40320.0))))
    qm = jnp.bitwise_and(q.astype(jnp.int32), jnp.int32(3))
    # sin(x) for x = y + q·π/2, then negate both for the +π of (u-0.5)·2π
    sin_x = jnp.where(qm == 0, s, jnp.where(qm == 1, c,
                                            jnp.where(qm == 2, -s, -c)))
    cos_x = jnp.where(qm == 0, c, jnp.where(qm == 1, -s,
                                            jnp.where(qm == 2, -c, s)))
    return -sin_x, -cos_x


def _normal_block(shape):
    """(rows, LANES) standard normals via sin/cos-paired Box–Muller: one
    (log, sqrt) pair yields TWO normals, halving transcendental cost; log
    and sin/cos use the fast-math forms above (~1e-6, statistically
    indistinguishable for posterior sampling). Random bits come back as
    signed int32 and Mosaic cannot cast uint32 to f32 — the low 24 bits
    (non-negative int32) are the uniform source."""
    half = (shape[0] // 2, shape[1])
    b1 = pltpu.prng_random_bits(half)
    b2 = pltpu.prng_random_bits(half)
    m24 = jnp.int32(0xFFFFFF)
    # u1 in (0, 1]: 24 random bits + 1;  ln(u1) = ln(b1+1) - 24·ln2
    f1 = ((b1 & m24) + 1).astype(jnp.float32)
    ln_u1 = _fast_ln(f1) - 24.0 * _LN2
    u2 = (b2 & m24).astype(jnp.float32) * (1.0 / 16777216.0)
    r = jnp.sqrt(-2.0 * ln_u1)
    sin_t, cos_t = _fast_sincos_2pi(u2)
    return jnp.concatenate([r * cos_t, r * sin_t], axis=0)


def _fast_ln_bf16(f):
    """_fast_ln with the atanh series cut to 3 terms: abs error <= 2e-4
    (truncation 2z^7/7 at |z|<=1/3) — two fmas cheaper, still ~20x inside
    the bf16 output quantum the _bf16 kernel rounds to."""
    i = jax.lax.bitcast_convert_type(f, jnp.int32)
    e = jax.lax.shift_right_arithmetic(i, 23) - 127
    m = jax.lax.bitcast_convert_type(
        jnp.bitwise_or(jnp.bitwise_and(i, jnp.int32(0x7FFFFF)),
                       jnp.int32(0x3F800000)), jnp.float32)
    z = (m - 1.0) / (m + 1.0)
    z2 = z * z
    p = 1.0 + z2 * (1.0 / 3.0 + z2 * (1.0 / 5.0))
    return e.astype(jnp.float32) * _LN2 + 2.0 * z * p


def _fast_sincos_2pi_bf16(u):
    """_fast_sincos_2pi with degree-5 sin / degree-4 cos: abs error
    <= 4e-5 (sin) / 3.3e-4 (cos) on the reduced range — three fmas
    cheaper, below the bf16 quantum of the normals it produces."""
    x = (u - 0.5) * _TWO_PI
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


def _normal_block_fast(shape):
    """bf16-grade Box–Muller (the VPU-bound sampling kernel's fast path for
    bfloat16 outputs): identical bit consumption and pairing to
    _normal_block — two 24-bit uniforms per pair, same 5.77-sigma tail —
    with the polynomial budgets cut to the bf16 output quantum: 3-term ln
    series, degree-5/4 sin/cos (abs errors 2e-4 / 4e-5 / 3.3e-4 — ~10x
    below one bf16 ulp of a typical |sample| ~ 1; NOT sub-ulp for the
    measure-zero tail of near-zero samples, where the ln truncation is
    amplified by 1/r as r->0 and the bf16 ulp shrinks with magnitude —
    P~1e-4, distributionally irrelevant, and the moment checks in
    tests/test_sampling_vjp.py are the actual acceptance criterion), five
    fmas fewer per pair. Measured on v5e at the 73M-draw geometry:
    0.624 vs 0.715 ms/draw marginal (scripts/probe_rng_split.py; a
    one-word 16+16-bit variant was ALSO built and measured 1.76 ms/draw —
    Mosaic lowers the word split badly — hence two words here).

    The rounded bf16 outputs are statistically indistinguishable from
    _normal_block's — only bf16 consumers may use this (enforced in
    _pallas_reparam_split). NOT for the differentiable path: the VJP's
    eps regeneration (_eps_kernel) must stay bit-exact with the f32
    forward."""
    half = (shape[0] // 2, shape[1])
    b1 = pltpu.prng_random_bits(half)
    b2 = pltpu.prng_random_bits(half)
    m24 = jnp.int32(0xFFFFFF)
    f1 = ((b1 & m24) + 1).astype(jnp.float32)
    ln_u1 = _fast_ln_bf16(f1) - 24.0 * _LN2
    u2 = (b2 & m24).astype(jnp.float32) * (1.0 / 16777216.0)
    r = jnp.sqrt(-2.0 * ln_u1)
    sin_t, cos_t = _fast_sincos_2pi_bf16(u2)
    return jnp.concatenate([r * cos_t, r * sin_t], axis=0)


def _reparam_kernel(seed_ref, mu_ref, rho_ref, out_ref):
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + draw * nblk + blk)

    eps = _normal_block(mu_ref.shape)
    mu = mu_ref[:].astype(jnp.float32)
    rho = rho_ref[:].astype(jnp.float32)
    out_ref[0] = (mu + _softplus(rho) * eps).astype(out_ref.dtype)


def _reparam_sigma_kernel(seed_ref, mu_ref, sigma_ref, out_ref):
    """Variant taking a precomputed sigma = softplus(rho): sigma is constant
    across the MC draws of a step, so the softplus is hoisted out of the
    kernel (one elementwise pass per step instead of one per draw)."""
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + draw * nblk + blk)

    eps = _normal_block(mu_ref.shape)
    mu = mu_ref[:].astype(jnp.float32)
    sigma = sigma_ref[:].astype(jnp.float32)
    out_ref[0] = (mu + sigma * eps).astype(out_ref.dtype)


def _eps_kernel(seed_ref, out_ref):
    """Noise-only variant for the custom-VJP backward: regenerates eps from
    the seed without streaming mu/sigma (the zeros/ones the generic kernel
    would read are 8 bytes/param of dead HBM traffic). Seeding is identical
    to the sampling kernels, so eps is bit-exact the forward's."""
    blk = pl.program_id(0)
    draw = pl.program_id(1)
    nblk = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[0], seed_ref[1] + draw * nblk + blk)
    out_ref[0] = _normal_block(out_ref.shape[1:]).astype(out_ref.dtype)


def _pallas_reparam(mu2d, rho2d, seed, num_draws, out_dtype, *,
                    kernel=_reparam_kernel, interpret=False):
    if interpret:
        # TPU-semantics interpreter (supports pltpu.prng_* on CPU).
        interpret = pltpu.InterpretParams()
    rows = mu2d.shape[0]
    # Grid order: parameter blocks MAJOR, draws MINOR. Consecutive grid steps
    # then map to the *same* (mu, sigma) block, so Mosaic elides the input
    # DMAs across draws — (mu, sigma) are streamed from HBM once per chunk
    # instead of once per draw. Per-draw HBM traffic drops from
    # (mu + sigma + w) to (mu + sigma)/num_draws + w: ~2.7x less for a
    # 20-draw chunk in bf16. The seed derivation is per-(draw, blk), so the
    # samples are bit-identical to the draw-major order.
    grid = (pl.cdiv(rows, BLOCK_ROWS), num_draws)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_draws, rows, LANES), out_dtype),
        interpret=interpret,
    )(seed, mu2d, rho2d)
    return out


def _pallas_reparam_split(mu2d, sigma2d, seed, num_draws, out_dtype, *,
                          interpret=False, fast_math=False):
    """One launch, ``num_draws`` SEPARATE (rows, LANES) outputs.

    Measured on v5e: consuming draws by slicing a stacked (n, P) output
    costs ~6 ms/draw of extra time in the full model (XLA fails to fuse the
    cross-draw slices into the convolutions), while separate arrays consume
    exactly like single-draw outputs. The (mu, sigma) blocks stay resident
    across the inner draw axis (same elision as the stacked variant), and
    each output block is written once under a pl.when guard and flushed when
    the parameter block advances. Seeding matches the stacked kernel
    bit-for-bit.

    ``fast_math``: use the bf16-budget noise generator (_normal_block_fast)
    — bfloat16 outputs only."""
    if fast_math and out_dtype != jnp.bfloat16:
        raise ValueError("fast_math sampling is bf16-output-only (its error "
                         f"budget is the bf16 quantum); got {out_dtype}")
    if interpret:
        interpret = pltpu.InterpretParams()
    rows = mu2d.shape[0]
    grid = (pl.cdiv(rows, BLOCK_ROWS), num_draws)
    noise = _normal_block_fast if fast_math else _normal_block

    def kernel(seed_ref, mu_ref, sg_ref, *out_refs):
        blk = pl.program_id(0)
        draw = pl.program_id(1)
        nblk = pl.num_programs(0)
        pltpu.prng_seed(seed_ref[0], seed_ref[1] + draw * nblk + blk)
        eps = noise(mu_ref.shape)
        val = (mu_ref[:].astype(jnp.float32)
               + sg_ref[:].astype(jnp.float32) * eps)
        for j in range(num_draws):
            @pl.when(draw == j)
            def _(j=j):
                out_refs[j][...] = val.astype(out_refs[j].dtype)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, d: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((BLOCK_ROWS, LANES), lambda i, d: (i, 0),
                                memory_space=pltpu.VMEM)] * num_draws,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), out_dtype)] * num_draws,
        interpret=interpret,
    )(seed, mu2d, sigma2d)
    return list(outs) if isinstance(outs, (list, tuple)) else [outs]


def gaussian_shift_scale_split(mu, sigma, key, num_draws, *,
                               impl: str = "auto", out_dtype=None,
                               fast_math: bool = False):
    """Sample ``num_draws`` posterior draws as a LIST of flat arrays (the
    fast inference path — see _pallas_reparam_split). Not differentiable;
    training uses gaussian_shift_scale.

    ``fast_math``: bf16-budget noise generation (see _normal_block_fast) —
    requires bfloat16 outputs; the jnp fallback ignores it (full-precision
    jax.random.normal)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    out_dtype = out_dtype or mu.dtype
    if impl == "jnp":
        ws = _shift_scale_impl(mu, sigma, key, num_draws, "jnp", out_dtype)
        return [ws[i] for i in range(num_draws)]
    if mu.shape[0] % LANES != 0:
        raise ValueError(f"packed size {mu.shape[0]} not a multiple of {LANES}")
    rows = mu.shape[0] // LANES
    seed = _seed_from_key(key)
    outs = _pallas_reparam_split(
        mu.reshape(rows, LANES), sigma.reshape(rows, LANES), seed, num_draws,
        out_dtype, interpret=(impl == "pallas_interpret"),
        fast_math=fast_math)
    return [o.reshape(mu.shape[0]) for o in outs]


def _pallas_eps(numel, seed, num_draws, out_dtype, *, interpret=False):
    """(num_draws, numel) standard normals, seeded exactly like
    _pallas_reparam — used by the VJP backward to regenerate eps."""
    if interpret:
        interpret = pltpu.InterpretParams()
    rows = numel // LANES
    grid = (pl.cdiv(rows, BLOCK_ROWS), num_draws)
    out = pl.pallas_call(
        _eps_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, BLOCK_ROWS, LANES), lambda i, d: (d, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_draws, rows, LANES), out_dtype),
        interpret=interpret,
    )(seed)
    return out.reshape(num_draws, numel)


def gaussian_reparam(
    mu: jax.Array,
    rho: jax.Array,
    key: jax.Array,
    num_draws: Optional[int] = None,
    *,
    impl: str = "auto",
    out_dtype=None,
) -> jax.Array:
    """Sample ``w = mu + softplus(rho) * N(0,1)``.

    Args:
        mu, rho: flat arrays of equal length P (P % 1024 == 0 when using the
            Pallas path — guaranteed by bayes.packing's pad_multiple). May be
            f32 or bf16 (bf16 halves the HBM read traffic).
        key: jax PRNG key.
        num_draws: if given, returns shape (num_draws, P); else (P,).
        impl: 'auto' | 'jnp' | 'pallas' | 'pallas_interpret'.
        out_dtype: dtype of the sampled weights (default: mu.dtype).
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    out_dtype = out_dtype or mu.dtype

    n = 1 if num_draws is None else num_draws
    if impl == "jnp":
        eps = jax.random.normal(key, (n,) + mu.shape, jnp.float32)
        mu32 = mu.astype(jnp.float32)
        sig32 = jax.nn.softplus(rho.astype(jnp.float32))
        out = (mu32[None] + sig32[None] * eps).astype(out_dtype)
    elif impl in ("pallas", "pallas_interpret"):
        if mu.shape[0] % LANES != 0:
            raise ValueError(f"packed size {mu.shape[0]} not a multiple of {LANES}")
        rows = mu.shape[0] // LANES
        seed = _seed_from_key(key)
        out = _pallas_reparam(
            mu.reshape(rows, LANES),
            rho.reshape(rows, LANES),
            seed,
            n,
            out_dtype,
            interpret=(impl == "pallas_interpret"),
        ).reshape(n, mu.shape[0])
    else:
        raise ValueError(f"unknown impl {impl!r}")

    return out[0] if num_draws is None else out


def _shift_scale_impl(mu, sigma, key, num_draws, impl, out_dtype):
    n = 1 if num_draws is None else num_draws
    if impl == "jnp":
        eps = jax.random.normal(key, (n,) + mu.shape, jnp.float32)
        out = (mu.astype(jnp.float32)[None]
               + sigma.astype(jnp.float32)[None] * eps).astype(out_dtype)
    elif impl in ("pallas", "pallas_interpret"):
        if mu.shape[0] % LANES != 0:
            raise ValueError(f"packed size {mu.shape[0]} not a multiple of {LANES}")
        rows = mu.shape[0] // LANES
        seed = _seed_from_key(key)
        out = _pallas_reparam(
            mu.reshape(rows, LANES),
            sigma.reshape(rows, LANES),
            seed,
            n,
            out_dtype,
            kernel=_reparam_sigma_kernel,
            interpret=(impl == "pallas_interpret"),
        ).reshape(n, mu.shape[0])
    else:
        raise ValueError(f"unknown impl {impl!r}")
    return out[0] if num_draws is None else out


from functools import partial as _partial  # noqa: E402


@_partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gss(mu, sigma, key, num_draws, impl, out_dtype):
    return _shift_scale_impl(mu, sigma, key, num_draws, impl, out_dtype)


def _gss_fwd(mu, sigma, key, num_draws, impl, out_dtype):
    w = _shift_scale_impl(mu, sigma, key, num_draws, impl, out_dtype)
    # residuals must be a pytree of arrays; mu/sigma carry shape+dtype info
    return w, (key, mu, sigma)


def _gss_bwd(num_draws, impl, out_dtype, res, g):
    """Reparameterization VJP: dmu = sum_draws g, dsigma = sum_draws g*eps.
    eps is *regenerated* from the saved PRNG key via a noise-only kernel —
    bit-exact, no eps storage, no dead mu/sigma streaming, robust to tiny
    sigmas (no (w-mu)/sigma cancellation)."""
    key, mu, sigma = res
    n = 1 if num_draws is None else num_draws
    if impl == "jnp":
        eps = jax.random.normal(key, (n,) + mu.shape, jnp.float32)
        if num_draws is None:
            eps = eps[0]
    else:
        seed = _seed_from_key(key)
        eps = _pallas_eps(mu.shape[0], seed, n, jnp.float32,
                          interpret=(impl == "pallas_interpret"))
        if num_draws is None:
            eps = eps[0]
    g32 = g.astype(jnp.float32)
    if num_draws is None:
        dmu, dsigma = g32, g32 * eps
    else:
        dmu = jnp.sum(g32, axis=0)
        dsigma = jnp.sum(g32 * eps, axis=0)
    return dmu.astype(mu.dtype), dsigma.astype(sigma.dtype), None


_gss.defvjp(_gss_fwd, _gss_bwd)


def gaussian_shift_scale(
    mu: jax.Array,
    sigma: jax.Array,
    key: jax.Array,
    num_draws: Optional[int] = None,
    *,
    impl: str = "auto",
    out_dtype=None,
) -> jax.Array:
    """Sample ``w = mu + sigma * N(0,1)`` with a *precomputed* sigma.

    The fast path for MC loops: sigma = softplus(rho) is loop-invariant
    across a step's draws, so callers compute it once (see engine/mc.py)
    and the kernel is a pure shift-scale of on-chip noise. Differentiable
    (custom VJP — the Pallas path has no built-in autodiff rule)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "jnp"
    out_dtype = out_dtype or mu.dtype
    return _gss(mu, sigma, key, num_draws, impl, out_dtype)
