"""Custom-VJP correctness for the fused sampling op."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.ops.sampling import gaussian_shift_scale


def test_vjp_matches_autodiff_jnp():
    P = 1024
    mu = jnp.linspace(-1, 1, P)
    sigma = jnp.linspace(0.1, 0.5, P)
    key = jax.random.PRNGKey(0)

    def loss_custom(mu, sigma):
        w = gaussian_shift_scale(mu, sigma, key, num_draws=4, impl="jnp")
        return jnp.sum(jnp.sin(w) * w)

    def loss_direct(mu, sigma):
        eps = jax.random.normal(key, (4, P), jnp.float32)
        w = mu[None] + sigma[None] * eps
        return jnp.sum(jnp.sin(w) * w)

    g1 = jax.grad(loss_custom, argnums=(0, 1))(mu, sigma)
    g2 = jax.grad(loss_direct, argnums=(0, 1))(mu, sigma)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), rtol=1e-5)


def test_vjp_single_draw_and_dtype():
    P = 256
    mu = jnp.zeros(P)
    sigma = jnp.full(P, 0.3)
    key = jax.random.PRNGKey(1)
    g = jax.grad(lambda m: jnp.sum(
        gaussian_shift_scale(m, sigma, key, impl="jnp")))(mu)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=1e-6)


def test_interpret_kernel_sigma_variant_plumbing():
    """Zero-bits interpreter: both Box–Muller halves are deterministic
    (cos half z=r, sin half z=0), validating the sin/cos split layout."""
    P = 512 * 128  # exactly one (512, 128) kernel block
    mu = jnp.zeros(P)
    sigma = jnp.ones(P)
    out = gaussian_shift_scale(mu, sigma, jax.random.PRNGKey(0), num_draws=1,
                               impl="pallas_interpret")
    x = np.asarray(out).reshape(-1, 512, 128)
    z0 = np.sqrt(-2.0 * np.log(1.0 / 16777216.0))
    # first half of each block = r*cos(0) = z0; second half = r*sin(0) = 0
    np.testing.assert_allclose(x[:, :256, :], z0, rtol=1e-4)
    np.testing.assert_allclose(x[:, 256:, :], 0.0, atol=1e-4)


def test_fast_math_log_sincos_accuracy():
    """The kernel's fast-math ln and sin/cos (VPU-op-count-optimised) must
    stay within ~1e-6 of the true functions across their full input domains
    (24-bit uniforms)."""
    import numpy as np

    from multimodal_auv_tpu.ops.sampling import _fast_ln, _fast_sincos_2pi

    rng = np.random.default_rng(0)
    b = rng.integers(0, 1 << 24, size=100000).astype(np.int64)
    f = (b + 1).astype(np.float32)
    got = np.asarray(_fast_ln(jnp.asarray(f)))
    want = np.log(f.astype(np.float64))
    assert np.abs(got - want).max() < 4e-6  # abs err; ln range [0, 16.6]

    u = rng.uniform(0, 1, 100000).astype(np.float32)
    s, c = _fast_sincos_2pi(jnp.asarray(u))
    assert np.abs(np.asarray(s) - np.sin(2 * np.pi * u.astype(np.float64))).max() < 2e-6
    assert np.abs(np.asarray(c) - np.cos(2 * np.pi * u.astype(np.float64))).max() < 2e-6
    # exact quadrant edges
    for uu, (es, ec) in {0.0: (0, 1), 0.25: (1, 0), 0.5: (0, -1),
                         0.75: (-1, 0)}.items():
        s, c = _fast_sincos_2pi(jnp.asarray(np.float32(uu)))
        np.testing.assert_allclose([float(s), float(c)], [es, ec], atol=1e-6)


def test_split_sampling_matches_stacked():
    """gaussian_shift_scale_split must produce draw-for-draw the same
    samples as the stacked variant (same seeding) in both the jnp and
    interpret-mode pallas paths."""
    import numpy as np

    from multimodal_auv_tpu.ops.sampling import (
        gaussian_shift_scale,
        gaussian_shift_scale_split,
    )

    mu = jnp.arange(2048, dtype=jnp.float32) / 2048.0
    sg = jnp.full((2048,), 0.1, jnp.float32)
    k = jax.random.PRNGKey(0)
    for impl in ("jnp", "pallas_interpret"):
        st = gaussian_shift_scale(mu, sg, k, num_draws=3, impl=impl)
        sp = gaussian_shift_scale_split(mu, sg, k, 3, impl=impl)
        assert len(sp) == 3
        for i in range(3):
            np.testing.assert_allclose(np.asarray(sp[i]), np.asarray(st[i]))


def test_fast_math_bf16_log_sincos_accuracy():
    """The bf16-budget fast-math variants (two 24-bit uniforms per pair —
    the same bit consumption as _normal_block; the one-word 16+16 split
    was rejected as 2.5x slower, see BENCH_NOTES/probe_rng_split — with
    trimmed polynomials) must stay well inside the bf16 output quantum:
    ln to ~2e-4 abs, sin/cos to ~4e-4 abs."""
    from multimodal_auv_tpu.ops.sampling import (
        _fast_ln_bf16,
        _fast_sincos_2pi_bf16,
    )

    rng = np.random.default_rng(0)
    # full 16-bit u1 domain is enumerable — test every value
    f = (np.arange(1 << 16) + 1).astype(np.float32)
    got = np.asarray(_fast_ln_bf16(jnp.asarray(f)))
    want = np.log(f.astype(np.float64))
    assert np.abs(got - want).max() < 2.5e-4

    u = rng.uniform(0, 1, 200000).astype(np.float32)
    s, c = _fast_sincos_2pi_bf16(jnp.asarray(u))
    serr = np.abs(np.asarray(s) - np.sin(2 * np.pi * u.astype(np.float64)))
    cerr = np.abs(np.asarray(c) - np.cos(2 * np.pi * u.astype(np.float64)))
    # both bounded by the deg-4 cos truncation (y^6/720 at pi/4 = 3.3e-4):
    # quadrant rotation hands each output the other polynomial's error
    assert serr.max() < 4e-4
    assert cerr.max() < 4e-4
    # exact quadrant edges survive the trim
    for uu, (es, ec) in {0.0: (0, 1), 0.25: (1, 0), 0.5: (0, -1),
                         0.75: (-1, 0)}.items():
        s, c = _fast_sincos_2pi_bf16(jnp.asarray(np.float32(uu)))
        np.testing.assert_allclose([float(s), float(c)], [es, ec], atol=1e-5)


def test_fast_math_split_kernel_interpret():
    """fast_math split kernel in interpret mode: zero-bits stub makes both
    Box–Muller halves deterministic with the 24-bit radius
    r = sqrt(48*ln2) = 5.768 (same bit consumption as the precise kernel;
    only the polynomials are trimmed) — and the kernel must refuse
    non-bf16 outputs (its error budget is defined by the bf16 quantum)."""
    from multimodal_auv_tpu.ops.sampling import gaussian_shift_scale_split

    P = 512 * 128
    mu = jnp.zeros(P, jnp.bfloat16)
    sg = jnp.ones(P, jnp.bfloat16)
    outs = gaussian_shift_scale_split(mu, sg, jax.random.PRNGKey(0), 2,
                                      impl="pallas_interpret",
                                      out_dtype=jnp.bfloat16, fast_math=True)
    assert len(outs) == 2 and outs[0].dtype == jnp.bfloat16
    x = np.asarray(outs[0], np.float32).reshape(512, 128)
    r24 = np.sqrt(2.0 * 24.0 * np.log(2.0))
    np.testing.assert_allclose(x[:256, :], r24, rtol=1e-2)
    np.testing.assert_allclose(x[256:, :], 0.0, atol=1e-2)

    with pytest.raises(ValueError, match="bf16-output-only"):
        gaussian_shift_scale_split(mu, sg, jax.random.PRNGKey(0), 2,
                                   impl="pallas_interpret",
                                   out_dtype=jnp.float32, fast_math=True)
