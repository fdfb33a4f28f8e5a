"""Deterministic variance propagation (DVP) — moment primitives against
closed forms and MC, and the single-pass predict step against the full MC
path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.engine.moment import (
    batchnorm_moments,
    conv_moments,
    dense_moments,
    gap_moments,
    make_dvp_predict_step,
    relu_moments,
)


def test_relu_moments_closed_form():
    # X ~ N(0, 1): E[relu] = 1/sqrt(2pi), Var = 1/2 - 1/(2pi)
    m, v = relu_moments(jnp.zeros(4), jnp.ones(4))
    np.testing.assert_allclose(np.asarray(m), 1 / np.sqrt(2 * np.pi),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v), 0.5 - 1 / (2 * np.pi),
                               rtol=1e-5)
    # degenerate: zero variance -> plain relu
    m2, v2 = relu_moments(jnp.asarray([-1.0, 2.0]), jnp.zeros(2))
    np.testing.assert_allclose(np.asarray(m2), [0.0, 2.0])
    np.testing.assert_allclose(np.asarray(v2), 0.0)


def test_dense_moments_match_mc():
    rng = np.random.default_rng(0)
    B, I, O = 8, 16, 12
    x_m = jnp.asarray(rng.normal(size=(B, I)).astype(np.float32))
    x_v = jnp.asarray((rng.uniform(0.01, 0.1, size=(B, I))).astype(np.float32))
    mu_w = jnp.asarray(rng.normal(size=(I, O)).astype(np.float32) * 0.3)
    var_w = jnp.asarray(rng.uniform(0.001, 0.01, (I, O)).astype(np.float32))

    m, v = dense_moments(x_m, x_v, mu_w, var_w)

    # MC ground truth
    K = 4000
    k = jax.random.PRNGKey(0)
    xs = x_m + jnp.sqrt(x_v) * jax.random.normal(k, (K, B, I))
    ws = mu_w + jnp.sqrt(var_w) * jax.random.normal(
        jax.random.PRNGKey(1), (K, I, O))
    ys = jnp.einsum("kbi,kio->kbo", xs, ws)
    np.testing.assert_allclose(np.asarray(ys.mean(0)), np.asarray(m),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(ys.var(0)), np.asarray(v),
                               rtol=0.2, atol=0.02)


def test_conv_moments_match_mc():
    rng = np.random.default_rng(1)
    x_m = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    x_v = jnp.asarray(rng.uniform(0.01, 0.05, (2, 8, 8, 3)).astype(np.float32))
    mu_k = jnp.asarray(rng.normal(size=(3, 3, 3, 4)).astype(np.float32) * 0.2)
    var_k = jnp.asarray(rng.uniform(0.001, 0.005, (3, 3, 3, 4)).astype(np.float32))

    m, v = conv_moments(x_m, x_v, mu_k, var_k, strides=(1, 1),
                        padding=[(1, 1), (1, 1)])

    K = 3000
    dn = jax.lax.conv_dimension_numbers(x_m.shape, mu_k.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def one(k):
        k1, k2 = jax.random.split(k)
        x = x_m + jnp.sqrt(x_v) * jax.random.normal(k1, x_m.shape)
        w = mu_k + jnp.sqrt(var_k) * jax.random.normal(k2, mu_k.shape)
        return jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                            dimension_numbers=dn)

    ys = jax.lax.map(one, jax.random.split(jax.random.PRNGKey(2), K),
                     batch_size=100)
    np.testing.assert_allclose(np.asarray(ys.mean(0)), np.asarray(m),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(ys.var(0)), np.asarray(v),
                               rtol=0.25, atol=0.02)


def test_gap_and_bn_shapes():
    m = jnp.ones((2, 4, 4, 8))
    v = jnp.full((2, 4, 4, 8), 0.1)
    gm, gv = gap_moments(m, v)
    assert gm.shape == (2, 8) and gv.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(gv), 0.1 / 16, rtol=1e-5)
    bm, bv = batchnorm_moments(jnp.asarray(np.random.default_rng(0).normal(
        size=(4, 4, 4, 8)).astype(np.float32)), v[:, :, :, :8] * 0 + 0.05,
        jnp.ones(8), jnp.zeros(8))
    assert bm.shape == (4, 4, 4, 8)


@pytest.mark.slow
def test_dvp_predict_against_mc(tmp_path):
    """Single-pass DVP predictions must agree with the full MC path on a
    tiny model (same argmax on a clear majority of samples, calibrated
    mean probabilities)."""
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.predict import make_predict_step
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    arch = ArchConfig(stage_sizes=(1, 1), width=8, image_size=32,
                      dtype=jnp.float32)
    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    arch)
    rng = np.random.default_rng(0)
    B = 6
    inputs = (jnp.asarray(rng.uniform(size=(B, 32, 32, 3)).astype(np.float32)),
              jnp.asarray(rng.uniform(size=(B, 32, 32, 3)).astype(np.float32)),
              jnp.asarray(rng.uniform(size=(B, 32, 32, 1)).astype(np.float32)))
    key = jax.random.PRNGKey(1)

    mc_step = make_predict_step(bundle, 128, impl="jnp",
                                sample_dtype=jnp.float32)
    mc = mc_step(bundle.post, bundle.batch_stats, inputs, key)

    dvp_step = make_dvp_predict_step(bundle, num_feature_samples=128)
    dvp = dvp_step(bundle.post, bundle.batch_stats, inputs, key)

    assert dvp["mean_prob"].shape == mc["mean_prob"].shape
    # NOTE: MC uses train-mode BN (batch stats), DVP approximates BN from
    # the moment maps — distributions differ somewhat; require agreement in
    # prediction and rough agreement in probabilities.
    agree = float(np.mean(np.asarray(dvp["predicted"]) ==
                          np.asarray(mc["predicted"])))
    prob_diff = float(np.abs(np.asarray(dvp["mean_prob"]) -
                             np.asarray(mc["mean_prob"])).mean())
    assert agree >= 0.5, f"DVP/MC argmax agreement too low: {agree}"
    assert prob_diff < 0.25, f"DVP/MC prob divergence too high: {prob_diff}"
    assert np.isfinite(np.asarray(dvp["predictive_uncertainty"])).all()


def test_unimodal_dvp(tmp_path):
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.moment import make_unimodal_dvp_predict_step
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_unimodal_bundle,
    )

    arch = ArchConfig(stage_sizes=(1, 1), width=8, image_size=32,
                      dtype=jnp.float32)
    bundle = make_unimodal_bundle(3, 4, BNNPriorSpec(), jax.random.PRNGKey(0),
                                  arch)
    step = make_unimodal_dvp_predict_step(bundle, num_feature_samples=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32, 3))
    out = step(bundle.post, bundle.batch_stats, (x,), jax.random.PRNGKey(2))
    assert out["predicted"].shape == (3,)
    assert out["mean_prob"].shape == (3, 4)
    assert np.isfinite(np.asarray(out["mean_prob"])).all()


def test_dvp_guardrail_trips_on_spread_posterior(caplog):
    """VERDICT r2 #6: DVP is validated only near MOPED-tight posteriors;
    a deliberately-spread posterior must trip the build-time guardrail —
    warning by default, exact-MC fallback with on_excess='mc'."""
    import logging

    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    TINY = ArchConfig.tiny()

    from multimodal_auv_tpu.bayes import softplus_inv
    from multimodal_auv_tpu.engine.moment import (
        make_dvp_predict_step,
        posterior_spread,
    )

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    TINY)
    # MOPED init: spread ~= moped_delta = 0.1 -> below the 0.15 threshold
    assert posterior_spread(bundle.post, bundle.meta) < 0.15
    with caplog.at_level(logging.WARNING):
        make_dvp_predict_step(bundle, num_feature_samples=2)
    assert not any("guardrail" in r.message for r in caplog.records)

    # spread the posterior to sigma = 0.5|mu|
    import numpy as np

    mu = np.asarray(bundle.post.mu)
    rho = np.log(np.expm1(np.maximum(0.5 * np.abs(mu), 1e-6))).astype(
        np.float32)
    bundle.post = bundle.post.replace(rho=jnp.asarray(rho))
    assert posterior_spread(bundle.post, bundle.meta) > 0.15

    caplog.clear()
    with caplog.at_level(logging.WARNING):
        make_dvp_predict_step(bundle, num_feature_samples=2)
    assert any("guardrail" in r.message for r in caplog.records)

    # on_excess='mc': the returned step IS the exact MC predict step
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        step = make_dvp_predict_step(bundle, num_feature_samples=2,
                                     on_excess="mc")
    assert any("falling back" in r.message for r in caplog.records)
    from multimodal_auv_tpu.engine.predict import make_predict_step

    rng = np.random.default_rng(0)
    s = TINY.image_size
    inputs = tuple(jnp.asarray(rng.uniform(size=(2, s, s, c)), jnp.float32)
                   for c in (3, 3, 1))
    key = jax.random.PRNGKey(5)
    got = step(bundle.post, bundle.batch_stats, inputs, key)
    want = make_predict_step(bundle, 2)(bundle.post, bundle.batch_stats,
                                        inputs, key)
    np.testing.assert_array_equal(np.asarray(got["predicted"]),
                                  np.asarray(want["predicted"]))
    np.testing.assert_allclose(np.asarray(got["predictive_uncertainty"]),
                               np.asarray(want["predictive_uncertainty"]))


def test_dvp_return_mode_reports_built_program():
    """return_mode=True is the ONE authoritative record of whether the
    guardrail fell back: callers (serving.py's artifact export) must not
    re-derive the spread-vs-threshold decision themselves."""
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.moment import (
        make_dvp_predict_step,
        posterior_spread,
    )
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    bundle = make_multimodal_bundle(4, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ArchConfig.tiny())
    _, mode = make_dvp_predict_step(bundle, num_feature_samples=2,
                                    return_mode=True)
    assert mode == "dvp"

    mu = np.asarray(bundle.post.mu)
    rho = np.log(np.expm1(np.maximum(0.5 * np.abs(mu), 1e-6))).astype(
        np.float32)
    bundle.post = bundle.post.replace(rho=jnp.asarray(rho))
    assert posterior_spread(bundle.post, bundle.meta) > 0.15
    step, mode = make_dvp_predict_step(bundle, num_feature_samples=2,
                                       on_excess="mc", return_mode=True)
    assert mode == "mc" and callable(step)


def test_dvp_rejects_unknown_on_excess():
    """An unrecognised on_excess would silently behave as 'warn' — the
    silent-accuracy-loss path the guardrail exists to prevent — so the
    builder must reject it loudly."""
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.moment import make_dvp_predict_step
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    bundle = make_multimodal_bundle(3, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ArchConfig.tiny())
    with pytest.raises(ValueError, match="on_excess"):
        make_dvp_predict_step(bundle, num_feature_samples=2,
                              on_excess="exact")
