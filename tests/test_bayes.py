"""Golden tests for the packed variational posterior (bayes/packing.py).

Mirrors the spirit of the reference's "Bayesianness audit"
(/root/reference/unittests/test_model.py:115-168): every Conv/Dense leaf
must be variational, KL must match the closed form, MOPED init must match
bayesian-torch's parameterisation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_auv_tpu.bayes import (
    bayesianize,
    iter_variational_paths,
    kl_divergence,
    mean_params,
    sample_weights,
    softplus_inv,
)
from multimodal_auv_tpu.config import BNNPriorSpec

SPEC = BNNPriorSpec()


def tiny_params():
    k = jax.random.PRNGKey(0)
    return {
        "Conv_0": {"kernel": jax.random.normal(k, (3, 3, 2, 4))},
        "BatchNorm_0": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
        "Dense_0": {
            "kernel": jax.random.normal(jax.random.fold_in(k, 1), (4, 5)),
            "bias": jnp.zeros((5,)),
        },
    }


def test_variational_selection():
    paths = [p for p, _ in iter_variational_paths(tiny_params())]
    assert (("Conv_0", "kernel")) in paths
    assert (("Dense_0", "kernel")) in paths
    assert (("Dense_0", "bias")) in paths
    # BatchNorm stays deterministic (dnn_to_bnn only converts Conv/Linear/LSTM)
    assert not any(p[0] == "BatchNorm_0" for p in paths)


def test_pack_unpack_roundtrip():
    params = tiny_params()
    post, meta = bayesianize(params, SPEC)
    rebuilt = mean_params(post, meta)
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        got = rebuilt
        for p in path:
            got = got[p.key]
        np.testing.assert_allclose(np.asarray(got), np.asarray(leaf), rtol=1e-6)
    # padding to multiple of 1024 with zero-KL values
    assert post.mu.shape[0] % 1024 == 0
    assert meta.n_real == 3 * 3 * 2 * 4 + 4 * 5 + 5


def test_moped_init_matches_bayesian_torch_parameterisation():
    params = tiny_params()
    post, meta = bayesianize(params, SPEC)
    w = np.asarray(jnp.ravel(params["Conv_0"]["kernel"]))
    e = meta.entries[
        [i for i, en in enumerate(meta.entries) if en.path == ("Conv_0", "kernel")][0]
    ]
    mu = np.asarray(post.mu[e.offset : e.offset + e.size])
    rho = np.asarray(post.rho[e.offset : e.offset + e.size])
    np.testing.assert_allclose(mu, w, rtol=1e-6)
    # sigma = softplus(rho) == moped_delta * |w|
    sigma = np.log1p(np.exp(rho))
    np.testing.assert_allclose(sigma, 0.1 * np.abs(w), rtol=1e-3, atol=1e-8)


def test_non_moped_init():
    spec = BNNPriorSpec(moped_enable=False)
    post, meta = bayesianize(tiny_params(), spec, rng=jax.random.PRNGKey(3))
    # bayesian-torch draws BOTH with std 0.1: .normal_(init, 0.1) in each
    # layer's init_parameters (mu around 0.0, rho around -3.0)
    rho = np.asarray(post.rho[: meta.n_real])
    assert abs(rho.mean() + 3.0) < 0.05 and 0.05 < rho.std() < 0.2
    mu = np.asarray(post.mu[: meta.n_real])
    assert abs(mu.mean()) < 0.05 and 0.05 < mu.std() < 0.2


def test_kl_closed_form_golden():
    # Single-leaf posterior with hand-computable KL.
    params = {"Dense_0": {"kernel": jnp.array([[0.5]]), "bias": jnp.array([0.0])}}
    spec = BNNPriorSpec(prior_mu=0.0, prior_sigma=1.0, moped_enable=True, moped_delta=0.1)
    post, meta = bayesianize(params, spec)
    kl = float(kl_divergence(post, spec))

    def kl_elem(mu, sigma):
        return np.log(1.0 / sigma) + (sigma**2 + mu**2) / 2.0 - 0.5

    expected = kl_elem(0.5, 0.05) + kl_elem(0.0, 0.1 * 1e-11)  # bias sigma clamped
    # bias term: sigma = softplus(softplus_inv(max(0.1*0, 1e-12))) = 1e-12
    expected = kl_elem(0.5, 0.05) + kl_elem(0.0, 1e-12)
    assert kl == pytest.approx(expected, rel=1e-3)
    # pad region contributes zero
    assert float(jnp.log1p(jnp.exp(softplus_inv(1.0)))) == pytest.approx(1.0, rel=1e-4)


def test_sampling_statistics_jnp():
    params = {"Dense_0": {"kernel": jnp.full((64, 64), 2.0), "bias": jnp.zeros((64,))}}
    spec = BNNPriorSpec(moped_delta=0.25)
    post, meta = bayesianize(params, spec)
    draws = sample_weights(post, jax.random.PRNGKey(0), impl="jnp")
    ws = jnp.stack(
        [sample_weights(post, jax.random.PRNGKey(i), impl="jnp") for i in range(64)]
    )
    e = next(en for en in meta.entries if en.path == ("Dense_0", "kernel"))
    kernel_region = np.asarray(ws[:, e.offset : e.offset + e.size])
    assert kernel_region.mean() == pytest.approx(2.0, abs=0.01)
    assert kernel_region.std() == pytest.approx(0.5, abs=0.02)
    assert draws.shape == post.mu.shape


def test_pallas_kernel_interpret_plumbing():
    """Validates kernel shapes/offsets in TPU-interpret mode on CPU.

    The CPU interpreter stubs `prng_random_bits` to zeros, so eps collapses
    to the deterministic Box–Muller value z0 = sqrt(-2*ln(2^-24)); we verify
    out == mu + softplus(rho)*z0 elementwise, which exercises the full
    mu/rho/output block plumbing. True randomness statistics are validated
    on real TPU hardware (scripts/validate_tpu.py / bench.py)."""
    from multimodal_auv_tpu.ops.sampling import gaussian_reparam

    P = 2048
    mu = jnp.arange(P, dtype=jnp.float32) * 1e-3
    rho = jnp.full((P,), softplus_inv(0.7))
    out = gaussian_reparam(mu, rho, jax.random.PRNGKey(7), num_draws=2,
                           impl="pallas_interpret")
    assert out.shape == (2, P)
    z0 = np.sqrt(-2.0 * np.log(1.0 / 16777216.0))
    expected = np.asarray(mu) + 0.7 * z0
    np.testing.assert_allclose(np.asarray(out[0]), expected, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), expected, rtol=1e-4)


def test_unpack_gradients_flow():
    params = tiny_params()
    post, meta = bayesianize(params, SPEC)

    def loss(post):
        w = sample_weights(post, jax.random.PRNGKey(0), impl="jnp")
        p = meta.unpack(w, post.det)
        return jnp.sum(p["Dense_0"]["kernel"] ** 2) + kl_divergence(post, SPEC) * 1e-6

    g = jax.grad(lambda mu: loss(post.replace(mu=mu)))(post.mu)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g[: meta.n_real]).sum()) > 0


def test_unpack_custom_vjp_matches_autodiff():
    """unpack's custom VJP (single-concatenation transpose, packing.py) must
    equal the default autodiff transpose (per-leaf pad+add) exactly — for
    both the flat-vector cotangent and the deterministic leaves' cotangents
    (BatchNorm scale/bias are trained through det)."""
    params = tiny_params()
    post, meta = bayesianize(params, SPEC)

    def loss_via(unpack_fn, w, det):
        p = unpack_fn(w, det)
        return sum(jnp.sum(jnp.sin(x.astype(jnp.float32)))
                   for x in jax.tree_util.tree_leaves(p))

    w, det = post.mu, post.det
    (v1, (gw1, gd1)) = jax.value_and_grad(
        lambda w, d: loss_via(meta.unpack, w, d), argnums=(0, 1))(w, det)
    (v2, (gw2, gd2)) = jax.value_and_grad(
        lambda w, d: loss_via(meta._unpack_impl, w, d), argnums=(0, 1))(w, det)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-6)
    assert (jax.tree_util.tree_structure(gd1)
            == jax.tree_util.tree_structure(det))
    for a, b in zip(jax.tree_util.tree_leaves(gd1),
                    jax.tree_util.tree_leaves(gd2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pack_tree_pad_value_preserves_zero_kl_invariant():
    """pack_tree must be able to rebuild a posterior array whose pad region
    keeps the zero-KL / zero-noise invariant: with pad_value = prior values
    the round trip pack_tree(unpack(x)) == x including the pad; the 0.0
    default is only for non-posterior payloads."""
    from multimodal_auv_tpu.bayes import softplus_inv

    spec = BNNPriorSpec(prior_mu=0.0, prior_sigma=1.0)
    post, meta = bayesianize(tiny_params(), spec)
    assert meta.n_padded > meta.n_real  # the fixture must exercise the pad
    mu_tree = meta.unpack(post.mu, post.det)
    packed = meta.pack_tree(mu_tree, pad_value=spec.prior_mu)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(post.mu))
    rho_tree = meta.unpack(post.rho, post.det)
    packed_rho = meta.pack_tree(
        rho_tree, pad_value=softplus_inv(spec.prior_sigma))
    np.testing.assert_allclose(np.asarray(packed_rho), np.asarray(post.rho),
                               rtol=1e-6)
