"""Deterministic variance propagation (DVP) — single probabilistic forward
pass.

An optional fast-inference mode beyond the reference's capabilities
(literature: single-pass BNN acceleration via moment propagation, see
PAPERS.md): instead of num_mc sampled forwards, propagate the activation
mean and (diagonal) variance analytically through the trunks —

  conv/dense:  m' = conv(m, Mw);  v' = conv(v, Mw^2) + conv(m^2 + v, Vw)
  ReLU:        Gaussian closed form via Phi/phi
  BatchNorm:   train-mode stats of the mean map (+ mean input variance)
  pool/GAP:    max-of-means / independence-sum approximations

and Monte-Carlo sample only the *feature* distribution into the tiny
fusion/classifier head. Cost: ~2 deterministic trunk passes instead of
num_mc sampled ones (~10x at 20 MC), at a documented approximation cost
(diagonal covariance, moment-matched ReLU, BN/pool approximations).

This mode is OPT-IN (`run DVP` via engine.moment.make_dvp_predict_step);
the default MC path retains exact reference estimator semantics.
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_auv_tpu.bayes import PackMeta, PackedPosterior
from multimodal_auv_tpu.engine import uncertainty as U

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


# ---------------------------------------------------------------------------
# moment primitives
# ---------------------------------------------------------------------------

def relu_moments(m: jax.Array, v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """E[max(0,X)], Var[max(0,X)] for X ~ N(m, v), elementwise."""
    sd = jnp.sqrt(jnp.maximum(v, 1e-12))
    a = m / sd
    cdf = 0.5 * (1.0 + jax.lax.erf(a / _SQRT2))
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * a * a)
    mean = m * cdf + sd * pdf
    second = (m * m + v) * cdf + m * sd * pdf
    var = jnp.maximum(second - mean * mean, 0.0)
    # degenerate v -> plain ReLU
    mean = jnp.where(v <= 1e-12, jnp.maximum(m, 0.0), mean)
    var = jnp.where(v <= 1e-12, 0.0, var)
    return mean, var


def conv_moments(m, v, mu_k, var_k, *, strides, padding):
    """Gaussian weights (mu_k, var_k), independent of inputs with moments
    (m, v): m' = m * Mw ; v' = v * Mw^2 + (m^2 + v) * Vw (elementwise
    notation; * = convolution)."""
    dn = jax.lax.conv_dimension_numbers(m.shape, mu_k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, window_strides=strides, padding=padding, dimension_numbers=dn)
    m_out = conv(m, mu_k)
    v_out = conv(v, mu_k * mu_k) + conv(m * m + v, var_k)
    return m_out, jnp.maximum(v_out, 0.0)


def dense_moments(m, v, mu_w, var_w, mu_b=None, var_b=None):
    m_out = m @ mu_w
    v_out = v @ (mu_w * mu_w) + (m * m + v) @ var_w
    if mu_b is not None:
        m_out = m_out + mu_b
    if var_b is not None:
        v_out = v_out + var_b
    return m_out, jnp.maximum(v_out, 0.0)


def batchnorm_moments(m, v, scale, bias, eps=1e-5):
    """Train-mode BN approximation: batch statistics from the mean map plus
    the average input variance; output variance scaled by the same factor."""
    axes = tuple(range(m.ndim - 1))
    bm = jnp.mean(m, axis=axes)
    bv = jnp.var(m, axis=axes) + jnp.mean(v, axis=axes)
    inv = scale / jnp.sqrt(bv + eps)
    m_out = (m - bm) * inv + bias
    v_out = v * (inv * inv)
    return m_out, v_out


def maxpool_moments(m, v, window=(3, 3), strides=(2, 2), padding=((1, 1), (1, 1))):
    """Max-of-means approximation; variance taken at the max positions
    (approximated by max-pooling the variance map — an upper bound)."""
    pads = ((0, 0), padding[0], padding[1], (0, 0))
    m_out = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                  (1,) + window + (1,),
                                  (1,) + strides + (1,), pads)
    v_out = jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                  (1,) + window + (1,),
                                  (1,) + strides + (1,), pads)
    return m_out, v_out


def gap_moments(m, v):
    """Global average pool: mean of means; variance / N under independence."""
    n = m.shape[1] * m.shape[2]
    return jnp.mean(m, axis=(1, 2)), jnp.sum(v, axis=(1, 2)) / (n * n)


# ---------------------------------------------------------------------------
# moment ResNet trunk (mirrors models/resnet.py topology)
# ---------------------------------------------------------------------------

def _g(tree, *path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _conv_m(mp, vp, name, m, v, stride):
    kernel = _g(mp, name, "kernel")
    p = kernel.shape[0] // 2  # torch-style symmetric padding (resnet.py)
    return conv_moments(m, v, kernel, _g(vp, name, "kernel"),
                        strides=(stride, stride), padding=[(p, p), (p, p)])


def _bn_m(mp, name, m, v):
    return batchnorm_moments(m, v, _g(mp, name, "scale"), _g(mp, name, "bias"))


def _bottleneck_moments(mp, vp, m, v, stride, downsample):
    im, iv = m, v
    m, v = _conv_m(mp, vp, "conv1", m, v, 1)
    m, v = _bn_m(mp, "bn1", m, v)
    m, v = relu_moments(m, v)
    m, v = _conv_m(mp, vp, "conv2", m, v, stride)
    m, v = _bn_m(mp, "bn2", m, v)
    m, v = relu_moments(m, v)
    m, v = _conv_m(mp, vp, "conv3", m, v, 1)
    m, v = _bn_m(mp, "bn3", m, v)
    if downsample:
        im, iv = _conv_m(mp, vp, "downsample_conv", im, iv, stride)
        im, iv = _bn_m(mp, "downsample_bn", im, iv)
    return relu_moments(m + im, v + iv)


def moment_resnet_features(mu_params: Dict, var_params: Dict, x: jax.Array,
                           stage_sizes=(3, 4, 6, 3)) -> Tuple[jax.Array, jax.Array]:
    """(mean, var) of the 2048-d pooled features for deterministic input x."""
    m, v = conv_moments(x, jnp.zeros_like(x),
                        _g(mu_params, "conv1", "kernel"),
                        _g(var_params, "conv1", "kernel"),
                        strides=(2, 2), padding=[(3, 3), (3, 3)])
    m, v = _bn_m(mu_params, "bn1", m, v)
    m, v = relu_moments(m, v)
    m, v = maxpool_moments(m, v)
    for stage, blocks in enumerate(stage_sizes):
        for blk in range(blocks):
            stride = 2 if (stage > 0 and blk == 0) else 1
            name = f"layer{stage + 1}_{blk}"
            m, v = _bottleneck_moments(_g(mu_params, name), _g(var_params, name),
                                       m, v, stride, downsample=(blk == 0))
    return gap_moments(m, v)


# ---------------------------------------------------------------------------
# DVP predict step for the multimodal model
# ---------------------------------------------------------------------------

def _split_trees(meta: PackMeta, post: PackedPosterior):
    sigma = jax.nn.softplus(post.rho)
    mu_tree = meta.unpack(post.mu, post.det)
    zero_det = jax.tree_util.tree_map(jnp.zeros_like, post.det)
    var_tree = meta.unpack(sigma * sigma, zero_det)
    return mu_tree, var_tree


def _sample_dense(mu_node, var_node, x, key):
    w = mu_node["kernel"] + jnp.sqrt(var_node["kernel"]) * jax.random.normal(
        key, mu_node["kernel"].shape)
    b = mu_node["bias"] + jnp.sqrt(var_node["bias"]) * jax.random.normal(
        jax.random.fold_in(key, 1), mu_node["bias"].shape)
    return x @ w + b


def make_unimodal_dvp_predict_step(bundle, num_feature_samples: int = 20):
    """Single-pass DVP for a unimodal ResNet50Custom bundle: moment-propagate
    the trunk, MC-sample feature noise + the fc head only."""
    meta = bundle.meta
    stage_sizes = tuple(bundle.module.stage_sizes)

    @jax.jit
    def step(post, batch_stats, inputs, key, mask=None):
        # mask: accepted for predict-step signature compatibility, unused
        # (same rationale as make_dvp_predict_step's step)
        del batch_stats, mask
        mu_tree, var_tree = _split_trees(meta, post)
        (x,) = inputs
        fm, fv = moment_resnet_features(mu_tree["model"], var_tree["model"],
                                        x.astype(jnp.float32), stage_sizes)

        def head_one(k):
            f = fm + jnp.sqrt(fv) * jax.random.normal(k, fm.shape)
            return _sample_dense(mu_tree["model"]["fc"],
                                 var_tree["model"]["fc"], f,
                                 jax.random.fold_in(k, 7))

        logits = jax.vmap(head_one)(jax.random.split(key, num_feature_samples))
        probs = U.softmax_probs(logits)
        pred = U.predicted_class(probs)
        pu = U.variance_uncertainty(probs)
        au = U.aleatoric_uncertainty(probs, eps=1e-7)
        return {
            "predicted": pred,
            "predictive_uncertainty": pu,
            "aleatoric_uncertainty": au,
            "mean_prob": U.mean_probs(probs),
            # schema parity with engine.predict steps: serving loops fetch
            # the CSV columns in one D2H transfer
            "csv_cols": jnp.stack([pred.astype(jnp.float32),
                                   pu.astype(jnp.float32),
                                   au.astype(jnp.float32)]),
        }

    return step


def posterior_spread(post: PackedPosterior, meta: Optional[PackMeta] = None
                     ) -> float:
    """Mean relative posterior width, mean(sigma / |mu|), over the real
    (non-pad) packed region — the cheap statistic gating DVP fidelity.

    DVP's accuracy was validated at MOPED-tight posteriors
    (sigma = moped_delta*|w| = 0.1|w| with the default BNNPriorSpec,
    i.e. spread ~= 0.1: argmax agreement 1.0, max softmax diff 3e-4 vs
    20-MC on the full model — BENCH_NOTES.md) and the approximation error
    grows as training spreads the posterior."""
    import numpy as np

    n = meta.n_real if meta is not None else post.mu.shape[0]
    mu = np.asarray(post.mu[:n], np.float32)
    sigma = np.logaddexp(np.asarray(post.rho[:n], np.float32), 0.0)
    return float(np.mean(sigma / (np.abs(mu) + 1e-8)))


# 1.5x the MOPED-validated regime (spread ~= moped_delta = 0.1 at the
# default init); beyond this the silent-accuracy-loss risk outweighs
# DVP's speedup and the guardrail trips. Measured on-chip
# (scripts/probe_dvp_spread.py, BENCH_NOTES round 3): argmax agreement
# holds 1.00 through spread 0.3 and first breaks at 0.5, so 0.15 is
# conservative for class decisions; it is kept because the uncertainty
# heads' fidelity beyond it cannot be bounded by that probe.
DVP_SPREAD_THRESHOLD = 0.15


def make_dvp_predict_step(bundle, num_feature_samples: int = 20, *,
                          spread_threshold: float = DVP_SPREAD_THRESHOLD,
                          on_excess: str = "warn",
                          packed_inputs: bool = False,
                          mc_chunk=None, impl: str = "auto",
                          return_mode: bool = False,
                          spread: float = None):
    """Single-probabilistic-pass predict step: moment-propagated trunks +
    MC over feature noise and head weights only. Same output schema as
    engine.predict.make_predict_step.

    Guardrail (round-2 verdict #6): DVP is estimator-approximate and only
    validated near MOPED-tight posteriors. At build time the posterior
    spread (``posterior_spread``) is measured against
    ``spread_threshold``; beyond it, ``on_excess`` decides:
      * "warn" (default) — log a warning and proceed (caller opted in);
      * "mc"             — fall back to the EXACT MC predict step with
                            ``num_feature_samples`` draws (safe default
                            for serving configs that must not silently
                            lose accuracy).

    ``mc_chunk``/``impl`` configure the exact-MC step the fallback builds
    (they are meaningless to the DVP program itself). ``return_mode=True``
    returns ``(step, mode)`` with mode ``"dvp"`` or ``"mc"`` — the ONE
    authoritative record of which program was built (callers must not
    re-derive the spread-vs-threshold decision; serving.py records this in
    the artifact's meta.json). ``spread`` accepts a precomputed
    ``posterior_spread`` value so a caller that already measured it (the
    serving exporter records it in meta.json) doesn't pay the full-posterior
    numpy pass twice.
    """
    import logging

    if on_excess not in ("warn", "mc"):
        # anything unrecognised would silently behave as "warn" — the exact
        # silent-accuracy-loss path the guardrail exists to prevent
        raise ValueError(
            f"on_excess must be 'warn' or 'mc', got {on_excess!r}")

    def _ret(step, mode):
        return (step, mode) if return_mode else step

    if spread is None:
        spread = posterior_spread(bundle.post, bundle.meta)
    if spread > spread_threshold:
        logger = logging.getLogger(__name__)
        if on_excess == "mc":
            logger.warning(
                "DVP guardrail: posterior spread %.3f exceeds the validated "
                "regime (threshold %.3f) — falling back to the exact MC "
                "predict step (%d draws).", spread, spread_threshold,
                num_feature_samples)
            if packed_inputs:
                from multimodal_auv_tpu.engine.predict import (
                    make_packed_predict_step,
                )

                return _ret(make_packed_predict_step(
                    bundle, num_feature_samples, mc_chunk=mc_chunk,
                    impl=impl), "mc")
            from multimodal_auv_tpu.engine.predict import make_predict_step

            return _ret(make_predict_step(
                bundle, num_feature_samples, mc_chunk=mc_chunk, impl=impl),
                "mc")
        logger.warning(
            "DVP guardrail: posterior spread %.3f exceeds the validated "
            "regime (threshold %.3f, BENCH_NOTES.md) — DVP estimators may "
            "diverge from exact MC; pass on_excess='mc' to auto-fall-back.",
            spread, spread_threshold)

    meta = bundle.meta
    module = bundle.module
    stage_sizes = tuple(module.stage_sizes)

    @jax.jit
    def step(post, batch_stats, inputs, key, mask=None):
        # mask: accepted for serving-loop signature compatibility but NOT
        # used — DVP's moment BN is computed from the mean map including
        # any padded ragged-tail rows (an extra approximation on top of an
        # already-approximate mode; exact MC remains the default path).
        del batch_stats, mask  # trunk BN handled by the moment approximation
        if packed_inputs:
            from multimodal_auv_tpu.ops.preprocess import normalize_multimodal

            inputs = normalize_multimodal(*inputs)
        mu_tree, var_tree = _split_trees(meta, post)
        main, bathy, sss = inputs
        feats = []
        for name, x in (("image_model_feat", main),
                        ("bathy_model_feat", bathy),
                        ("sss_model_feat", sss)):
            fm, fv = moment_resnet_features(
                mu_tree[name], var_tree[name], x.astype(jnp.float32),
                stage_sizes)
            feats.append((fm, fv))

        # sample feature noise + head weights; run the tiny head in MC
        def head_one(k):
            ks = jax.random.split(k, 7)
            outs = []
            for i, ((fm, fv), mod) in enumerate(zip(
                    feats, ("image", "bathy", "sss"))):
                f = fm + jnp.sqrt(fv) * jax.random.normal(ks[i], fm.shape)
                att = f"attention_{mod}"
                att_mu, att_var = mu_tree[att], var_tree[att]

                def dense(x, leaf, kk):
                    w = att_mu[leaf]["kernel"] + jnp.sqrt(
                        att_var[leaf]["kernel"]) * jax.random.normal(
                        kk, att_mu[leaf]["kernel"].shape)
                    b = att_mu[leaf]["bias"] + jnp.sqrt(
                        att_var[leaf]["bias"]) * jax.random.normal(
                        jax.random.fold_in(kk, 1),
                        att_mu[leaf]["bias"].shape)
                    return x @ w + b

                kq = jax.random.fold_in(ks[i], 10)
                keys_ = dense(f, "key_projection", jax.random.fold_in(kq, 0))
                vals = dense(f, "value_projection", jax.random.fold_in(kq, 1))
                quer = dense(f, "query_projection", jax.random.fold_in(kq, 2))
                scores = jnp.tanh(quer + keys_)
                wts = jax.nn.softmax(
                    dense(scores, "attention_mechanism",
                          jax.random.fold_in(kq, 3)), axis=1)
                outs.append(vals * wts)
            x = jnp.concatenate(outs, axis=1)
            for i, fc in enumerate(("fc", "fc1", "fc2")):
                w = mu_tree[fc]["kernel"] + jnp.sqrt(
                    var_tree[fc]["kernel"]) * jax.random.normal(
                    jax.random.fold_in(ks[3 + i], 0),
                    mu_tree[fc]["kernel"].shape)
                b = mu_tree[fc]["bias"] + jnp.sqrt(
                    var_tree[fc]["bias"]) * jax.random.normal(
                    jax.random.fold_in(ks[3 + i], 1),
                    mu_tree[fc]["bias"].shape)
                x = x @ w + b
            return x

        logits = jax.vmap(head_one)(
            jax.random.split(key, num_feature_samples))
        probs = U.softmax_probs(logits)
        pred = U.predicted_class(probs)
        pu = U.variance_uncertainty(probs)
        au = U.aleatoric_uncertainty(probs, eps=1e-7)
        return {
            "predicted": pred,
            "predictive_uncertainty": pu,
            "aleatoric_uncertainty": au,
            "mean_prob": U.mean_probs(probs),
            "csv_cols": jnp.stack([pred.astype(jnp.float32),
                                   pu.astype(jnp.float32),
                                   au.astype(jnp.float32)]),
        }

    return _ret(step, "dvp")
