"""Monte-Carlo uncertainty estimators.

The reference uses **two different "predictive uncertainty" estimators** at
different call sites (SURVEY.md §2.4 note), and BASELINE.json requires
matching each call site's choice:

* variance estimator — inference (`inference/predictors.py:73`) and
  unimodal eval (`train/unimodal.py:296-301`): per-class variance of the
  MC softmax stack (torch.var, *unbiased*, correction=1), averaged over
  classes.
* entropy decomposition — multimodal eval (`train/multimodal.py:305-310`):
  predictive = entropy of the mean softmax; aleatoric = mean per-draw
  entropy; model (epistemic) = predictive - aleatoric.

Epsilons also differ per call site (1e-7 at inference/unimodal eval,
1e-8 at multimodal eval) and are preserved.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def softmax_probs(logits: jax.Array) -> jax.Array:
    """(num_mc, B, C) logits -> f32 softmax probabilities."""
    return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)


def mean_probs(probs: jax.Array) -> jax.Array:
    return jnp.mean(probs, axis=0)


def predicted_class(probs: jax.Array) -> jax.Array:
    return jnp.argmax(mean_probs(probs), axis=-1)


def variance_uncertainty(probs: jax.Array) -> jax.Array:
    """Mean over classes of the *unbiased* per-class MC variance
    (matches torch.var's default correction=1)."""
    return jnp.var(probs, axis=0, ddof=1).mean(axis=-1)


def entropy(p: jax.Array, eps: float) -> jax.Array:
    return -jnp.sum(p * jnp.log(p + eps), axis=-1)


def aleatoric_uncertainty(probs: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Mean over MC draws of the per-draw predictive entropy."""
    return jnp.mean(entropy(probs, eps), axis=0)


class EntropyDecomposition(NamedTuple):
    predictive: jax.Array  # total uncertainty: entropy of mean softmax
    aleatoric: jax.Array   # expected entropy
    model: jax.Array       # epistemic: predictive - aleatoric


def entropy_decomposition(probs: jax.Array, eps: float = 1e-8) -> EntropyDecomposition:
    predictive = entropy(mean_probs(probs), eps)
    aleatoric = jnp.mean(entropy(probs, eps), axis=0)
    return EntropyDecomposition(predictive, aleatoric, predictive - aleatoric)
