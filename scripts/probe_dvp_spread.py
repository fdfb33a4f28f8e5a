"""Measure DVP fidelity vs posterior spread — data behind the guardrail.

``DVP_SPREAD_THRESHOLD = 0.15`` (engine/moment.py) was chosen as 1.5x the
MOPED-validated operating point (spread ~= moped_delta = 0.1, where
BENCH_NOTES records argmax agreement 1.0 / max softmax diff 3e-4). This
probe replaces the extrapolated margin with a measured error-vs-spread
curve on the FLAGSHIP model (full ResNet-50 trunks, 7 classes, 256x256):
for each spread s it sets sigma = s*|mu| on every variational leaf, runs
the DVP single-pass step and a 64-draw exact-MC reference on the same
batch, and reports argmax agreement, max/mean |Delta mean_prob|, and the
relative error of both uncertainty heads.

DVP's trunk moment propagation assumes sigma is small enough that the
ReLU/BN Gaussian closures hold (engine/moment.py:20-90); the curve shows
where that assumption visibly breaks. The estimator contract it must not
silently violate is inference/predictors.py:52-95 (reference).

Run ON TPU (one process at a time):  python scripts/probe_dvp_spread.py
Append the output table to BENCH_NOTES.md's round-3 section.
"""
import os
import sys
import time

# robust to relative __file__ (Python <=3.10 does not absolutize it)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.moment import (
    make_dvp_predict_step,
    posterior_spread,
)
from multimodal_auv_tpu.engine.predict import make_predict_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle

BATCH = 4
MC_REF = 64  # exact-MC reference draws (est. noise ~ 1/sqrt(64) per class)
SPREADS = (0.05, 0.10, 0.15, 0.20, 0.30, 0.50)


def set_spread(bundle, s):
    """sigma = s*|mu| on the real packed region (pad region untouched)."""
    n = bundle.meta.n_real
    mu = np.asarray(bundle.post.mu, np.float32).copy()
    rho = np.asarray(bundle.post.rho, np.float32).copy()
    sigma = np.maximum(s * np.abs(mu[:n]), 1e-12)
    rho[:n] = np.log(np.expm1(sigma))
    bundle.post = bundle.post.replace(rho=jnp.asarray(rho))
    return bundle


def main():
    print(f"devices: {jax.devices()}")
    arch = ArchConfig()
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    arch)
    rng = np.random.default_rng(0)
    s_img = arch.image_size
    inputs = tuple(
        jnp.asarray(rng.uniform(size=(BATCH, s_img, s_img, c)), jnp.float32)
        for c in (3, 3, 1))
    key = jax.random.PRNGKey(7)

    # one exact-MC step re-used at every spread (the posterior is an arg)
    mc_step = make_predict_step(bundle, MC_REF)

    print(f"spread | argmax agree | max|dP| | mean|dP| | rel dPU | rel dAU")
    rows = []
    for s in SPREADS:
        bundle = set_spread(bundle, s)
        measured = posterior_spread(bundle.post, bundle.meta)
        # rebuild DVP each time only to keep the API honest (jit cache hits
        # after the first); on_excess='warn' because we are deliberately
        # probing beyond the threshold
        dvp_step = make_dvp_predict_step(bundle, num_feature_samples=20,
                                         on_excess="warn")
        t0 = time.time()
        dvp = dvp_step(bundle.post, bundle.batch_stats, inputs, key)
        dvp = {k: np.asarray(v) for k, v in dvp.items()}
        t1 = time.time()
        ref = mc_step(bundle.post, bundle.batch_stats, inputs, key)
        ref = {k: np.asarray(v) for k, v in ref.items()}
        t2 = time.time()

        agree = float(np.mean(dvp["predicted"] == ref["predicted"]))
        dp = np.abs(dvp["mean_prob"] - ref["mean_prob"])
        rel_pu = float(np.max(np.abs(
            dvp["predictive_uncertainty"] - ref["predictive_uncertainty"])
            / (np.abs(ref["predictive_uncertainty"]) + 1e-8)))
        rel_au = float(np.max(np.abs(
            dvp["aleatoric_uncertainty"] - ref["aleatoric_uncertainty"])
            / (np.abs(ref["aleatoric_uncertainty"]) + 1e-8)))
        rows.append((measured, agree, float(dp.max()), float(dp.mean()),
                     rel_pu, rel_au))
        print(f"{measured:6.3f} | {agree:12.2f} | {dp.max():7.4f} | "
              f"{dp.mean():8.5f} | {rel_pu:7.4f} | {rel_au:7.4f}   "
              f"(dvp {t1 - t0:.1f}s, mc{MC_REF} {t2 - t1:.1f}s)")

    # MC estimator self-noise floor at the tightest spread: same config,
    # two disjoint key halves of the reference draws
    bundle = set_spread(bundle, SPREADS[0])
    half = make_predict_step(bundle, MC_REF // 2)
    a = half(bundle.post, bundle.batch_stats, inputs, key)
    b = half(bundle.post, bundle.batch_stats, inputs,
             jax.random.fold_in(key, 999))
    noise = float(np.abs(np.asarray(a["mean_prob"]) -
                         np.asarray(b["mean_prob"])).max())
    print(f"MC self-noise floor (two {MC_REF // 2}-draw estimates, "
          f"spread {SPREADS[0]}): max|dP| = {noise:.4f}")


if __name__ == "__main__":
    main()
