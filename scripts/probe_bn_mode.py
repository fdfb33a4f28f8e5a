"""A/B the predict-path BatchNorm mode at the flagship operating point.

Round-4 verdict #4: the reference runs BN in TRAIN mode on every eval /
inference path (inference/predictors.py:27, train/multimodal.py:232), so
our predict steps reproduce that — at a cost BENCH_NOTES (round 2) priced
at ~0.8 ms/draw of batch-moment work, ~20% of the ~3.6 ms/draw b4x20MC
step. This probe measures the opt-in alternative (bn_mode="eval": frozen
running statistics, engine/predict.py) the way every other fast-path
candidate was judged:

  1. PERF: same-session alternated A/B timings (train vs eval mode) at
     the flagship b4x20MC geometry — tunnel variance makes anything else
     meaningless (BENCH_NOTES "measurement gotchas").
  2. FIDELITY: on the same inputs/key, top-1 agreement, max/mean
     |Delta mean_prob| and relative deltas of both uncertainty heads,
     at MOPED-like spread (the production posterior regime) — eval-mode
     BN changes the function, so the divergence must be quantified before
     anyone flips the flag in production.

Run ON TPU (one process at a time):  python scripts/probe_bn_mode.py
Append the output to BENCH_NOTES.md's round-5 section.
"""
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine.predict import make_predict_step
from multimodal_auv_tpu.models.model_utils import ArchConfig, make_multimodal_bundle

BATCH = 4
NUM_MC = 20
ITERS = 5
ROUNDS = 4  # alternated A/B rounds (t(ITERS) totals, not t(1) marginals)


def _fence(out):
    # host copy: the only reliable completion fence through the axon tunnel
    return float(np.asarray(out["mean_prob"]).sum())


def _time_step(step, post, bs, inputs, key):
    t0 = time.perf_counter()
    for i in range(ITERS):
        out = step(post, bs, inputs, jax.random.fold_in(key, i))
    _fence(out)
    return time.perf_counter() - t0


def main():
    print(f"devices: {jax.devices()}", flush=True)
    arch = ArchConfig()
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    arch)
    s = arch.image_size
    key = jax.random.PRNGKey(1)
    inputs = (jax.random.uniform(key, (BATCH, s, s, 3), jnp.float32),
              jax.random.uniform(key, (BATCH, s, s, 3), jnp.float32),
              jax.random.uniform(key, (BATCH, s, s, 1), jnp.float32))

    steps = {m: make_predict_step(bundle, NUM_MC, bn_mode=m)
             for m in ("train", "eval")}

    # compile + warmup both programs before any timing
    outs = {}
    for m, st in steps.items():
        t0 = time.perf_counter()
        outs[m] = st(bundle.post, bundle.batch_stats, inputs,
                     jax.random.PRNGKey(2))
        _fence(outs[m])
        print(f"compile+warm {m}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        _fence(steps[m](bundle.post, bundle.batch_stats, inputs,
                        jax.random.PRNGKey(2)))

    # ---- fidelity on identical inputs + key -------------------------------
    a = {k: np.asarray(v, np.float32) for k, v in outs["train"].items()}
    b = {k: np.asarray(v, np.float32) for k, v in outs["eval"].items()}
    agree = float((a["predicted"] == b["predicted"]).mean())
    dprob = np.abs(a["mean_prob"] - b["mean_prob"])
    rel = lambda x, y: float(np.max(np.abs(x - y) / np.maximum(y, 1e-6)))
    print(f"fidelity (same key, random-batch inputs, MOPED posterior):")
    print(f"  top-1 agreement      : {agree:.3f}")
    print(f"  |d mean_prob| max/mean: {dprob.max():.4f} / {dprob.mean():.5f}")
    print(f"  predictive-unc rel-d : "
          f"{rel(b['predictive_uncertainty'], a['predictive_uncertainty']):.4f}")
    print(f"  aleatoric-unc  rel-d : "
          f"{rel(b['aleatoric_uncertainty'], a['aleatoric_uncertainty']):.4f}",
          flush=True)

    # ---- alternated A/B timings ------------------------------------------
    times = {"train": [], "eval": []}
    for r in range(ROUNDS):
        for m in ("train", "eval") if r % 2 == 0 else ("eval", "train"):
            dt = _time_step(steps[m], bundle.post, bundle.batch_stats,
                            inputs, jax.random.fold_in(key, 100 + r))
            times[m].append(dt)
            print(f"round {r} {m}: {dt:.3f}s "
                  f"({BATCH * ITERS / dt:.2f} patches/s)", flush=True)
    for m in ("train", "eval"):
        best = min(times[m])
        med = sorted(times[m])[len(times[m]) // 2]
        print(f"{m}: best {BATCH * ITERS / best:.2f} p/s, "
              f"median {BATCH * ITERS / med:.2f} p/s "
              f"(times {['%.3f' % t for t in times[m]]})")
    sp = {m: BATCH * ITERS / min(times[m]) for m in times}
    print(f"SPEEDUP eval/train: {sp['eval'] / sp['train']:.4f}x", flush=True)


if __name__ == "__main__":
    main()
