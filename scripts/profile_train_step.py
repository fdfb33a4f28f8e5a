"""Capture a narrow jax profiler trace of the compiled train step.

Compiles + warms up OUTSIDE the trace window, then traces exactly
``--iters`` executed steps — keeps the xplane small enough that the
Chrome-trace export isn't truncated (tracing the whole bench run produced
an 870 MB xplane whose JSON export dropped the device lanes).

Usage: python scripts/profile_train_step.py --batch 12 --num-mc 12 \
           --out /tmp/prof_train
"""
from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--num-mc", type=int, default=12)
    ap.add_argument("--mc-chunk", type=int, default=1)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--out", type=str, default="/tmp/prof_train")
    ap.add_argument("--predict", action="store_true",
                    help="profile the predict step instead")
    ap.add_argument("--pipelined", action="store_true",
                    help="predict mode: software-pipelined MC scan "
                         "(engine/mc.py pipelined=True)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))

    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
    from multimodal_auv_tpu.engine.predict import make_predict_step
    from multimodal_auv_tpu.engine.steps import make_train_step
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    spec = BNNPriorSpec()
    bundle = make_multimodal_bundle(7, spec, jax.random.PRNGKey(0),
                                    ArchConfig())
    s = 256
    key = jax.random.PRNGKey(1)
    batch = args.batch
    inputs = (jax.random.uniform(key, (batch, s, s, 3)),
              jax.random.uniform(key, (batch, s, s, 3)),
              jax.random.uniform(key, (batch, s, s, 1)))

    if args.predict:
        step_fn = make_predict_step(bundle, args.num_mc,
                                    pipelined=args.pipelined)
        post, bs = bundle.post, bundle.batch_stats

        def run(i):
            out = step_fn(post, bs, inputs, jax.random.fold_in(key, i))
            np.asarray(out["predicted"])
    else:
        tx = make_optimizer(1e-5, 1e-5)
        state = BayesTrainState(post=bundle.post,
                                opt_state=tx.init(bundle.post),
                                batch_stats=bundle.batch_stats,
                                step=jnp.zeros((), jnp.int32))
        step_fn = make_train_step(bundle.module, bundle.meta, spec, tx,
                                  num_mc=args.num_mc, mc_chunk=args.mc_chunk,
                                  donate=True)
        labels = jnp.zeros((batch,), jnp.int32)
        mask = jnp.ones((batch,))
        holder = {"state": state}

        def run(i):
            holder["state"], m = step_fn(holder["state"], inputs, labels,
                                         mask, jax.random.fold_in(key, i),
                                         0.5, float(batch))
            np.asarray(m["loss"])

    # compile + warmup outside the trace
    for i in range(2):
        run(100 + i)

    t0 = time.perf_counter()
    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            run(i)
    dt = time.perf_counter() - t0
    print(f"{args.iters} traced steps in {dt:.3f}s "
          f"({dt / args.iters * 1e3:.1f} ms/step incl. host)")


if __name__ == "__main__":
    main()
