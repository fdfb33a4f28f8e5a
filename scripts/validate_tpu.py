"""On-hardware validation suite — the checks that CPU cannot run.

Covers: Pallas sampling statistics (mean/std/independence/moments),
bf16-vs-f32 predictive agreement, pallas-vs-jnp estimator agreement, and
an end-to-end jitted predict step. Run on a machine with a real TPU:

    python scripts/validate_tpu.py
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  __file__.rsplit("/", 2)[0] + "/.jax_cache")


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
    return bool(ok)


def main():
    from multimodal_auv_tpu.bayes import softplus_inv
    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.engine.predict import make_predict_step
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )
    from multimodal_auv_tpu.ops.sampling import (
        gaussian_reparam,
        gaussian_shift_scale,
    )

    assert jax.default_backend() == "tpu", "run on a TPU host"
    results = []

    # 1. sampling statistics (sigma-variant kernel)
    P = 1024 * 64
    mu = jnp.full((P,), 1.5)
    sigma = jnp.full((P,), 0.7)
    f = jax.jit(lambda k: gaussian_shift_scale(mu, sigma, k, num_draws=8,
                                               impl="pallas"))
    x = np.asarray(f(jax.random.PRNGKey(7)))
    results.append(check("sampling mean", abs(x.mean() - 1.5) < 0.01,
                         f"{x.mean():.4f}"))
    results.append(check("sampling std", abs(x.std() - 0.7) < 0.01,
                         f"{x.std():.4f}"))
    results.append(check("draw independence",
                         np.abs(x[0] - x[1]).max() > 0.01))
    import scipy.stats as st

    results.append(check("skew ~ 0", abs(st.skew(x.ravel())) < 0.02,
                         f"{st.skew(x.ravel()):.4f}"))
    results.append(check("kurtosis ~ 0", abs(st.kurtosis(x.ravel())) < 0.02,
                         f"{st.kurtosis(x.ravel()):.4f}"))
    halves = np.corrcoef(x[0][:P // 2], x[0][P // 2:])[0, 1]
    results.append(check("block corr ~ 0", abs(halves) < 0.01, f"{halves:.4f}"))

    # 2. rho-variant kernel agrees with softplus semantics
    rho = jnp.full((P,), softplus_inv(0.7))
    y = np.asarray(gaussian_reparam(mu, rho, jax.random.PRNGKey(3),
                                    num_draws=4, impl="pallas"))
    results.append(check("rho-kernel std", abs(y.std() - 0.7) < 0.02,
                         f"{y.std():.4f}"))

    # 3. end-to-end predict: pallas vs jnp estimator agreement (tiny arch
    #    to keep the second compile affordable)
    arch = ArchConfig.tiny(image_size=64)
    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    arch)
    key = jax.random.PRNGKey(1)
    inputs = (jax.random.uniform(key, (4, 64, 64, 3)),
              jax.random.uniform(key, (4, 64, 64, 3)),
              jax.random.uniform(key, (4, 64, 64, 1)))
    outs = {}
    for impl in ("pallas", "jnp"):
        step = make_predict_step(bundle, 64, impl=impl)
        o = step(bundle.post, bundle.batch_stats, inputs, key)
        outs[impl] = {k: np.asarray(v) for k, v in o.items()}
    agree = np.abs(outs["pallas"]["mean_prob"] - outs["jnp"]["mean_prob"]).max()
    results.append(check("pallas/jnp mean_prob agree (64 MC)", agree < 0.05,
                         f"maxdiff={agree:.4f}"))
    pu = np.abs(outs["pallas"]["aleatoric_uncertainty"]
                - outs["jnp"]["aleatoric_uncertainty"]).max()
    results.append(check("aleatoric agree", pu < 0.05, f"maxdiff={pu:.4f}"))

    print(f"\n{sum(results)}/{len(results)} checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"total {time.time() - t0:.1f}s")
    sys.exit(rc)
