"""On-hardware validation suite — the checks that CPU cannot run.

Covers: Pallas sampling statistics (mean/std/independence/moments),
bf16-vs-f32 predictive agreement, pallas-vs-jnp estimator agreement, and
an end-to-end jitted predict step. Run on a machine with a real TPU:

    python scripts/validate_tpu.py
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))


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

    # 2b. fast-math bf16 split kernel (the inference default when sampling
    #     straight to bf16): trimmed bf16-budget polynomials — distribution
    #     must be indistinguishable at bf16
    from multimodal_auv_tpu.ops.sampling import gaussian_shift_scale_split

    ff = jax.jit(lambda k: gaussian_shift_scale_split(
        mu.astype(jnp.bfloat16), sigma.astype(jnp.bfloat16), k, 8,
        impl="pallas", out_dtype=jnp.bfloat16, fast_math=True))
    xf = np.stack([np.asarray(a, np.float32)
                   for a in ff(jax.random.PRNGKey(7))])
    results.append(check("fast-math sampling mean",
                         abs(xf.mean() - 1.5) < 0.01, f"{xf.mean():.4f}"))
    results.append(check("fast-math sampling std",
                         abs(xf.std() - 0.7) < 0.01, f"{xf.std():.4f}"))
    results.append(check("fast-math skew ~ 0",
                         abs(st.skew(xf.ravel())) < 0.02,
                         f"{st.skew(xf.ravel()):.4f}"))
    results.append(check("fast-math kurtosis ~ 0",
                         abs(st.kurtosis(xf.ravel())) < 0.03,
                         f"{st.kurtosis(xf.ravel()):.4f}"))
    results.append(check("fast-math draw independence",
                         np.abs(xf[0] - xf[1]).max() > 0.01))

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

    # 4. training machinery on-chip (round-2 verdict #5): one real train
    #    step — finite loss, no NaN-guard trip, posterior moved
    from multimodal_auv_tpu.engine.optim import BayesTrainState, make_optimizer
    from multimodal_auv_tpu.engine.steps import make_train_step

    spec = BNNPriorSpec()
    tx = make_optimizer(1e-3)
    state = BayesTrainState(post=bundle.post, opt_state=tx.init(bundle.post),
                            batch_stats=bundle.batch_stats,
                            step=jnp.zeros((), jnp.int32))
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    mask = jnp.ones((4,), jnp.float32)
    tstep = make_train_step(bundle.module, bundle.meta, spec, tx, num_mc=4)
    state_f32, m = tstep(state, inputs, labels, mask, key, 0.5, 4.0)
    loss = float(m["loss"])
    dmu = np.abs(np.asarray(state_f32.post.mu) - np.asarray(state.post.mu))
    results.append(check("train step loss finite", np.isfinite(loss),
                         f"{loss:.4f}"))
    results.append(check("train step not skipped", not bool(m["skipped"])))
    results.append(check("train step moved posterior", dmu.max() > 0,
                         f"max|dmu|={dmu.max():.2e}"))

    # 5. bf16-weights step tracks the f32 step ON-CHIP (same pins as the
    #    CPU test tests/test_engine.py::test_bf16_weight_sampling_...)
    tstep16 = make_train_step(bundle.module, bundle.meta, spec, tx,
                              num_mc=4, sample_dtype=jnp.bfloat16)
    state_b16, m16 = tstep16(state, inputs, labels, mask, key, 0.5, 4.0)
    loss16 = float(m16["loss"])
    upd32 = np.asarray(state_f32.post.mu) - np.asarray(state.post.mu)
    upd16 = np.asarray(state_b16.post.mu) - np.asarray(state.post.mu)
    cos = float(np.dot(upd32, upd16)
                / max(np.linalg.norm(upd32) * np.linalg.norm(upd16), 1e-30))
    results.append(check("bf16-weights loss tracks f32",
                         abs(loss16 - loss) / max(abs(loss), 1e-9) < 2e-2,
                         f"{loss16:.4f} vs {loss:.4f}"))
    results.append(check("bf16-weights update cosine > 0.98", cos > 0.98,
                         f"{cos:.4f}"))

    # 6. custom VJPs at FULL scale (the 73M-parameter flagship posterior):
    #    (a) the sampling VJP's in-backward eps REGENERATION must match the
    #    forward pass's eps on real hardware (the kernel re-derives eps
    #    from the PRNG key — bit-exactness of that path is chip-specific);
    #    (b) the unpack VJP's single-concat transpose vs XLA's autodiff.
    full = make_multimodal_bundle(7, spec, jax.random.PRNGKey(0), ArchConfig())
    mu_f = full.post.mu
    sigma_f = jax.nn.softplus(full.post.rho)
    k6 = jax.random.PRNGKey(11)
    w, vjp = jax.vjp(
        lambda m_, s_: gaussian_shift_scale(m_, s_, k6, num_draws=2,
                                            impl="pallas"), mu_f, sigma_f)
    eps_fwd = (np.asarray(w, np.float32) - np.asarray(mu_f)) \
        / np.maximum(np.asarray(sigma_f), 1e-30)
    g = jax.random.normal(jax.random.PRNGKey(12), w.shape, jnp.float32)
    dmu_c, dsigma_c = vjp(g.astype(w.dtype))
    gn = np.asarray(g)
    want_dmu = gn.sum(axis=0)
    want_dsigma = (gn * eps_fwd).sum(axis=0)
    e_mu = np.abs(np.asarray(dmu_c) - want_dmu).max()
    rel = np.linalg.norm(np.asarray(dsigma_c) - want_dsigma) \
        / max(np.linalg.norm(want_dsigma), 1e-30)
    results.append(check("sampling VJP dmu == sum(g) (73M)", e_mu < 1e-3,
                         f"maxerr={e_mu:.2e}"))
    results.append(check("sampling VJP eps regeneration (73M)", rel < 1e-3,
                         f"rel-L2={rel:.2e}"))

    meta_f, det_f = full.meta, full.post.det

    def loss_of(unpack):
        def f(w_):
            tree = unpack(w_, det_f)
            return sum(jnp.sum(l.astype(jnp.float32) ** 2)
                       for l in jax.tree_util.tree_leaves(tree))
        return f

    g_custom = np.asarray(jax.grad(loss_of(meta_f.unpack))(mu_f))
    g_auto = np.asarray(jax.grad(loss_of(meta_f._unpack_impl))(mu_f))
    e_unpack = np.abs(g_custom - g_auto).max()
    results.append(check("unpack VJP == autodiff transpose (73M)",
                         e_unpack == 0.0, f"maxerr={e_unpack:.2e}"))

    # AOT serving artifact on-chip: export the packed predict step for TPU,
    # reload, and pin it bit-exact against the in-process step (serving.py)
    import tempfile

    from multimodal_auv_tpu.engine.predict import make_packed_predict_step
    from multimodal_auv_tpu.serving import (export_predict_artifact,
                                            load_predict_artifact)

    small = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                   ArchConfig.tiny(image_size=64))
    d = tempfile.mkdtemp(prefix="auv_art_")
    export_predict_artifact(small, d, batch_size=2, num_mc_samples=4,
                            image_size=64)
    art = load_predict_artifact(d)
    rng = np.random.default_rng(0)
    u8 = (rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8),
          rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8),
          rng.integers(0, 255, (2, 64, 64, 1), dtype=np.uint8))
    k = jax.random.PRNGKey(5)
    got = art.predict(*u8, key=k)
    ref = make_packed_predict_step(small, 4)(
        small.post, small.batch_stats, u8, k, jnp.ones((2,), jnp.float32))
    e_art = np.abs(got["csv_cols"] - np.asarray(ref["csv_cols"])).max()
    results.append(check("AOT artifact == in-process step (on-chip)",
                         e_art == 0.0, f"maxerr={e_art:.2e}"))

    # streamed serving: predict_batches' host-folded keys must reproduce
    # per-batch predict with device-side fold_in subkeys, on hardware
    streamed = list(art.predict_batches([u8, u8], key=k))
    ref0 = art.predict(*u8, key=jax.random.fold_in(k, 0))
    ref1 = art.predict(*u8, key=jax.random.fold_in(k, 1))
    e_stream = max(
        np.abs(streamed[0]["csv_cols"] - ref0["csv_cols"]).max(),
        np.abs(streamed[1]["csv_cols"] - ref1["csv_cols"]).max())
    results.append(check("artifact lagged stream == per-batch (on-chip)",
                         e_stream == 0.0, f"maxerr={e_stream:.2e}"))

    # DVP artifact: same ABI, bit-exact vs the in-process DVP step
    from multimodal_auv_tpu.engine.moment import make_dvp_predict_step

    d2 = tempfile.mkdtemp(prefix="auv_art_dvp_")
    export_predict_artifact(small, d2, batch_size=2, num_mc_samples=4,
                            image_size=64, mode="dvp")
    art_dvp = load_predict_artifact(d2)
    got_dvp = art_dvp.predict(*u8, key=k)
    ref_dvp = make_dvp_predict_step(small, 4, packed_inputs=True)(
        small.post, small.batch_stats, u8, k, jnp.ones((2,), jnp.float32))
    e_dvp = np.abs(got_dvp["csv_cols"] - np.asarray(ref_dvp["csv_cols"])).max()
    results.append(check(
        "DVP artifact == in-process DVP step (on-chip)",
        art_dvp.mode == "dvp" and e_dvp == 0.0, f"maxerr={e_dvp:.2e}"))

    # HTTP host over the real chip: a seeded loopback POST (serve_http +
    # serve_client) must be bit-identical to artifact.predict with the
    # same key — pins the network path end-to-end on hardware
    import threading

    from multimodal_auv_tpu.serve_client import ServeClient
    from multimodal_auv_tpu.serve_http import make_server

    server = make_server(d, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        host, port = server.server_address[:2]
        c = ServeClient(f"http://{host}:{port}")
        got_http = c.predict(*u8, seed=123)
        with jax.default_device(jax.devices("cpu")[0]):
            k123 = np.asarray(jax.random.PRNGKey(123), np.uint32)
        ref_http = art.predict(*u8, key=k123)
        e_http = max(
            np.abs(got_http["predicted"]
                   - np.asarray(ref_http["predicted"])).max(),
            np.abs(got_http["mean_prob"]
                   - np.round(np.asarray(ref_http["mean_prob"], np.float64),
                              6)).max())
        results.append(check("HTTP host == artifact.predict (on-chip)",
                             e_http == 0.0 and c.healthz()["status"] == "ok",
                             f"maxerr={e_http:.2e}"))
    finally:
        server.shutdown()
        server.server_close()

    print(f"\n{sum(results)}/{len(results)} checks passed")
    return 0 if all(results) else 1


if __name__ == "__main__":
    t0 = time.time()
    rc = main()
    print(f"total {time.time() - t0:.1f}s")
    sys.exit(rc)
