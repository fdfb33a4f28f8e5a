"""On-chip Monte-Carlo forward machinery.

The reference's hot loop is ``for _ in range(num_mc): model(...)`` in Python
(SURVEY.md §3.1) — num_mc sequential full forwards per batch. Here the MC
axis lives *inside one XLA program*: a ``lax.scan`` over MC chunks, each
chunk sampling its weights with one fused kernel (ops/sampling.py) and
running the forward under ``jax.vmap`` (or a plain call for chunk size 1,
which keeps convolutions in their most MXU-friendly unbatched-weights form).

Per-draw forwards are rematerialised (``jax.checkpoint``) so training
memory stays flat in num_mc.

BatchNorm note: all reference paths run BN in train mode — even eval and
inference (`train/multimodal.py:232`, `inference/predictors.py:27`) — so the
forward normalises by current-batch statistics and never reads the running
stats. We therefore keep batch_stats frozen inside the MC loop; training
refreshes them once per step outside the loop (see steps.py).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from multimodal_auv_tpu.bayes import PackMeta, PackedPosterior
from multimodal_auv_tpu.ops.sampling import gaussian_shift_scale


def mc_logits(
    module,
    meta: PackMeta,
    post: PackedPosterior,
    batch_stats,
    inputs: Tuple[Any, ...],
    key: jax.Array,
    num_mc: int,
    *,
    mc_chunk: int = 1,
    impl: str = "auto",
    train: bool = True,
    remat: bool = True,
    ws_sharding=None,
    sample_dtype=None,
    antithetic: bool = False,
) -> jax.Array:
    """Stacked logits over MC draws: (num_mc, batch, num_classes).

    ``ws_sharding``: optional NamedSharding for the (mc_chunk, P) weight
    stack — set to parallel.mesh.mc_sharding(mesh) to spread MC draws over
    the 'mc' mesh axis (ensemble parallelism).

    ``sample_dtype``: dtype for the sampled weights. Setting bfloat16 on the
    inference path pre-casts (mu, rho) once and samples straight to bf16,
    halving the sampling HBM traffic (the op is bandwidth-bound).

    ``antithetic``: pair each draw with its mirror (w, 2mu - w) — halves the
    on-chip RNG work and is a classic MC variance-reduction scheme. OFF by
    default: draws are then no longer i.i.d., which deviates from the
    reference's estimator semantics (BASELINE parity)."""
    draws_per_chunk = mc_chunk * (2 if antithetic else 1)
    if num_mc % draws_per_chunk != 0:
        raise ValueError(
            f"num_mc={num_mc} must be divisible by "
            f"{'2*' if antithetic else ''}mc_chunk={mc_chunk}")
    nchunks = num_mc // draws_per_chunk

    # sigma = softplus(rho) is loop-invariant across draws: computed once
    # per step (f32 for accuracy), then cast with mu for the sampling kernel.
    mu = post.mu
    sigma = jax.nn.softplus(post.rho.astype(jnp.float32))
    if sample_dtype is not None and mu.dtype != sample_dtype:
        mu = mu.astype(sample_dtype)
    if sample_dtype is not None:
        sigma = sigma.astype(sample_dtype)
    else:
        sigma = sigma.astype(mu.dtype)

    def fwd(w_flat):
        params = meta.unpack(w_flat, post.det)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            # train-mode BN normalises by current-batch stats; the running-stat
            # update it emits is discarded here (refreshed once per train step).
            out, _ = module.apply(variables, *inputs, train=True,
                                  mutable=["batch_stats"])
            return out
        return module.apply(variables, *inputs, train=False)

    if remat:
        fwd = jax.checkpoint(fwd)

    def chunk_step(_, k):
        ws = gaussian_shift_scale(mu, sigma, k, num_draws=mc_chunk, impl=impl,
                                  out_dtype=sample_dtype)
        if antithetic:
            mirror = (2.0 * mu.astype(jnp.float32)
                      - ws.astype(jnp.float32)).astype(ws.dtype)
            ws = jnp.concatenate([ws, mirror], axis=0)
        if ws_sharding is not None:
            ws = jax.lax.with_sharding_constraint(ws, ws_sharding)
        if ws_sharding is None and ws.shape[0] <= 4:
            # unrolled sequential forwards: unbatched weights keep convs in
            # their most MXU-efficient form (vmapped weights measured ~20%
            # slower); vmap only for large chunks or mc-axis sharding
            logits = jnp.stack([fwd(ws[i]) for i in range(ws.shape[0])])
        else:
            logits = jax.vmap(fwd)(ws)
        return None, logits

    keys = jax.random.split(key, nchunks)
    if nchunks == 1:
        _, logits = chunk_step(None, keys[0])
    else:
        _, logits = jax.lax.scan(chunk_step, None, keys)
        logits = logits.reshape((num_mc,) + logits.shape[2:])
    return logits


def refresh_batch_stats(module, meta, post, batch_stats, inputs):
    """One posterior-mean forward with mutable batch_stats to advance the
    running statistics (momentum 0.9, as torch BN momentum=0.1)."""
    params = meta.unpack(post.mu, post.det)
    _, updated = module.apply(
        {"params": params, "batch_stats": batch_stats},
        *inputs,
        train=True,
        mutable=["batch_stats"],
    )
    return updated["batch_stats"]
