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

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_auv_tpu.bayes import PackMeta, PackedPosterior
from multimodal_auv_tpu.ops.sampling import (
    gaussian_shift_scale,
    gaussian_shift_scale_split,
)


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
    cast_posterior: bool = True,
    antithetic: bool = False,
    batch_mask=None,
    return_batch_stats: bool = False,
    split_sampling: bool = False,
    pipelined: bool = False,
    fast_sampling: Optional[bool] = None,
) -> jax.Array:
    """Stacked logits over MC draws: (num_mc, batch, num_classes).

    ``ws_sharding``: optional NamedSharding for the (mc_chunk, P) weight
    stack — set to parallel.mesh.mc_sharding(mesh) to spread MC draws over
    the 'mc' mesh axis (ensemble parallelism).

    ``sample_dtype``: dtype for the sampled weights. Setting bfloat16 on the
    inference path pre-casts (mu, rho) once and samples straight to bf16,
    halving the sampling HBM traffic (the op is bandwidth-bound).

    ``cast_posterior``: with ``sample_dtype`` set, also pre-cast (mu, sigma)
    to it (the inference default — halves the kernel's input reads).
    ``False`` keeps (mu, sigma) f32 and only the kernel's *output* is cast:
    the mixed-precision TRAINING mode — bf16 weights feed the (already
    bf16) convs, while the sampling VJP still returns f32 (mu, rho)
    cotangents, so cross-draw gradient accumulation in the MC scan carry
    stays full precision (f32 master posterior).

    ``antithetic``: pair each draw with its mirror (w, 2mu - w) — halves the
    on-chip RNG work and is a classic MC variance-reduction scheme. OFF by
    default: draws are then no longer i.i.d., which deviates from the
    reference's estimator semantics (BASELINE parity).

    ``return_batch_stats``: also return the running batch_stats after
    chaining each draw's BN momentum update through the MC loop — exactly
    the reference's semantics, where every train-mode stochastic forward
    advances the running statistics (train/multimodal.py:104-117), at zero
    extra forwards. Returns (logits, new_batch_stats).

    ``split_sampling``: sample each chunk's draws as SEPARATE arrays from
    one kernel launch (ops/sampling.py::gaussian_shift_scale_split). The
    (mu, sigma) HBM reads amortise over the chunk while each draw consumes
    like a single-draw output (slicing a stacked output measured ~3x slower
    end-to-end on v5e). Inference-only: not differentiable. Best-effort
    HINT, not a command: callers pass it unconditionally and it is
    IGNORED (stacked path) when combined with ``antithetic``,
    ``ws_sharding`` or ``return_batch_stats``, whose draw consumption
    (mirror pairing / cross-chip sharding / sequential BN chaining) needs
    the stacked layout.

    ``fast_sampling``: bf16-budget noise generation on the split/pipelined
    inference paths (ops/sampling.py::_normal_block_fast — trimmed
    polynomials, every error below the bf16 output quantum). ``None`` (default) resolves to True exactly
    when the sampled weights are bfloat16 AND a split-consumption path is
    active; the differentiable stacked path never uses it (its VJP
    regenerates eps bit-exactly and must match the f32 forward).

    ``pipelined``: two-stage software pipeline over the draw axis —
    iteration k of the scan runs forward(w_k) from the CARRY while
    sampling w_{k+1} (no data dependence between the two: the sampling
    kernel is VPU/HBM-bound, the convs MXU-bound). If the backend can
    overlap them the step cost drops from sum(S + C·b) toward
    sum(max(S, C·b)). Opt-in, inference-only (requires remat=False;
    incompatible with antithetic / ws_sharding / return_batch_stats /
    mc_chunk>1 — silently ignored there, same hint semantics as
    ``split_sampling``, which it supersedes when active)."""
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
    if sample_dtype is not None and cast_posterior:
        if mu.dtype != sample_dtype:
            mu = mu.astype(sample_dtype)
        sigma = sigma.astype(sample_dtype)
    else:
        sigma = sigma.astype(mu.dtype)

    def fwd(w_flat):
        params = meta.unpack(w_flat, post.det)
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            # train-mode BN normalises by current-batch stats (excluding
            # padded rows when batch_mask is given); the running-stat update
            # it emits is discarded here (refreshed once per train step).
            out, _ = module.apply(variables, *inputs, train=True,
                                  batch_mask=batch_mask,
                                  mutable=["batch_stats"])
            return out
        return module.apply(variables, *inputs, train=False)

    def fwd_bs(bs, w_flat):
        # forward that also chains the BN running-stat momentum update —
        # the reference advances running stats on every stochastic forward
        # (train/multimodal.py:104-117). Normalisation still uses the
        # current batch's stats, so logits are unchanged.
        params = meta.unpack(w_flat, post.det)
        out, upd = module.apply({"params": params, "batch_stats": bs},
                                *inputs, train=True, batch_mask=batch_mask,
                                mutable=["batch_stats"])
        return out, upd["batch_stats"]

    # Remat placement. Checkpointing only the per-draw forward (fwd) makes
    # each chunk's sampled weight stack ws a *residual* of the outer MC scan:
    # num_mc x P floats of HBM (5.9 GB at 20 f32 draws of the 73M posterior)
    # — that OOMs a 16 GB chip at batch 4 x 20 MC. Instead, for small chunks
    # the checkpoint wraps sampling + forward together, so backward
    # regenerates the weights from the chunk key (the sampling op's custom
    # VJP re-derives eps from the key — bit-exact, ~1.5 ms/draw): residuals
    # per chunk are just the PRNG key. Linearisation memory inside one
    # checkpointed chunk is mc_chunk x one forward's activations, so this
    # applies only for mc_chunk <= 4; larger chunks keep the per-draw
    # checkpoint (and pay the ws residuals).
    # split_sampling is ignored (stacked layout) by the chained-BN and
    # antithetic paths — neutralise the hint HERE for both, or it would
    # silently flip sample_in_remat off and make each chunk's weight stack
    # a scan residual (num_mc x P floats — the OOM mode described above)
    split_sampling = (split_sampling and not return_batch_stats
                      and not antithetic)
    sample_in_remat = (remat and ws_sharding is None and not split_sampling
                       and mc_chunk <= 4)
    if remat and not sample_in_remat:
        fwd = jax.checkpoint(fwd)
        fwd_bs = jax.checkpoint(fwd_bs)

    if return_batch_stats:
        if not train:
            raise ValueError("return_batch_stats requires train=True")
        if ws_sharding is not None or antithetic:
            raise ValueError("return_batch_stats: chained BN updates are "
                             "sequential per draw — incompatible with "
                             "mc-sharded or antithetic draws")

        def chunk_body_bs(bs, k):
            ws = gaussian_shift_scale(mu, sigma, k, num_draws=mc_chunk,
                                      impl=impl, out_dtype=sample_dtype)
            if ws.shape[0] <= 4:
                outs = []
                for i in range(ws.shape[0]):
                    out, bs = fwd_bs(bs, ws[i])
                    outs.append(out)
                return bs, jnp.stack(outs)
            # fwd_bs returns (out, new_bs); scan wants (carry, y) = (bs, out)
            bs, logits = jax.lax.scan(
                lambda b, w: tuple(reversed(fwd_bs(b, w))), bs, ws)
            return bs, logits

        chunk_step_bs = (jax.checkpoint(chunk_body_bs) if sample_in_remat
                         else chunk_body_bs)

        new_bs, logits = _dispatch_chunks(chunk_step_bs, batch_stats, key,
                                          nchunks, num_mc)
        return logits, new_bs

    # Two-stage software pipeline over the chunk axis (VERDICT r3 #3):
    # the scan CARRIES chunk k's sampled weights and each iteration runs
    # chunk k's forwards while launching chunk k+1's sampling kernel —
    # the two have no data dependence (different PRNG keys), so a backend
    # that can overlap a VPU/HBM-bound kernel with MXU-bound convs bounds
    # the draw loop at ~max(S, C·b) instead of S + C·b. Keys and the
    # split-kernel consumption pattern are IDENTICAL to the split path
    # (same jax.random.split(key, nchunks) order): each draw consumes the
    # same weights, and logits agree to program-schedule fusion rounding
    # (the bodies are different XLA programs; bf16 fusions may round
    # differently — estimator semantics unchanged).
    # Inference-only hint: silently inactive under remat / antithetic /
    # mc-sharding / chained BN / single-chunk programs.
    if (pipelined and not remat and not return_batch_stats
            and not antithetic and ws_sharding is None and nchunks >= 2):
        def chunk_sample(k):
            return tuple(gaussian_shift_scale_split(
                mu, sigma, k, num_draws=mc_chunk, impl=impl,
                out_dtype=sample_dtype, fast_math=_resolve_fast(
                    fast_sampling, sample_dtype)))

        keys = jax.random.split(key, nchunks)
        ws0 = chunk_sample(keys[0])

        def body(ws_k, key_next):
            ws_next = chunk_sample(key_next)
            return ws_next, jnp.stack([fwd(w) for w in ws_k])

        ws_last, logits = jax.lax.scan(body, ws0, keys[1:])
        last = jnp.stack([fwd(w) for w in ws_last])
        logits = jnp.concatenate(
            [logits.reshape((-1,) + logits.shape[2:]), last], axis=0)
        return logits

    # split_sampling is a hint (see docstring): antithetic / mc-sharded
    # consumption needs the stacked layout, so those flags win silently.
    # The antithetic case is enforced ONCE, at the neutralisation above
    # (which also keeps sample_in_remat honest); here only ws_sharding
    # still needs checking.
    if split_sampling and ws_sharding is None:
        def chunk_step_split(_, k):
            ws_list = gaussian_shift_scale_split(
                mu, sigma, k, num_draws=mc_chunk, impl=impl,
                out_dtype=sample_dtype, fast_math=_resolve_fast(
                    fast_sampling, sample_dtype))
            # unrolled sequential forwards over independent per-draw arrays
            return None, jnp.stack([fwd(w) for w in ws_list])

        _, logits = _dispatch_chunks(chunk_step_split, None, key,
                                     nchunks, num_mc)
        return logits

    def chunk_body(k):
        # One kernel launch samples the whole chunk: with the block-major
        # grid (ops/sampling.py) the (mu, sigma) HBM reads are amortised
        # over the chunk's draws, so larger chunks cut the bandwidth-bound
        # sampling cost per draw (~2.7x at chunk 20, bf16).
        ws = gaussian_shift_scale(mu, sigma, k, num_draws=mc_chunk, impl=impl,
                                  out_dtype=sample_dtype)
        if antithetic:
            mirror = (2.0 * mu.astype(jnp.float32)
                      - ws.astype(jnp.float32)).astype(ws.dtype)
            ws = jnp.concatenate([ws, mirror], axis=0)
        if ws_sharding is not None:
            # mc-axis ensemble parallelism: draws spread over devices, so the
            # forward must be batched over the draw axis.
            ws = jax.lax.with_sharding_constraint(ws, ws_sharding)
            logits = jax.vmap(fwd)(ws)
        elif ws.shape[0] <= 4:
            # unrolled sequential forwards: unbatched weights keep convs in
            # their most MXU-efficient form (vmapped weights measured ~20%
            # slower on v5e)
            logits = jnp.stack([fwd(ws[i]) for i in range(ws.shape[0])])
        else:
            # large chunks: still sequential (one compiled forward scanned
            # over the draw stack) — the chunk exists to amortise sampling,
            # not to batch the convs.
            _, logits = jax.lax.scan(lambda c, w: (c, fwd(w)), None, ws)
        return logits

    if sample_in_remat:
        chunk_body = jax.checkpoint(chunk_body)

    def chunk_step(_, k):
        return None, chunk_body(k)

    _, logits = _dispatch_chunks(chunk_step, None, key, nchunks, num_mc)
    return logits



def _resolve_fast(fast_sampling, sample_dtype):
    """fast_sampling=None -> auto: fast noise exactly when sampling straight
    to bf16 (where its error budget is sub-quantum)."""
    if fast_sampling is None:
        return sample_dtype == jnp.bfloat16
    return bool(fast_sampling)


def _dispatch_chunks(step, carry, key, nchunks, num_mc):
    """Shared chunk dispatch: one direct call when nchunks == 1, else a
    lax.scan over per-chunk keys with the (nchunks, chunk, ...) logit
    stack flattened back to the num_mc draw axis. All three consumption
    paths (chained-BN, split, stacked) MUST dispatch identically — key
    derivation or reshape drift between them would silently change which
    eps each draw sees (the custom VJP regenerates eps from these keys)."""
    keys = jax.random.split(key, nchunks)
    if nchunks == 1:
        return step(carry, keys[0])
    carry, logits = jax.lax.scan(step, carry, keys)
    return carry, logits.reshape((num_mc,) + logits.shape[2:])


def refresh_batch_stats(module, meta, post, batch_stats, inputs,
                        batch_mask=None):
    """One posterior-mean forward with mutable batch_stats to advance the
    running statistics (momentum 0.9, as torch BN momentum=0.1)."""
    params = meta.unpack(post.mu, post.det)
    _, updated = module.apply(
        {"params": params, "batch_stats": batch_stats},
        *inputs,
        train=True,
        batch_mask=batch_mask,
        mutable=["batch_stats"],
    )
    return updated["batch_stats"]
