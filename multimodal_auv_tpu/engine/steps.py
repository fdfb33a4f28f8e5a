"""Jitted train / eval steps — the MC-ELBO recipe on-chip.

Loss semantics match /root/reference/src/Multimodal_AUV/train/multimodal.py:
104-130 exactly:

    logits_mc  : num_mc stochastic forwards (weights re-sampled per draw)
    output     = mean(logits_mc, axis=0)
    scaled_kl  = mean(per-draw KL) / batch_size * kl_weight
    loss       = CrossEntropy(output, labels) + scaled_kl

(The per-draw KL is a deterministic function of (mu, rho), so its MC mean
equals a single evaluation — computed once here.)

NaN/Inf handling reproduces the reference's numerical sanitizers: a batch
whose loss is non-finite is skipped, and an update with non-finite grads is
skipped (multimodal.py:133-145) — both as branchless ``jnp.where`` selects
so the step stays a single compiled program.

The whole step (num_mc forwards + backward + Adam) is one XLA program; MC
draws are rematerialised so training memory is flat in num_mc.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from multimodal_auv_tpu.bayes import kl_divergence
from multimodal_auv_tpu.config import BNNPriorSpec
from multimodal_auv_tpu.engine import uncertainty as U
from multimodal_auv_tpu.engine.mc import mc_logits, refresh_batch_stats
from multimodal_auv_tpu.engine.optim import BayesTrainState


def make_elbo_loss_fn(module, meta, spec: BNNPriorSpec, num_mc: int, *,
                      mc_chunk: int = 1, impl: str = "auto",
                      sample_dtype=None, packed_inputs: bool = False,
                      chained_bn: bool = True, ws_sharding=None,
                      remat: bool = True):
    """The training ELBO exactly as ``make_train_step`` differentiates it
    (reference semantics: train/multimodal.py:104-130). Factored out so the
    torch-twin training-gradient parity golden (tests/test_train_parity.py)
    pins the very composition production runs — sampling custom VJP with
    in-backward eps regeneration, unpack custom VJP, remat-wrapped
    sampling+forward, chained per-draw BN — not a test-local rebuild of it.

    Returns loss_fn(post, batch_stats, inputs, labels, mask, key, kl_weight,
    bs_scale) -> (loss, (output, ce, scaled_kl, new_batch_stats))."""

    def loss_fn(post, batch_stats, inputs, labels, mask, key, kl_weight,
                bs_scale):
        if packed_inputs:
            from multimodal_auv_tpu.ops.preprocess import normalize_multimodal

            inputs = normalize_multimodal(*inputs)
        if chained_bn:
            logits, new_bs = mc_logits(
                module, meta, post, batch_stats, inputs, key, num_mc,
                mc_chunk=mc_chunk, impl=impl, train=True, remat=remat,
                batch_mask=mask, return_batch_stats=True,
                sample_dtype=sample_dtype, cast_posterior=False)
        else:
            new_bs = None
            logits = mc_logits(module, meta, post, batch_stats, inputs, key,
                               num_mc, mc_chunk=mc_chunk, impl=impl,
                               train=True, remat=remat,
                               ws_sharding=ws_sharding, batch_mask=mask,
                               sample_dtype=sample_dtype,
                               cast_posterior=False)
        output = jnp.mean(logits.astype(jnp.float32), axis=0)
        ce_vec = optax.softmax_cross_entropy_with_integer_labels(output, labels)
        ce = jnp.sum(ce_vec * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        scaled_kl = kl_divergence(post, spec) / bs_scale * kl_weight
        loss = ce + scaled_kl
        return loss, (output, ce, scaled_kl, new_bs)

    return loss_fn


def _device_memory_budget(headroom: float = 0.95):
    """Usable accelerator memory in bytes (None when the backend doesn't
    report it, e.g. CPU): ``bytes_limit`` x headroom."""
    try:
        stats = jax.devices()[0].memory_stats()
        limit = (stats or {}).get("bytes_limit")
        return int(limit * headroom) if limit else None
    except Exception:
        return None


class _AutoRematTrainStep:
    """remat="auto" (VERDICT r3 #4): the per-draw remat exists only to keep
    training memory flat in num_mc — but it pays a full re-forward in every
    backward (~22 of 34 ms/draw at b12x12MC, BENCH_NOTES). When the
    no-remat program's residuals FIT the chip, paying them in HBM is free
    throughput. Resolution happens on the FIRST call, with the real args:

      1. AOT-compile the remat=False program and read the compiled
         memory_analysis(); accept it when temp+args+outputs fit the
         device budget (bytes_limit x 0.95).
      2. On a budget miss, an un-analysable backend (CPU reports no
         bytes_limit -> conservative), or RESOURCE_EXHAUSTED at compile or
         first execution, fall back to the remat=True program.

    The resolved executable is cached; later calls pay nothing."""

    def __init__(self, build, budget_bytes=None):
        self._build = build  # build(remat: bool) -> jitted step
        self._budget = budget_bytes
        self._step = None
        self.remat_used = None

    def _fits(self, compiled) -> bool:
        budget = (self._budget if self._budget is not None
                  else _device_memory_budget())
        if budget is None:
            return False  # unanalysable backend: keep the safe program
        m = compiled.memory_analysis()
        if m is None:
            return False
        need = (int(m.temp_size_in_bytes) + int(m.argument_size_in_bytes)
                + int(m.output_size_in_bytes) - int(m.alias_size_in_bytes))
        logger = __import__("logging").getLogger(__name__)
        logger.info("remat=auto: no-remat program needs %.2f GB "
                    "(temp %.2f + args %.2f + out %.2f - alias %.2f), "
                    "budget %.2f GB", need / 2**30,
                    m.temp_size_in_bytes / 2**30,
                    m.argument_size_in_bytes / 2**30,
                    m.output_size_in_bytes / 2**30,
                    m.alias_size_in_bytes / 2**30, budget / 2**30)
        return need <= budget

    def __call__(self, *args):
        if self._step is None:
            self._step = self._resolve(args)
        return self._step(*args)

    def _resolve(self, args):
        # No probe EXECUTION here: the decision is the allocator's own
        # compile-time numbers, and a donated-input step could not be
        # safely retried after a mid-execution failure anyway.
        try:
            compiled = self._build(False).lower(*args).compile()
            if self._fits(compiled):
                self.remat_used = False
                return compiled
        except Exception as e:
            msg = str(e).lower()
            if ("resource_exhausted" not in msg
                    and "out of memory" not in msg):
                raise  # only OOM falls back; real errors surface
        self.remat_used = True
        return self._build(True)


def make_train_step(module, meta, spec: BNNPriorSpec, tx, num_mc: int, *,
                    mc_chunk: int = 1, impl: str = "auto",
                    update_batch_stats: bool = True, ws_sharding=None,
                    donate: bool = False, sample_dtype=None,
                    packed_inputs: bool = False, remat="on"):
    """Returns jitted (state, inputs, labels, mask, key, kl_weight,
    batch_size_scale) -> (state, metrics). ``mask`` is f32[batch]
    (1.0 = real row, 0.0 = ragged-tail padding) and sits BEFORE ``key`` —
    bind arguments positionally with care.

    BN running stats are chained through the MC loop (one momentum update per
    stochastic forward — exact reference semantics, train/multimodal.py:
    104-117) at zero extra cost; with an mc-sharded weight stack the chain
    would serialise the ensemble axis, so a single posterior-mean refresh is
    used instead.

    ``donate``: donate the input state's buffers to the step so XLA updates
    the ~1.2 GB packed posterior + Adam moments in place. OFF by default —
    a donated state must never be touched again, which would break the epoch
    loops' crash-save path (they checkpoint ``state.post`` if a step raises);
    bench.py turns it on.

    ``sample_dtype``: dtype of the sampled weights fed to the forward.
    ``jnp.bfloat16`` is the mixed-precision training mode — the posterior
    (mu, rho), its gradients, the cross-draw gradient accumulation, and the
    Adam update all stay f32 (master weights); only the per-draw sampled
    weight vector is emitted bf16, matching the bf16 activations the convs
    already run in. Removes the per-draw f32->bf16 weight converts and
    halves the weight-cotangent concat traffic (BENCH_NOTES.md). ``None``
    (default) keeps full-f32 reference semantics.

    ``remat``: "on" (default — per-draw sampling+forward checkpointing,
    memory flat in num_mc), "off" (store residuals; faster when they fit),
    or "auto" (resolve on the first call from the compiled program's
    memory analysis, with an OOM fallback — see _AutoRematTrainStep)."""
    if remat == "auto":
        kw = dict(mc_chunk=mc_chunk, impl=impl,
                  update_batch_stats=update_batch_stats,
                  ws_sharding=ws_sharding, donate=donate,
                  sample_dtype=sample_dtype, packed_inputs=packed_inputs)
        return _AutoRematTrainStep(
            lambda r: make_train_step(module, meta, spec, tx, num_mc,
                                      remat=r, **kw))
    remat = remat if isinstance(remat, bool) else {"on": True,
                                                   "off": False}[remat]
    chained_bn = update_batch_stats and ws_sharding is None
    loss_fn = make_elbo_loss_fn(module, meta, spec, num_mc,
                                mc_chunk=mc_chunk, impl=impl,
                                sample_dtype=sample_dtype,
                                packed_inputs=packed_inputs,
                                chained_bn=chained_bn,
                                ws_sharding=ws_sharding, remat=remat)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def step(state: BayesTrainState, inputs, labels, mask, key, kl_weight,
             batch_size_scale) -> Tuple[BayesTrainState, Any]:
        """mask: f32[batch], 1.0 for real rows, 0.0 for padding of ragged
        final batches (keeps one compiled program for every batch)."""
        (loss, (output, ce, scaled_kl, chained_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.post, state.batch_stats, inputs,
                                   labels, mask, key, kl_weight,
                                   batch_size_scale)

        loss_ok = jnp.isfinite(loss)
        grads_ok = jnp.all(jnp.asarray(
            [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]))
        ok = jnp.logical_and(loss_ok, grads_ok)

        safe_grads = jax.tree_util.tree_map(
            lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt_state = tx.update(safe_grads, state.opt_state,
                                           state.post)
        new_post = optax.apply_updates(state.post, updates)
        # skip the whole update when the guard trips
        new_post = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old), new_post, state.post)
        new_opt_state = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old) if hasattr(new, "dtype") else new,
            new_opt_state, state.opt_state)

        if chained_bn:
            new_bs = chained_bs
        elif update_batch_stats:
            ref_inputs = inputs
            if packed_inputs:
                from multimodal_auv_tpu.ops.preprocess import (
                    normalize_multimodal,
                )

                ref_inputs = normalize_multimodal(*inputs)
            new_bs = refresh_batch_stats(module, meta, state.post,
                                         state.batch_stats, ref_inputs,
                                         batch_mask=mask)
        else:
            new_bs = state.batch_stats

        predicted = jnp.argmax(output, axis=-1)
        correct = jnp.sum((predicted == labels) * mask)
        loss_out = jnp.where(loss_ok, loss, jnp.nan)
        total = jnp.sum(mask)
        skipped = jnp.logical_not(ok)
        metrics = {
            "loss": loss_out,
            "cross_entropy": ce,
            "scaled_kl": scaled_kl,
            "correct": correct,
            "total": total,
            "skipped": skipped,
            "predicted": predicted,
            # all scalars + the per-sample vector as ONE f32 array, so the
            # epoch loops fetch each batch's metrics in a single D2H
            # transfer (a per-leaf device_get costs one ~30 ms tunnel round
            # trip per leaf); parse with unfuse_train_metrics
            "fused": jnp.concatenate([
                jnp.stack([loss_out, ce, scaled_kl, correct, total,
                           skipped.astype(jnp.float32)]),
                predicted.astype(jnp.float32)]),
        }
        new_state = BayesTrainState(post=new_post, opt_state=new_opt_state,
                                    batch_stats=new_bs, step=state.step + 1)
        return new_state, metrics

    return step


def make_eval_step(module, meta, spec: BNNPriorSpec, num_mc: int, *,
                   mc_chunk: int = 1, impl: str = "auto", ws_sharding=None,
                   packed_inputs: bool = False):
    """Returns jitted (post, batch_stats, inputs, labels, mask, key,
    kl_scale) -> metrics with both uncertainty families. ``mask`` is
    f32[batch] (1.0 = real row, 0.0 = ragged-tail padding), BEFORE ``key``.

    ``kl_scale`` absorbs the call-site-dependent divisor: multimodal eval
    divides the KL by len(dataloader) (multimodal.py:293) while unimodal
    eval divides by batch_size (unimodal.py:272); both then multiply by the
    annealed kl_weight (the caller folds that in too).
    """

    @jax.jit
    def step(post, batch_stats, inputs, labels, mask, key, kl_scale):
        if packed_inputs:
            from multimodal_auv_tpu.ops.preprocess import normalize_multimodal

            inputs = normalize_multimodal(*inputs)
        logits = mc_logits(module, meta, post, batch_stats, inputs, key,
                           num_mc, mc_chunk=mc_chunk, impl=impl, train=True,
                           remat=False, ws_sharding=ws_sharding,
                           batch_mask=mask, split_sampling=True)
        probs = U.softmax_probs(logits)
        output_mean = jnp.mean(logits.astype(jnp.float32), axis=0)
        ce_vec = optax.softmax_cross_entropy_with_integer_labels(
            output_mean, labels)
        ce = jnp.sum(ce_vec * mask) / jnp.maximum(jnp.sum(mask), 1.0)
        kl_scaled = kl_divergence(post, spec) * kl_scale
        predicted = jnp.argmax(output_mean, axis=-1)
        ent = U.entropy_decomposition(probs, eps=1e-8)
        mean_prob = U.mean_probs(probs)
        correct = jnp.sum((predicted == labels) * mask)
        total = jnp.sum(mask)
        epi_var = U.variance_uncertainty(probs)
        alea_mc = U.aleatoric_uncertainty(probs, eps=1e-7)
        loss = ce + kl_scaled
        return {
            "loss": loss,
            "cross_entropy": ce,
            "kl_scaled": kl_scaled,
            "predicted": predicted,
            "mean_prob": mean_prob,
            "correct": correct,
            "total": total,
            # entropy-decomposition family (multimodal eval, multimodal.py:305-310)
            "predictive_entropy": ent.predictive,
            "aleatoric_entropy": ent.aleatoric,
            "model_uncertainty": ent.model,
            # variance family (unimodal eval, unimodal.py:296-309; eps 1e-7)
            "epistemic_variance": epi_var,
            "aleatoric_mc_entropy": alea_mc,
            # single-transfer bundle (see make_train_step); parse with
            # unfuse_eval_metrics
            "fused": jnp.concatenate([
                jnp.stack([loss, ce, kl_scaled, correct, total]),
                predicted.astype(jnp.float32),
                ent.predictive.astype(jnp.float32),
                ent.aleatoric.astype(jnp.float32),
                ent.model.astype(jnp.float32),
                epi_var.astype(jnp.float32),
                alea_mc.astype(jnp.float32),
                mean_prob.astype(jnp.float32).ravel()]),
        }

    return step


def unfuse_train_metrics(vec) -> dict:
    """Host-side parse of make_train_step's ``fused`` array (one D2H fetch
    replaces one per metrics leaf — each costs a full round trip on a
    tunneled TPU). Returns the same keys/py-types the epoch loops read."""
    import numpy as np

    vec = np.asarray(vec)
    return {
        "loss": float(vec[0]),
        "cross_entropy": float(vec[1]),
        "scaled_kl": float(vec[2]),
        "correct": float(vec[3]),
        "total": float(vec[4]),
        "skipped": bool(vec[5]),
        "predicted": vec[6:].astype(np.int32),
    }


def unfuse_eval_metrics(vec, batch_size: int) -> dict:
    """Host-side parse of make_eval_step's ``fused`` array. Layout:
    5 scalars, then 6 per-sample vectors of length ``batch_size``, then the
    (batch, C) mean_prob raveled (C inferred from the remainder)."""
    import numpy as np

    vec = np.asarray(vec)
    b = batch_size
    names = ["predicted", "predictive_entropy", "aleatoric_entropy",
             "model_uncertainty", "epistemic_variance", "aleatoric_mc_entropy"]
    out = {
        "loss": float(vec[0]),
        "cross_entropy": float(vec[1]),
        "kl_scaled": float(vec[2]),
        "correct": float(vec[3]),
        "total": float(vec[4]),
    }
    off = 5
    for n in names:
        out[n] = vec[off:off + b]
        off += b
    out["predicted"] = out["predicted"].astype(np.int32)
    out["mean_prob"] = vec[off:].reshape(b, -1)
    return out
