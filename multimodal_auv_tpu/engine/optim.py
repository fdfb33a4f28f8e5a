"""Optimizers and LR schedules — ``define_optimizers_and_schedulers`` parity.

Reference (/root/reference/src/Multimodal_AUV/train/loop_utils.py:13-63):
torch.optim.Adam(lr, weight_decay) + StepLR(step_size, gamma) per model.

torch's Adam applies weight decay as an L2 term *added to the gradient*
before the Adam moments (not AdamW), reproduced here as
``add_decayed_weights -> scale_by_adam -> -lr``. The StepLR replica keeps
its step count host-side like torch's scheduler object, including the
reference's double-step-per-epoch quirk (loop_utils.py:233,246) which is
applied by the caller.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import optax
from flax import struct

from multimodal_auv_tpu.bayes import PackedPosterior
from multimodal_auv_tpu.config import OptimizerSpec, SchedulerSpec


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam semantics (betas 0.9/0.999, eps 1e-8, coupled L2)."""

    def tx(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain += [optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                  optax.scale(-learning_rate)]
        return optax.chain(*chain)

    return optax.inject_hyperparams(tx)(learning_rate=lr)


class StepLR:
    """Host-side replica of torch.optim.lr_scheduler.StepLR."""

    def __init__(self, base_lr: float, step_size: int, gamma: float):
        self.base_lr = base_lr
        self.step_size = step_size
        self.gamma = gamma
        self.epoch_count = 0

    @property
    def lr(self) -> float:
        return self.base_lr * self.gamma ** (self.epoch_count // self.step_size)

    def step(self):
        self.epoch_count += 1

    def state_dict(self):
        return {"epoch_count": self.epoch_count}

    def load_state_dict(self, d):
        self.epoch_count = d["epoch_count"]


@struct.dataclass
class BayesTrainState:
    """Jit-carryable training state for one Bayesian model."""

    post: PackedPosterior
    opt_state: Any
    batch_stats: Any
    step: jax.Array


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning_rate hyperparameter in-place-ish."""
    opt_state.hyperparams["learning_rate"] = jax.numpy.asarray(
        lr, opt_state.hyperparams["learning_rate"].dtype)
    return opt_state


@dataclass
class OptimizerBundle:
    tx: optax.GradientTransformation
    scheduler: StepLR


def define_optimizers_and_schedulers(
    model_names,
    optimizer_params: Dict[str, Dict[str, float]],
    scheduler_params: Dict[str, Dict[str, float]],
) -> Dict[str, OptimizerBundle]:
    """Build an Adam+StepLR pair per model name, honoring the reference's
    param-dict knob names (``lr``, ``weight_decay``, ``step_size``,
    ``gamma``)."""
    out = {}
    for name in model_names:
        op = optimizer_params.get(name, {})
        sp = scheduler_params.get(name, {})
        lr = float(op.get("lr", OptimizerSpec.lr))
        wd = float(op.get("weight_decay", OptimizerSpec.weight_decay))
        out[name] = OptimizerBundle(
            tx=make_optimizer(lr, wd),
            scheduler=StepLR(lr, int(sp.get("step_size", SchedulerSpec.step_size)),
                             float(sp.get("gamma", SchedulerSpec.gamma))),
        )
    return out


def make_backbone_freeze_mask(meta, post,
                              trainable_prefixes=("attention_", "fc")):
    """Elementwise update mask for foundation-model fine-tuning with a
    frozen backbone (BASELINE configs[3]): 1.0 on packed-posterior regions
    whose top-level module matches a trainable prefix (the fusion head:
    attention_*, fc/fc1/fc2), 0.0 on the ResNet trunks, pad region, and all
    deterministic (BatchNorm) leaves."""
    import numpy as np

    mask = np.zeros(meta.n_padded, np.float32)
    for e in meta.entries:
        if any(e.path[0].startswith(p) for p in trainable_prefixes):
            mask[e.offset:e.offset + e.size] = 1.0
    flat = jax.numpy.asarray(mask)
    det_mask = jax.tree_util.tree_map(
        lambda x: jax.numpy.zeros_like(x), post.det)
    return PackedPosterior(mu=flat, rho=flat, det=det_mask)


def freeze_transform(mask_post) -> optax.GradientTransformation:
    """Elementwise gradient gate — optax.masked works per-leaf only, and the
    packed posterior holds trunk+head in one leaf."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        gated = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask_post)
        return gated, state

    return optax.GradientTransformation(init, update)


def make_optimizer_with_freeze(lr: float, weight_decay: float,
                               mask_post) -> optax.GradientTransformation:
    """Adam with the frozen-backbone gate in front (moments of frozen
    elements stay exactly zero)."""

    def tx(learning_rate):
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        # gate AFTER decay so frozen params neither decay nor accumulate
        # Adam moments
        chain += [freeze_transform(mask_post),
                  optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                  optax.scale(-learning_rate)]
        return optax.chain(*chain)

    return optax.inject_hyperparams(tx)(learning_rate=lr)


def kl_annealing_weight(epoch: int, total_num_epochs: int) -> float:
    """kl_weight = 2^(epoch+1) / 2^total_epochs
    (/root/reference/src/Multimodal_AUV/train/multimodal.py:80)."""
    return float(2.0 ** (epoch + 1 - total_num_epochs))
