"""Model construction — the ``define_models`` equivalent.

Reference (/root/reference/src/Multimodal_AUV/models/model_utils.py:10-49)
builds three unimodal ResNet50Custom models + a MultiModalModel over three
pretrained feature trunks, then converts each with dnn_to_bnn. Here the same
seven-entry dict is produced, but "conversion" is ``bayes.bayesianize`` over
the flax param tree, yielding a PackedPosterior per model.

Pretrained ImageNet initialisation: the reference downloads torchvision
IMAGENET1K_V1 weights. This environment has no torchvision and no network
egress, so trunks initialise randomly unless a local torch state-dict is
supplied (``pretrained_paths`` -> interop.torch_import); the HuggingFace
checkpoint importer covers the production path.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_auv_tpu.bayes import (
    PackedPosterior,
    PackMeta,
    bayesianize,
    sample_weights,
)
from multimodal_auv_tpu.config import BNNPriorSpec, IMAGE_SIZE
from multimodal_auv_tpu.models.fusion import MultiModalModel
from multimodal_auv_tpu.models.resnet import ResNet, ResNet50Custom


@dataclass
class ModelBundle:
    """A Bayesian model: static module + learnable posterior + BN stats.

    The module is static (hashable config); only ``post`` and
    ``batch_stats`` flow through jitted code.
    """

    module: nn.Module
    post: PackedPosterior
    meta: PackMeta
    batch_stats: Any

    def apply_with_weights(self, w_flat, *inputs, train: bool = True,
                           batch_stats=None, mutable: bool = False):
        """Forward with an explicit sampled flat weight vector."""
        params = self.meta.unpack(w_flat, self.post.det)
        variables = {
            "params": params,
            "batch_stats": self.batch_stats if batch_stats is None else batch_stats,
        }
        if mutable:
            return self.module.apply(variables, *inputs, train=train,
                                     mutable=["batch_stats"])
        return self.module.apply(variables, *inputs, train=train)

    def apply_mean(self, *inputs, train: bool = False):
        """Deterministic forward at the posterior mean."""
        return self.apply_with_weights(self.post.mu, *inputs, train=train)

    def sample_and_apply(self, key, *inputs, train: bool = True,
                         impl: str = "auto", mutable: bool = False):
        w = sample_weights(self.post, key, impl=impl)
        return self.apply_with_weights(w, *inputs, train=train, mutable=mutable)


@dataclass(frozen=True)
class ArchConfig:
    """Backbone scaling knobs; default is the full ResNet-50 geometry."""

    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    width: int = 64
    image_size: int = IMAGE_SIZE
    dtype: Any = jnp.bfloat16  # activation dtype (MXU-friendly)
    param_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, image_size: int = 32):
        """A miniature config for tests: same topology, 1 block per stage."""
        return cls(stage_sizes=(1, 1, 1, 1), width=8, image_size=image_size,
                   dtype=jnp.float32)

    @classmethod
    def micro(cls, image_size: int = 32):
        """An even smaller config (2 stages) for tests that exercise engine /
        sharding / pipeline semantics rather than the exact ResNet-50
        topology — on this VM's single CPU core, trace+compile time scales
        with layer count. Tests of torch-naming parity must use tiny()."""
        return cls(stage_sizes=(1, 1), width=8, image_size=image_size,
                   dtype=jnp.float32)


def _bayesian_bundle(module: nn.Module, example_inputs, spec: BNNPriorSpec,
                     rng: jax.Array) -> ModelBundle:
    # jit the flax init: eager tracing dispatches every conv/bn op one by one
    # (~13 s for even the tiny test model on CPU); compiled init is one
    # cached program.
    variables = jax.jit(partial(module.init, train=True))(rng, *example_inputs)
    post, meta = bayesianize(variables["params"], spec, rng=rng)
    return ModelBundle(module=module, post=post, meta=meta,
                       batch_stats=variables.get("batch_stats", {}))


def make_multimodal_bundle(num_classes: int, spec: BNNPriorSpec,
                           rng: jax.Array,
                           arch: ArchConfig = ArchConfig()) -> ModelBundle:
    module = MultiModalModel(num_classes=num_classes,
                             stage_sizes=tuple(arch.stage_sizes),
                             width=arch.width, dtype=arch.dtype,
                             param_dtype=arch.param_dtype)
    s = arch.image_size
    ex = (jnp.zeros((1, s, s, 3), jnp.float32),
          jnp.zeros((1, s, s, 3), jnp.float32),
          jnp.zeros((1, s, s, 1), jnp.float32))
    return _bayesian_bundle(module, ex, spec, rng)


def make_unimodal_bundle(input_channels: int, num_classes: int,
                         spec: BNNPriorSpec, rng: jax.Array,
                         arch: ArchConfig = ArchConfig()) -> ModelBundle:
    module = ResNet50Custom(num_classes=num_classes,
                            stage_sizes=tuple(arch.stage_sizes),
                            width=arch.width, dtype=arch.dtype,
                            param_dtype=arch.param_dtype)
    s = arch.image_size
    ex = (jnp.zeros((1, s, s, input_channels), jnp.float32),)
    return _bayesian_bundle(module, ex, spec, rng)


def load_models(model_paths: Dict[str, str], num_classes: int = 7,
                arch: ArchConfig = ArchConfig(),
                rng: Optional[jax.Array] = None) -> Tuple[Any, Any, Any]:
    """Parity with model_utils.py:66-101: load three feature-extractor
    checkpoints ("image", "channels", "sss") from paths, tolerant of missing
    files (warn + keep random init). Accepts orbax dirs or torch files."""
    import logging
    import os

    logger = logging.getLogger(__name__)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 3)
    s = arch.image_size

    out = []
    for (key_name, channels), k in zip(
            (("image", 3), ("channels", 3), ("sss", 1)), keys):
        module = ResNet(stage_sizes=tuple(arch.stage_sizes), width=arch.width,
                        num_classes=None, dtype=arch.dtype,
                        param_dtype=arch.param_dtype)
        # jitted init, same rationale as _bayesian_bundle (eager tracing
        # dispatches every op individually: tens of seconds per trunk)
        variables = jax.jit(partial(module.init, train=True))(
            k, jnp.zeros((1, s, s, channels), jnp.float32))
        path = (model_paths or {}).get(key_name)
        if path and os.path.exists(path):
            try:
                if os.path.isdir(path):
                    from multimodal_auv_tpu.engine.checkpointing import (
                        restore_pytree,
                    )

                    variables = restore_pytree(path, variables)
                else:
                    from multimodal_auv_tpu.interop.torch_import import (
                        load_torch_state_dict,
                    )

                    sd = load_torch_state_dict(path)
                    from multimodal_auv_tpu.interop.torch_import import (
                        import_posterior,
                    )

                    post, meta = bayesianize(variables["params"], BNNPriorSpec())
                    bundle = ModelBundle(module=module, post=post, meta=meta,
                                         batch_stats=variables.get(
                                             "batch_stats", {}))
                    post, bs, _ = import_posterior(bundle, sd)
                    variables = {"params": meta.unpack(post.mu, post.det),
                                 "batch_stats": bs}
                logger.info("%s model loaded successfully from %s",
                            key_name.capitalize(), path)
            except Exception as e:
                logger.error("Failed to load %s model from %s: %s", key_name,
                             path, e, exc_info=True)
        else:
            logger.warning("Path not found for model: %s -> %s", key_name, path)
        out.append({"module": module, "variables": variables})
    return tuple(out)


def move_models_to_device(models: Dict[str, Any], devices=None,
                          use_multigpu_for_multimodal: bool = True) -> Dict[str, Any]:
    """Parity shim for utils/device.py:30: on TPU, placement is
    sharding-driven (parallel/mesh.py); this commits every array leaf to the
    default device(s) and returns the dict unchanged in structure."""
    import jax as _jax

    def put(x):
        return _jax.device_put(x) if hasattr(x, "dtype") else x

    for name, m in models.items():
        if isinstance(m, ModelBundle):
            m.post = _jax.tree_util.tree_map(put, m.post)
            m.batch_stats = _jax.tree_util.tree_map(put, m.batch_stats)
        elif isinstance(m, dict) and "variables" in m:
            m["variables"] = _jax.tree_util.tree_map(put, m["variables"])
    return models


def define_models(num_classes: int, const_bnn_prior_parameters,
                  rng: Optional[jax.Array] = None,
                  arch: ArchConfig = ArchConfig(),
                  pretrained_paths: Optional[Dict[str, str]] = None
                  ) -> Dict[str, Any]:
    """Seven-entry model dict with the reference's keys
    (model_utils.py:37-45): three Bayesian unimodal classifiers, the
    Bayesian multimodal fusion model, and three deterministic feature
    trunks.

    ``pretrained_paths``: optional {"image": ..., "channels": ..., "sss": ...}
    paths to torchvision-*named* ResNet-50 state dicts (the offline stand-in
    for the reference's IMAGENET1K_V1 download). Trunk weights MOPED-init
    the posteriors (sigma = delta*|w|); the 1000-class fc head and any
    channel-mismatched conv1 are dropped, as in the reference's fc->Identity
    swap (model_utils.py:26-64)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    if isinstance(const_bnn_prior_parameters, dict):
        spec = BNNPriorSpec.from_dict(const_bnn_prior_parameters)
    else:
        spec = const_bnn_prior_parameters

    keys = jax.random.split(rng, 7)
    s = arch.image_size

    sds: Dict[str, Any] = {}
    if pretrained_paths:
        from multimodal_auv_tpu.interop.torch_import import load_torch_state_dict

        for name, path in pretrained_paths.items():
            try:
                sds[name] = load_torch_state_dict(path)
            except Exception:
                import logging

                logging.getLogger(__name__).warning(
                    "Could not load pretrained trunk %s from %s", name, path,
                    exc_info=True)

    def moped_trunks(bundle, by_prefix: Dict[str, str]):
        """MOPED-init the bundle's trunks from torchvision dicts, keyed by
        flax submodule prefix -> pretrained_paths name."""
        from multimodal_auv_tpu.interop.torch_import import (
            init_trunks_from_torchvision,
        )

        for prefix, sd_name in by_prefix.items():
            sd = sds.get(sd_name)
            if sd is None:
                continue
            post, bs, _ = init_trunks_from_torchvision(
                bundle, sd, prefixes=(prefix,) if prefix else ("",), spec=spec)
            bundle.post, bundle.batch_stats = post, bs
        return bundle

    def feat(input_channels, key, sd_name):
        module = ResNet(stage_sizes=tuple(arch.stage_sizes), width=arch.width,
                        num_classes=None, dtype=arch.dtype,
                        param_dtype=arch.param_dtype)
        variables = jax.jit(partial(module.init, train=True))(
            key, jnp.zeros((1, s, s, input_channels), jnp.float32))
        sd = sds.get(sd_name)
        if sd is not None:
            from multimodal_auv_tpu.interop.torch_import import (
                init_trunks_from_torchvision,
            )

            post, meta = bayesianize(variables["params"], spec)
            tmp = ModelBundle(module=module, post=post, meta=meta,
                              batch_stats=variables.get("batch_stats", {}))
            post, bs, _ = init_trunks_from_torchvision(tmp, sd, prefixes=("",),
                                                       spec=spec)
            variables = {"params": meta.unpack(post.mu, post.det),
                         "batch_stats": bs}
        return {"module": module, "variables": variables}

    return {
        "image_model": moped_trunks(
            make_unimodal_bundle(3, num_classes, spec, keys[0], arch),
            {"model": "image"}),
        "bathy_model": moped_trunks(
            make_unimodal_bundle(3, num_classes, spec, keys[1], arch),
            {"model": "channels"}),
        "sss_model": moped_trunks(
            make_unimodal_bundle(1, num_classes, spec, keys[2], arch),
            {"model": "sss"}),
        "multimodal_model": moped_trunks(
            make_multimodal_bundle(num_classes, spec, keys[3], arch),
            {"image_model_feat": "image", "bathy_model_feat": "channels",
             "sss_model_feat": "sss"}),
        "image_model_feat": feat(3, keys[4], "image"),
        "bathy_model_feat": feat(3, keys[5], "channels"),
        "sss_model_feat": feat(1, keys[6], "sss"),
    }
