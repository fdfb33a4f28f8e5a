"""Torch -> JAX checkpoint importer for the HuggingFace pretrained weights.

The reference downloads ``sams-tom/multimodal-auv-bathy-bnn-classifier /
multimodal-bnn/pytorch_model.bin`` — a bayesian-torch ``dnn_to_bnn``-mutated
state dict — and loads it with key remapping
(/root/reference/src/Multimodal_AUV/Examples/Example_Inference_model.py:78-112):

  * strip a ``module.`` DataParallel prefix,
  * remap ``{image,bathy,sss}_model_feat.model.`` -> ``*_model_feat.``,
  * drop the ``fc2.*`` head when num_classes != 7 (foundation-model head swap),
  * ``strict=False`` tolerance.

Here the same key space is mapped onto the flax param tree / PackedPosterior:

  torch (bayesian-torch)                 flax
  -------------------------------------  --------------------------------
  conv ``mu_kernel`` / ``rho_kernel``    Conv ``kernel``  (OIHW -> HWIO)
  linear ``mu_weight`` / ``rho_weight``  Dense ``kernel`` ((out,in) -> (in,out))
  linear ``mu_bias`` / ``rho_bias``      Dense ``bias``
  BN ``weight`` / ``bias``               BatchNorm ``scale`` / ``bias`` (det)
  BN ``running_mean`` / ``running_var``  batch_stats ``mean`` / ``var``
  ``layerL.B.``                          ``layerL_B``
  ``downsample.0`` / ``downsample.1``    ``downsample_conv`` / ``downsample_bn``

Deterministic torchvision-style state dicts (plain ``weight``/``bias``) are
also supported: they initialise mu, with rho re-derived by MOPED.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_auv_tpu.bayes import PackedPosterior
from multimodal_auv_tpu.bayes.packing import _get_path, _set_path as _set
from multimodal_auv_tpu.config import BNNPriorSpec

logger = logging.getLogger(__name__)

_LAYER_RE = re.compile(r"^layer(\d+)\.(\d+)$")


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a state dict to numpy (CPU), stripping ``module.`` and
    remapping ``*_model_feat.model.`` -> ``*_model_feat.``."""
    import torch

    try:
        # safe path first: hub checkpoints are third-party pickles, and
        # weights_only=False would execute arbitrary code from them
        raw = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        logger.warning(
            "%s is not a plain-tensor checkpoint; falling back to full "
            "unpickling (legacy whole-module save). Only do this for "
            "checkpoints you trust.", path)
        raw = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    out = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        for mod in ("image", "bathy", "sss"):
            k = k.replace(f"{mod}_model_feat.model.", f"{mod}_model_feat.")
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _segments_to_flax(segments) -> Tuple[str, ...]:
    """Map torch module path segments to flax module names."""
    out = []
    i = 0
    while i < len(segments):
        s = segments[i]
        m = _LAYER_RE.match(s + "." + segments[i + 1]) if i + 1 < len(segments) else None
        if m:
            out.append(f"layer{m.group(1)}_{m.group(2)}")
            i += 2
            continue
        if s == "downsample" and i + 1 < len(segments):
            out.append("downsample_conv" if segments[i + 1] == "0" else "downsample_bn")
            i += 2
            continue
        out.append(s)
        i += 1
    return tuple(out)


def torch_key_to_flax(key: str) -> Optional[Tuple[Tuple[str, ...], str, str]]:
    """Return (flax_path, leaf_name, kind) for a torch state-dict key.

    kind in {mu, rho, det, bn_mean, bn_var}; None for ignorable keys
    (num_batches_tracked, prior buffers...)."""
    parts = key.split(".")
    leaf = parts[-1]
    mods = _segments_to_flax(parts[:-1])

    if leaf in ("mu_kernel", "mu_weight"):
        return mods, "kernel", "mu"
    if leaf in ("rho_kernel", "rho_weight"):
        return mods, "kernel", "rho"
    if leaf == "mu_bias":
        return mods, "bias", "mu"
    if leaf == "rho_bias":
        return mods, "bias", "rho"
    if leaf == "running_mean":
        return mods, "mean", "bn_mean"
    if leaf == "running_var":
        return mods, "var", "bn_var"
    if leaf == "num_batches_tracked" or leaf.startswith("prior_"):
        return None
    if leaf == "weight":
        # BN scale or deterministic conv/linear weight — disambiguated by rank
        return mods, "weight", "det"
    if leaf == "bias":
        return mods, "bias", "det"
    return None


def _to_flax_array(arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:  # conv OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:  # linear (out,in) -> (in,out)
        return np.transpose(arr, (1, 0))
    return arr


def _get(tree: Dict, path: Tuple[str, ...]):
    return _get_path(tree, path, default=None)


def import_posterior(
    bundle,
    state_dict: Dict[str, np.ndarray],
    *,
    num_classes: Optional[int] = None,
    pretrained_head_classes: int = 7,
    spec: Optional[BNNPriorSpec] = None,
) -> Tuple[PackedPosterior, Any, Dict[str, int]]:
    """Merge a torch state dict into a ModelBundle's posterior/batch_stats.

    Returns (new_post, new_batch_stats, stats). Unknown keys and shape
    mismatches are dropped (strict=False parity); ``fc2.*`` is dropped when
    num_classes != pretrained_head_classes
    (Example_Inference_model.py:99-108).

    ``stats`` also carries a by-name coverage audit against the EXPECTED
    key inventory of the reference's construction (interop/hf_manifest.py):
    ``missing`` (loadable keys the dict should have contained but didn't)
    and ``unexpected`` (keys the inventory doesn't know) — so a real-weights
    import can be audited, not just counted."""
    spec = spec or BNNPriorSpec()
    meta = bundle.meta
    post = bundle.post

    drop_head = num_classes is not None and num_classes != pretrained_head_classes

    # Build mutable trees for mu/rho keyed by variational paths.
    mu_tree: Dict = {}
    rho_tree: Dict = {}
    det = jax.tree_util.tree_map(lambda x: x, post.det)  # shallow copy ok
    bs = jax.device_get(bundle.batch_stats)
    bs = jax.tree_util.tree_map(np.asarray, bs)

    var_paths = {e.path: e for e in meta.entries}
    stats = {"loaded": 0, "dropped": 0, "ignored": 0}

    for key, arr in state_dict.items():
        mapped = torch_key_to_flax(key)
        if mapped is None:
            stats["ignored"] += 1
            continue
        mods, leaf, kind = mapped
        if drop_head and mods and mods[0] == "fc2":
            stats["dropped"] += 1
            logger.info("Dropping pretrained head key %s (num_classes mismatch)", key)
            continue

        if kind in ("mu", "rho"):
            path = mods + (leaf,)
            e = var_paths.get(path)
            val = _to_flax_array(arr)
            if e is None or tuple(val.shape) != e.shape:
                stats["dropped"] += 1
                logger.warning("Dropping %s (no variational match at %s)", key, path)
                continue
            _set(mu_tree if kind == "mu" else rho_tree, path, val)
            stats["loaded"] += 1
        elif kind == "det":
            if arr.ndim == 1:
                if leaf == "weight":
                    # BatchNorm weight -> flax 'scale'
                    path = mods + ("scale",)
                    cur = _get(det, path)
                    if cur is not None and tuple(arr.shape) == tuple(np.shape(cur)):
                        _set(det, path, jnp.asarray(arr))
                        stats["loaded"] += 1
                    else:
                        stats["dropped"] += 1
                else:
                    # 'bias': BatchNorm bias (deterministic) or a plain
                    # linear/conv bias (variational mu under MOPED)
                    path = mods + ("bias",)
                    cur = _get(det, path)
                    e = var_paths.get(path)
                    if cur is not None and tuple(arr.shape) == tuple(np.shape(cur)):
                        _set(det, path, jnp.asarray(arr))
                        stats["loaded"] += 1
                    elif e is not None and tuple(arr.shape) == e.shape:
                        _set(mu_tree, path, arr)
                        stats["loaded"] += 1
                    else:
                        stats["dropped"] += 1
            else:
                # deterministic conv/linear weight -> variational mu (MOPED init)
                path = mods + ("kernel",)
                e = var_paths.get(path)
                val = _to_flax_array(arr)
                if e is not None and tuple(val.shape) == e.shape:
                    _set(mu_tree, path, val)
                    stats["loaded"] += 1
                else:
                    stats["dropped"] += 1
                    logger.warning("Dropping %s (no match at %s)", key, path)
        elif kind in ("bn_mean", "bn_var"):
            path = mods + ({"bn_mean": "mean", "bn_var": "var"}[kind],)
            cur = _get(bs, path)
            if cur is not None and tuple(arr.shape) == tuple(np.shape(cur)):
                _set(bs, path, np.asarray(arr))
                stats["loaded"] += 1
            else:
                stats["dropped"] += 1

    # Fold loaded mu/rho leaves into the packed arrays.
    mu = np.asarray(post.mu).copy()
    rho = np.asarray(post.rho).copy()
    for e in meta.entries:
        mv = _get(mu_tree, e.path)
        rv = _get(rho_tree, e.path)
        if mv is not None:
            mu[e.offset:e.offset + e.size] = np.ravel(mv)
            if rv is None:
                # deterministic import: MOPED re-derivation of sigma
                sigma = np.maximum(spec.moped_delta * np.abs(np.ravel(mv)), 1e-12)
                rho[e.offset:e.offset + e.size] = np.log(np.expm1(sigma))
        if rv is not None:
            rho[e.offset:e.offset + e.size] = np.ravel(rv)

    new_post = PackedPosterior(mu=jnp.asarray(mu), rho=jnp.asarray(rho), det=det)
    bs = jax.tree_util.tree_map(jnp.asarray, bs)
    logger.info("Torch import: %(loaded)d loaded, %(dropped)d dropped, "
                "%(ignored)d ignored", stats)
    try:
        # by-name coverage vs the expected inventory (post-remap form;
        # fc2.* is legitimately absent under a head swap)
        from multimodal_auv_tpu.interop.hf_manifest import (
            audit_coverage,
            expected_checkpoint_keys,
            log_coverage,
        )

        expected = expected_checkpoint_keys(bundle, published=False,
                                            include_buffers=True)
        if drop_head:
            expected = {k: v for k, v in expected.items()
                        if not k.startswith("fc2.")}
        audit = audit_coverage(state_dict, expected)
        stats["missing"] = audit["missing"]
        stats["unexpected"] = audit["unexpected"]
        log_coverage(audit, name="torch import")
    except Exception as e:  # the audit must never break an import
        logger.warning("Import coverage audit unavailable: %s", e)
    return new_post, bs, stats


def init_trunks_from_torchvision(
    bundle,
    state_dict: Dict[str, np.ndarray],
    prefixes: Tuple[str, ...] = ("image_model_feat", "bathy_model_feat",
                                 "sss_model_feat"),
    *,
    spec: Optional[BNNPriorSpec] = None,
) -> Tuple[PackedPosterior, Any, Dict[str, int]]:
    """MOPED-initialise ResNet trunks from a torchvision-*named* ResNet-50
    state dict (plain ``conv1.weight``, ``layer1.0.conv1.weight``,
    ``fc.weight`` keys — the IMAGENET1K_V1 format the reference feeds to
    ``dnn_to_bnn`` + MOPED, models/model_utils.py:26-64).

    The dict is re-keyed under each trunk prefix and merged; deterministic
    weights become mu with sigma = delta*|w| (MOPED), BN affine + running
    stats load directly, and keys with no geometric match (the 1000-class
    ``fc.*`` head; ``conv1`` for the 1-channel SSS trunk) are dropped —
    mirroring the reference's fc->Identity replacement and fresh conv1.
    """
    rekeyed = {}
    for p in prefixes:
        pref = f"{p}." if p else ""
        for k, v in state_dict.items():
            rekeyed[f"{pref}{k}"] = v
    return import_posterior(bundle, rekeyed, spec=spec)


def load_and_prepare_multimodal_model(bundle, weights_path: str,
                                      num_classes: int = 7):
    """End-to-end equivalent of Example_Inference_model.py:78-112."""
    sd = load_torch_state_dict(weights_path)
    post, bs, stats = import_posterior(bundle, sd, num_classes=num_classes)
    bundle.post = post
    bundle.batch_stats = bs
    return bundle, stats
