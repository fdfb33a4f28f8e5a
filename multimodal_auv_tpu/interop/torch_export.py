"""Export the packed posterior back to a bayesian-torch-style state dict.

The inverse of interop/torch_import.py: a model trained here can be handed
back to the PyTorch reference stack (or published to HF Hub in the format
`sams-tom/multimodal-auv-bathy-bnn-classifier` uses) — key naming matches
what bayesian-torch's dnn_to_bnn produces and what the reference's loaders
expect after their ``module.`` / ``*_model_feat.model.`` strip
(/root/reference/src/Multimodal_AUV/Examples/Example_Inference_model.py:
82-112, train/checkpointing.py:79-102):

    conv:    {path}.mu_kernel / {path}.rho_kernel   (OIHW)
    linear:  {path}.mu_weight / {path}.rho_weight   ((out, in))
    bias:    {path}.mu_bias   / {path}.rho_bias
    BN:      {path}.weight / {path}.bias / {path}.running_mean /
             {path}.running_var / {path}.num_batches_tracked

Round-trip guarantee: ``import_posterior(bundle, export_posterior(bundle))``
reproduces (mu, rho, det, batch_stats) exactly (tests/test_interop.py).
"""
from __future__ import annotations

import logging
import re
from typing import Dict, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)

_FLAX_LAYER_RE = re.compile(r"^layer(\d+)_(\d+)$")


def _flax_to_segments(mods: Tuple[str, ...]) -> Tuple[str, ...]:
    """Inverse of torch_import._segments_to_flax."""
    out = []
    for s in mods:
        m = _FLAX_LAYER_RE.match(s)
        if m:
            out += [f"layer{m.group(1)}", m.group(2)]
        elif s == "downsample_conv":
            out += ["downsample", "0"]
        elif s == "downsample_bn":
            out += ["downsample", "1"]
        else:
            out.append(s)
    return tuple(out)


def _to_torch_array(arr: np.ndarray) -> np.ndarray:
    """Inverse of torch_import._to_flax_array."""
    if arr.ndim == 4:  # HWIO -> OIHW
        return np.transpose(arr, (3, 2, 0, 1))
    if arr.ndim == 2:  # (in, out) -> (out, in)
        return np.transpose(arr, (1, 0))
    return arr


def _walk(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, prefix + (k,))
    else:
        yield prefix, tree


def export_posterior(bundle) -> Dict[str, np.ndarray]:
    """Build a bayesian-torch-named state dict (numpy values, f32) from a
    ModelBundle's posterior + batch_stats."""
    meta, post = bundle.meta, bundle.post
    mu = np.asarray(jax.device_get(post.mu), np.float32)
    rho = np.asarray(jax.device_get(post.rho), np.float32)
    sd: Dict[str, np.ndarray] = {}

    for e in meta.entries:
        mods, leaf = e.path[:-1], e.path[-1]
        base = ".".join(_flax_to_segments(mods))
        mu_leaf = np.ravel(mu[e.offset:e.offset + e.size]).reshape(e.shape)
        rho_leaf = np.ravel(rho[e.offset:e.offset + e.size]).reshape(e.shape)
        if leaf == "kernel":
            # 4-D conv kernels are bayesian-torch's *_kernel; 2-D dense
            # matrices are *_weight (torch_import.torch_key_to_flax)
            suffix = "kernel" if len(e.shape) == 4 else "weight"
        else:
            suffix = "bias"
        sd[f"{base}.mu_{suffix}"] = _to_torch_array(mu_leaf)
        sd[f"{base}.rho_{suffix}"] = _to_torch_array(rho_leaf)

    det = jax.tree_util.tree_map(np.asarray, jax.device_get(post.det))
    for path, val in _walk(det):
        mods, leaf = path[:-1], path[-1]
        base = ".".join(_flax_to_segments(mods))
        if leaf == "scale":  # flax BN scale -> torch BN weight
            sd[f"{base}.weight"] = np.asarray(val, np.float32)
        elif leaf == "bias":
            sd[f"{base}.bias"] = np.asarray(val, np.float32)
        else:
            logger.warning("Unmapped deterministic leaf %s.%s", base, leaf)

    bs = jax.tree_util.tree_map(np.asarray, jax.device_get(bundle.batch_stats))
    for path, val in _walk(bs):
        mods, leaf = path[:-1], path[-1]
        base = ".".join(_flax_to_segments(mods))
        name = {"mean": "running_mean", "var": "running_var"}.get(leaf)
        if name is None:
            logger.warning("Unmapped batch stat %s.%s", base, leaf)
            continue
        sd[f"{base}.{name}"] = np.asarray(val, np.float32)
        # torch BN tracks this; emit 0 so strict loaders are satisfied
        key = f"{base}.num_batches_tracked"
        if key not in sd:
            sd[key] = np.zeros((), np.int64)

    return sd


def save_torch_checkpoint(bundle, path: str) -> Dict[str, int]:
    """torch.save an exported state dict (CPU tensors) at ``path`` —
    loadable by the reference's load_and_fix_state_dict /
    load_and_prepare_multimodal_model."""
    import torch

    sd = export_posterior(bundle)
    # copy: jax.device_get arrays can be non-writable views, which torch
    # tensors cannot wrap safely
    torch.save({k: torch.from_numpy(np.array(v, copy=True))
                for k, v in sd.items()}, path)
    logger.info("Exported %d tensors to %s", len(sd), path)
    return {"exported": len(sd)}
