"""Device / environment utilities — the L0 layer.

Reference equivalents (/root/reference/src/Multimodal_AUV/config/paths.py,
utils/device.py): ``setup_environment_and_devices`` picked CUDA GPUs via a
pynvml memory probe and wrapped models in nn.DataParallel. On TPU there is
no occupancy probing — ``jax.devices()`` enumerates the slice, and placement
is sharding, not model wrapping (see parallel/mesh.py).
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def get_available_devices(platform: Optional[str] = None) -> List[jax.Device]:
    """All visible accelerator devices (TPU chips on a slice; CPU devices
    under the virtual-device test harness). The analogue of
    ``get_empty_gpus`` (config/paths.py:43) — idle-probing is unnecessary
    because XLA owns the whole chip."""
    try:
        return jax.devices(platform) if platform else jax.devices()
    except RuntimeError:
        return jax.devices("cpu")


def setup_environment_and_devices(
    root_dir: Optional[str] = None,
) -> Tuple[str, List[jax.Device]]:
    """Parity shim for config/paths.py:96: resolves the working directory
    (env var MULTIMODAL_AUV_ROOT > argument > cwd; no interactive input())
    and returns (root_dir, devices)."""
    root = os.environ.get("MULTIMODAL_AUV_ROOT") or root_dir or os.getcwd()
    devices = get_available_devices()
    logger.info("Using root_dir=%s, %d %s device(s)", root, len(devices),
                devices[0].platform if devices else "no")
    return root, devices


def check_model_devices(tree) -> None:
    """Log the sharding/placement of every array leaf (utils/device.py:57
    analogue)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "sharding"):
            logger.info("%s -> %s", jax.tree_util.keystr(path), leaf.sharding)
