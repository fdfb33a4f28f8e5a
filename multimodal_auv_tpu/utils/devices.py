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


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache for production processes.

    First compile of the flagship predict/train program takes 20-40 s on
    TPU (longer through a tunnel); the reference never pays this (torch
    is eager) so a fresh CLI process here would otherwise START 20-40 s
    behind it. With the cache, every process after the first loads the
    compiled executable from disk.

    Resolution order: explicit ``cache_dir`` argument >
    ``MULTIMODAL_AUV_COMPILE_CACHE`` env var > ``~/.cache/
    multimodal_auv_tpu/jax_cache``. Set the env var to ``off``/``0`` to
    disable. Safe to call multiple times; returns the directory in use
    (or None when disabled). Cache entries are keyed by program + compiler
    version + device kind, so CPU tests and TPU runs coexist."""
    d = cache_dir or os.environ.get("MULTIMODAL_AUV_COMPILE_CACHE")
    if d is None:
        d = os.path.join(os.path.expanduser("~"), ".cache",
                         "multimodal_auv_tpu", "jax_cache")
    if str(d).strip().lower() in ("", "0", "off", "none", "disabled"):
        return None
    d = os.path.abspath(os.path.expanduser(str(d)))
    try:
        os.makedirs(d, exist_ok=True)
        changed = jax.config.jax_compilation_cache_dir != d
        jax.config.update("jax_compilation_cache_dir", d)
        if changed:
            # the cache backend is instantiated lazily ONCE; if something
            # already compiled under the old dir, the new setting would
            # silently never take effect
            from jax.experimental.compilation_cache import compilation_cache

            compilation_cache.reset_cache()
    except Exception as e:  # unwritable dir etc. — never block the run
        logger.warning("Compilation cache disabled (%s): %s", d, e)
        return None
    logger.info("Persistent compilation cache: %s", d)
    return d


def check_model_devices(tree) -> None:
    """Log the sharding/placement of every array leaf (utils/device.py:57
    analogue)."""
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if hasattr(leaf, "sharding"):
            logger.info("%s -> %s", jax.tree_util.keystr(path), leaf.sharding)
