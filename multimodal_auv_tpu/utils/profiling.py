"""Profiling — jax profiler traces viewable in TensorBoard/Perfetto.

The reference's only observability is TB scalars (SURVEY.md §5); this adds
on-device traces for kernel-level performance work.
"""
from __future__ import annotations

import contextlib
import logging
import os

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "profile_traces"):
    """Context manager: `with trace('dir'): step(...)` captures an XLA/TPU
    trace to dir (open with TensorBoard's profile plugin or Perfetto)."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)
