"""Run manifests: record what actually ran, next to its outputs.

The reference's provenance story is a timestamped log file
(/root/reference/src/Multimodal_AUV/functions/functions.py:107-132);
reproducing a CSV of results months later means archaeology. Each
training pipeline here drops a ``run_manifest.json`` next to its CSV
ledgers: the full argument set (JSON-safe, with the RNG seed), package
and library versions, device kind/count, and hostname/time — enough to
re-run the exact experiment or explain a regression. Written best-effort:
a manifest failure must never kill a training run.
"""
from __future__ import annotations

import json
import logging
import os
import socket
import sys
import time
from typing import Any, Dict

logger = logging.getLogger(__name__)


def _json_safe(v: Any):
    if isinstance(v, (str, int, float, bool)) or v is None:
        return v
    if isinstance(v, dict):
        return {str(k): _json_safe(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if hasattr(v, "to_dict"):
        try:
            return _json_safe(v.to_dict())
        except Exception:
            pass
    return repr(v)


def write_run_manifest(out_dir: str, kind: str,
                       config: Dict[str, Any]) -> str | None:
    """Write ``{out_dir}/run_manifest.json``. Returns the path, or None on
    any failure (logged, never raised)."""
    try:
        import jax

        import multimodal_auv_tpu

        devs = jax.devices()
        manifest = {
            "kind": kind,
            "time": time.strftime("%Y-%m-%dT%H:%M:%S%z"),
            "hostname": socket.gethostname(),
            "argv": list(sys.argv),
            "config": _json_safe(config),
            "versions": {
                "multimodal_auv_tpu": getattr(multimodal_auv_tpu,
                                              "__version__", "unknown"),
                "jax": jax.__version__,
                "python": sys.version.split()[0],
            },
            "devices": {
                "count": len(devs),
                "kind": devs[0].device_kind if devs else None,
                "platform": devs[0].platform if devs else None,
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
            },
        }
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "run_manifest.json")
        with open(path, "w") as f:
            json.dump(manifest, f, indent=1)
        logger.info("Run manifest written to %s", path)
        return path
    except Exception as e:  # never let provenance kill the run
        logger.warning("Could not write run manifest: %s", e)
        return None
