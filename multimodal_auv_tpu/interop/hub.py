"""HuggingFace Hub weight retrieval (gated for offline environments).

Reference: /root/reference/src/Multimodal_AUV/functions/functions.py:43-64
downloads ``sams-tom/multimodal-auv-bathy-bnn-classifier`` /
``multimodal-bnn/pytorch_model.bin``.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

DEFAULT_REPO_ID = "sams-tom/multimodal-auv-bathy-bnn-classifier"
DEFAULT_SUBFOLDER = "multimodal-bnn"
DEFAULT_FILENAME = f"{DEFAULT_SUBFOLDER}/pytorch_model.bin"


def fetch_pretrained_weights(
    repo_id: str = DEFAULT_REPO_ID,
    filename: str = DEFAULT_FILENAME,
    local_path: Optional[str] = None,
) -> Optional[str]:
    """Return a local path to the pretrained torch checkpoint.

    An explicit ``local_path`` is authoritative: it is returned if it
    exists and raises FileNotFoundError otherwise (no silent hub
    fallback — see the inline comment). With no ``local_path``, a
    cached/hub download is attempted; returns None (with a warning) when
    offline and uncached — callers decide whether random init is
    acceptable."""
    if local_path:
        if os.path.exists(local_path):
            return local_path
        # loud, not a fallback: silently serving the generic hub weights
        # after a typo'd --model_weights path would attribute the survey's
        # results to the wrong model
        raise FileNotFoundError(
            f"model weights path {local_path!r} does not exist (omit it to "
            "use the HuggingFace Hub checkpoint)")

    try:
        from huggingface_hub import hf_hub_download

        if not _env_offline() and not _hub_reachable():
            # zero-egress environments: without this, huggingface_hub's
            # connect+retry backoff stalls the pipeline for tens of seconds
            # before failing. A cached download may still exist, so fall
            # through with local_files_only instead of giving up.
            logger.warning("HuggingFace Hub unreachable; checking the local "
                           "cache only (pass a local weights path to skip).")
            return hf_hub_download(repo_id=repo_id, filename=filename,
                                   local_files_only=True)
        return hf_hub_download(repo_id=repo_id, filename=filename)
    except Exception as e:
        logger.warning(
            "Could not fetch pretrained weights from the HuggingFace Hub "
            "(%s). Offline environment? Pass a local weights path.", e)
        return None


def _env_offline() -> bool:
    """HF_HUB_OFFLINE with huggingface_hub's parsing: '0'/'false'/'no'/''
    mean ONLINE (a raw truthiness test would treat the string '0' as
    offline and skip the reachability fast-fail probe)."""
    return os.environ.get("HF_HUB_OFFLINE", "").upper() in (
        "1", "ON", "YES", "TRUE")


def _hub_reachable(timeout: float = 3.0) -> bool:
    """Cheap TCP connect probe to the Hub endpoint (no request issued).

    Behind an HTTP(S) proxy the endpoint itself is not directly
    connectable even though hf_hub_download (requests honors
    *_PROXY env vars; a raw socket does not) would succeed — so probe
    the PROXY address instead of the endpoint in that case."""
    import socket
    from urllib.parse import urlparse

    endpoint = os.environ.get("HF_ENDPOINT", "https://huggingface.co")
    parsed = urlparse(endpoint)
    proxy = (os.environ.get("HTTPS_PROXY") or os.environ.get("https_proxy")
             if parsed.scheme == "https" else None) or \
        os.environ.get("HTTP_PROXY") or os.environ.get("http_proxy") or \
        os.environ.get("ALL_PROXY") or os.environ.get("all_proxy")
    if proxy:
        parsed = urlparse(proxy if "//" in proxy else "http://" + proxy)
    port = parsed.port or (80 if parsed.scheme == "http" else 443)
    try:
        socket.create_connection((parsed.hostname, port), timeout=timeout).close()
        return True
    except OSError:
        return False


def export_for_hub(bundle, out_dir: str,
                   subfolder: str = DEFAULT_SUBFOLDER) -> str:
    """Write the exact repo layout the reference downloads
    (``{subfolder}/pytorch_model.bin``, functions.py:60-63) from a trained
    bundle, ready for ``huggingface_hub.upload_folder``. Returns the
    checkpoint path. The file round-trips through both this package's
    importer and the reference's own loaders (interop/torch_export.py)."""
    from multimodal_auv_tpu.interop.torch_export import save_torch_checkpoint

    target = os.path.join(out_dir, subfolder)
    os.makedirs(target, exist_ok=True)
    path = os.path.join(target, "pytorch_model.bin")
    save_torch_checkpoint(bundle, path)
    return path
