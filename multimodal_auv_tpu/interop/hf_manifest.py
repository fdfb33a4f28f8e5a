"""Expected key inventory of the published HF checkpoint — the import audit.

The real pretrained artifact (``sams-tom/multimodal-auv-bathy-bnn-classifier
/ multimodal-bnn/pytorch_model.bin``) cannot be downloaded in this offline
environment, so the next-best evidence for import correctness is an exact,
independently-derived INVENTORY of the keys that artifact must contain,
plus a coverage audit of any state dict against it. The inventory is
derived from the reference's own construction:

  * module tree: ``MultiModalModel`` (base_models.py:54-90) — three
    ResNet-50 trunks at ``{image,bathy,sss}_model_feat`` (published with an
    extra ``.model.`` nesting level, stripped at load time —
    Example_Inference_model.py:88-93), three ``AdditiveAttention`` heads
    (``query_projection``/``key_projection``/``value_projection``/
    ``attention_mechanism``, base_models.py:38-41), and ``fc``/``fc1``/
    ``fc2`` (base_models.py:60-65);
  * ``dnn_to_bnn`` replacement naming (bayesian-torch): every Conv2d
    becomes ``Conv2dReparameterization`` with ``mu_kernel``/``rho_kernel``
    parameters (ResNet convs carry no bias) and ``eps_kernel``/
    ``prior_weight_mu``/``prior_weight_sigma`` BUFFERS; every Linear
    becomes ``LinearReparameterization`` with ``mu_weight``/``rho_weight``/
    ``mu_bias``/``rho_bias`` parameters and ``eps_weight``/``eps_bias``/
    ``prior_weight_mu``/``prior_weight_sigma``/``prior_bias_mu``/
    ``prior_bias_sigma`` buffers — buffers land in the state dict and must
    be IGNORED on import;
  * torch BatchNorm2d: ``weight``/``bias`` (affine), ``running_mean``/
    ``running_var`` (statistics), ``num_batches_tracked`` (ignored).

Rather than hand-typing ~900 keys, the inventory is GENERATED from our own
flax model bundle's PackMeta + det/batch_stats trees (the same geometry,
validated against the reference by the logits/gradient parity goldens) and
cross-validated two ways:

  * tests/test_interop.py pins the generated inventory against the
    in-repo bayesianized torch twin's actual ``state_dict()`` keys
    (published=False form: zero missing, zero unexpected);
  * the checked-in ``expected_hf_keys.json`` (full ResNet-50 geometry,
    7 classes, published form) is re-generated and compared by the same
    test, so geometry drift cannot silently stale the manifest.

``audit_coverage`` classifies a real checkpoint's keys against the
inventory; ``import_posterior`` runs and logs it on every import (the
result rides ``stats["missing"]``/``stats["unexpected"]``). The
one-command runbook for a networked host is docs/HF_IMPORT.md.
"""
from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

TRUNKS = ("image_model_feat", "bathy_model_feat", "sss_model_feat")

_LAYER_FLAX_RE = re.compile(r"^layer(\d+)_(\d+)$")


def _flax_to_torch_mods(path) -> Tuple[str, ...]:
    """Inverse of torch_import._segments_to_flax."""
    out = []
    for s in path:
        m = _LAYER_FLAX_RE.match(s)
        if m:
            out += [f"layer{m.group(1)}", m.group(2)]
        elif s == "downsample_conv":
            out += ["downsample", "0"]
        elif s == "downsample_bn":
            out += ["downsample", "1"]
        else:
            out.append(s)
    return tuple(out)


def _torch_prefix(path, published: bool) -> str:
    mods = _flax_to_torch_mods(path)
    if published and mods and mods[0] in TRUNKS:
        mods = (mods[0], "model") + mods[1:]
    return ".".join(mods)


def _torch_shape(flax_shape) -> Tuple[int, ...]:
    s = tuple(int(x) for x in flax_shape)
    if len(s) == 4:  # HWIO -> OIHW
        return (s[3], s[2], s[0], s[1])
    if len(s) == 2:  # (in, out) -> (out, in)
        return (s[1], s[0])
    return s


def _walk(tree, pre=()):
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _walk(tree[k], pre + (k,))
    else:
        yield pre, tree


def expected_checkpoint_keys(bundle, *, published: bool = True,
                             include_buffers: Optional[bool] = None
                             ) -> Dict[str, Dict[str, Any]]:
    """{torch_key: {"role": ..., "shape": [...] | None}} for the checkpoint
    the reference's construction produces from this bundle's geometry.

    ``published=True`` is the artifact form: trunk keys carry the
    ``.model.`` nesting and every variational layer contributes its
    eps/prior buffers. ``published=False`` is the post-remap, params-only
    form (what the in-repo torch twin emits — used to cross-validate this
    generator offline). Roles: mu / rho / bn_affine / bn_stats / ignored
    (buffers + num_batches_tracked — present in the file, skipped by the
    importer)."""
    import jax

    if include_buffers is None:
        include_buffers = published
    out: Dict[str, Dict[str, Any]] = {}

    # variational layers, keyed by (module path) -> {leaf: shape}
    by_mod: Dict[Tuple[str, ...], Dict[str, Tuple[int, ...]]] = {}
    for e in bundle.meta.entries:
        by_mod.setdefault(tuple(e.path[:-1]), {})[e.path[-1]] = e.shape

    for mod_path, leaves in sorted(by_mod.items()):
        pre = _torch_prefix(mod_path, published)
        k_shape = leaves.get("kernel")
        is_conv = k_shape is not None and len(k_shape) == 4
        wname = "kernel" if is_conv else "weight"
        if k_shape is not None:
            tshape = list(_torch_shape(k_shape))
            out[f"{pre}.mu_{wname}"] = {"role": "mu", "shape": tshape}
            out[f"{pre}.rho_{wname}"] = {"role": "rho", "shape": tshape}
            if include_buffers:
                out[f"{pre}.eps_{wname}"] = {"role": "ignored",
                                             "shape": tshape}
                out[f"{pre}.prior_weight_mu"] = {"role": "ignored",
                                                 "shape": tshape}
                out[f"{pre}.prior_weight_sigma"] = {"role": "ignored",
                                                    "shape": tshape}
        b_shape = leaves.get("bias")
        if b_shape is not None:
            tshape = list(b_shape)
            out[f"{pre}.mu_bias"] = {"role": "mu", "shape": tshape}
            out[f"{pre}.rho_bias"] = {"role": "rho", "shape": tshape}
            if include_buffers:
                out[f"{pre}.eps_bias"] = {"role": "ignored", "shape": tshape}
                out[f"{pre}.prior_bias_mu"] = {"role": "ignored",
                                               "shape": tshape}
                out[f"{pre}.prior_bias_sigma"] = {"role": "ignored",
                                                  "shape": tshape}

    # BatchNorm affine (det tree) + statistics (batch_stats tree)
    det = jax.tree_util.tree_map(np.asarray, jax.device_get(bundle.post.det))
    for path, leaf in _walk(det):
        pre = _torch_prefix(path[:-1], published)
        name = {"scale": "weight", "bias": "bias"}[path[-1]]
        out[f"{pre}.{name}"] = {"role": "bn_affine",
                                "shape": list(np.shape(leaf))}
    bs = jax.tree_util.tree_map(np.asarray, jax.device_get(bundle.batch_stats))
    for path, leaf in _walk(bs):
        pre = _torch_prefix(path[:-1], published)
        name = {"mean": "running_mean", "var": "running_var"}[path[-1]]
        out[f"{pre}.{name}"] = {"role": "bn_stats",
                                "shape": list(np.shape(leaf))}
        nbt = f"{pre}.num_batches_tracked"
        if nbt not in out:
            out[nbt] = {"role": "ignored", "shape": []}
    return out


def audit_coverage(state_dict: Dict[str, Any],
                   expected: Dict[str, Dict[str, Any]]) -> Dict[str, Any]:
    """Classify a (raw, ``module.``-stripped) state dict against the
    expected inventory. Returns {matched, missing, unexpected,
    shape_mismatch, by_role} — ``missing`` restricted to LOADABLE roles
    (mu/rho/bn_affine/bn_stats; absent ignored-buffers are fine)."""
    sd_keys = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd_keys[k] = v

    matched, unexpected, shape_mismatch = [], [], []
    by_role: Dict[str, int] = {}
    for k, v in sd_keys.items():
        info = expected.get(k)
        if info is None:
            unexpected.append(k)
            continue
        want = info.get("shape")
        have = list(np.shape(v)) if hasattr(v, "shape") or isinstance(
            v, (np.ndarray, list, tuple)) else []
        if want not in (None, []) and have and want != have:
            shape_mismatch.append((k, have, want))
            continue
        matched.append(k)
        by_role[info["role"]] = by_role.get(info["role"], 0) + 1
    missing = [k for k, info in expected.items()
               if k not in sd_keys and info["role"] != "ignored"]
    return {"matched": matched, "missing": sorted(missing),
            "unexpected": sorted(unexpected),
            "shape_mismatch": shape_mismatch, "by_role": by_role}


def log_coverage(audit: Dict[str, Any], *, name: str = "checkpoint") -> None:
    logger.info(
        "%s coverage: %d matched (%s), %d missing, %d unexpected, "
        "%d shape mismatches", name, len(audit["matched"]),
        ", ".join(f"{k}={v}" for k, v in sorted(audit["by_role"].items())),
        len(audit["missing"]), len(audit["unexpected"]),
        len(audit["shape_mismatch"]))
    for k in audit["missing"][:10]:
        logger.warning("%s: expected key missing: %s", name, k)
    for k in audit["unexpected"][:10]:
        logger.warning("%s: unexpected key: %s", name, k)
    for k, have, want in audit["shape_mismatch"][:10]:
        logger.warning("%s: %s shape %s != expected %s", name, k, have, want)


MANIFEST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "expected_hf_keys.json")


def build_flagship_manifest() -> Dict[str, Dict[str, Any]]:
    """The shipped inventory: full ResNet-50 geometry, 7 classes,
    published (.model.-nested, with buffers) form."""
    import jax

    from multimodal_auv_tpu.config import BNNPriorSpec
    from multimodal_auv_tpu.models.model_utils import (
        ArchConfig,
        make_multimodal_bundle,
    )

    bundle = make_multimodal_bundle(7, BNNPriorSpec(), jax.random.PRNGKey(0),
                                    ArchConfig())
    return expected_checkpoint_keys(bundle, published=True)


def main(argv=None) -> int:
    """CLI: audit a downloaded checkpoint against the shipped manifest.

    python -m multimodal_auv_tpu.interop.hf_manifest <pytorch_model.bin>
    python -m multimodal_auv_tpu.interop.hf_manifest --write-manifest
    """
    import argparse

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("checkpoint", nargs="?", default=None,
                    help="path to a torch state-dict checkpoint to audit")
    ap.add_argument("--write-manifest", action="store_true",
                    help=f"regenerate {MANIFEST_PATH}")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(message)s")

    if args.write_manifest:
        man = build_flagship_manifest()
        with open(MANIFEST_PATH, "w") as f:
            json.dump(man, f, indent=0, sort_keys=True)
        print(f"wrote {len(man)} keys to {MANIFEST_PATH}")
        return 0
    if not args.checkpoint:
        print("nothing to do (pass a checkpoint path or --write-manifest)")
        return 2
    from multimodal_auv_tpu.interop.torch_import import load_torch_state_dict

    with open(MANIFEST_PATH) as f:
        expected = json.load(f)
    # load RAW (no .model. remap): the manifest is in published form
    import torch

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    sd = {k: np.asarray(v) for k, v in raw.items()}
    audit = audit_coverage(sd, expected)
    log_coverage(audit, name=os.path.basename(args.checkpoint))
    ok = not audit["missing"] and not audit["shape_mismatch"]
    print("COVERAGE OK" if ok else "COVERAGE INCOMPLETE")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
