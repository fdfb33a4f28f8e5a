"""Grouped-convolution trunk fusion — one conv per layer for all three
modalities.

The multimodal forward (models/fusion.py — the hot loop of
/root/reference/src/Multimodal_AUV/inference/predictors.py:54-66 and
base_models.py:74-89) runs three separate ResNet trunks whose conv
geometries are identical except conv1's input channels. At the reference
operating point (batch 4) each conv is too small to fill the MXU
(~40% utilisation measured inside the MC loop, BENCH_NOTES.md). Here the
three modalities are concatenated channel-wise (SSS zero-padded from 1 to
3 input channels — zero kernel columns make the padding exact) and every
trunk layer runs as ONE convolution with ``feature_group_count=3``:
3x the arithmetic per op at the same op count, which is exactly the lever
for the small-batch MXU-starvation regime.

The function consumes the STANDARD MultiModalModel param tree (packed
posterior layout, checkpoints, interop all unchanged): per-layer grouped
kernels are built by concatenating the three trunks' kernels along the
output-channel axis on the fly — XLA fuses these concats into the
consuming convolutions the same way it fuses the unpack slices
(BENCH_NOTES.md HLO inspection). BatchNorm is per-channel, so the grouped
BN concatenates (scale, bias) and computes masked train-mode statistics
over the concatenated channels — bit-equivalent per modality group.

Inference-only (train-mode BN statistics are computed but running-stat
updates are not emitted — the reference's predict path never reads them,
predictors.py:27). Numerical equivalence with the unfused module is pinned
by tests/test_models.py::test_fused_trunks_match_module.

MEASURED AND REJECTED as the default (BENCH_NOTES.md, round 3): 37.4 vs
55.4 patches/s at batch 4 x 20 MC, 9.6 vs 22.6 at batch 1 — XLA:TPU
lowers grouped convolutions by block-diagonal kernel expansion (3x
arithmetic, 2/3 of it zeros), so the fusion costs more than the
small-batch MXU starvation it removes. Kept opt-in (`fused_trunks=True`)
as the documented experiment.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

TRUNKS = ("image_model_feat", "bathy_model_feat", "sss_model_feat")


def _dense(p, x, dtype):
    return x.astype(dtype) @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def _attention(p, f, dtype):
    """models/fusion.py::AdditiveAttention with explicit params."""
    keys = _dense(p["key_projection"], f, dtype)
    values = _dense(p["value_projection"], f, dtype)
    queries = _dense(p["query_projection"], f, dtype)
    scores = jnp.tanh(queries + keys)
    weights = jax.nn.softmax(_dense(p["attention_mechanism"], scores, dtype),
                             axis=1)
    return values * weights


def fused_trunks_features(params, main, bathy, sss, *, stage_sizes,
                          dtype=jnp.bfloat16, batch_mask=None,
                          eps: float = 1e-5) -> Tuple[jax.Array, ...]:
    """Run all three ResNet trunks as one grouped-conv program.

    Returns (image_features, bathy_features, sss_features), each
    (batch, feature_size) — identical values to three separate
    ``ResNet.apply`` calls in train-mode BN."""
    if sss.shape[-1] == 1:
        sss = jnp.pad(sss, ((0, 0), (0, 0), (0, 0), (0, 2)))
    x = jnp.concatenate([jnp.asarray(main), jnp.asarray(bathy),
                         jnp.asarray(sss)], axis=-1).astype(dtype)
    mask4 = None
    if batch_mask is not None:
        m = batch_mask.reshape(-1, 1, 1, 1) if batch_mask.ndim == 1 \
            else batch_mask
        mask4 = m.astype(bool)

    def node(t, name, sub):
        return (params[t] if sub is None else params[t][sub])[name]

    def gconv(y, name, stride, pad, sub=None, pad_sss_in=False):
        ks = []
        for t in TRUNKS:
            k = node(t, name, sub)["kernel"]
            if pad_sss_in and k.shape[2] == 1:
                # SSS conv1 is 1-in; zero kernel columns make the zero-
                # padded input channels exact no-ops
                k = jnp.pad(k, ((0, 0), (0, 0), (0, 2), (0, 0)))
            ks.append(k.astype(dtype))
        k = jnp.concatenate(ks, axis=3)
        return lax.conv_general_dilated(
            y, k, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=3)

    def gbn(y, name, sub=None):
        # flax BatchNorm train-mode numerics (f32 stats, fast variance,
        # masked mean), over the concatenated per-modality channels
        scale = jnp.concatenate(
            [node(t, name, sub)["scale"] for t in TRUNKS]).astype(jnp.float32)
        bias = jnp.concatenate(
            [node(t, name, sub)["bias"] for t in TRUNKS]).astype(jnp.float32)
        yf = y.astype(jnp.float32)
        where = None if mask4 is None else jnp.broadcast_to(mask4, yf.shape)
        mean = jnp.mean(yf, (0, 1, 2), where=where)
        mean2 = jnp.mean(yf * yf, (0, 1, 2), where=where)
        var = mean2 - mean * mean
        out = (yf - mean) * (lax.rsqrt(var + eps) * scale) + bias
        return out.astype(dtype)

    x = gconv(x, "conv1", 2, [(3, 3), (3, 3)], pad_sss_in=True)
    x = nn.relu(gbn(x, "bn1"))
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    for stage, blocks in enumerate(stage_sizes):
        for blk in range(blocks):
            stride = 2 if (stage > 0 and blk == 0) else 1
            sub = f"layer{stage + 1}_{blk}"
            identity = x
            out = gconv(x, "conv1", 1, [(0, 0), (0, 0)], sub=sub)
            out = nn.relu(gbn(out, "bn1", sub=sub))
            out = gconv(out, "conv2", stride, [(1, 1), (1, 1)], sub=sub)
            out = nn.relu(gbn(out, "bn2", sub=sub))
            out = gconv(out, "conv3", 1, [(0, 0), (0, 0)], sub=sub)
            out = gbn(out, "bn3", sub=sub)
            if blk == 0:
                identity = gconv(x, "downsample_conv", stride,
                                 [(0, 0), (0, 0)], sub=sub)
                identity = gbn(identity, "downsample_bn", sub=sub)
            x = nn.relu(out + identity)

    feats = jnp.mean(x, axis=(1, 2))  # (B, 3*feature_size)
    c = feats.shape[-1] // 3
    return feats[:, :c], feats[:, c:2 * c], feats[:, 2 * c:]


def fused_multimodal_logits(params, main, bathy, sss, *, stage_sizes,
                            dtype=jnp.bfloat16, batch_mask=None):
    """Full MultiModalModel forward with grouped trunks + the standard
    attention/fc head (models/fusion.py geometry), from the standard param
    tree."""
    fi, fb, fs = fused_trunks_features(params, main, bathy, sss,
                                       stage_sizes=stage_sizes, dtype=dtype,
                                       batch_mask=batch_mask)
    combined = jnp.concatenate([
        _attention(params["attention_image"], fi, dtype),
        _attention(params["attention_bathy"], fb, dtype),
        _attention(params["attention_sss"], fs, dtype),
    ], axis=1)
    x = _dense(params["fc"], combined, dtype)
    x = _dense(params["fc1"], x, dtype)
    return _dense(params["fc2"], x, dtype)


@dataclass(frozen=True)
class FusedMultiModal:
    """Drop-in ``module`` for engine.mc.mc_logits: same ``apply`` contract
    as MultiModalModel (train-mode only; running-stat updates are returned
    unchanged — the predict path discards them, engine/mc.py:115)."""

    stage_sizes: Tuple[int, ...]
    width: int
    dtype: Any = jnp.bfloat16

    def apply(self, variables, *inputs, train: bool = True, batch_mask=None,
              mutable=False):
        if not train:
            # the fused twin computes train-mode BN (current-batch stats)
            # only; silently returning them for an eval-mode caller would
            # be numerically wrong with no signal
            raise NotImplementedError(
                "FusedMultiModal supports train=True (MC predict) only — "
                "use the unfused MultiModalModel for eval-mode BN")
        out = fused_multimodal_logits(variables["params"], *inputs,
                                      stage_sizes=tuple(self.stage_sizes),
                                      dtype=self.dtype,
                                      batch_mask=batch_mask)
        if mutable:
            return out, {"batch_stats": variables.get("batch_stats", {})}
        return out


def fused_module_for(module) -> FusedMultiModal:
    """Build the grouped-trunk twin of a MultiModalModel instance."""
    return FusedMultiModal(stage_sizes=tuple(module.stage_sizes),
                           width=module.width, dtype=module.dtype)
