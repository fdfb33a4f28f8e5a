"""ResNet-50 in flax linen, NHWC, bf16-activation / f32-param — the TPU
re-design of the reference's torchvision trunks.

Reference behavior being matched (not translated):
  * ``ResNet50Custom``: torchvision resnet50 with conv1 swapped for an
    ``input_channels``-in 7x7/2 conv and fc -> Linear(2048, num_classes)
    (/root/reference/src/Multimodal_AUV/models/base_models.py:7-29).
  * ``load_pretrained_resnet_as_feature_extractor``: fc replaced by
    Identity so the trunk emits 2048-d pooled features
    (/root/reference/src/Multimodal_AUV/models/model_utils.py:52-64).

Architecture is the standard torchvision "v1.5" bottleneck (stride on the
3x3 conv), so imported torch weights line up exactly. Module names mirror
torch's state-dict keys (conv1, bn1, layer{i}_{j}, fc) to make the interop
key mapping mechanical (see interop/torch_import.py).

All convs are bias-free (as in torchvision) and BatchNorm is deterministic
under bayesianization (dnn_to_bnn converts only Conv/Linear — SURVEY.md §2.1).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) + skip."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = True, batch_mask=None):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
            name=name,
        )
        # batch_mask: optional bool (B,1,1,1) — train-mode statistics are
        # computed over real rows only, so padded ragged-tail rows cannot
        # pollute BN (exact-batch parity with the reference, which never pads).
        bn = lambda name: (lambda y: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )(y, mask=batch_mask))

        identity = x
        out = conv(self.planes, 1, 1, "conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = conv(self.planes, 3, self.stride, "conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = conv(self.planes * self.expansion, 1, 1, "conv3")(out)
        out = bn("bn3")(out)

        if self.downsample:
            identity = conv(self.planes * self.expansion, 1, self.stride,
                            "downsample_conv")(x)
            identity = bn("downsample_bn")(identity)

        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Generic ResNet trunk. ``num_classes=None`` => feature extractor
    (fc == Identity), emitting (batch, 512*width_factor) pooled features."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, batch_mask=None):
        if batch_mask is not None and batch_mask.ndim == 1:
            batch_mask = batch_mask.reshape(-1, 1, 1, 1).astype(bool)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="bn1")(
                             x, mask=batch_mask)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        planes = self.width
        for stage, blocks in enumerate(self.stage_sizes):
            for blk in range(blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    downsample=(blk == 0),
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x, train=train, batch_mask=batch_mask)
            planes *= 2

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (B, 2048)
        if self.num_classes is not None:
            x = nn.Dense(self.num_classes, dtype=self.dtype,
                         param_dtype=self.param_dtype, name="fc")(x)
        return x

    @property
    def feature_size(self) -> int:
        return self.width * 8 * Bottleneck.expansion


def resnet50(num_classes: Optional[int] = None, dtype=jnp.float32,
             param_dtype=jnp.float32, width: int = 64,
             stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)) -> ResNet:
    return ResNet(stage_sizes=stage_sizes, width=width,
                  num_classes=num_classes, dtype=dtype,
                  param_dtype=param_dtype)


class ResNet50Custom(nn.Module):
    """Unimodal classifier: ResNet-50 trunk + fc head, accepting an arbitrary
    number of input channels (the channel count is set by the data, NHWC).

    Equivalent of /root/reference/src/Multimodal_AUV/models/base_models.py:7-29;
    the trunk lives under the submodule name "model" to mirror the torch
    state-dict prefix ``model.``.
    """

    num_classes: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    width: int = 64
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = True, batch_mask=None):
        return ResNet(stage_sizes=self.stage_sizes, width=self.width,
                      num_classes=self.num_classes, dtype=self.dtype,
                      param_dtype=self.param_dtype, name="model")(
                          x, train=train, batch_mask=batch_mask)

    def get_feature_size(self) -> int:
        return self.width * 8 * Bottleneck.expansion
