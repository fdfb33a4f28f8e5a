"""Multimodal fusion head — exact geometry of the reference.

* ``AdditiveAttention``: a 2048->128 self-gating block. Q, K, V are
  Dense(2048->128); weights = softmax(Dense(128->128)(tanh(Q+K)), axis=1);
  output = V * weights, elementwise ("No sum here!") — 128-d gated features
  (/root/reference/src/Multimodal_AUV/models/base_models.py:35-52).
* ``MultiModalModel``: three ResNet-50 feature trunks (optical RGB, bathy
  RGB, SSS 1-ch) -> per-modality AdditiveAttention -> concat(3x128=384) ->
  fc Dense(384,1284) -> fc1 Dense(1284,32) -> fc2 Dense(32,num_classes),
  with *no* nonlinearities between the fc layers — a faithful reproduction
  of base_models.py:54-90 (including the unused ``attention_type`` knob).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodal_auv_tpu.models.resnet import ResNet


class AdditiveAttention(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query):
        dense = lambda name: nn.Dense(self.hidden_dim, dtype=self.dtype,
                                      param_dtype=self.param_dtype, name=name)
        keys = dense("key_projection")(query)
        values = dense("value_projection")(query)
        queries = dense("query_projection")(query)

        attention_scores = jnp.tanh(queries + keys)
        attention_weights = nn.softmax(
            dense("attention_mechanism")(attention_scores), axis=1
        )
        return values * attention_weights  # elementwise gate, no reduction


class MultiModalModel(nn.Module):
    num_classes: int
    attention_type: str = "scaled_dot_product"  # stored but unused (parity)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32
    width: int = 64
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    hidden_dim: int = 128
    fusion_dims: Tuple[int, int] = (1284, 32)

    @nn.compact
    def __call__(self, inputs, bathy_tensor, sss_image, train: bool = True,
                 batch_mask=None):
        trunk = lambda name: ResNet(
            stage_sizes=self.stage_sizes, width=self.width, num_classes=None,
            dtype=self.dtype, param_dtype=self.param_dtype, name=name,
        )
        attn = lambda name: AdditiveAttention(
            hidden_dim=self.hidden_dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name,
        )

        image_features = trunk("image_model_feat")(
            inputs, train=train, batch_mask=batch_mask)
        bathy_features = trunk("bathy_model_feat")(
            bathy_tensor, train=train, batch_mask=batch_mask)
        sss_features = trunk("sss_model_feat")(
            sss_image, train=train, batch_mask=batch_mask)

        image_attended = attn("attention_image")(image_features)
        bathy_attended = attn("attention_bathy")(bathy_features)
        sss_attended = attn("attention_sss")(sss_features)

        combined = jnp.concatenate(
            [image_attended, bathy_attended, sss_attended], axis=1
        )
        dense = lambda f, name: nn.Dense(f, dtype=self.dtype,
                                         param_dtype=self.param_dtype, name=name)
        x = dense(self.fusion_dims[0], "fc")(combined)
        x = dense(self.fusion_dims[1], "fc1")(x)
        return dense(self.num_classes, "fc2")(x)
