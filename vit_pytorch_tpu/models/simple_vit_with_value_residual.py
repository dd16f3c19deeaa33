"""SimpleViT + value residual (reference
simple_vit_with_value_residual.py:102-159): layer-1 values are mixed into
later layers' values with a learned per-head sigmoid mix (lines 41-67)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import exists, pair


class ValueResidualAttention(nn.Module):
    """reference simple_vit_with_value_residual.py:40-76."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    learned_value_residual_mix: bool = False

    @nn.compact
    def __call__(self, x, value_residual=None):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        if exists(value_residual):
            if self.learned_value_residual_mix:
                mix = nn.Dense(h, name="to_residual_mix")(x)
                mix = jax.nn.sigmoid(mix).transpose(0, 2, 1)[..., None]
            else:
                mix = 0.5
            v = v * mix + value_residual * (1.0 - mix)

        out = dot_product_attention(q, k, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out), v


class SimpleViT(nn.Module):
    """reference simple_vit_with_value_residual.py:102 — same constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )

        value_residual = None
        for i in range(self.depth):
            attn_out, values = ValueResidualAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                learned_value_residual_mix=i > 0,
                name=f"layers_{i}_attn",
            )(x, value_residual=value_residual)
            if value_residual is None:
                value_residual = values
            x = attn_out + x
            x = FeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
            )(x, train=train) + x

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(x.mean(axis=1))
