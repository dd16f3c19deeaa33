"""SimpleViT + specialized cls-token parameters (reference
simple_vit_with_specialized_cls.py:140-205): separate LayerNorm (and, for
the first third of layers, separate qkv projection) parameter sets for the
cls token vs the patch tokens, split/concatenated by static token lengths."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import default, pair


def _specialized(mods, x, n_cls):
    """Apply per-group modules over the (cls, patches) split (reference
    Specialized, lines 36-57)."""
    parts = (x[:, :n_cls], x[:, n_cls:])
    outs = [fn(t) for fn, t in zip(mods, parts)]
    return jnp.concatenate(outs, axis=1)


class SpecializedAttention(nn.Module):
    """reference simple_vit_with_specialized_cls.py:75-116."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    specialize_qkv: bool = False

    @nn.compact
    def __call__(self, x, n_cls: int):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        norms = (
            nn.LayerNorm(epsilon=LN_EPS, name="norm_cls"),
            nn.LayerNorm(epsilon=LN_EPS, name="norm_patch"),
        )
        x = _specialized(norms, x, n_cls)

        if self.specialize_qkv:
            qkvs = (
                nn.Dense(inner * 3, use_bias=False, name="to_qkv_cls"),
                nn.Dense(inner * 3, use_bias=False, name="to_qkv_patch"),
            )
            qkv = _specialized(qkvs, x, n_cls)
        else:
            qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        out = dot_product_attention(*map(split, (q, k, v)))
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


class SpecializedFeedForward(nn.Module):
    """reference lines 59-73 — specialized norms, shared MLP."""

    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, n_cls: int):
        norms = (
            nn.LayerNorm(epsilon=LN_EPS, name="norm_cls"),
            nn.LayerNorm(epsilon=LN_EPS, name="norm_patch"),
        )
        x = _specialized(norms, x, n_cls)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = _gelu(x)
        return nn.Dense(self.dim, name="fc2")(x)


class SimpleViT(nn.Module):
    """reference simple_vit_with_specialized_cls.py:140 — same constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    specialize_qkv_depth: Optional[int] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-2), (self.dim,)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        specialize_depth = default(self.specialize_qkv_depth, self.depth // 3)

        for i in range(self.depth):
            x = SpecializedAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                specialize_qkv=i < specialize_depth,
                name=f"layers_{i}_attn",
            )(x, 1) + x
            x = SpecializedFeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
            )(x, 1) + x

        norms = (
            nn.LayerNorm(epsilon=LN_EPS, name="final_norm_cls"),
            nn.LayerNorm(epsilon=LN_EPS, name="final_norm_patch"),
        )
        x = _specialized(norms, x, 1)
        return nn.Dense(self.num_classes, name="linear_head")(x[:, 0])
