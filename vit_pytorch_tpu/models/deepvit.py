"""DeepViT — re-attention (reference deepvit.py:87-130).

Re-attention mixes post-softmax attention maps across heads with a learned
(heads × heads) matrix then LayerNorms over the head axis (deepvit.py:34-63).
It needs the materialized attention matrix, so it always takes the XLA
attention path (SURVEY §7.2 "flash kernel vs attention variants")."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d


class ReAttention(nn.Module):
    """reference deepvit.py:17-70."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        dots = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        # re-attention: head mixing + LN over heads (deepvit.py:34-39, 62-63)
        reattn_weights = self.param(
            "reattn_weights", nn.initializers.normal(1.0), (h, h)
        )
        attn = jnp.einsum("bhij,hg->bgij", attn, reattn_weights.astype(attn.dtype))
        attn = attn.transpose(0, 2, 3, 1)  # b i j h
        attn = nn.LayerNorm(epsilon=LN_EPS, name="reattn_norm")(attn)
        attn = attn.transpose(0, 3, 1, 2)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class DeepViT(nn.Module):
    """reference deepvit.py:87 — same keyword constructor."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        assert self.pool in {"cls", "mean"}
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, self.patch_size, self.patch_size)
        )
        n = x.shape[1]

        num_patches = (self.image_size // self.patch_size) ** 2
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim)
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )

        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        for i in range(self.depth):
            x = (
                ReAttention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    name=f"layers_{i}_attn",
                )(x, train=train)
                + x
            )
            x = (
                FeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(x, train=train)
                + x
            )

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)
