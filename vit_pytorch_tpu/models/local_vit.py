"""LocalViT — depthwise-conv feed-forward with cls exclusion (reference
local_vit.py:114-150).

NOTE — reference-bug divergence (SURVEY §7.2): the reference's conv
FeedForward applies ``nn.LayerNorm(dim)`` *after* rearranging to channels-
first (local_vit.py:45-47), which raises a RuntimeError for any grid width ≠
dim — the module as published cannot run.  We implement the intended
behavior: LayerNorm over the channel dim on (b, n, c) tokens, then re-image
for the conv stack (1×1 conv → Hardswish → 3×3 depthwise → Hardswish →
1×1 conv, local_vit.py:41-59)."""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d


class ConvFeedForward(nn.Module):
    """intended behavior of reference local_vit.py:41-59 (see module note)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, n, c = x.shape
        h = w = int(math.sqrt(n))

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = x.reshape(b, h, w, c)  # NHWC
        x = nn.Conv(self.hidden_dim, (1, 1), name="conv_in")(x)
        x = nn.activation.hard_swish(x)
        x = nn.Conv(
            self.hidden_dim,
            (3, 3),
            padding=1,
            feature_group_count=self.hidden_dim,
            name="depthwise",
        )(x)
        x = nn.Conv(self.hidden_dim, (1, 1), name="pointwise")(x)
        x = nn.activation.hard_swish(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Conv(self.dim, (1, 1), name="conv_out")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x.reshape(b, n, self.dim)


class LocalViT(nn.Module):
    """reference local_vit.py:114 — same keyword constructor.  The conv FFN
    runs on patch tokens only; cls is excluded and re-attached
    (local_vit.py:19-27, 103-105)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        num_patches = (self.image_size // self.patch_size) ** 2
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, self.patch_size, self.patch_size)
        )
        n = x.shape[1]

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
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    project_out=True,
                    flash=self.flash,
                    name=f"layers_{i}_attn",
                )(x, train=train)
                + x
            )
            # FFN excludes cls (local_vit.py:19-27)
            cls_tok, tokens = x[:, :1], x[:, 1:]
            tokens = (
                ConvFeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(tokens, train=train)
                + tokens
            )
            x = jnp.concatenate([cls_tok, tokens], axis=1)

        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(x)
