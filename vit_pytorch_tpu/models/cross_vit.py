"""CrossViT — two-branch multi-scale ViT (reference cross_vit.py:204-270).

Small/large patch encoders run per round, then the CLS token of each branch
cross-attends the other branch's patch tokens (with ``kv_include_self``,
cross_vit.py:58-59,125-126), through dim-projection shims when the branch
dims differ (ProjectInOut, cross_vit.py:94-107).  Logits are the sum of the
two branch heads (cross_vit.py:270)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, Transformer, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d


class ImageEmbedder(nn.Module):
    """reference cross_vit.py:166-200."""

    dim: int
    image_size: int
    patch_size: int
    dropout: float = 0.0
    channels: int = 3

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
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class CrossTransformer(nn.Module):
    """reference cross_vit.py:111-130 — CLS-only bidirectional cross
    attention with ProjectInOut shims."""

    sm_dim: int
    lg_dim: int
    depth: int
    heads: int
    dim_head: int
    dropout: float

    @nn.compact
    def __call__(self, sm_tokens, lg_tokens, *, train: bool = False):
        sm_cls, sm_patch = sm_tokens[:, :1], sm_tokens[:, 1:]
        lg_cls, lg_patch = lg_tokens[:, :1], lg_tokens[:, 1:]

        need_proj = self.sm_dim != self.lg_dim
        for i in range(self.depth):
            # small cls attends large patches
            q = sm_cls
            if need_proj:
                q = nn.Dense(self.lg_dim, name=f"layers_{i}_sm_proj_in")(q)
            q = Attention(
                dim=self.lg_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                kv_include_self=True,
                project_out=True,
                name=f"layers_{i}_sm_attend_lg",
            )(q, context=lg_patch, train=train)
            if need_proj:
                q = nn.Dense(self.sm_dim, name=f"layers_{i}_sm_proj_out")(q)
            sm_cls = q + sm_cls

            # large cls attends small patches
            q = lg_cls
            if need_proj:
                q = nn.Dense(self.sm_dim, name=f"layers_{i}_lg_proj_in")(q)
            q = Attention(
                dim=self.sm_dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                kv_include_self=True,
                project_out=True,
                name=f"layers_{i}_lg_attend_sm",
            )(q, context=sm_patch, train=train)
            if need_proj:
                q = nn.Dense(self.lg_dim, name=f"layers_{i}_lg_proj_out")(q)
            lg_cls = q + lg_cls

        return (
            jnp.concatenate([sm_cls, sm_patch], axis=1),
            jnp.concatenate([lg_cls, lg_patch], axis=1),
        )


class CrossViT(nn.Module):
    """reference cross_vit.py:204 — same keyword constructor."""

    image_size: int
    num_classes: int
    sm_dim: int
    lg_dim: int
    sm_patch_size: int = 12
    sm_enc_depth: int = 1
    sm_enc_heads: int = 8
    sm_enc_mlp_dim: int = 2048
    sm_enc_dim_head: int = 64
    lg_patch_size: int = 16
    lg_enc_depth: int = 4
    lg_enc_heads: int = 8
    lg_enc_mlp_dim: int = 2048
    lg_enc_dim_head: int = 64
    cross_attn_depth: int = 2
    cross_attn_heads: int = 8
    cross_attn_dim_head: int = 64
    depth: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.1
    channels: int = 3

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        sm_tokens = ImageEmbedder(
            dim=self.sm_dim,
            image_size=self.image_size,
            patch_size=self.sm_patch_size,
            dropout=self.emb_dropout,
            channels=self.channels,
            name="sm_image_embedder",
        )(img, train=train)
        lg_tokens = ImageEmbedder(
            dim=self.lg_dim,
            image_size=self.image_size,
            patch_size=self.lg_patch_size,
            dropout=self.emb_dropout,
            channels=self.channels,
            name="lg_image_embedder",
        )(img, train=train)

        for i in range(self.depth):
            sm_tokens = Transformer(
                dim=self.sm_dim,
                depth=self.sm_enc_depth,
                heads=self.sm_enc_heads,
                dim_head=self.sm_enc_dim_head,
                mlp_dim=self.sm_enc_mlp_dim,
                dropout=self.dropout,
                name=f"encoder_{i}_sm",
            )(sm_tokens, train=train)
            lg_tokens = Transformer(
                dim=self.lg_dim,
                depth=self.lg_enc_depth,
                heads=self.lg_enc_heads,
                dim_head=self.lg_enc_dim_head,
                mlp_dim=self.lg_enc_mlp_dim,
                dropout=self.dropout,
                name=f"encoder_{i}_lg",
            )(lg_tokens, train=train)
            sm_tokens, lg_tokens = CrossTransformer(
                sm_dim=self.sm_dim,
                lg_dim=self.lg_dim,
                depth=self.cross_attn_depth,
                heads=self.cross_attn_heads,
                dim_head=self.cross_attn_dim_head,
                dropout=self.dropout,
                name=f"encoder_{i}_cross",
            )(sm_tokens, lg_tokens, train=train)

        sm_cls, lg_cls = sm_tokens[:, 0], lg_tokens[:, 0]

        sm_logits = nn.Dense(self.num_classes, name="sm_mlp_head")(
            nn.LayerNorm(epsilon=LN_EPS, name="sm_head_norm")(sm_cls)
        )
        lg_logits = nn.Dense(self.num_classes, name="lg_mlp_head")(
            nn.LayerNorm(epsilon=LN_EPS, name="lg_head_norm")(lg_cls)
        )
        return sm_logits + lg_logits
