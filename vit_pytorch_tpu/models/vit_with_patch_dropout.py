"""Classic ViT + patch dropout (reference vit_with_patch_dropout.py:96-147).

Faithful quirks: the patch embedding is a bare Linear (no LayerNorms, line
110-113), pos emb is added to patches *before* the cls token is concatenated
(line 134-138), the transformer has no final norm, and the head is LN →
Linear."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer, LN_EPS
from ..nn.patch import PatchDropout, PatchEmbedding, patchify_2d
from ..utils.helpers import pair


class ViT(nn.Module):
    """reference vit_with_patch_dropout.py:96 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
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
    patch_dropout: float = 0.25
    flash: Optional[bool] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}

        self.patch_hw = (patch_height, patch_width)
        num_patches = (image_height // patch_height) * (image_width // patch_width)

        self.patch_embedding = PatchEmbedding(
            dim=self.dim, norm_input=False, norm_output=False
        )
        self.pos_embedding = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (num_patches, self.dim)
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        self.patch_drop = PatchDropout(self.patch_dropout)
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            final_norm=False,
            flash=self.flash,
        )
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")
        self.mlp_head = nn.Dense(self.num_classes, name="mlp_head")

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def __call__(self, img, *, train: bool = False):
        x = self.patch_embedding(self.patchify(img))
        b = x.shape[0]

        x = x + self.pos_embedding.astype(x.dtype)
        x = self.patch_drop(x, train=train)

        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = self.emb_drop(x, deterministic=not train)

        x = self.transformer(x, train=train)
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return self.mlp_head(self.head_norm(x))
