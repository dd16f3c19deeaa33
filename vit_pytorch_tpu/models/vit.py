"""Canonical ViT (reference vit.py:85-139), TPU-native.

Constructor signature matches the reference exactly (vit.py:86).  The whole
forward is one jittable function of (params, img) — patchify folds into the
embedding GEMM, the transformer runs on the shared attention core.

Encoder protocol (used by MAE / SimMIM / MPP instead of the reference's
structural indexing into ``to_patch_embedding[i]``, mae.py:28-31):
  - ``patchify(img)``             → raw patches (b, n, patch_dim)
  - ``patch_embedding`` submodule → PatchEmbedding (LN→Linear→LN)
  - params carry ``pos_embedding`` and ``cls_token``
  - ``transformer`` submodule
  - ``pool``/``num_cls_tokens`` attributes
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import pair


class ViT(nn.Module):
    """reference vit.py:85 — same keyword constructor."""

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
    flash: Optional[bool] = None
    remat: bool = False  # rematerialize layers in backward (big-batch training)

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert (
            image_height % patch_height == 0 and image_width % patch_width == 0
        ), "Image dimensions must be divisible by the patch size."
        assert self.pool in {"cls", "mean"}, "pool type must be either cls or mean"

        self.patch_hw = (patch_height, patch_width)
        self.num_patches = (image_height // patch_height) * (image_width // patch_width)
        self.num_cls_tokens = 1 if self.pool == "cls" else 0

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (self.num_cls_tokens, self.dim)
        )
        self.pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (self.num_patches + self.num_cls_tokens, self.dim),
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            flash=self.flash,
            remat=self.remat,
        )
        if self.num_classes > 0:
            self.mlp_head = nn.Dense(self.num_classes)

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def embed(self, img, *, train: bool = False, dropout: bool = True):
        """Patchify + embed + cls + pos emb + dropout (vit.py:120-128).

        ``dropout=False`` skips the trailing emb dropout — DistillableViT
        appends its distill token first and applies the dropout itself
        (reference distill.py:33-34,64-66 drops out AFTER the concat, so
        the distill token is regularized like every other token)."""
        x = self.patch_embedding(self.patchify(img))
        b, n, _ = x.shape

        cls = jnp.broadcast_to(
            self.cls_token, (b, self.num_cls_tokens, self.dim)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        seq = x.shape[1]
        x = x + self.pos_embedding[:seq].astype(x.dtype)
        if not dropout:
            return x
        return self.emb_drop(x, deterministic=not train)

    def __call__(self, img, *, train: bool = False):
        x = self.embed(img, train=train)
        x = self.transformer(x, train=train)

        if self.num_classes <= 0:
            return x

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return self.mlp_head(x)
