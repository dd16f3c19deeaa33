"""ViT for 1-D sequences (reference vit_1d.py:72-113)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_1d


class ViT(nn.Module):
    """reference vit_1d.py:72 — same keyword constructor.  Transformer has no
    final norm; the head carries LN → Linear (vit_1d.py:93-96)."""

    seq_len: int
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

    def setup(self):
        assert self.seq_len % self.patch_size == 0
        self.num_patches = self.seq_len // self.patch_size

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, self.num_patches + 1, self.dim),
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (self.dim,)
        )
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

    def patchify(self, series):
        return patchify_1d(series, self.patch_size)

    def __call__(self, series, *, train: bool = False):
        x = self.patch_embedding(self.patchify(series))
        b, n, _ = x.shape

        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding[:, : n + 1].astype(x.dtype)
        x = self.emb_drop(x, deterministic=not train)

        x = self.transformer(x, train=train)
        return self.mlp_head(self.head_norm(x[:, 0]))
