"""SimpleViT for 1-D sequences (reference simple_vit_1d.py:78-110)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.patch import PatchEmbedding, patchify_1d
from ..nn.posemb import posemb_sincos_1d
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_vit_1d.py:78 — same keyword constructor."""

    seq_len: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    flash: Optional[bool] = None

    def setup(self):
        assert self.seq_len % self.patch_size == 0
        self.num_patches = self.seq_len // self.patch_size
        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.transformer = SimpleTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            flash=self.flash,
        )
        self.linear_head = nn.Dense(self.num_classes, name="linear_head")

    def patchify(self, series):
        return patchify_1d(series, self.patch_size)

    def __call__(self, series, *, train: bool = False):
        x = self.patch_embedding(self.patchify(series))
        x = x + posemb_sincos_1d(x.shape[1], self.dim, dtype=x.dtype)
        x = self.transformer(x, train=train)
        return self.linear_head(x.mean(axis=1))
