"""SimpleViT + patch dropout (reference
simple_vit_with_patch_dropout.py:103-150)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.patch import PatchDropout, PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_vit_with_patch_dropout.py:103 — same constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    patch_dropout: float = 0.5
    flash: Optional[bool] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0

        self.patch_hw = (patch_height, patch_width)
        self.grid_hw = (image_height // patch_height, image_width // patch_width)

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.patch_drop = PatchDropout(self.patch_dropout)
        self.transformer = SimpleTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            flash=self.flash,
        )
        self.linear_head = nn.Dense(self.num_classes, name="linear_head")

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def __call__(self, img, *, train: bool = False):
        x = self.patch_embedding(self.patchify(img))
        x = x + posemb_sincos_2d(*self.grid_hw, self.dim, dtype=x.dtype)
        x = self.patch_drop(x, train=train)
        x = self.transformer(x, train=train)
        return self.linear_head(x.mean(axis=1))
