"""SimpleViT + register tokens (reference
simple_vit_with_register_tokens.py:85-134, "Vision Transformers Need
Registers")."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_vit_with_register_tokens.py:85 — same constructor.
    Registers are packed after the patch tokens (line 123-127) and stripped
    before pooling."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_register_tokens: int = 4
    channels: int = 3
    dim_head: int = 64
    flash: Optional[bool] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0

        self.patch_hw = (patch_height, patch_width)
        self.grid_hw = (image_height // patch_height, image_width // patch_width)

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.register_tokens = self.param(
            "register_tokens",
            nn.initializers.normal(1.0),
            (self.num_register_tokens, self.dim),
        )
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
        b = img.shape[0]
        x = self.patch_embedding(self.patchify(img))
        x = x + posemb_sincos_2d(*self.grid_hw, self.dim, dtype=x.dtype)

        n = x.shape[1]
        r = jnp.broadcast_to(
            self.register_tokens, (b, self.num_register_tokens, self.dim)
        ).astype(x.dtype)
        x = jnp.concatenate([x, r], axis=1)

        x = self.transformer(x, train=train)
        x = x[:, :n]  # strip registers
        return self.linear_head(x.mean(axis=1))
