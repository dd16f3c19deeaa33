"""SimpleViT (reference simple_vit.py:80-120): ViT minus dropout/cls token,
fixed 2-D sincos positional embedding, mean pool, linear head."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


class SimpleTransformer(nn.Module):
    """reference simple_vit.py:64-78 — no dropout; attention out-proj and FF
    without dropout, to_out bias-free."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    flash: Optional[bool] = None
    # the flash-attention variants (reference simple_flash_attn_vit.py:124-137)
    # end the loop WITHOUT a trailing LayerNorm
    final_norm: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False, rotary=None):
        for i in range(self.depth):
            x = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                out_bias=False,
                project_out=True,
                flash=self.flash,
                name=f"layers_{i}_attn",
            )(x, rotary=rotary, train=train, residual=x)
            x = (
                FeedForward(
                    dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
                )(x, train=train)
                + x
            )
        if self.final_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        return x


class SimpleViT(nn.Module):
    """reference simple_vit.py:80 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
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
        self.transformer = SimpleTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            flash=self.flash,
        )
        self.linear_head = nn.Dense(self.num_classes)

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def __call__(self, img, *, train: bool = False):
        x = self.patch_embedding(self.patchify(img))
        pe = posemb_sincos_2d(*self.grid_hw, self.dim, dtype=x.dtype)
        x = x + pe
        x = self.transformer(x, train=train)
        x = x.mean(axis=1)
        return self.linear_head(x)
