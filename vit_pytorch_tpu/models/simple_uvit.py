"""SimpleUViT — U-Net-style skip connections + register tokens (reference
simple_uvit.py:106-158).

First-half layer inputs are pushed on a stack; latter-half layers concat the
popped skip and project back to dim (simple_uvit.py:74-97)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


class SimpleUViT(nn.Module):
    """reference simple_uvit.py:106 — same keyword constructor."""

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

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )
        n = x.shape[1]

        r = self.param(
            "register_tokens",
            nn.initializers.normal(1.0),
            (self.num_register_tokens, self.dim),
        )
        regs = jnp.broadcast_to(
            r, (b, self.num_register_tokens, self.dim)
        ).astype(x.dtype)
        x = jnp.concatenate([x, regs], axis=1)

        skips = []
        for ind in range(self.depth):
            layer = ind + 1
            first_half = layer <= self.depth / 2
            latter_half = layer >= (self.depth / 2 + 1)

            if first_half:
                skips.append(x)
            if latter_half:
                skip = skips.pop()
                x = nn.Dense(self.dim, name=f"layers_{ind}_combine_skip")(
                    jnp.concatenate([skip, x], axis=-1)
                )

            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    out_bias=False,
                    project_out=True,
                    flash=self.flash,
                    name=f"layers_{ind}_attn",
                )(x, train=train)
                + x
            )
            x = (
                FeedForward(
                    dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{ind}_ff"
                )(x, train=train)
                + x
            )

        assert len(skips) == 0
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = x[:, :n]  # strip registers
        return nn.Dense(self.num_classes, name="linear_head")(x.mean(axis=1))
