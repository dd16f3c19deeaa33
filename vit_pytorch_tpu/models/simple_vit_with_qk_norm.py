"""SimpleViT + query-key RMSNorm (reference simple_vit_with_qk_norm.py:101-141).

Faithful quirks: attention scale is 1 (the RMSNorm carries sqrt(d)·gamma,
gamma initialized to 1/sqrt(d), lines 29-37) and the "head" is just a
LayerNorm over the mean-pooled embedding (line 129: ``linear_head =
nn.LayerNorm(dim)``)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


class SimpleViT(nn.Module):
    """reference simple_vit_with_qk_norm.py:101 — same constructor."""

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

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        grid_hw = (image_height // patch_height, image_width // patch_width)

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(*grid_hw, self.dim, dtype=x.dtype)

        for i in range(self.depth):
            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    qk_norm=True,
                    qk_norm_gamma_init=self.dim_head**-0.5,
                    out_bias=False,
                    project_out=True,
                    flash=self.flash,
                    name=f"transformer_layers_{i}_attn",
                )(x, train=train)
                + x
            )
            x = (
                FeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    name=f"transformer_layers_{i}_ff",
                )(x, train=train)
                + x
            )
        x = nn.LayerNorm(epsilon=LN_EPS, name="transformer_norm")(x)

        x = x.mean(axis=1)
        # the reference's "linear_head" is a LayerNorm (line 129)
        return nn.LayerNorm(epsilon=LN_EPS, name="linear_head")(x)
