"""SimpleViT-3D with explicit flash attention (reference
simple_flash_attn_vit_3d.py:136-171).

Architecture deltas vs simple_vit_3d: the transformer loop has NO trailing
LayerNorm (reference simple_flash_attn_vit_3d.py:119-134) and the head is a
plain Linear after mean pooling (``linear_head``, reference :158) — no LN
anywhere after the transformer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.patch import PatchEmbedding, patchify_3d
from ..nn.posemb import posemb_sincos_3d
from ..utils.helpers import pair
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_flash_attn_vit_3d.py:136 — same keyword constructor."""

    image_size: int | tuple
    image_patch_size: int | tuple
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    use_flash_attn: bool = True
    flash: Optional[bool] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.image_patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.frames % self.frame_patch_size == 0

        self.patch_hw = (patch_height, patch_width)
        self.grid_fhw = (
            self.frames // self.frame_patch_size,
            image_height // patch_height,
            image_width // patch_width,
        )
        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.transformer = SimpleTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            # use_flash_attn=True -> None (auto); False -> explicit opt-out
            flash=self.flash
            if self.flash is not None
            else (None if self.use_flash_attn else False),
            final_norm=False,
        )
        self.linear_head = nn.Dense(self.num_classes, name="linear_head")

    def patchify(self, video):
        return patchify_3d(video, self.frame_patch_size, *self.patch_hw)

    def __call__(self, video, *, train: bool = False):
        x = self.patch_embedding(self.patchify(video))
        x = x + posemb_sincos_3d(*self.grid_fhw, self.dim, dtype=x.dtype)
        x = self.transformer(x, train=train)
        return self.linear_head(x.mean(axis=1))
