"""SimpleViT with explicit flash attention (reference
simple_flash_attn_vit.py:139-176).

The reference exists to select torch SDPA backends per-GPU
(simple_flash_attn_vit.py:49-54); here fused attention is the default path
anyway, so the interesting part is the variant's *architecture*, which
differs from SimpleViT in two places:

- the transformer loop has NO trailing LayerNorm (reference
  simple_flash_attn_vit.py:124-137 vs simple_vit.py:64-78);
- the head is ``Sequential(LayerNorm, Linear)`` applied AFTER mean pooling
  (reference simple_flash_attn_vit.py:159-166) — LN-after-pool is not
  equivalent to SimpleViT's LN-before-pool.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_flash_attn_vit.py:139 — same keyword constructor
    (``use_flash``, exactly as the reference 2-D variant; the 3-D variant's
    reference kwarg is ``use_flash_attn`` and is mirrored there)."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    use_flash: bool = True
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
            # use_flash=True -> None (auto: fused/flash kernels allowed);
            # use_flash=False -> False (explicit opt-out, reference parity)
            flash=self.flash if self.flash is not None else (None if self.use_flash else False),
            final_norm=False,
        )
        # reference simple_flash_attn_vit.py:160-163: linear_head =
        # Sequential(LayerNorm, Linear), applied after mean pooling
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")
        self.linear_head = nn.Dense(self.num_classes, name="linear_head")

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def __call__(self, img, *, train: bool = False):
        x = self.patch_embedding(self.patchify(img))
        x = x + posemb_sincos_2d(*self.grid_hw, self.dim, dtype=x.dtype)
        x = self.transformer(x, train=train)
        x = x.mean(axis=1)
        return self.linear_head(self.head_norm(x))
