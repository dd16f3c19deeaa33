"""EfficientViT shell — ViT around a user-supplied transformer module
(reference efficient.py:9-49; the README pairs it with Linformer/Nystromformer).

Any flax module with signature ``transformer(x, *, train=False) -> x`` drops
in (e.g. a linear-attention transformer)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import pair


class ViT(nn.Module):
    """reference efficient.py:9 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int
    num_classes: int
    dim: int
    transformer: Any
    pool: str = "cls"
    channels: int = 3

    def embed(self, img):
        """Patchify + embed + cls + pos emb (efficient.py:39-44).  Helper of
        the compact ``__call__`` so DistillableEfficientViT can reuse it."""
        image_size_h, image_size_w = pair(self.image_size)
        assert image_size_h % self.patch_size == 0 and image_size_w % self.patch_size == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_size_h // self.patch_size) * (
            image_size_w // self.patch_size
        )
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, self.patch_size, self.patch_size)
        )
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim)
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        return x + pos[:, : n + 1].astype(x.dtype)

    def head(self, x):
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        x = self.embed(img)
        x = self.transformer(x, train=train)
        return self.head(x)
