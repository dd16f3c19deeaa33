"""Parallel ViT — N parallel attention/FF branches summed per layer
(reference parallel_vit.py:14-20, 70-88)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import pair


class ViT(nn.Module):
    """reference parallel_vit.py:90 — same keyword constructor.  Patch embed
    is a bare Linear (line 101-104); transformer has no final norm; head is
    LN → Linear."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    num_parallel_branches: int = 2
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        b = img.shape[0]

        x = PatchEmbedding(
            dim=self.dim, norm_input=False, norm_output=False, name="patch_embedding"
        )(patchify_2d(img, patch_height, patch_width))
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim)
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        for i in range(self.depth):
            # parallel attention branches summed (parallel_vit.py:14-20)
            x = (
                sum(
                    Attention(
                        dim=self.dim,
                        heads=self.heads,
                        dim_head=self.dim_head,
                        dropout=self.dropout,
                        flash=self.flash,
                        name=f"layers_{i}_attn_{j}",
                    )(x, train=train)
                    for j in range(self.num_parallel_branches)
                )
                + x
            )
            x = (
                sum(
                    FeedForward(
                        dim=self.dim,
                        hidden_dim=self.mlp_dim,
                        dropout=self.dropout,
                        name=f"layers_{i}_ff_{j}",
                    )(x, train=train)
                    for j in range(self.num_parallel_branches)
                )
                + x
            )

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)
