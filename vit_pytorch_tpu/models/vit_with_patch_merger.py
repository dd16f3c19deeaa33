"""ViT + PatchMerger — learned-query token pooling mid-transformer
(reference vit_with_patch_merger.py:20-144)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import default, pair


class PatchMerger(nn.Module):
    """reference vit_with_patch_merger.py:20-32 — softmax(Q·LN(x)ᵀ)·x with
    learned queries, shrinking n tokens to ``num_tokens_out``."""

    dim: int
    num_tokens_out: int

    @nn.compact
    def __call__(self, x):
        queries = self.param(
            "queries", nn.initializers.normal(1.0), (self.num_tokens_out, self.dim)
        )
        scale = self.dim**-0.5
        normed = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        # single-head attention through the unified dispatcher: the learned
        # queries attend the normed tokens, values = the normed tokens
        b = x.shape[0]
        q = jnp.broadcast_to(
            queries.astype(x.dtype)[None, None],
            (b, 1, self.num_tokens_out, self.dim),
        )
        out = dot_product_attention(
            q, normed[:, None], normed[:, None], scale=scale
        )
        return out[:, 0]


class ViT(nn.Module):
    """reference vit_with_patch_merger.py:107 — same keyword constructor.
    No cls token; mean pool head (line 138-141)."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    patch_merge_layer: Optional[int] = None
    patch_merge_num_tokens: int = 8
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
        num_patches = (image_height // patch_height) * (image_width // patch_width)

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim)
        )
        x = x + pos[:, :n].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        merge_index = default(self.patch_merge_layer, self.depth // 2) - 1

        for i in range(self.depth):
            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    flash=self.flash,
                    name=f"layers_{i}_attn",
                )(x, train=train)
                + x
            )
            x = (
                FeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(x, train=train)
                + x
            )
            if i == merge_index:
                x = PatchMerger(
                    dim=self.dim,
                    num_tokens_out=self.patch_merge_num_tokens,
                    name="patch_merger",
                )(x)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x.mean(axis=1))
