"""ViT + KEEL post-LN (reference vit_with_keel_post_ln.py:121-217): post-LN
with the residual scaled by ≈ num_layers before the norm; the first layer is
a plain pre-norm residual (lines 101-119).  LayerNorms are bias-free."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import default, exists, pair


class ViT(nn.Module):
    """reference vit_with_keel_post_ln.py:121 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    keel_residual_scale: Optional[float] = None
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        num_cls = 1 if self.pool == "cls" else 0
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (num_cls, self.dim)
        )
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (num_patches + num_cls, self.dim),
        )
        cls = jnp.broadcast_to(cls_token, (b, num_cls, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[: x.shape[1]].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        num_layers = self.depth * 2
        residual_scale = default(self.keel_residual_scale, num_layers)

        layer_ind = 0
        for i in range(self.depth):
            for kind in ("attn", "ff"):
                residual = x
                if kind == "attn":
                    out = Attention(
                        dim=self.dim,
                        heads=self.heads,
                        dim_head=self.dim_head,
                        dropout=self.dropout,
                        norm_bias=False,
                        project_out=True,
                        flash=self.flash,
                        name=f"layers_{i}_attn",
                    )(x, train=train)
                else:
                    out = FeedForward(
                        dim=self.dim,
                        hidden_dim=self.mlp_dim,
                        dropout=self.dropout,
                        norm_bias=False,
                        name=f"layers_{i}_ff",
                    )(x, train=train)

                if layer_ind == 0:
                    x = out + residual
                else:
                    x = nn.LayerNorm(
                        epsilon=LN_EPS,
                        use_bias=False,
                        name=f"post_norms_{layer_ind - 1}",
                    )(out + residual * residual_scale)
                layer_ind += 1

        if self.num_classes <= 0:
            return x
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, name="mlp_head")(x)
