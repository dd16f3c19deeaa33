"""JumboViT — jumbo cls token split into k tokens for attention, re-fused
for a dedicated wide FFN each layer (reference jumbo_vit.py:70-184).

Faithful quirk: the reference passes ``int(jumbo_cls_dim * jumbo_ff_mult)``
as the ``mult`` argument of its FeedForward factory (jumbo_vit.py:120-124
with the signature at line 34), so the jumbo FFN hidden dim is
``jumbo_cls_dim * int(jumbo_cls_dim * jumbo_ff_mult)``.  We reproduce that
exactly so converted weights line up."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


class JumboViT(nn.Module):
    """reference jumbo_vit.py:70 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_jumbo_cls: int = 1
    jumbo_cls_k: int = 6
    jumbo_ff_mult: int = 2
    channels: int = 3
    dim_head: int = 64
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        b = img.shape[0]
        k = self.jumbo_cls_k
        jumbo_cls_dim = self.dim * k
        n_jumbo_tokens = self.num_jumbo_cls * k

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        pe = posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )
        x = x + pe

        jumbo_cls = self.param(
            "jumbo_cls_token",
            nn.initializers.zeros,
            (self.num_jumbo_cls, jumbo_cls_dim),
        )
        jumbo_tokens = jnp.broadcast_to(
            jumbo_cls, (b, self.num_jumbo_cls, jumbo_cls_dim)
        ).astype(x.dtype)
        jumbo_tokens = jumbo_tokens.reshape(b, n_jumbo_tokens, self.dim)

        x = jnp.concatenate([jumbo_tokens, x], axis=1)

        # reference quirk: mult arg receives int(jumbo_cls_dim * jumbo_ff_mult)
        jumbo_hidden = jumbo_cls_dim * int(jumbo_cls_dim * self.jumbo_ff_mult)
        # ONE module instance → weight-tied across layers (jumbo_vit.py:119-124)
        jumbo_ff = FeedForward(
            dim=jumbo_cls_dim, hidden_dim=jumbo_hidden, name="jumbo_ff"
        )

        for i in range(self.depth):
            is_last = i == self.depth - 1
            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    out_bias=False,
                    project_out=True,
                    flash=self.flash,
                    name=f"layers_{i}_attn",
                )(x, train=train)
                + x
            )

            jumbo, patches = x[:, :n_jumbo_tokens], x[:, n_jumbo_tokens:]
            # faithful quirk #2: the reference passes mlp_dim as the *mult*
            # argument of its FeedForward factory (jumbo_vit.py:150 with the
            # signature at :34), so the patch-FF hidden dim is dim * mlp_dim
            patches = (
                FeedForward(
                    dim=self.dim,
                    hidden_dim=int(self.dim * self.mlp_dim),
                    name=f"layers_{i}_ff",
                )(patches, train=train)
                + patches
            )
            # weight-tied wide FFN on the re-fused jumbo token (jumbo_vit.py:119-124)
            fused = jumbo.reshape(b, self.num_jumbo_cls, jumbo_cls_dim)
            fused_out = jumbo_ff(fused, train=train)
            jumbo = jumbo + fused_out.reshape(b, n_jumbo_tokens, self.dim)

            if not is_last:
                x = jnp.concatenate([jumbo, patches], axis=1)

        pooled = jumbo.mean(axis=1)
        embed = nn.LayerNorm(epsilon=LN_EPS, name="norm")(pooled)
        return nn.Dense(self.num_classes, name="linear_head")(embed)
