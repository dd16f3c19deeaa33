"""ViTDetPool — object-mask-aware ViT (reference vit_detpool.py:107-209).

A pixel object mask max-pools down to a token key-padding mask used for both
attention and the final masked-mean pooling (vit_detpool.py:121, 174-187,
22-29).  An optional frozen ``mask_generator`` runs under stop_gradient
(vit_detpool.py:149-154) — pass its variables via ``mask_generator_variables``."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, reduce

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import exists, pair


def masked_mean(t, mask, eps=1e-5):
    """reference vit_detpool.py:22-29."""
    if not exists(mask):
        return t.mean(axis=1)
    m = mask.astype(bool)[..., None]
    t = jnp.where(m, t, 0.0)
    return t.sum(axis=1) / jnp.maximum(m.sum(axis=1), eps)


class ViTDetPool(nn.Module):
    """reference vit_detpool.py:107 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    use_cls_token: bool = True
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    mask_generator: Optional[Any] = None
    mask_generator_variables: Optional[Any] = None

    @nn.compact
    def __call__(self, img, object_mask=None, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        batch, _, height, width = img.shape

        if not exists(object_mask) and exists(self.mask_generator):
            # frozen mask generator (vit_detpool.py:149-154)
            gen = self.mask_generator
            gen = gen.clone(parent=None) if isinstance(gen, nn.Module) else gen
            if isinstance(gen, nn.Module):
                object_mask = jax.lax.stop_gradient(
                    gen.apply(self.mask_generator_variables, img)
                )
            else:
                object_mask = jax.lax.stop_gradient(gen(img))

        tokens = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        seq = tokens.shape[1]

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1e-2),
            (num_patches, self.dim),
        )
        tokens = tokens + pos[:seq].astype(tokens.dtype)

        has_cls = self.use_cls_token
        if has_cls:
            cls_token = self.param(
                "cls_token", nn.initializers.normal(1e-2), (self.dim,)
            )
            cls = jnp.broadcast_to(cls_token, (batch, 1, self.dim)).astype(
                tokens.dtype
            )
            tokens = jnp.concatenate([cls, tokens], axis=1)

        tokens = nn.Dropout(self.emb_dropout, deterministic=not train)(tokens)

        mask = None
        if exists(object_mask):
            assert object_mask.ndim in (2, 3)
            if object_mask.shape == (batch, height, width):
                mask = reduce(
                    object_mask,
                    "b (h p1) (w p2) -> b (h w)",
                    "max",
                    p1=patch_height,
                    p2=patch_width,
                )
            else:
                mask = object_mask.reshape(batch, -1)
            assert mask.shape == (batch, seq)
            mask = mask.astype(bool)
            if has_cls:
                mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)

        kp = mask[:, None, None, :] if exists(mask) else None
        for i in range(self.depth):
            tokens = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(tokens, mask=kp, train=train) + tokens
            tokens = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(tokens, train=train) + tokens
        tokens = nn.LayerNorm(epsilon=LN_EPS, name="norm")(tokens)

        if self.num_classes <= 0:
            return tokens

        if has_cls:
            tokens = tokens[:, 1:]
            if exists(mask):
                mask = mask[:, 1:]

        pooled = masked_mean(tokens, mask)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
