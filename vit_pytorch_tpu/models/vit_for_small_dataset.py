"""ViT for small datasets — SPT + LSA (reference vit_for_small_dataset.py:98-140).

SPT (shifted patch tokenization): concat the image with its 4 diagonal
1-pixel shifts → 5× channels before patchify (lines 81-96).
LSA (locality self-attention): learned log temperature and self-token masking
on the attention diagonal (lines 30-64)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import patchify_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import pair


def _pad_shift(x, left, right, top, bottom):
    """torch F.pad semantics on (b, c, h, w): negative = crop."""
    x = jnp.pad(
        x,
        (
            (0, 0),
            (0, 0),
            (max(top, 0), max(bottom, 0)),
            (max(left, 0), max(right, 0)),
        ),
    )
    h, w = x.shape[2], x.shape[3]
    return x[
        :,
        :,
        (-top if top < 0 else 0) : h - (-bottom if bottom < 0 else 0),
        (-left if left < 0 else 0) : w - (-right if right < 0 else 0),
    ]


class SPT(nn.Module):
    """reference vit_for_small_dataset.py:81-96."""

    dim: int
    patch_size: int
    channels: int = 3

    @nn.compact
    def __call__(self, x):
        shifts = ((1, -1, 0, 0), (-1, 1, 0, 0), (0, 0, 1, -1), (0, 0, -1, 1))
        shifted = [_pad_shift(x, *s) for s in shifts]
        x = jnp.concatenate([x, *shifted], axis=1)
        patches = patchify_2d(x, self.patch_size, self.patch_size)
        patches = nn.LayerNorm(epsilon=LN_EPS, name="norm")(patches)
        return nn.Dense(self.dim, name="proj")(patches)


class LSA(nn.Module):
    """reference vit_for_small_dataset.py:30-64."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        temperature = self.param(
            "temperature",
            nn.initializers.constant(math.log(dh**-0.5)),
            (),
        )

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        # unified dispatcher with the learned temperature as a TRACED scale
        # (stays on the XLA path by design) and the diagonal self-mask
        # (reference vit_for_small_dataset.py:53-57) as a boolean mask
        n = q.shape[2]
        dropout_rng = None
        if self.dropout > 0.0 and train:
            dropout_rng = self.make_rng("dropout")
        out = dot_product_attention(
            q,
            k,
            v,
            scale=jnp.exp(temperature),
            mask=~jnp.eye(n, dtype=bool),
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(b, -1, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ViT(nn.Module):
    """reference vit_for_small_dataset.py:98 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int
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
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        assert image_height % self.patch_size == 0 and image_width % self.patch_size == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_height // self.patch_size) * (
            image_width // self.patch_size
        )
        b = img.shape[0]

        x = SPT(
            dim=self.dim,
            patch_size=self.patch_size,
            channels=self.channels,
            name="patch_embedding",
        )(img)
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
            x = (
                LSA(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
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

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)
