"""MP3 — masked position prediction pretraining (reference mp3.py:150-186).

Full token set queries cross-attend the unmasked context; CE over
patch-index labels.  Ships with its own ViT whose transformer supports a
context stream normed by the *same* LayerNorm as the queries
(mp3.py:72-77)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import exists, pair


class MP3Attention(nn.Module):
    """reference mp3.py:52-89 — q/kv split; context shares the query LN."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        norm = nn.LayerNorm(epsilon=LN_EPS, name="norm")
        x = norm(x)
        context = norm(context) if exists(context) else x

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            q, k, v,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MP3Transformer(nn.Module):
    """reference mp3.py:91-104 — no final norm."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        for i in range(self.depth):
            x = MP3Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, context=context, train=train) + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        return x


class ViT(nn.Module):
    """reference mp3.py:106-146 — SimpleViT-flavoured encoder for MP3."""

    num_classes: int
    image_size: int | tuple
    patch_size: int | tuple
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        self.patch_hw = (patch_height, patch_width)
        self.grid_hw = (image_height // patch_height, image_width // patch_width)
        self.num_patches = self.grid_hw[0] * self.grid_hw[1]

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.transformer = MP3Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
        )
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")
        self.linear_head = nn.Dense(self.num_classes, name="linear_head")

    def patchify(self, img):
        return patchify_2d(img, *self.patch_hw)

    def embed_patches(self, img):
        return self.patch_embedding(self.patchify(img))

    def __call__(self, img, *, train: bool = False):
        x = self.embed_patches(img)
        x = x + posemb_sincos_2d(*self.grid_hw, self.dim, dtype=x.dtype)
        x = self.transformer(x, train=train)
        return self.linear_head(self.head_norm(x.mean(axis=1)))


class MP3(nn.Module):
    """reference mp3.py:150 — same constructor."""

    vit: Any
    masking_ratio: float

    def setup(self):
        assert 0 < self.masking_ratio < 1
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, name="mlp_head_norm")
        self.mlp_head = nn.Dense(self.vit.num_patches, name="mlp_head")

    def __call__(self, img, *, rand_indices=None, train: bool = False):
        tokens = self.vit.embed_patches(img)
        batch, num_patches, _ = tokens.shape

        num_masked = int(self.masking_ratio * num_patches)
        if rand_indices is None:
            rng = self.make_rng("mask")
            rand_indices = jnp.argsort(
                jax.random.uniform(rng, (batch, num_patches)), axis=-1
            )
        unmasked_indices = rand_indices[:, num_masked:]

        batch_range = jnp.arange(batch)[:, None]
        tokens_unmasked = tokens[batch_range, unmasked_indices]

        attended = self.vit.transformer(tokens, tokens_unmasked, train=train)
        logits = self.mlp_head(self.head_norm(attended))
        logits = logits.reshape(-1, logits.shape[-1])

        labels = jnp.tile(jnp.arange(num_patches), batch)
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logprobs, labels[:, None], axis=-1)
        return jnp.mean(ce)
