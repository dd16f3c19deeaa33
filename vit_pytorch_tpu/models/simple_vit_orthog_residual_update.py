"""SimpleViT + orthogonal residual update (reference
simple_vit_orthog_residual_update.py:146-206).

Each block's output is projected orthogonal to the residual direction; the
parallel component is dropped (or gated when ``learned=True``).  The
reference offers fp64 for the projection (lines 90-107) — fp64 is slow on
TPU (SURVEY §7.2), so ``double_precision=True`` here means a *fp32 island*
(compensated in fp32 rather than fp64), which matches fp32-input behaviour
exactly and bf16 behaviour to fp32 accuracy."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


def orthog_proj(block_out, residual, high_precision: bool):
    dtype = residual.dtype
    if high_precision:
        residual = residual.astype(jnp.float32)
        block_out = block_out.astype(jnp.float32)
    unit = residual / jnp.maximum(
        jnp.linalg.norm(residual, axis=-1, keepdims=True), 1e-12
    )
    parallel = jnp.sum(block_out * unit, axis=-1, keepdims=True) * unit
    orthogonal = block_out - parallel
    return parallel.astype(dtype), orthogonal.astype(dtype)


class OrthogonalResidualBlock(nn.Module):
    """reference simple_vit_orthog_residual_update.py:72-122 (wraps a block)."""

    dim: int
    double_precision: bool = True
    learned: bool = False

    @nn.compact
    def __call__(self, residual, block_out):
        parallel, orthogonal = orthog_proj(
            block_out, residual, self.double_precision
        )
        if self.learned:
            mod = jax.nn.sigmoid(
                nn.Dense(2, name="to_modulation")(block_out)
            )
            parallel = parallel * mod[..., :1]
            orthogonal = orthogonal * mod[..., 1:]
        else:
            parallel = 0.0
        return residual + parallel + orthogonal


class SimpleViT(nn.Module):
    """reference simple_vit_orthog_residual_update.py:146 — same constructor
    (``orthog_residual_update_kwargs`` flattened into fields)."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    orthog_learned: bool = False
    orthog_double_precision: bool = True

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )

        for i in range(self.depth):
            attn_out = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                out_bias=False,
                project_out=True,
                name=f"layers_{i}_attn",
            )(x, train=train)
            x = OrthogonalResidualBlock(
                dim=self.dim,
                double_precision=self.orthog_double_precision,
                learned=self.orthog_learned,
                name=f"layers_{i}_attn_orthog",
            )(x, attn_out)

            ff_out = FeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
            )(x, train=train)
            x = OrthogonalResidualBlock(
                dim=self.dim,
                double_precision=self.orthog_double_precision,
                learned=self.orthog_learned,
                name=f"layers_{i}_ff_orthog",
            )(x, ff_out)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        return nn.Dense(self.num_classes, name="linear_head")(x.mean(axis=1))
