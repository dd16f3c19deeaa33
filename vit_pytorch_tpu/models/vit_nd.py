"""ViT-ND — generic 1-7 dimensional ViT (reference vit_nd.py:89-189).

The einops patchify pattern is built dynamically from ``ndim``
(vit_nd.py:130-139); patch embed is Linear → LN (no input LN); transformer
has a final norm; mean pool excludes the cls token (vit_nd.py:168)."""

from __future__ import annotations

from typing import Tuple, Union

import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import Transformer, LN_EPS
from ..utils.helpers import cast_tuple


def nd_patterns(ndim: int):
    """reference vit_nd.py:128-139."""
    dim_names = "fghijkl"[:ndim]
    input_dims = [f"({d} p{i})" for i, d in enumerate(dim_names)]
    patch_dims = [f"p{i}" for i in range(ndim)]
    input_pattern = f"b c {' '.join(input_dims)}"
    output_pattern = f"b ({' '.join(dim_names)}) ({' '.join(patch_dims)} c)"
    return f"{input_pattern} -> {output_pattern}"


class ViTND(nn.Module):
    """reference vit_nd.py:89 — same keyword constructor."""

    ndim: int
    input_shape: Union[int, Tuple[int, ...]]
    patch_size: Union[int, Tuple[int, ...]]
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

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert 1 <= self.ndim <= 7, "ndim must be between 1 and 7"
        assert self.pool in {"cls", "mean"}

        input_shape = cast_tuple(self.input_shape, self.ndim)
        patch_size = cast_tuple(self.patch_size, self.ndim)
        for i, (inp, p) in enumerate(zip(input_shape, patch_size)):
            assert inp % p == 0

        num_patches = 1
        for inp, p in zip(input_shape, patch_size):
            num_patches *= inp // p

        b = x.shape[0]
        pattern = nd_patterns(self.ndim)
        kwargs = {f"p{i}": p for i, p in enumerate(patch_size)}
        x = rearrange(x, pattern, **kwargs)

        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(x)
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

        x = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            name="transformer",
        )(x, train=train)

        x = x[:, 1:].mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, name="mlp_head")(x)
