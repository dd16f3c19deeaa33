"""PiT — pooling-based ViT (reference pit.py:117-182).

Overlapping unfold patchify (stride p/2, pit.py:140-144), stage transformers,
and depthwise-conv ×2-dim spatial pooling with a Linear for the cls token
(pit.py:98-113)."""

from __future__ import annotations

import math
from typing import Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer, LN_EPS
from ..nn.patch import unfold_2d
from ..utils.helpers import cast_tuple


def conv_output_size(image_size, kernel_size, stride, padding=0):
    return int(((image_size - kernel_size + (2 * padding)) / stride) + 1)


class DepthWiseConv2d(nn.Module):
    """reference pit.py:86-94 — depthwise conv + pointwise conv, NHWC here."""

    dim_out: int
    kernel_size: int
    stride: int
    dim_in: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.dim_out,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=1,
            feature_group_count=math.gcd(self.dim_in, self.dim_out),
            name="depthwise",
        )(x)
        x = nn.Conv(self.dim_out, (1, 1), name="pointwise")(x)
        return x


class Pool(nn.Module):
    """reference pit.py:98-113."""

    dim: int

    @nn.compact
    def __call__(self, x):
        cls_token, tokens = x[:, :1], x[:, 1:]
        cls_token = nn.Dense(self.dim * 2, name="cls_ff")(cls_token)

        b, n, c = tokens.shape
        h = int(math.sqrt(n))
        tokens = tokens.reshape(b, h, h, c)
        tokens = DepthWiseConv2d(
            dim_out=self.dim * 2,
            kernel_size=3,
            stride=2,
            dim_in=self.dim,
            name="downsample",
        )(tokens)
        tokens = tokens.reshape(b, -1, self.dim * 2)
        return jnp.concatenate([cls_token, tokens], axis=1)


class PiT(nn.Module):
    """reference pit.py:117 — same keyword constructor (depth is a tuple of
    per-stage block counts)."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    heads: Union[int, Tuple[int, ...]]
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    channels: int = 3

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        assert isinstance(self.depth, (tuple, list)), (
            "depth must be a tuple of integers, specifying the number of "
            "blocks before each downsizing"
        )
        heads = cast_tuple(self.heads, len(self.depth))
        b = img.shape[0]
        p = self.patch_size

        # overlapping patches: unfold stride p/2, no padding (pit.py:141)
        x = unfold_2d(img, p, p // 2, 0)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        n = x.shape[1]

        output_size = conv_output_size(self.image_size, p, p // 2)
        num_patches = output_size**2

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

        dim = self.dim
        for ind, (layer_depth, layer_heads) in enumerate(zip(self.depth, heads)):
            x = Transformer(
                dim=dim,
                depth=layer_depth,
                heads=layer_heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                final_norm=False,
                name=f"stage_{ind}_transformer",
            )(x, train=train)
            if ind < len(self.depth) - 1:
                x = Pool(dim=dim, name=f"stage_{ind}_pool")(x)
                dim *= 2

        out = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(out)
