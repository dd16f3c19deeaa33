"""NesT — nested hierarchical transformer (reference nest.py:106-180).

The image is chopped into 4^level blocks folded into the batch dim (constant
sequence length per level, nest.py:129, 174-177); conv+LN+maxpool Aggregate
between levels.  NHWC layout; the reference's channel-LN is last-axis LN."""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple


class NestAttention(nn.Module):
    """reference nest.py:41-73 — conv qkv on spatial maps, dim_head =
    dim // heads."""

    dim: int
    heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = self.heads
        dim_head = self.dim // h
        inner = dim_head * h
        scale = dim_head**-0.5
        b, hh, ww, _ = x.shape

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, hh * ww, h, dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, hh, ww, inner)
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class NestFeedForward(nn.Module):
    """reference nest.py:28-39 — 1×1 conv FFN with channel LN."""

    dim: int
    mlp_mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Conv(self.dim * self.mlp_mult, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class NestTransformer(nn.Module):
    """reference nest.py:83-104 — learned flat pos emb over the block."""

    dim: int
    seq_len: int
    depth: int
    heads: int
    mlp_mult: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, h, w, _ = x.shape
        pos = self.param("pos_emb", nn.initializers.normal(1.0), (self.seq_len,))
        x = x + pos[: h * w].reshape(1, h, w, 1).astype(x.dtype)

        for i in range(self.depth):
            x = NestAttention(
                dim=self.dim,
                heads=self.heads,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, train=train) + x
            x = NestFeedForward(
                dim=self.dim,
                mlp_mult=self.mlp_mult,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        return x


class NesT(nn.Module):
    """reference nest.py:106 — same keyword constructor."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    heads: int
    num_hierarchies: int
    block_repeats: Union[int, Tuple[int, ...]]
    mlp_mult: int = 4
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        fmap_size = self.image_size // self.patch_size
        blocks = 2 ** (self.num_hierarchies - 1)
        seq_len = (fmap_size // blocks) ** 2
        hierarchies = list(reversed(range(self.num_hierarchies)))
        mults = [2**i for i in reversed(hierarchies)]
        layer_heads = [m * self.heads for m in mults]
        layer_dims = [m * self.dim for m in mults]
        last_dim = layer_dims[-1]
        layer_dims = [*layer_dims, layer_dims[-1]]
        block_repeats = cast_tuple(self.block_repeats, self.num_hierarchies)

        # space-to-depth patchify, NHWC (nest.py:141-146)
        p = self.patch_size
        x = rearrange(img, "b c (h p1) (w p2) -> b h w (p1 p2 c)", p1=p, p2=p)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")(x)
        x = nn.Conv(layer_dims[0], (1, 1), name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")(x)

        for ind, (level, heads, depth) in enumerate(
            zip(hierarchies, layer_heads, block_repeats)
        ):
            dim_in, dim_out = layer_dims[ind], layer_dims[ind + 1]
            is_last = level == 0
            block_size = 2**level

            x = rearrange(
                x, "b (b1 h) (b2 w) d -> (b b1 b2) h w d", b1=block_size, b2=block_size
            )
            x = NestTransformer(
                dim=dim_in,
                seq_len=seq_len,
                depth=depth,
                heads=heads,
                mlp_mult=self.mlp_mult,
                dropout=self.dropout,
                name=f"level_{ind}_transformer",
            )(x, train=train)
            x = rearrange(
                x, "(b b1 b2) h w d -> b (b1 h) (b2 w) d", b1=block_size, b2=block_size
            )
            if not is_last:
                x = nn.Conv(dim_out, (3, 3), padding=1, name=f"level_{ind}_aggregate_conv")(x)
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"level_{ind}_aggregate_norm")(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        pooled = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
