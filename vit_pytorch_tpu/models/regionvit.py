"""RegionViT — regional-to-local attention (reference regionvit.py:194-281).

Dual token stream: region tokens self-attend, then each window's local
tokens attend together with their region token, with a rel-pos-bias padded
for the region slot (regionvit.py:139-190).  Within a layer the SAME
attention weights serve both calls, and each stage's downsample conv is
shared between the local and region streams (regionvit.py:276-277).
NHWC layout."""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple


class RegionAttention(nn.Module):
    """reference regionvit.py:62-112."""

    dim: int
    heads: int = 4
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, *, train: bool = False):
        h = self.heads
        inner = h * self.dim_head
        scale = self.dim_head**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            bias=rel_pos_bias,  # (h, n, n) per-head table or None
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class RegionFeedForward(nn.Module):
    """reference regionvit.py:53-60."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Dense(self.dim * self.mult, name="fc1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.Dense(self.dim, name="fc2")(out)


class R2LTransformer(nn.Module):
    """reference regionvit.py:114-190."""

    dim: int
    window_size: int
    depth: int = 4
    heads: int = 4
    dim_head: int = 32
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0

    @nn.compact
    def __call__(self, local_tokens, region_tokens, *, train: bool = False):
        b, lh, lw, _ = local_tokens.shape
        _, rh, rw, _ = region_tokens.shape
        wh, ww = lh // rh, lw // rw

        local_flat = local_tokens.reshape(b, lh * lw, self.dim)
        region_flat = region_tokens.reshape(b, rh * rw, self.dim)

        # local relative positional bias + region pad (regionvit.py:148-160)
        table = self.param(
            "local_rel_pos_bias",
            nn.initializers.normal(1.0),
            ((2 * self.window_size - 1) ** 2, self.heads),
        )
        gx, gy = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
        grid = np.stack([gx.ravel(), gy.ravel()])  # (2, n)
        rel = grid[:, :, None] - grid[:, None, :] + (self.window_size - 1)
        idx = rel[0] * 1 + rel[1] * (self.window_size * 2 - 1)
        bias = table[idx]  # (n, n, h)
        bias = bias.transpose(2, 0, 1)  # (h, n, n) — per-head table
        bias = jnp.pad(bias, ((0, 0), (1, 0), (1, 0)))

        for i in range(self.depth):
            attn = RegionAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.attn_dropout,
                name=f"layers_{i}_attn",
            )
            ff = RegionFeedForward(
                dim=self.dim, dropout=self.ff_dropout, name=f"layers_{i}_ff"
            )

            region_flat = attn(region_flat, train=train) + region_flat

            lt = local_flat.reshape(b, lh, lw, self.dim)
            lt = rearrange(
                lt, "b (h p1) (w p2) d -> (b h w) (p1 p2) d", p1=wh, p2=ww
            )
            rt = region_flat.reshape(b * rh * rw, 1, self.dim)

            both = jnp.concatenate([rt, lt], axis=1)
            both = attn(both, rel_pos_bias=bias, train=train) + both
            both = ff(both, train=train) + both

            rt, lt = both[:, :1], both[:, 1:]
            local_flat = rearrange(
                lt,
                "(b h w) (p1 p2) d -> b (h p1 w p2) d",
                h=lh // wh,
                w=lw // ww,
                p1=wh,
            )
            region_flat = rt.reshape(b, rh * rw, self.dim)

        local_tokens = local_flat.reshape(b, lh, lw, self.dim)
        region_tokens = region_flat.reshape(b, rh, rw, self.dim)
        return local_tokens, region_tokens


class RegionViT(nn.Module):
    """reference regionvit.py:194 — same keyword constructor."""

    dim: Union[int, Tuple[int, ...]] = (64, 128, 256, 512)
    depth: Union[int, Tuple[int, ...]] = (2, 2, 8, 2)
    window_size: int = 7
    num_classes: int = 1000
    tokenize_local_3_conv: bool = False
    local_patch_size: int = 4
    use_peg: bool = False
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    channels: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim = cast_tuple(self.dim, 4)
        depth = cast_tuple(self.depth, 4)
        region_patch_size = self.local_patch_size * self.window_size
        _, _, H, W = x.shape
        assert H % region_patch_size == 0 and W % region_patch_size == 0
        assert H % self.local_patch_size == 0 and W % self.local_patch_size == 0

        init_dim, last_dim = dim[0], dim[-1]
        img = jnp.transpose(x, (0, 2, 3, 1))

        if self.tokenize_local_3_conv:
            lt = nn.Conv(init_dim, (3, 3), strides=(2, 2), padding=1, name="local_conv1")(img)
            lt = nn.LayerNorm(epsilon=LN_EPS, name="local_norm1")(lt)
            lt = _gelu(lt)
            lt = nn.Conv(init_dim, (3, 3), strides=(2, 2), padding=1, name="local_conv2")(lt)
            lt = nn.LayerNorm(epsilon=LN_EPS, name="local_norm2")(lt)
            lt = _gelu(lt)
            local_tokens = nn.Conv(init_dim, (3, 3), padding=1, name="local_conv3")(lt)
        else:
            local_tokens = nn.Conv(
                init_dim, (8, 8), strides=(4, 4), padding=3, name="local_encoder"
            )(img)

        rp = region_patch_size
        region = rearrange(
            img, "b (h p1) (w p2) c -> b h w (c p1 p2)", p1=rp, p2=rp
        )
        region_tokens = nn.Conv(init_dim, (1, 1), name="region_encoder")(region)

        for ind in range(4):
            not_first = ind != 0
            if not_first:
                down = nn.Conv(
                    dim[ind], (3, 3), strides=(2, 2), padding=1,
                    name=f"stage_{ind}_downsample",
                )
                # shared downsample conv on both streams (regionvit.py:277)
                local_tokens = down(local_tokens)
                region_tokens = down(region_tokens)
                if self.use_peg:
                    local_tokens = (
                        nn.Conv(
                            dim[ind], (3, 3), padding=1,
                            feature_group_count=dim[ind],
                            name=f"stage_{ind}_peg",
                        )(local_tokens)
                        + local_tokens
                    )
            local_tokens, region_tokens = R2LTransformer(
                dim=dim[ind],
                window_size=self.window_size,
                depth=depth[ind],
                attn_dropout=self.attn_dropout,
                ff_dropout=self.ff_dropout,
                name=f"stage_{ind}_transformer",
            )(local_tokens, region_tokens, train=train)

        pooled = region_tokens.mean(axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="to_logits")(pooled)
