"""MaxViT with register tokens (reference max_vit_with_registers.py:200-345).

Per-block register tokens are packed into every window for block attention,
mean-pooled across windows, re-broadcast for grid attention
(max_vit_with_registers.py:290-330); the rel-pos-bias table has one extra
row/col index for registers (lines 148-158).

Faithful detail: in the block phase, registers ride through the FF as well;
in the grid phase they are split off after the attention, before the FF."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, reduce, repeat

from ..nn.blocks import LN_EPS
from ..ops.attention import dot_product_attention
from ..utils.helpers import default
from .max_vit import MBConv, MaxFeedForward, rel_pos_indices


class RegisterWindowAttention(nn.Module):
    """reference max_vit_with_registers.py:116-198 — windowed attention over
    [registers ∥ window tokens], padded bias index for registers."""

    dim: int
    dim_head: int = 32
    dropout: float = 0.0
    window_size: int = 7
    num_registers: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # x: (B, r + w², d) with windows already folded into B
        assert self.dim % self.dim_head == 0
        h = self.dim // self.dim_head
        w = self.window_size
        r = self.num_registers
        num_rel = (2 * w - 1) ** 2

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        table = self.param(
            "rel_pos_bias", nn.initializers.normal(1.0), (num_rel + 1, h)
        )
        idx = rel_pos_indices(w)
        idx = np.pad(idx, ((r, 0), (r, 0)), constant_values=num_rel)
        bias = table[idx].transpose(2, 0, 1)  # (h, r+w², r+w²)

        # unified dispatcher: XLA fused attention (measured final for
        # windowed shapes — PERF_NOTES round 5; same routing as max_vit.py)
        out = dot_product_attention(
            q,
            k,
            v,
            scale=self.dim_head**-0.5,
            bias=bias,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MaxViT(nn.Module):
    """reference max_vit_with_registers.py:200 — same keyword constructor."""

    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    dim_head: int = 32
    dim_conv_stem: Optional[int] = None
    window_size: int = 7
    mbconv_expansion_rate: float = 4
    mbconv_shrinkage_rate: float = 0.25
    dropout: float = 0.1
    channels: int = 3
    num_register_tokens: int = 4

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert isinstance(self.depth, (tuple, list))
        assert self.num_register_tokens > 0
        w = self.window_size
        r = self.num_register_tokens
        b = img.shape[0]

        x = jnp.transpose(img, (0, 2, 3, 1))
        dim_conv_stem = default(self.dim_conv_stem, self.dim)
        x = nn.Conv(dim_conv_stem, (3, 3), strides=(2, 2), padding=1, name="conv_stem_0")(x)
        x = nn.Conv(dim_conv_stem, (3, 3), padding=1, name="conv_stem_1")(x)

        num_stages = len(self.depth)
        dims = (dim_conv_stem, *((2**i) * self.dim for i in range(num_stages)))

        block_idx = 0
        for ind, layer_depth in enumerate(self.depth):
            layer_dim_in, layer_dim = dims[ind], dims[ind + 1]
            for stage_ind in range(layer_depth):
                is_first = stage_ind == 0
                name = f"block_{block_idx}"
                block_idx += 1

                x = MBConv(
                    dim_in=layer_dim_in if is_first else layer_dim,
                    dim_out=layer_dim,
                    downsample=is_first,
                    expansion_rate=self.mbconv_expansion_rate,
                    shrinkage_rate=self.mbconv_shrinkage_rate,
                    name=f"{name}_mbconv",
                )(x, train=train)

                registers = self.param(
                    f"{name}_register_tokens",
                    nn.initializers.normal(1.0),
                    (r, layer_dim),
                )

                # ---- block attention with registers ----
                xx = rearrange(x, "b (x w1) (y w2) d -> b x y (w1 w2) d", w1=w, w2=w)
                gx, gy = xx.shape[1], xx.shape[2]
                xw = xx.reshape(b * gx * gy, w * w, layer_dim)
                rr = repeat(registers, "n d -> B n d", B=b * gx * gy).astype(xw.dtype)
                packed = jnp.concatenate([rr, xw], axis=1)

                packed = RegisterWindowAttention(
                    dim=layer_dim,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    window_size=w,
                    num_registers=r,
                    name=f"{name}_block_attn",
                )(packed, train=train) + packed
                packed = MaxFeedForward(
                    dim=layer_dim, dropout=self.dropout, name=f"{name}_block_ff"
                )(packed, train=train) + packed

                rr, xw = packed[:, :r], packed[:, r:]
                xx = xw.reshape(b, gx, gy, w, w, layer_dim)
                x = rearrange(xx, "b x y w1 w2 d -> b (x w1) (y w2) d")
                rr = rr.reshape(b, gx, gy, r, layer_dim)

                # ---- grid attention with mean-pooled registers ----
                xx = rearrange(x, "b (w1 x) (w2 y) d -> b x y (w1 w2) d", w1=w, w2=w)
                ggx, ggy = xx.shape[1], xx.shape[2]
                xw = xx.reshape(b * ggx * ggy, w * w, layer_dim)
                rmean = reduce(rr, "b x y n d -> b n d", "mean")
                rr2 = repeat(rmean, "b n d -> (b x y) n d", x=ggx, y=ggy).astype(xw.dtype)
                packed = jnp.concatenate([rr2, xw], axis=1)

                packed = RegisterWindowAttention(
                    dim=layer_dim,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    window_size=w,
                    num_registers=r,
                    name=f"{name}_grid_attn",
                )(packed, train=train) + packed

                # registers split off BEFORE the grid FF (reference lines 323-328)
                xw = packed[:, r:]
                xw = MaxFeedForward(
                    dim=layer_dim, dropout=self.dropout, name=f"{name}_grid_ff"
                )(xw, train=train) + xw

                xx = xw.reshape(b, ggx, ggy, w, w, layer_dim)
                x = rearrange(xx, "b x y w1 w2 d -> b (w1 x) (w2 y) d")

        pooled = x.mean(axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
