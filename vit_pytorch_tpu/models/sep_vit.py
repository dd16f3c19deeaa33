"""SepViT — depthwise-pointwise separable attention (reference
sep_vit.py:237-291).

Per window, a learned *window token* joins the window's tokens for windowed
("depthwise") attention; the window tokens then attend each other and their
attention mixes whole window feature maps ("pointwise" attention,
sep_vit.py:143-205).  NHWC layout."""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, repeat

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple


class SepFeedForward(nn.Module):
    """reference sep_vit.py:48-61 (NHWC 1×1 convs)."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inner = int(self.dim * self.mult)
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Conv(inner, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class DSSA(nn.Module):
    """reference sep_vit.py:65-205."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    dropout: float = 0.0
    window_size: int = 7

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh, wsz = self.heads, self.dim_head, self.window_size
        inner = h * dh
        scale = dh**-0.5
        b, H, W, _ = x.shape
        assert H % wsz == 0 and W % wsz == 0
        gx, gy = H // wsz, W // wsz
        num_windows = gx * gy

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        # windows folded into batch, + a learned window token per window
        xw = rearrange(
            x, "b (x w1) (y w2) c -> (b x y) (w1 w2) c", w1=wsz, w2=wsz
        )
        window_tokens = self.param(
            "window_tokens", nn.initializers.normal(1.0), (self.dim,)
        )
        w = jnp.broadcast_to(
            window_tokens, (xw.shape[0], 1, self.dim)
        ).astype(xw.dtype)
        xw = jnp.concatenate([w, xw], axis=1)

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            bb, n, _ = t.shape
            return t.reshape(bb, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )

        wtok, fmaps = out[:, :, 0], out[:, :, 1:]

        if num_windows == 1:
            fmap = rearrange(
                fmaps,
                "(b x y) h (w1 w2) d -> b (x w1) (y w2) (h d)",
                x=gx, y=gy, w1=wsz, w2=wsz,
            )
            fmap = nn.Conv(self.dim, (1, 1), name="to_out")(fmap)
            return nn.Dropout(self.dropout, deterministic=not train)(fmap)

        # pointwise attention between window tokens (sep_vit.py:181-199)
        wtok = rearrange(wtok, "(b x y) h d -> b h (x y) d", x=gx, y=gy)
        fmaps = rearrange(fmaps, "(b x y) h n d -> b h (x y) n d", x=gx, y=gy)

        wn = nn.LayerNorm(epsilon=LN_EPS, name="window_norm")(wtok)
        wn = _gelu(wn)
        # conv1d over heads-merged channels → q,k (sep_vit.py:95-101)
        wn = wn.transpose(0, 2, 1, 3).reshape(b, num_windows, inner)
        wqk = nn.Dense(inner * 2, name="window_to_qk")(wn)
        wqk = wqk.reshape(b, num_windows, h, 2 * dh).transpose(0, 2, 1, 3)
        w_q, w_k = jnp.split(wqk, 2, axis=-1)

        w_q = w_q * scale
        w_dots = jnp.einsum(
            "bhid,bhjd->bhij", w_q, w_k, preferred_element_type=jnp.float32
        )
        w_attn = jax.nn.softmax(w_dots, axis=-1).astype(fmaps.dtype)
        w_attn = nn.Dropout(self.dropout, deterministic=not train)(w_attn)

        agg = jnp.einsum("bhij,bhjwd->bhiwd", w_attn, fmaps)
        fmap = rearrange(
            agg,
            "b h (x y) (w1 w2) d -> b (x w1) (y w2) (h d)",
            x=gx, y=gy, w1=wsz, w2=wsz,
        )
        fmap = nn.Conv(self.dim, (1, 1), name="to_out")(fmap)
        return nn.Dropout(self.dropout, deterministic=not train)(fmap)


class SepViT(nn.Module):
    """reference sep_vit.py:237 — same keyword constructor."""

    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    heads: Union[int, Tuple[int, ...]]
    window_size: Union[int, Tuple[int, ...]] = 7
    dim_head: int = 32
    ff_mult: int = 4
    channels: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert isinstance(self.depth, (tuple, list))
        num_stages = len(self.depth)
        dims = tuple((2**i) * self.dim for i in range(num_stages))
        all_dims = (self.channels, *dims)
        strides = (4, *((2,) * (num_stages - 1)))
        heads = cast_tuple(self.heads, num_stages)
        window_sizes = cast_tuple(self.window_size, num_stages)

        x = jnp.transpose(x, (0, 2, 3, 1))

        for ind in range(num_stages):
            is_last = ind == num_stages - 1
            layer_dim = dims[ind]
            stride = strides[ind]
            kernel_size = stride * 2 - 1

            # overlapping patch embed (sep_vit.py:28-36)
            x = nn.Conv(
                layer_dim,
                (kernel_size, kernel_size),
                strides=(stride, stride),
                padding=kernel_size // 2,
                name=f"stage_{ind}_ope",
            )(x)
            # PEG (sep_vit.py:38-44)
            x = (
                nn.Conv(
                    layer_dim,
                    (3, 3),
                    padding=1,
                    feature_group_count=layer_dim,
                    name=f"stage_{ind}_peg",
                )(x)
                + x
            )
            for d in range(self.depth[ind]):
                x = DSSA(
                    dim=layer_dim,
                    heads=heads[ind],
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    window_size=window_sizes[ind],
                    name=f"stage_{ind}_layers_{d}_attn",
                )(x, train=train) + x
                x = SepFeedForward(
                    dim=layer_dim,
                    mult=self.ff_mult,
                    dropout=self.dropout,
                    name=f"stage_{ind}_layers_{d}_ff",
                )(x, train=train) + x
            if not is_last:
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"stage_{ind}_norm")(x)

        pooled = x.mean(axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
