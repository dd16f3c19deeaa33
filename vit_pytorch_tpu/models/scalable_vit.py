"""ScalableViT (reference scalable_vit.py:240-304).

SSA: conv-reduced kv spatial resolution (scalable_vit.py:89-90); IWSA:
windowed attention plus a 3×3-conv Local Interactive Module added to the
output (scalable_vit.py:144-192); PEG on the first block of each stage.

Faithful quirk: the reference's layer unpacking swaps the names of the
second FF and the IWSA (scalable_vit.py:228-237) — the effective per-block
order is SSA → FF → [PEG] → FF → IWSA, which we implement directly.
NHWC layout."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple, default


class ScalableFeedForward(nn.Module):
    """reference scalable_vit.py:54-67."""

    dim: int
    expansion_factor: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inner = self.dim * self.expansion_factor
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Conv(inner, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ScalableSelfAttention(nn.Module):
    """reference scalable_vit.py:71-124."""

    dim: int
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    dropout: float = 0.0
    reduction_factor: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = self.heads
        r = self.reduction_factor
        scale = self.dim_key**-0.5
        b, H, W, _ = x.shape

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        q = nn.Conv(self.dim_key * h, (1, 1), use_bias=False, name="to_q")(x)
        k = nn.Conv(
            self.dim_key * h, (r, r), strides=(r, r), use_bias=False, name="to_k"
        )(x)
        v = nn.Conv(
            self.dim_value * h, (r, r), strides=(r, r), use_bias=False, name="to_v"
        )(x)

        def split(t, d):
            bb, hh, ww, _ = t.shape
            return t.reshape(bb, hh * ww, h, d).transpose(0, 2, 1, 3)

        q = split(q, self.dim_key)
        k = split(k, self.dim_key)
        v = split(v, self.dim_value)

        dropout_rng = None
        if self.dropout > 0.0 and train:
            dropout_rng = self.make_rng("dropout")
        out = dot_product_attention(
            q, k, v, scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, H, W, self.dim_value * h)
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class InteractiveWindowedSelfAttention(nn.Module):
    """reference scalable_vit.py:126-192."""

    dim: int
    window_size: Optional[int]
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = self.heads
        scale = self.dim_key**-0.5
        b, H, W, _ = x.shape
        wsz_h = default(self.window_size, H)
        wsz_w = default(self.window_size, W)
        assert H % wsz_h == 0 and W % wsz_w == 0

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        q = nn.Conv(self.dim_key * h, (1, 1), use_bias=False, name="to_q")(x)
        k = nn.Conv(self.dim_key * h, (1, 1), use_bias=False, name="to_k")(x)
        v = nn.Conv(self.dim_value * h, (1, 1), use_bias=False, name="to_v")(x)

        # Local Interactive Module on v (scalable_vit.py:144, 167)
        local_out = nn.Conv(
            self.dim_value * h, (3, 3), padding=1, name="local_interactive_module"
        )(v)

        def to_win(t, d):
            return rearrange(
                t,
                "b (x w1) (y w2) (h d) -> (b x y) h (w1 w2) d",
                w1=wsz_h, w2=wsz_w, h=h,
            )

        qw, kw, vw = to_win(q, self.dim_key), to_win(k, self.dim_key), to_win(v, self.dim_value)

        dropout_rng = None
        if self.dropout > 0.0 and train:
            dropout_rng = self.make_rng("dropout")
        out = dot_product_attention(
            qw, kw, vw, scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )

        out = rearrange(
            out,
            "(b x y) h (w1 w2) d -> b (x w1) (y w2) (h d)",
            x=H // wsz_h, y=W // wsz_w, w1=wsz_h, w2=wsz_w,
        )
        out = out + local_out
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class ScalableViT(nn.Module):
    """reference scalable_vit.py:240 — same keyword constructor."""

    num_classes: int
    dim: int
    depth: Tuple[int, ...]
    heads: Union[int, Tuple[int, ...]]
    reduction_factor: Union[int, Tuple[int, ...]]
    window_size: Union[None, int, Tuple] = None
    iwsa_dim_key: Union[int, Tuple[int, ...]] = 32
    iwsa_dim_value: Union[int, Tuple[int, ...]] = 32
    ssa_dim_key: Union[int, Tuple[int, ...]] = 32
    ssa_dim_value: Union[int, Tuple[int, ...]] = 32
    ff_expansion_factor: int = 4
    channels: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert isinstance(self.depth, (tuple, list))
        num_stages = len(self.depth)
        dims = tuple((2**i) * self.dim for i in range(num_stages))
        heads = cast_tuple(self.heads, num_stages)
        red = cast_tuple(self.reduction_factor, num_stages)
        wins = cast_tuple(self.window_size, num_stages)
        # per-stage hyperparams, like reference scalable_vit.py:266-277
        ssa_dk = cast_tuple(self.ssa_dim_key, num_stages)
        ssa_dv = cast_tuple(self.ssa_dim_value, num_stages)
        iwsa_dk = cast_tuple(self.iwsa_dim_key, num_stages)
        iwsa_dv = cast_tuple(self.iwsa_dim_value, num_stages)

        x = jnp.transpose(img, (0, 2, 3, 1))
        x = nn.Conv(self.dim, (7, 7), strides=(4, 4), padding=3, name="to_patches")(x)

        for ind in range(num_stages):
            is_last = ind == num_stages - 1
            d = dims[ind]
            for blk in range(self.depth[ind]):
                is_first = blk == 0
                name = f"stage_{ind}_block_{blk}"
                x = ScalableSelfAttention(
                    dim=d,
                    heads=heads[ind],
                    dim_key=ssa_dk[ind],
                    dim_value=ssa_dv[ind],
                    reduction_factor=red[ind],
                    dropout=self.dropout,
                    name=f"{name}_ssa",
                )(x, train=train) + x
                x = ScalableFeedForward(
                    dim=d,
                    expansion_factor=self.ff_expansion_factor,
                    dropout=self.dropout,
                    name=f"{name}_ff1",
                )(x, train=train) + x
                if is_first:
                    x = (
                        nn.Conv(
                            d, (3, 3), padding=1, feature_group_count=d,
                            name=f"{name}_peg",
                        )(x)
                        + x
                    )
                x = ScalableFeedForward(
                    dim=d,
                    expansion_factor=self.ff_expansion_factor,
                    dropout=self.dropout,
                    name=f"{name}_ff2",
                )(x, train=train) + x
                x = InteractiveWindowedSelfAttention(
                    dim=d,
                    window_size=wins[ind],
                    heads=heads[ind],
                    dim_key=iwsa_dk[ind],
                    dim_value=iwsa_dv[ind],
                    dropout=self.dropout,
                    name=f"{name}_iwsa",
                )(x, train=train) + x

            if not is_last:
                x = nn.LayerNorm(epsilon=LN_EPS, name=f"stage_{ind}_norm")(x)
                x = nn.Conv(
                    dims[ind] * 2, (3, 3), strides=(2, 2), padding=1,
                    name=f"stage_{ind}_downsample",
                )(x)

        pooled = x.mean(axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
