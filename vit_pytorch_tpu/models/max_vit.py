"""MaxViT — MBConv + block/grid windowed attention hybrid (reference
max_vit.py:208-291).

TPU-native notes:
  - all convs run NHWC (native TPU layout); the reference's NCHW einops
    rearranges (max_vit.py:264-272) become NHWC window folds.
  - windowed attention folds windows into the batch dim: (b·x·y, w², d)
    GEMMs, with the (2w−1)² learned rel-pos-bias table added as an attention
    bias (max_vit.py:150-189).
  - ``Dropsample`` implements the *intended* per-sample stochastic drop; the
    reference's ``torch.FloatTensor((shape))`` call is a latent bug
    (max_vit.py:87, SURVEY §7.2) that builds a 4-element tensor instead of a
    (b,1,1,1) one.
  - MBConv BatchNorm uses the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import default
from einops import rearrange


class SqueezeExcitation(nn.Module):
    """reference max_vit.py:47-62 (NHWC)."""

    dim: int
    shrinkage_rate: float = 0.25

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.shrinkage_rate)
        gate = x.mean(axis=(1, 2))
        gate = nn.Dense(hidden, use_bias=False, name="fc1")(gate)
        gate = jax.nn.silu(gate)
        gate = nn.Dense(self.dim, use_bias=False, name="fc2")(gate)
        gate = jax.nn.sigmoid(gate)
        return x * gate[:, None, None, :]


class Dropsample(nn.Module):
    """Per-sample stochastic depth (intended behavior of max_vit.py:76-88)."""

    prob: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.prob == 0.0 or not train:
            return x
        rng = self.make_rng("dropout")
        keep = (
            jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) > self.prob
        )
        return jnp.where(keep, x / (1 - self.prob), 0.0)


class MBConv(nn.Module):
    """reference max_vit.py:90-117 (NHWC, BatchNorm via batch_stats)."""

    dim_in: int
    dim_out: int
    downsample: bool
    expansion_rate: float = 4
    shrinkage_rate: float = 0.25
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = int(self.expansion_rate * self.dim_out)
        stride = 2 if self.downsample else 1
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )

        out = nn.Conv(hidden, (1, 1), name="conv_expand")(x)
        out = bn("bn1")(out)
        out = _gelu(out)
        out = nn.Conv(
            hidden,
            (3, 3),
            strides=(stride, stride),
            padding=1,
            feature_group_count=hidden,
            name="conv_depthwise",
        )(out)
        out = bn("bn2")(out)
        out = _gelu(out)
        out = SqueezeExcitation(
            dim=hidden, shrinkage_rate=self.shrinkage_rate, name="se"
        )(out)
        out = nn.Conv(self.dim_out, (1, 1), name="conv_project")(out)
        out = bn("bn3")(out)

        if self.dim_in == self.dim_out and not self.downsample:
            out = Dropsample(self.dropout, name="dropsample")(out, train=train)
            out = out + x
        return out


def rel_pos_indices(window_size: int) -> np.ndarray:
    """(w², w²) indices into the (2w−1)² bias table (max_vit.py:152-159)."""
    w = window_size
    pos = np.arange(w)
    grid = np.stack(np.meshgrid(pos, pos, indexing="ij"), axis=-1).reshape(-1, 2)
    rel = grid[:, None, :] - grid[None, :, :] + (w - 1)
    return rel[..., 0] * (2 * w - 1) + rel[..., 1]


class WindowAttention(nn.Module):
    """reference max_vit.py:121-206 — windowed attention with learned
    rel-pos-bias; input (b, x, y, w1, w2, d)."""

    dim: int
    dim_head: int = 32
    dropout: float = 0.0
    window_size: int = 7

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.dim % self.dim_head == 0
        h = self.dim // self.dim_head
        w = self.window_size
        b, gx, gy, w1, w2, d = x.shape

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = x.reshape(b * gx * gy, w1 * w2, d)

        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            bb, n, _ = t.shape
            return t.reshape(bb, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        table = self.param(
            "rel_pos_bias", nn.initializers.normal(1.0), ((2 * w - 1) ** 2, h)
        )
        idx = rel_pos_indices(w)
        bias = table[idx].transpose(2, 0, 1)  # (h, w², w²)

        # unified dispatcher: XLA fused attention (measured final for
        # windowed shapes — PERF_NOTES round 5; explicit use_flash=True
        # still routes the per-head bias to the Pallas short kernel)
        out = dot_product_attention(
            q,
            k,
            v,
            scale=self.dim_head**-0.5,
            bias=bias,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b * gx * gy, w1 * w2, self.dim)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out.reshape(b, gx, gy, w1, w2, self.dim)


class MaxFeedForward(nn.Module):
    """reference max_vit.py:30-43 (mult-style)."""

    dim: int
    mult: float = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inner = int(self.dim * self.mult)
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Dense(inner, name="fc1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Dense(self.dim, name="fc2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class MaxViT(nn.Module):
    """reference max_vit.py:208 — same keyword constructor."""

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

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert isinstance(self.depth, (tuple, list)), (
            "depth needs to be tuple if integers indicating number of "
            "transformer blocks at that stage"
        )
        w = self.window_size

        # NCHW input (reference convention) → NHWC for TPU convs
        x = jnp.transpose(img, (0, 2, 3, 1))

        dim_conv_stem = default(self.dim_conv_stem, self.dim)
        x = nn.Conv(
            dim_conv_stem, (3, 3), strides=(2, 2), padding=1, name="conv_stem_0"
        )(x)
        x = nn.Conv(dim_conv_stem, (3, 3), padding=1, name="conv_stem_1")(x)

        num_stages = len(self.depth)
        dims = tuple((2**i) * self.dim for i in range(num_stages))
        dims = (dim_conv_stem, *dims)

        block_idx = 0
        for ind, layer_depth in enumerate(self.depth):
            layer_dim_in, layer_dim = dims[ind], dims[ind + 1]
            for stage_ind in range(layer_depth):
                is_first = stage_ind == 0
                stage_dim_in = layer_dim_in if is_first else layer_dim
                name = f"block_{block_idx}"
                block_idx += 1

                x = MBConv(
                    dim_in=stage_dim_in,
                    dim_out=layer_dim,
                    downsample=is_first,
                    expansion_rate=self.mbconv_expansion_rate,
                    shrinkage_rate=self.mbconv_shrinkage_rate,
                    name=f"{name}_mbconv",
                )(x, train=train)

                # block attention: windows are contiguous tiles
                xx = rearrange(x, "b (x w1) (y w2) d -> b x y w1 w2 d", w1=w, w2=w)
                xx = WindowAttention(
                    dim=layer_dim,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    window_size=w,
                    name=f"{name}_block_attn",
                )(xx, train=train) + xx
                xx = MaxFeedForward(
                    dim=layer_dim, dropout=self.dropout, name=f"{name}_block_ff"
                )(xx, train=train) + xx
                x = rearrange(xx, "b x y w1 w2 d -> b (x w1) (y w2) d")

                # grid attention: windows are dilated
                xx = rearrange(x, "b (w1 x) (w2 y) d -> b x y w1 w2 d", w1=w, w2=w)
                xx = WindowAttention(
                    dim=layer_dim,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    window_size=w,
                    name=f"{name}_grid_attn",
                )(xx, train=train) + xx
                xx = MaxFeedForward(
                    dim=layer_dim, dropout=self.dropout, name=f"{name}_grid_ff"
                )(xx, train=train) + xx
                x = rearrange(xx, "b x y w1 w2 d -> b (w1 x) (w2 y) d")

        pooled = x.mean(axis=(1, 2))
        pooled = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(pooled)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
