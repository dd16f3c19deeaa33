"""LeViT — conv stem + BN-conv attention with downsampling stages
(reference levit.py:129-195).

All convs/BNs run NHWC; BatchNorm uses the ``batch_stats`` collection.  The
learned attention-bias Embedding indexed by absolute relative position
(levit.py:69-88) is a static numpy index table."""

from __future__ import annotations

from math import ceil
from typing import Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention

from ..utils.helpers import default, exists


def cast_tuple_l(val, l=3):
    val = val if isinstance(val, tuple) else (val,)
    return (*val, *((val[-1],) * max(l - len(val), 0)))


class ConvFeedForward(nn.Module):
    """reference levit.py:27-38 — 1×1 conv FFN with Hardswish (NHWC)."""

    dim: int
    mult: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.Conv(self.dim * self.mult, (1, 1), name="conv1")(x)
        out = nn.activation.hard_swish(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


def levit_pos_indices(fmap_size: int, downsample: bool) -> np.ndarray:
    """reference levit.py:71-82."""
    q_range = np.arange(0, fmap_size, 2 if downsample else 1)
    k_range = np.arange(fmap_size)
    q_pos = np.stack(np.meshgrid(q_range, q_range, indexing="ij"), axis=-1).reshape(-1, 2)
    k_pos = np.stack(np.meshgrid(k_range, k_range, indexing="ij"), axis=-1).reshape(-1, 2)
    rel = np.abs(q_pos[:, None, :] - k_pos[None, :, :])
    return rel[..., 0] * fmap_size + rel[..., 1]


class LeViTAttention(nn.Module):
    """reference levit.py:40-108 — BN-conv q/k/v (q strided when
    downsampling), learned positional attention bias."""

    dim: int
    fmap_size: int
    heads: int = 8
    dim_key: int = 32
    dim_value: int = 64
    dropout: float = 0.0
    dim_out: Optional[int] = None
    downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = self.heads
        dim_out = default(self.dim_out, self.dim)
        inner_k = self.dim_key * h
        inner_v = self.dim_value * h
        scale = self.dim_key**-0.5
        bn = lambda name, init_zero=False: nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            scale_init=nn.initializers.zeros if init_zero else nn.initializers.ones,
            name=name,
        )

        stride = 2 if self.downsample else 1
        q = bn("q_bn")(
            nn.Conv(inner_k, (1, 1), strides=(stride, stride), use_bias=False, name="to_q")(x)
        )
        k = bn("k_bn")(nn.Conv(inner_k, (1, 1), use_bias=False, name="to_k")(x))
        v = bn("v_bn")(nn.Conv(inner_v, (1, 1), use_bias=False, name="to_v")(x))

        b, qy, qx, _ = q.shape

        def to_heads(t, dh):
            bb, yy, xx, _ = t.shape
            return t.reshape(bb, yy * xx, h, dh).transpose(0, 2, 1, 3)

        qh = to_heads(q, self.dim_key)
        kh = to_heads(k, self.dim_key)
        vh = to_heads(v, self.dim_value)

        table = self.param(
            "pos_bias",
            nn.initializers.normal(1.0),
            (self.fmap_size * self.fmap_size, h),
        )
        idx = levit_pos_indices(self.fmap_size, self.downsample)
        # reference adds bias/scale AFTER scaling (levit.py:85-88) — fold the
        # 1/scale into the per-head table handed to the dispatcher
        bias = table[idx].transpose(2, 0, 1) / scale  # (h, i, j)

        # unified dispatcher (per-head bias → short-kernel eligible; the
        # kernel supports dim_value ≠ dim_key)
        out = dot_product_attention(
            qh,
            kh,
            vh,
            scale=scale,
            bias=bias,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, qy, qx, inner_v)

        out = _gelu(out)
        out = nn.Conv(dim_out, (1, 1), name="out_conv")(out)
        out = bn("out_bn", init_zero=True)(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class LeViTTransformer(nn.Module):
    """reference levit.py:110-127."""

    dim: int
    fmap_size: int
    depth: int
    heads: int
    dim_key: int
    dim_value: int
    mlp_mult: int = 2
    dropout: float = 0.0
    dim_out: Optional[int] = None
    downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim_out = default(self.dim_out, self.dim)
        attn_residual = (not self.downsample) and self.dim == dim_out

        for i in range(self.depth):
            res = x if attn_residual else 0
            x = LeViTAttention(
                dim=self.dim,
                fmap_size=self.fmap_size,
                heads=self.heads,
                dim_key=self.dim_key,
                dim_value=self.dim_value,
                dropout=self.dropout,
                downsample=self.downsample,
                dim_out=dim_out,
                name=f"layers_{i}_attn",
            )(x, train=train) + res
            x = ConvFeedForward(
                dim=dim_out,
                mult=self.mlp_mult,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        return x


class LeViT(nn.Module):
    """reference levit.py:129 — same keyword constructor."""

    image_size: int
    num_classes: int
    dim: Union[int, Tuple[int, ...]]
    depth: Union[int, Tuple[int, ...]]
    heads: Union[int, Tuple[int, ...]]
    mlp_mult: int
    stages: int = 3
    dim_key: int = 32
    dim_value: int = 64
    dropout: float = 0.0
    num_distill_classes: Optional[int] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        dims = cast_tuple_l(self.dim, self.stages)
        depths = cast_tuple_l(self.depth, self.stages)
        layer_heads = cast_tuple_l(self.heads, self.stages)
        assert all(len(t) == self.stages for t in (dims, depths, layer_heads))

        x = jnp.transpose(img, (0, 2, 3, 1))
        for i, ch in enumerate((32, 64, 128, dims[0])):
            x = nn.Conv(
                ch, (3, 3), strides=(2, 2), padding=1, name=f"conv_embedding_{i}"
            )(x)

        fmap_size = self.image_size // 16
        for ind in range(self.stages):
            is_last = ind == self.stages - 1
            x = LeViTTransformer(
                dim=dims[ind],
                fmap_size=fmap_size,
                depth=depths[ind],
                heads=layer_heads[ind],
                dim_key=self.dim_key,
                dim_value=self.dim_value,
                mlp_mult=self.mlp_mult,
                dropout=self.dropout,
                name=f"stage_{ind}",
            )(x, train=train)
            if not is_last:
                x = LeViTTransformer(
                    dim=dims[ind],
                    fmap_size=fmap_size,
                    depth=1,
                    heads=layer_heads[ind] * 2,
                    dim_key=self.dim_key,
                    dim_value=self.dim_value,
                    mlp_mult=self.mlp_mult,
                    dropout=self.dropout,
                    dim_out=dims[ind + 1],
                    downsample=True,
                    name=f"stage_{ind}_downsample",
                )(x, train=train)
                fmap_size = ceil(fmap_size / 2)

        x = x.mean(axis=(1, 2))

        out = nn.Dense(self.num_classes, name="mlp_head")(x)
        if exists(self.num_distill_classes):
            distill = nn.Dense(self.num_distill_classes, name="distill_head")(x)
            return out, distill
        return out
