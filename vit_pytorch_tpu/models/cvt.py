"""CvT — convolutional vision transformer (reference cvt.py:114-173).

Three stages of conv embedding + conv-projection attention (depthwise convs
for q/kv, kv strided, cvt.py:62-97).  NHWC layout; channel-LayerNorm
(cvt.py:25-35) becomes a plain last-axis LayerNorm in NHWC."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention


class ChanLayerNorm(nn.Module):
    """reference cvt.py:25-35 — LN over channels.  In NHWC that's the last
    axis; the reference uses biased variance, matching flax LayerNorm."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=LN_EPS, name="ln")(x)


class DepthWiseConv2d(nn.Module):
    """reference cvt.py:51-60 — dw conv → BN → 1×1 conv (NHWC)."""

    dim_in: int
    dim_out: int
    kernel_size: int
    stride: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.dim_in,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            feature_group_count=self.dim_in,
            use_bias=self.use_bias,
            name="depthwise",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return nn.Conv(
            self.dim_out, (1, 1), use_bias=self.use_bias, name="pointwise"
        )(x)


class CvTAttention(nn.Module):
    """reference cvt.py:62-97."""

    dim: int
    proj_kernel: int
    kv_proj_stride: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        x = ChanLayerNorm(name="norm")(x)
        q = DepthWiseConv2d(
            self.dim, inner, self.proj_kernel, stride=1, use_bias=False, name="to_q"
        )(x, train=train)
        kv = DepthWiseConv2d(
            self.dim,
            inner * 2,
            self.proj_kernel,
            stride=self.kv_proj_stride,
            use_bias=False,
            name="to_kv",
        )(x, train=train)
        k, v = jnp.split(kv, 2, axis=-1)

        b, qy, qx, _ = q.shape

        def to_heads(t):
            bb, yy, xx, _ = t.shape
            return t.reshape(bb, yy * xx, h, dh).transpose(0, 2, 1, 3)

        qh, kh, vh = map(to_heads, (q, k, v))

        out = dot_product_attention(
            qh,
            kh,
            vh,
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, qy, qx, inner)
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class CvTFeedForward(nn.Module):
    """reference cvt.py:37-49 — 1×1 conv channel FFN."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = ChanLayerNorm(name="norm")(x)
        out = nn.Conv(self.dim * self.mult, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class CvT(nn.Module):
    """reference cvt.py:114 — same keyword constructor (prefix-grouped
    s1_/s2_/s3_ stage configs)."""

    num_classes: int
    s1_emb_dim: int = 64
    s1_emb_kernel: int = 7
    s1_emb_stride: int = 4
    s1_proj_kernel: int = 3
    s1_kv_proj_stride: int = 2
    s1_heads: int = 1
    s1_depth: int = 1
    s1_mlp_mult: int = 4
    s2_emb_dim: int = 192
    s2_emb_kernel: int = 3
    s2_emb_stride: int = 2
    s2_proj_kernel: int = 3
    s2_kv_proj_stride: int = 2
    s2_heads: int = 3
    s2_depth: int = 2
    s2_mlp_mult: int = 4
    s3_emb_dim: int = 384
    s3_emb_kernel: int = 3
    s3_emb_stride: int = 2
    s3_proj_kernel: int = 3
    s3_kv_proj_stride: int = 2
    s3_heads: int = 6
    s3_depth: int = 10
    s3_mlp_mult: int = 4
    dropout: float = 0.0
    channels: int = 3

    def stage_config(self, prefix: str) -> dict:
        return {
            k[len(prefix) + 1 :]: getattr(self, k)
            for k in self.__dataclass_fields__
            if k.startswith(prefix + "_")
        }

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))

        for prefix in ("s1", "s2", "s3"):
            cfg = self.stage_config(prefix)
            x = nn.Conv(
                cfg["emb_dim"],
                (cfg["emb_kernel"], cfg["emb_kernel"]),
                strides=(cfg["emb_stride"], cfg["emb_stride"]),
                padding=cfg["emb_kernel"] // 2,
                name=f"{prefix}_emb_conv",
            )(x)
            x = ChanLayerNorm(name=f"{prefix}_emb_norm")(x)
            for i in range(cfg["depth"]):
                x = CvTAttention(
                    dim=cfg["emb_dim"],
                    proj_kernel=cfg["proj_kernel"],
                    kv_proj_stride=cfg["kv_proj_stride"],
                    heads=cfg["heads"],
                    dim_head=64,
                    dropout=self.dropout,
                    name=f"{prefix}_layers_{i}_attn",
                )(x, train=train) + x
                x = CvTFeedForward(
                    dim=cfg["emb_dim"],
                    mult=cfg["mlp_mult"],
                    dropout=self.dropout,
                    name=f"{prefix}_layers_{i}_ff",
                )(x, train=train) + x

        pooled = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="to_logits")(pooled)
