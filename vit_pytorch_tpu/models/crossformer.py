"""CrossFormer (reference crossformer.py:208-267).

Multi-kernel conv embedding per stage (CrossEmbedLayer, crossformer.py:14-36),
alternating short-distance (windowed) and long-distance (dilated) attention
(crossformer.py:128-131), and an MLP-computed continuous relative position
bias (DynamicPositionBias, crossformer.py:40-53).  NHWC layout; the bias MLP
runs once per call over the static (2w+1)² relative offsets."""

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
from .max_vit import rel_pos_indices


class CrossEmbedLayer(nn.Module):
    """reference crossformer.py:14-36."""

    dim_out: int
    kernel_sizes: Tuple[int, ...]
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        kernel_sizes = sorted(self.kernel_sizes)
        num_scales = len(kernel_sizes)
        dim_scales = [int(self.dim_out / (2**i)) for i in range(1, num_scales)]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]

        fmaps = []
        for i, (kernel, dim_scale) in enumerate(zip(kernel_sizes, dim_scales)):
            fmaps.append(
                nn.Conv(
                    dim_scale,
                    (kernel, kernel),
                    strides=(self.stride, self.stride),
                    padding=(kernel - self.stride) // 2,
                    name=f"conv_{i}",
                )(x)
            )
        return jnp.concatenate(fmaps, axis=-1)


class DynamicPositionBias(nn.Module):
    """reference crossformer.py:40-53."""

    dim: int

    @nn.compact
    def __call__(self, rel_pos):
        x = rel_pos
        for i in range(3):
            x = nn.Dense(self.dim, name=f"fc{i}")(x)
            x = nn.LayerNorm(epsilon=LN_EPS, name=f"norm{i}")(x)
            x = jax.nn.relu(x)
        return nn.Dense(1, name="out")(x)[..., 0]


class CrossFormerAttention(nn.Module):
    """reference crossformer.py:78-172 — short (contiguous windows) or long
    (dilated windows) attention with dynamic position bias."""

    dim: int
    attn_type: str
    window_size: int
    dim_head: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.attn_type in {"short", "long"}
        h = self.dim // self.dim_head
        inner = self.dim_head * h
        scale = self.dim_head**-0.5
        wsz = self.window_size
        b, H, W, _ = x.shape

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        if self.attn_type == "short":
            xw = rearrange(x, "b (x s1) (y s2) d -> (b x y) s1 s2 d", s1=wsz, s2=wsz)
        else:
            xw = rearrange(x, "b (l1 x) (l2 y) d -> (b x y) l1 l2 d", l1=wsz, l2=wsz)

        qkv = nn.Conv(inner * 3, (1, 1), use_bias=False, name="to_qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            bb, s1, s2, _ = t.shape
            return t.reshape(bb, s1 * s2, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        # dynamic position bias over static (2w+1)² offsets (crossformer.py:146-152)
        pos = np.arange(-wsz, wsz + 1)
        rel = np.stack(np.meshgrid(pos, pos, indexing="ij"), axis=-1).reshape(-1, 2)
        biases = DynamicPositionBias(self.dim // 4, name="dpb")(
            jnp.asarray(rel, jnp.float32)
        )
        idx = rel_pos_indices(wsz)
        # DPB emits one scalar per offset (head-independent); broadcast to
        # (h, w², w²) so the dispatcher's per-head-bias kernel path applies
        bias = jnp.broadcast_to(biases[idx], (h,) + idx.shape)

        # unified dispatcher (per-head bias → short-kernel eligible)
        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            bias=bias,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        bb = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(bb, wsz, wsz, inner)
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)

        if self.attn_type == "short":
            out = rearrange(
                out, "(b x y) s1 s2 d -> b (x s1) (y s2) d", x=H // wsz, y=W // wsz
            )
        else:
            out = rearrange(
                out, "(b x y) l1 l2 d -> b (l1 x) (l2 y) d", x=H // wsz, y=W // wsz
            )
        return out


class CrossFormerFeedForward(nn.Module):
    """reference crossformer.py:69-76."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Conv(self.dim * self.mult, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return nn.Conv(self.dim, (1, 1), name="conv2")(out)


class CrossFormer(nn.Module):
    """reference crossformer.py:208 — same keyword constructor."""

    dim: Union[int, Tuple[int, ...]] = (64, 128, 256, 512)
    depth: Union[int, Tuple[int, ...]] = (2, 2, 8, 2)
    global_window_size: Union[int, Tuple[int, ...]] = (8, 4, 2, 1)
    local_window_size: Union[int, Tuple[int, ...]] = 7
    cross_embed_kernel_sizes: Tuple = ((4, 8, 16, 32), (2, 4), (2, 4), (2, 4))
    cross_embed_strides: Union[int, Tuple[int, ...]] = (4, 2, 2, 2)
    num_classes: int = 1000
    attn_dropout: float = 0.0
    ff_dropout: float = 0.0
    channels: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim = cast_tuple(self.dim, 4)
        depth = cast_tuple(self.depth, 4)
        global_wsz = cast_tuple(self.global_window_size, 4)
        local_wsz = cast_tuple(self.local_window_size, 4)
        kernels = cast_tuple(self.cross_embed_kernel_sizes, 4)
        strides = cast_tuple(self.cross_embed_strides, 4)

        x = jnp.transpose(x, (0, 2, 3, 1))

        for s in range(4):
            x = CrossEmbedLayer(
                dim_out=dim[s],
                kernel_sizes=kernels[s],
                stride=strides[s],
                name=f"stage_{s}_cel",
            )(x)
            for i in range(depth[s]):
                x = CrossFormerAttention(
                    dim=dim[s],
                    attn_type="short",
                    window_size=local_wsz[s],
                    dropout=self.attn_dropout,
                    name=f"stage_{s}_layers_{i}_short_attn",
                )(x, train=train) + x
                x = CrossFormerFeedForward(
                    dim=dim[s], dropout=self.ff_dropout,
                    name=f"stage_{s}_layers_{i}_short_ff",
                )(x, train=train) + x
                x = CrossFormerAttention(
                    dim=dim[s],
                    attn_type="long",
                    window_size=global_wsz[s],
                    dropout=self.attn_dropout,
                    name=f"stage_{s}_layers_{i}_long_attn",
                )(x, train=train) + x
                x = CrossFormerFeedForward(
                    dim=dim[s], dropout=self.ff_dropout,
                    name=f"stage_{s}_layers_{i}_long_ff",
                )(x, train=train) + x

        pooled = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="to_logits")(pooled)
