"""RvT — rotary vision transformer (reference rvt.py:178-211).

2-D axial rotary embeddings on q/k excluding the cls token (rvt.py:131-147),
depthwise-conv query projection (SpatialConv, rvt.py:61-73), GEGLU FFN.
Rotary math runs in fp32 regardless of compute dtype (the reference forces
this with ``@autocast(enabled=False)``, rvt.py:13,27 — SURVEY §7.2)."""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, repeat

from ..nn.blocks import FeedForward, LN_EPS
from ..ops.attention import dot_product_attention
from ..nn.patch import PatchEmbedding, patchify_2d


def rotate_every_two(x):
    """reference rvt.py:14-18 (fp32)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def axial_rotary_embedding(dim_head: int, n: int, max_freq: float):
    """reference rvt.py:20-47 — returns fp32 (1, n², dim) sin/cos tables."""
    scales = np.linspace(1.0, max_freq / 2, dim_head // 4, dtype=np.float32)
    seq = np.linspace(-1.0, 1.0, n, dtype=np.float32)[:, None]
    seq = seq * scales[None, :] * np.pi

    x_sinu = repeat(seq, "i d -> i j d", j=n)
    y_sinu = repeat(seq, "j d -> i j d", i=n)

    sin = np.concatenate([np.sin(x_sinu), np.sin(y_sinu)], axis=-1)
    cos = np.concatenate([np.cos(x_sinu), np.cos(y_sinu)], axis=-1)
    sin = rearrange(sin, "i j d -> (i j) d")
    cos = rearrange(cos, "i j d -> (i j) d")
    sin = np.repeat(sin, 2, axis=-1)[None]
    cos = np.repeat(cos, 2, axis=-1)[None]
    return jnp.asarray(sin), jnp.asarray(cos)


class SpatialConv(nn.Module):
    """reference rvt.py:61-73 — depthwise conv query proj; cls via Linear."""

    dim_in: int
    dim_out: int
    kernel: int

    @nn.compact
    def __call__(self, x, fmap_h: int, fmap_w: int):
        cls_token, tokens = x[:, :1], x[:, 1:]
        b = x.shape[0]
        fmap = tokens.reshape(b, fmap_h, fmap_w, self.dim_in)
        fmap = nn.Conv(
            self.dim_in,
            (self.kernel, self.kernel),
            padding=self.kernel // 2,
            feature_group_count=self.dim_in,
            use_bias=False,
            name="depthwise",
        )(fmap)
        fmap = nn.Conv(self.dim_out, (1, 1), use_bias=False, name="pointwise")(fmap)
        tokens = fmap.reshape(b, fmap_h * fmap_w, self.dim_out)
        if self.dim_in != self.dim_out:
            cls_token = nn.Dense(self.dim_out, name="cls_proj")(cls_token)
        return jnp.concatenate([cls_token, tokens], axis=1)


class RvTAttention(nn.Module):
    """reference rvt.py:94-156."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_rotary: bool = True
    use_ds_conv: bool = True
    conv_query_kernel: int = 5

    @nn.compact
    def __call__(self, x, sin, cos, fmap_h, fmap_w, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        if self.use_ds_conv:
            q = SpatialConv(
                dim_in=self.dim, dim_out=inner, kernel=self.conv_query_kernel, name="to_q"
            )(x, fmap_h, fmap_w)
        else:
            q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3).reshape(b * h, n, dh)

        q, k, v = map(split, (q, k, v))

        if self.use_rotary:
            dim_rotary = sin.shape[-1]
            orig_dtype = q.dtype

            def apply_rot(t):
                t_cls, tt = t[:, :1], t[:, 1:].astype(jnp.float32)  # fp32 island
                tr, tp = tt[..., :dim_rotary], tt[..., dim_rotary:]
                tr = tr * cos + rotate_every_two(tr) * sin
                tt = jnp.concatenate([tr, tp], axis=-1).astype(orig_dtype)
                return jnp.concatenate([t_cls, tt], axis=1)

            q, k = apply_rot(q), apply_rot(k)

        b = x.shape[0]
        n = q.shape[1]
        # (b·h, n, d) → (b, h, n, d) for the unified dispatcher (rotary is
        # already applied above; the dispatcher sees plain scaled attention)
        out = dot_product_attention(
            q.reshape(b, h, n, dh),
            k.reshape(b, h, -1, dh),
            v.reshape(b, h, -1, dh),
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class RvT(nn.Module):
    """reference rvt.py:178 — same keyword constructor."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    use_rotary: bool = True
    use_ds_conv: bool = True
    use_glu: bool = True

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        b = img.shape[0]
        fmap = self.image_size // self.patch_size

        x = PatchEmbedding(
            dim=self.dim, norm_input=False, norm_output=False, name="patch_embedding"
        )(patchify_2d(img, self.patch_size, self.patch_size))

        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        sin, cos = axial_rotary_embedding(self.dim_head, fmap, self.image_size)

        for i in range(self.depth):
            x = RvTAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                use_rotary=self.use_rotary,
                use_ds_conv=self.use_ds_conv,
                name=f"layers_{i}_attn",
            )(x, sin, cos, fmap, fmap, train=train) + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                glu=self.use_glu,
                name=f"layers_{i}_ff",
            )(x, train=train) + x

        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(x)
