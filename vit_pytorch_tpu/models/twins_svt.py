"""Twins-SVT (reference twins_svt.py:178-235): four stages of patch embed →
local windowed attention → PEG (residual depthwise-conv positional encoding)
→ global subsampled attention (k-strided kv).  NHWC layout."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention


class TwinsFeedForward(nn.Module):
    """reference twins_svt.py:40-52 — 1×1 conv FFN with channel LN."""

    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Conv(self.dim * self.mult, (1, 1), name="conv1")(out)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Conv(self.dim, (1, 1), name="conv2")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class TwinsPatchEmbedding(nn.Module):
    """reference twins_svt.py:59-75 — space-to-depth + LN + 1×1 conv + LN."""

    dim_out: int
    patch_size: int

    @nn.compact
    def __call__(self, fmap):
        p = self.patch_size
        fmap = rearrange(fmap, "b (h p1) (w p2) c -> b h w (c p1 p2)", p1=p, p2=p)
        fmap = nn.LayerNorm(epsilon=LN_EPS, name="norm_pre")(fmap)
        fmap = nn.Conv(self.dim_out, (1, 1), name="proj")(fmap)
        return nn.LayerNorm(epsilon=LN_EPS, name="norm_post")(fmap)


class PEG(nn.Module):
    """reference twins_svt.py:77-83 — residual depthwise conv pos encoding."""

    dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        return (
            nn.Conv(
                self.dim,
                (self.kernel_size, self.kernel_size),
                padding=self.kernel_size // 2,
                feature_group_count=self.dim,
                name="proj",
            )(x)
            + x
        )


class LocalAttention(nn.Module):
    """reference twins_svt.py:85-120 — windowed attention within p×p patches."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    patch_size: int = 7

    @nn.compact
    def __call__(self, fmap, *, train: bool = False):
        h, dh, p = self.heads, self.dim_head, self.patch_size
        inner = h * dh
        scale = dh**-0.5

        fmap = nn.LayerNorm(epsilon=LN_EPS, name="norm")(fmap)
        b, H, W, _ = fmap.shape
        gx, gy = H // p, W // p

        q = nn.Conv(inner, (1, 1), use_bias=False, name="to_q")(fmap)
        kv = nn.Conv(inner * 2, (1, 1), use_bias=False, name="to_kv")(fmap)
        k, v = jnp.split(kv, 2, axis=-1)

        def to_windows(t, d):
            t = rearrange(
                t, "b (x p1) (y p2) (h d) -> (b x y) h (p1 p2) d", p1=p, p2=p, h=h
            )
            return t

        q, k, v = (to_windows(t, dh) for t in (q, k, v))

        out = dot_product_attention(q, k, v, scale=scale)
        out = rearrange(
            out,
            "(b x y) h (p1 p2) d -> b (x p1) (y p2) (h d)",
            x=gx,
            y=gy,
            p1=p,
            p2=p,
        )
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class GlobalAttention(nn.Module):
    """reference twins_svt.py:122-157 — kv spatially subsampled by a strided
    k×k conv."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    k: int = 7

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        b, H, W, _ = x.shape

        q = nn.Conv(inner, (1, 1), use_bias=False, name="to_q")(x)
        kv = nn.Conv(
            inner * 2,
            (self.k, self.k),
            strides=(self.k, self.k),
            use_bias=False,
            padding="VALID",
            name="to_kv",
        )(x)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            bb, hh, ww, _ = t.shape
            return t.reshape(bb, hh * ww, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout") if train and self.dropout > 0 else None,
        )
        out = out.transpose(0, 2, 1, 3).reshape(b, H, W, inner)
        out = nn.Conv(self.dim, (1, 1), name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class TwinsTransformer(nn.Module):
    """reference twins_svt.py:159-176."""

    dim: int
    depth: int
    heads: int = 8
    dim_head: int = 64
    mlp_mult: int = 4
    local_patch_size: int = 7
    global_k: int = 7
    dropout: float = 0.0
    has_local: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        for i in range(self.depth):
            if self.has_local:
                x = LocalAttention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    patch_size=self.local_patch_size,
                    name=f"layers_{i}_local_attn",
                )(x, train=train) + x
                x = TwinsFeedForward(
                    dim=self.dim,
                    mult=self.mlp_mult,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff1",
                )(x, train=train) + x
            x = GlobalAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                k=self.global_k,
                name=f"layers_{i}_global_attn",
            )(x, train=train) + x
            x = TwinsFeedForward(
                dim=self.dim,
                mult=self.mlp_mult,
                dropout=self.dropout,
                name=f"layers_{i}_ff2",
            )(x, train=train) + x
        return x


class TwinsSVT(nn.Module):
    """reference twins_svt.py:178 — same keyword constructor."""

    num_classes: int
    s1_emb_dim: int = 64
    s1_patch_size: int = 4
    s1_local_patch_size: int = 7
    s1_global_k: int = 7
    s1_depth: int = 1
    s2_emb_dim: int = 128
    s2_patch_size: int = 2
    s2_local_patch_size: int = 7
    s2_global_k: int = 7
    s2_depth: int = 1
    s3_emb_dim: int = 256
    s3_patch_size: int = 2
    s3_local_patch_size: int = 7
    s3_global_k: int = 7
    s3_depth: int = 5
    s4_emb_dim: int = 512
    s4_patch_size: int = 2
    s4_local_patch_size: int = 7
    s4_global_k: int = 7
    s4_depth: int = 4
    peg_kernel_size: int = 3
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = jnp.transpose(x, (0, 2, 3, 1))

        for prefix in ("s1", "s2", "s3", "s4"):
            g = lambda k: getattr(self, f"{prefix}_{k}")
            is_last = prefix == "s4"
            dim = g("emb_dim")

            x = TwinsPatchEmbedding(
                dim_out=dim, patch_size=g("patch_size"), name=f"{prefix}_embed"
            )(x)
            x = TwinsTransformer(
                dim=dim,
                depth=1,
                local_patch_size=g("local_patch_size"),
                global_k=g("global_k"),
                dropout=self.dropout,
                has_local=not is_last,
                name=f"{prefix}_transformer_pre",
            )(x, train=train)
            x = PEG(dim=dim, kernel_size=self.peg_kernel_size, name=f"{prefix}_peg")(x)
            x = TwinsTransformer(
                dim=dim,
                depth=g("depth"),
                local_patch_size=g("local_patch_size"),
                global_k=g("global_k"),
                dropout=self.dropout,
                has_local=not is_last,
                name=f"{prefix}_transformer",
            )(x, train=train)

        pooled = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="head")(pooled)
