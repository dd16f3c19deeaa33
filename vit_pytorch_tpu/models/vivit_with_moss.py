"""ViViT + MOSS — multi-order spatio-temporal similarity (reference
vivit_with_moss.py:278-452).

MOSS l2-normalizes features and takes local 3-D similarity windows (the
reference uses ``unfold``, lines 223-249); here the tiny (lt, lh, lw)
windows are built as a static stack of shifted slices — XLA fuses them into
one gather.  Causal streaming is supported functionally: the temporal
transformer and MOSS accept and return explicit caches."""

from __future__ import annotations

from itertools import product
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, reduce, repeat

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.blocks import gelu as _gelu
from ..ops.attention import dot_product_attention
from ..utils.helpers import default, exists, pair


class CausalAttention(nn.Module):
    """reference vivit_with_moss.py:63-137 — optional causal masking and KV
    cache."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, x, *, mask=None, cache=None, return_cache: bool = False, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        is_causal = self.causal and x.shape[-2] > 1
        assert not (is_causal and exists(mask))

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        if exists(cache):
            ck, cv = cache
            k = jnp.concatenate([ck, k], axis=-2)
            v = jnp.concatenate([cv, v], axis=-2)

        kp = mask[:, None, None, :] if exists(mask) else None
        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            q, k, v,
            mask=kp,
            causal=is_causal,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        if return_cache:
            return out, (k, v)
        return out


class CausalTransformer(nn.Module):
    """reference vivit_with_moss.py:139-167."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, x, *, mask=None, cache=None, return_cache: bool = False, train: bool = False):
        new_caches = []
        cache = default(cache, (None,) * self.depth)
        for i in range(self.depth):
            attn_out, next_cache = CausalAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                causal=self.causal,
                name=f"layers_{i}_attn",
            )(x, mask=mask, cache=cache[i], return_cache=True, train=train)
            new_caches.append(next_cache)
            x = attn_out + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        if return_cache:
            return x, tuple(new_caches)
        return x


class STSSEncoder(nn.Module):
    """reference vivit_with_moss.py:171-198."""

    dim: int
    local_time: int = 3
    local_height: int = 3
    local_width: int = 3
    hidden_dim: int = 64

    @nn.compact
    def __call__(self, sim):
        b, t, h, w, lt, lh, lw = sim.shape
        x = sim.reshape(b, t, h, w, lt, lh * lw)
        x = nn.Dense(self.hidden_dim, name="spatial_to_hidden")(x)

        # (b t lt) h w d for the spatial convs (NHWC)
        x = x.transpose(0, 1, 4, 2, 3, 5).reshape(b * t * lt, h, w, self.hidden_dim)
        for i in range(2):
            x = nn.Conv(self.hidden_dim, (3, 3), padding=1, name=f"conv{i}")(x)
            x = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name=f"conv_norm{i}")(x)
            x = _gelu(x)

        x = x.reshape(b, t, lt, h, w, self.hidden_dim)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, t, h, w, lt * self.hidden_dim)
        return nn.Dense(self.dim, name="time_to_out")(x)


class MOSS(nn.Module):
    """reference vivit_with_moss.py:200-274 — stack of STSS orders."""

    dim: int
    local_time: int = 3
    local_height: int = 3
    local_width: int = 3
    hidden_dim: int = 64
    orders: int = 2
    causal: bool = False

    def _stss_transform(self, x, cache=None):
        lt, lh, lw = self.local_time, self.local_height, self.local_width
        b, t, h, w, c = x.shape

        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        xc = x.transpose(0, 4, 1, 2, 3)  # b c t h w

        pad_h, pad_w = lh // 2, lw // 2
        has_cache = self.causal and exists(cache)
        pad_t_past, pad_t_future = (
            ((lt - 1), 0) if self.causal else (lt // 2, lt // 2)
        )

        x_temporal = jnp.concatenate([cache, xc], axis=2) if has_cache else xc
        padded = jnp.pad(
            x_temporal,
            (
                (0, 0),
                (0, 0),
                (0 if has_cache else pad_t_past, pad_t_future),
                (pad_h, pad_h),
                (pad_w, pad_w),
            ),
        )

        # static window stack: sim[..., l, u, v] = <x, padded shifted by (l,u,v)>
        sims = []
        for l, u, v in product(range(lt), range(lh), range(lw)):
            window = padded[:, :, l : l + t, u : u + h, v : v + w]
            sims.append(jnp.einsum("bcthw,bcthw->bthw", xc, window))
        sim = jnp.stack(sims, axis=-1).reshape(b, t, h, w, lt, lh, lw)

        new_cache = None
        if self.causal:
            new_cache = padded[:, :, -(lt - 1):, pad_h : pad_h + h, pad_w : pad_w + w]
        return sim, new_cache

    @nn.compact
    def __call__(self, x, cache=None, return_cache: bool = False):
        assert not (exists(cache) and not self.causal)
        out = nn.Dense(self.dim, name="to_out")(x)

        new_caches = []
        cache = default(cache, (None,) * self.orders)
        for i in range(self.orders):
            sim, next_cache = self._stss_transform(x, cache=cache[i])
            new_caches.append(next_cache)
            x = STSSEncoder(
                dim=self.dim,
                local_time=self.local_time,
                local_height=self.local_height,
                local_width=self.local_width,
                hidden_dim=self.hidden_dim,
                name=f"encoders_{i}",
            )(sim)
            out = out + nn.Dense(self.dim, name=f"to_order_out_{i}")(x)

        if return_cache:
            return out, tuple(new_caches)
        return out


class ViViT(nn.Module):
    """reference vivit_with_moss.py:278 — same keyword constructor."""

    image_size: int | tuple
    image_patch_size: int | tuple
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    spatial_depth: int
    temporal_depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    use_flash_attn: bool = True
    moss_local_time: int = 3
    moss_local_height: int = 3
    moss_local_width: int = 3
    moss_hidden_dim: int = 64
    moss_orders: int = 2
    moss_causal: bool = True

    @nn.compact
    def __call__(self, video, *, mask=None, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.image_patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.frames % self.frame_patch_size == 0
        assert self.pool in {"cls", "mean"}
        assert not (exists(mask) and self.moss_causal)

        num_image_patches = (image_height // patch_height) * (image_width // patch_width)
        num_frame_patches = self.frames // self.frame_patch_size
        patch_h = image_height // patch_height
        patch_w = image_width // patch_width
        has_cls = self.pool == "cls"

        x = rearrange(
            video,
            "b c (f pf) (h p1) (w p2) -> b f (h w) (pf p1 p2 c)",
            p1=patch_height, p2=patch_width, pf=self.frame_patch_size,
        )
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")(x)

        batch, frames, seq, _ = x.shape
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, num_frame_patches, num_image_patches, self.dim),
        )
        x = x + pos[:, :frames, :seq].astype(x.dtype)

        if has_cls:
            spatial_cls = self.param(
                "spatial_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
            )
            cls = jnp.broadcast_to(
                spatial_cls[None], (batch, frames, 1, self.dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=2)

        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        temporal_mask = None
        if exists(mask):
            temporal_mask = reduce(
                mask, "b (f patch) -> b f", "all", patch=self.frame_patch_size
            )

        x = rearrange(x, "b f n d -> (b f) n d")
        x = CausalTransformer(
            dim=self.dim,
            depth=self.spatial_depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            name="spatial_transformer",
        )(x, train=train)
        x = rearrange(x, "(b f) n d -> b f n d", b=batch)

        if has_cls:
            spatial_cls_tokens, patch_tokens = x[:, :, :1], x[:, :, 1:]
        else:
            patch_tokens = x

        patch_tokens = rearrange(
            patch_tokens, "b f (h w) d -> b f h w d", h=patch_h, w=patch_w
        )
        patch_tokens = MOSS(
            dim=self.dim,
            local_time=self.moss_local_time,
            local_height=self.moss_local_height,
            local_width=self.moss_local_width,
            hidden_dim=self.moss_hidden_dim,
            orders=self.moss_orders,
            causal=self.moss_causal,
            name="moss",
        )(patch_tokens)
        patch_tokens = rearrange(patch_tokens, "b f h w d -> b f (h w) d")

        moss_pooled = patch_tokens.mean(axis=2)
        if has_cls:
            x = spatial_cls_tokens[:, :, 0] + moss_pooled
        else:
            x = moss_pooled

        tmask = temporal_mask
        if has_cls:
            temporal_cls = self.param(
                "temporal_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
            )
            tcls = jnp.broadcast_to(temporal_cls, (batch, 1, self.dim)).astype(x.dtype)
            x = jnp.concatenate([tcls, x], axis=1)
            if exists(tmask):
                tmask = jnp.pad(tmask, ((0, 0), (1, 0)), constant_values=True)

        x = CausalTransformer(
            dim=self.dim,
            depth=self.temporal_depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            causal=self.moss_causal,
            name="temporal_transformer",
        )(x, mask=tmask, train=train)

        x = x[:, 0] if has_cls else x.mean(axis=1)
        x = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x)
        return nn.Dense(self.num_classes, name="mlp_head")(x)
