"""LookViT — dual-resolution ViT with attention reuse (reference
look_vit.py:140-255).

Main tokens are a bilinear downsample of the highres tokens; each layer does
lookup cross-attention (returning the qk similarity), main self-attn + MLP,
then the *transposed* similarity drives the reverse cross-attention back to
the highres stream (look_vit.py:228-245)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import UnitOffsetLayerNorm
from ..nn.blocks import gelu as _gelu
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import exists
from einops import rearrange


class LookMLP(nn.Module):
    """reference look_vit.py:49-58."""

    dim: int
    factor: float = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        hidden = int(self.dim * self.factor)
        x = UnitOffsetLayerNorm(name="norm")(x)
        x = nn.Dense(hidden, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class LookAttention(nn.Module):
    """reference look_vit.py:62-136 — optional cross-attend, optional
    attention reuse (consumes a passed-in qk similarity)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    cross_attend: bool = False
    reuse_attention: bool = False

    @nn.compact
    def __call__(self, x, context=None, *, qk_sim=None, return_qk_sim=False, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        assert not (exists(context) ^ self.cross_attend)

        if not self.reuse_attention:
            x = UnitOffsetLayerNorm(name="norm")(x)
        if self.cross_attend:
            context = UnitOffsetLayerNorm(name="norm_context")(context)
        else:
            context = x

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        v = split(nn.Dense(inner, use_bias=False, name="to_v")(context))

        if not self.reuse_attention:
            q = split(nn.Dense(inner, use_bias=False, name="to_q")(x))
            k = split(nn.Dense(inner, use_bias=False, name="to_k")(context))
            q = q * scale
            qk_sim = jnp.einsum(
                "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
            )
        else:
            assert exists(qk_sim), "qk sim matrix must be passed in for reuse"

        attn = jax.nn.softmax(qk_sim, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        if return_qk_sim:
            return out, qk_sim
        return out


class LookViT(nn.Module):
    """reference look_vit.py:140 — same keyword constructor."""

    dim: int
    image_size: int
    num_classes: int
    depth: int = 3
    patch_size: int = 16
    heads: int = 8
    mlp_factor: float = 4
    dim_head: int = 64
    highres_patch_size: int = 12
    highres_mlp_factor: float = 4
    cross_attn_heads: int = 8
    cross_attn_dim_head: int = 64
    patch_conv_kernel_size: int = 7
    dropout: float = 0.1
    channels: int = 3

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert img.shape[-2:] == (self.image_size, self.image_size), (
            "input must match the configured image_size (look_vit.py:207)"
        )
        assert self.image_size % self.highres_patch_size == 0
        assert self.image_size % self.patch_size == 0
        assert self.patch_size > self.highres_patch_size
        assert self.patch_conv_kernel_size % 2 == 1

        hp = self.highres_patch_size
        k = self.patch_conv_kernel_size

        # space-to-depth then conv embed (look_vit.py:173-178); NHWC for TPU
        x = rearrange(
            img, "b c (h p1) (w p2) -> b h w (p1 p2 c)", p1=hp, p2=hp
        )
        x = nn.Conv(self.dim, (k, k), padding=k // 2, name="patch_conv")(x)
        x = UnitOffsetLayerNorm(name="patch_norm")(x)

        size = x.shape[1]
        pe = posemb_sincos_2d(size, x.shape[2], self.dim, dtype=x.dtype)
        highres = x + pe.reshape(size, x.shape[2], self.dim)

        # bilinear downsample to the main token grid (look_vit.py:217-222)
        main_size = self.image_size // self.patch_size
        # antialias=False: torch F.interpolate (look_vit.py:217-221) does not
        # low-pass filter on downsampling, jax.image.resize does by default
        tokens = jax.image.resize(
            highres,
            (highres.shape[0], main_size, main_size, self.dim),
            method="bilinear",
            antialias=False,
        )
        b = tokens.shape[0]
        tokens = tokens.reshape(b, main_size * main_size, self.dim)
        highres = highres.reshape(b, size * size, self.dim)

        for i in range(self.depth):
            lookup_out, qk_sim = LookAttention(
                dim=self.dim,
                heads=self.cross_attn_heads,
                dim_head=self.cross_attn_dim_head,
                dropout=self.dropout,
                cross_attend=True,
                name=f"layers_{i}_lookup_cross_attn",
            )(tokens, highres, return_qk_sim=True, train=train)
            tokens = lookup_out + tokens

            tokens = LookAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(tokens, train=train) + tokens
            tokens = LookMLP(
                dim=self.dim,
                factor=self.mlp_factor,
                dropout=self.dropout,
                name=f"layers_{i}_mlp",
            )(tokens, train=train) + tokens

            # attention reuse: transposed similarity (look_vit.py:240-242)
            qk_sim_t = jnp.swapaxes(qk_sim, -1, -2)
            highres = LookAttention(
                dim=self.dim,
                heads=self.cross_attn_heads,
                dim_head=self.cross_attn_dim_head,
                dropout=self.dropout,
                cross_attend=True,
                reuse_attention=True,
                name=f"layers_{i}_highres_attn",
            )(highres, tokens, qk_sim=qk_sim_t, train=train) + highres
            highres = UnitOffsetLayerNorm(name=f"layers_{i}_highres_norm")(highres)
            highres = LookMLP(
                dim=self.dim,
                factor=self.highres_mlp_factor,
                dropout=self.dropout,
                name=f"layers_{i}_highres_mlp",
            )(highres, train=train) + highres

        tokens = UnitOffsetLayerNorm(name="norm")(tokens)
        highres = UnitOffsetLayerNorm(name="highres_norm")(highres)

        pooled = tokens.mean(axis=1) + highres.mean(axis=1)
        return nn.Dense(self.num_classes, use_bias=False, name="to_logits")(pooled)
