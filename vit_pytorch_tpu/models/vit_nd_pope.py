"""ViT-ND with Golden-Gate PoPE — polar positional embedding (reference
vit_nd_pope.py:51-353).

q,k are mapped through softplus magnitude × (cos θ, sin θ) with a learned
clamped phase bias on the keys (vit_nd_pope.py:80-109), doubling the head
dim before the dot product.  fp32 island for the polar math."""

from __future__ import annotations

import math
from typing import Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import FeedForward, LN_EPS
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple, exists
from .vit_nd_rotary import make_directions


def pope_freqs(
    dim_pos: int,
    heads: int,
    dim_head: int,
    min_freq: float = 1.0,
    max_freq: float = 10000.0,
    p_zero_freqs: float = 0.0,
) -> jnp.ndarray:
    """(h, f=dim_head, p) frequency tensor (vit_nd_pope.py:51-78)."""
    n_freqs = dim_head
    n_zero = round(p_zero_freqs * n_freqs)
    omega = np.concatenate(
        [
            np.zeros(n_zero, dtype=np.float32),
            min_freq
            * (max_freq / min_freq)
            ** np.linspace(0, 1, n_freqs - n_zero, dtype=np.float32),
        ]
    )
    directions = rearrange(
        make_directions(heads * n_freqs, dim_pos), "(h f) p -> h f p", h=heads
    )
    return jnp.asarray(directions * omega[None, :, None])


def apply_polar_pos_emb(t, freqs):
    """vit_nd_pope.py:101-109 — fp32; output head dim doubles."""
    dtype = t.dtype
    t = jax.nn.softplus(t.astype(jnp.float32))
    return jnp.concatenate(
        [t * jnp.cos(freqs), t * jnp.sin(freqs)], axis=-1
    ).astype(dtype)


class PoPEAttention(nn.Module):
    """reference vit_nd_pope.py:129-168."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, polar_pos_emb=None, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        project_out = not (h == 1 and dh == self.dim)
        scale = dh**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qk = nn.Dense(inner * 2, use_bias=False, name="to_qk")(x)
        q, k = jnp.split(qk, 2, axis=-1)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        if exists(polar_pos_emb):
            freqs, bias = polar_pos_emb
            q = apply_polar_pos_emb(q, freqs)
            k = apply_polar_pos_emb(k, freqs + bias)

        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            q, k, v,
            scale=scale,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class ViTND(nn.Module):
    """reference vit_nd_pope.py:200 — same keyword constructor."""

    ndim: int
    input_shape: Union[int, Tuple[int, ...]]
    patch_size: Union[int, Tuple[int, ...]]
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    pope_min_freq: float = 1.0
    pope_max_freq: float = 10000.0
    pope_p_zero_freqs: float = 0.0
    init_learned_bias_uniform: bool = False

    @nn.compact
    def __call__(self, x, return_embed: bool = False, *, train: bool = False):
        assert 1 <= self.ndim <= 7
        input_shape = cast_tuple(self.input_shape, self.ndim)
        patch_size = cast_tuple(self.patch_size, self.ndim)
        for inp, p in zip(input_shape, patch_size):
            assert inp % p == 0

        b = x.shape[0]
        dim_names = "fghijkl"[: self.ndim]
        input_dims = [f"({d} p{i})" for i, d in enumerate(dim_names)]
        patch_dims = [f"p{i}" for i in range(self.ndim)]
        pattern = (
            f"b c {' '.join(input_dims)} -> "
            f"b {' '.join(dim_names)} ({' '.join(patch_dims)} c)"
        )
        kwargs = {f"p{i}": p for i, p in enumerate(patch_size)}
        x = rearrange(x, pattern, **kwargs)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm")(x)

        spatial_dims = x.shape[1:-1]
        grids = jnp.meshgrid(
            *[jnp.arange(d, dtype=jnp.float32) for d in spatial_dims], indexing="ij"
        )
        pos = jnp.stack(grids, axis=-1).reshape(-1, self.ndim)
        pos = jnp.broadcast_to(pos[None], (b,) + pos.shape)

        x = x.reshape(b, -1, self.dim)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        freqs_table = pope_freqs(
            self.ndim,
            self.heads,
            self.dim_head,
            self.pope_min_freq,
            self.pope_max_freq,
            self.pope_p_zero_freqs,
        )
        learned_bias = self.param(
            "learned_bias",
            (
                nn.initializers.uniform(scale=2 * math.pi)
                if self.init_learned_bias_uniform
                else nn.initializers.zeros
            ),
            (self.heads, self.dim_head),
        )
        if self.init_learned_bias_uniform:
            learned_bias = learned_bias - 2 * math.pi  # uniform(-2π, 0)
        # theta (b,h,n,f); bias (h,1,f) clamped to [-2π, 0] (vit_nd_pope.py:95-98)
        theta = jnp.einsum("hfp,bnp->bhnf", freqs_table, pos)
        bias = jnp.clip(learned_bias, -2 * math.pi, 0.0)[:, None, :]
        polar = (theta, bias)

        for i in range(self.depth):
            x = PoPEAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, polar_pos_emb=polar, train=train) + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        if return_embed:
            return x.reshape((b,) + spatial_dims + (self.dim,))
        pooled = x.mean(axis=1)
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)
