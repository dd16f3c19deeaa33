"""ViT-ND with Golden-Gate N-D rotary embeddings (reference
vit_nd_rotary.py:46-175, 175-300).

Rotary directions are golden-ratio quasi-random vectors gaussianized with
erfinv and l2-normalized (vit_nd_rotary.py:37-44); log-spaced frequencies
with an optional zero-frequency fraction.  Rotation math runs in fp32
(SURVEY §7.2 fp32 islands)."""

from __future__ import annotations

from typing import Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import FeedForward, LN_EPS
from ..ops.attention import dot_product_attention
from ..utils.helpers import cast_tuple, exists
from .vit_nd import nd_patterns


def _phi(d: int) -> float:
    """d-dimensional golden ratio (reference vit_nd_rotary.py:27-35)."""
    x = 1.0
    for _ in range(30):
        x = (1 + x) ** (1.0 / (d + 1))
    return x


def make_directions(n: int, d: int) -> np.ndarray:
    """reference vit_nd_rotary.py:37-44 (float64 internally)."""
    from scipy.special import erfinv

    g = _phi(d)
    alpha = (1.0 / g) ** np.arange(1, d + 1, dtype=np.float64)
    i = np.arange(1, n + 1, dtype=np.float64)[:, None]
    z = np.fmod(i * alpha, 1.0)
    directions = erfinv(2.0 * z - 1.0)
    directions = directions / np.linalg.norm(directions, axis=-1, keepdims=True)
    return directions.astype(np.float32)


def golden_gate_freqs(
    dim_pos: int,
    heads: int,
    dim_head: int,
    rope_min_freq: float = 1.0,
    rope_max_freq: float = 10000.0,
    rope_p_zero_freqs: float = 0.0,
) -> jnp.ndarray:
    """(h, f, p) frequency tensor (reference vit_nd_rotary.py:46-73)."""
    n_freqs = dim_head // 2
    n_zero = round(rope_p_zero_freqs * n_freqs)
    omega = np.concatenate(
        [
            np.zeros(n_zero, dtype=np.float32),
            rope_min_freq
            * (rope_max_freq / rope_min_freq)
            ** np.linspace(0, 1, n_freqs - n_zero, dtype=np.float32),
        ]
    )
    directions = rearrange(
        make_directions(heads * n_freqs, dim_pos), "(h f) p -> h f p", h=heads
    )
    return jnp.asarray(directions * omega[None, :, None])


def apply_golden_gate_rope(freqs, t, pos):
    """reference vit_nd_rotary.py:74-96 — t (b,h,n,d), pos (b,n,p), fp32."""
    dtype = t.dtype
    t = t.astype(jnp.float32)
    x, y = jnp.split(t, 2, axis=-1)
    theta = jnp.einsum("hfp,bnp->bhnf", freqs, pos.astype(jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    x_out = x * cos - y * sin
    y_out = x * sin + y * cos
    return jnp.concatenate([x_out, y_out], axis=-1).astype(dtype)


class RotaryAttention(nn.Module):
    """reference vit_nd_rotary.py:117-155 — split to_qk / to_v."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pos=None, freqs=None, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        project_out = not (h == 1 and dh == self.dim)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qk = nn.Dense(inner * 2, use_bias=False, name="to_qk")(x)
        q, k = jnp.split(qk, 2, axis=-1)
        v = nn.Dense(inner, use_bias=False, name="to_v")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        if exists(freqs):
            assert exists(pos)
            q = apply_golden_gate_rope(freqs, q, pos)
            k = apply_golden_gate_rope(freqs, k, pos)

        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            q, k, v,
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
    """reference vit_nd_rotary.py:175 — same keyword constructor."""

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
    rope_min_freq: float = 1.0
    rope_max_freq: float = 10000.0
    rope_p_zero_freqs: float = 0.0

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

        freqs = golden_gate_freqs(
            self.ndim,
            self.heads,
            self.dim_head,
            self.rope_min_freq,
            self.rope_max_freq,
            self.rope_p_zero_freqs,
        )

        for i in range(self.depth):
            x = RotaryAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, pos=pos, freqs=freqs, train=train) + x
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
