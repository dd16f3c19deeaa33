"""JetViT — per-layer attention type selection (reference jet_vit.py:292-359).

Each layer can run full ('FA'), windowed ('WA'), or linear+dynamic-conv
('LA') attention; a tuple of options means a random choice per forward
(jet_vit.py:229-243).  JAX redesign: all options' params exist (as in the
reference's ModuleDict) and a traced ``lax.switch`` picks the branch with an
index drawn from the explicit 'layer_select' RNG — jit-static shapes, no
Python-random control flow (SURVEY §7.1.v)."""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, reduce

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import exists, pair
from .max_vit import rel_pos_indices


def linear_attn(q, k, v):
    """ReLU linear attention (reference jet_vit.py:23-30)."""
    q = jax.nn.relu(q)
    k = jax.nn.relu(k)
    context = jnp.einsum("bhnd,bhne->bhde", k, v)
    normalizer = jnp.einsum("bhnd,bhd->bhn", q, k.sum(axis=2))
    attn = jnp.einsum("bhnd,bhde->bhne", q, context)
    return attn / jnp.maximum(normalizer[..., None], 1e-6)


class SqueezeDynamicConv(nn.Module):
    """Batch-conditional dynamic depthwise conv (reference jet_vit.py:48-77)."""

    dim: int
    h_s: int
    w_s: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, v):
        b, heads, n, d = v.shape
        k = self.kernel_size

        v_mean = reduce(v, "b h n d -> b (h d)", "mean")
        w = nn.Dense(self.dim // 4, name="mlp_fc1")(v_mean)
        w = jax.nn.silu(w)
        w = nn.Dense(self.dim * k * k, name="mlp_fc2")(w)

        # grouped conv: groups = b * dim, NHWC with channels = b*dim
        weight = w.reshape(b * self.dim, 1, k, k)
        # lax kernel layout HWIO: (k, k, in/groups=1, out=b*dim)
        kernel = weight.transpose(2, 3, 1, 0)

        v_spatial = rearrange(
            v, "b h (hs ws) d -> 1 hs ws (b h d)", hs=self.h_s, ws=self.w_s
        )
        out = jax.lax.conv_general_dilated(
            v_spatial,
            kernel.astype(v.dtype),
            (1, 1),
            [(k // 2, k // 2), (k // 2, k // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * self.dim,
        )
        return rearrange(
            out, "1 hs ws (b h d) -> b h (hs ws) d", b=b, h=heads
        )


class JetWindowAttention(nn.Module):
    """reference jet_vit.py:79-153."""

    dim: int
    h_s: int
    w_s: int
    dim_head: int = 64
    dropout: float = 0.0
    window_size: int = 7

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.dim % self.dim_head == 0
        h = self.dim // self.dim_head
        w = self.window_size

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        b = x.shape[0]
        xw = rearrange(x, "b (hh ww) d -> b hh ww d", hh=self.h_s, ww=self.w_s)
        xw = rearrange(
            xw, "b (x w1) (y w2) d -> (b x y) (w1 w2) d", w1=w, w2=w
        )
        gx, gy = self.h_s // w, self.w_s // w

        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            bb, n, _ = t.shape
            return t.reshape(bb, n, h, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        q = q * self.dim_head**-0.5
        sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32)

        table = self.param(
            "rel_pos_bias", nn.initializers.normal(1.0), ((2 * w - 1) ** 2, h)
        )
        sim = sim + table[rel_pos_indices(w)].transpose(2, 0, 1).astype(sim.dtype)

        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        bb = out.shape[0]
        out = out.transpose(0, 2, 1, 3).reshape(bb, w * w, self.dim)
        out = nn.Dense(self.dim, use_bias=False, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)

        out = rearrange(
            out, "(b x y) (w1 w2) d -> b (x w1 y w2) d", x=gx, y=gy, w1=w, w2=w
        )
        return out


class JetLinearAttention(nn.Module):
    """reference jet_vit.py:156-188."""

    dim: int
    h_s: int
    w_s: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        linear_out = linear_attn(q, k, v)
        conv_out = SqueezeDynamicConv(
            dim=inner, h_s=self.h_s, w_s=self.w_s, kernel_size=self.kernel_size,
            name="dynamic_conv",
        )(v)

        b = x.shape[0]
        out = rearrange(linear_out + conv_out, "b h n d -> b n (h d)")
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class JetFullAttention(nn.Module):
    """reference jet_vit.py:191-225."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from ..ops.attention import dot_product_attention

        h, dh = self.heads, self.dim_head
        inner = h * dh

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            *map(split, (q, k, v)),
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class JetViT(nn.Module):
    """reference jet_vit.py:292 — same keyword constructor.  ``attn_layers``
    entries are 'FA' | 'WA' | 'LA' or tuples thereof (random per forward via
    the 'layer_select' RNG; first option when the rng is absent)."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    window_size: int = 7
    attn_layers: Optional[Tuple] = None

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        h_s = image_height // patch_height
        w_s = image_width // patch_width
        num_patches = h_s * w_s

        attn_layers = self.attn_layers or tuple(["FA"] * self.depth)

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (num_patches, self.dim)
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        for i in range(self.depth):
            spec = attn_layers[i]
            options = spec if isinstance(spec, tuple) else (spec,)

            branches = []
            for key in options:
                if key == "WA":
                    mod = JetWindowAttention(
                        dim=self.dim, h_s=h_s, w_s=w_s, dim_head=self.dim_head,
                        dropout=self.dropout, window_size=self.window_size,
                        name=f"layers_{i}_wa",
                    )
                elif key == "LA":
                    mod = JetLinearAttention(
                        dim=self.dim, h_s=h_s, w_s=w_s, heads=self.heads,
                        dim_head=self.dim_head, dropout=self.dropout,
                        name=f"layers_{i}_la",
                    )
                else:
                    mod = JetFullAttention(
                        dim=self.dim, heads=self.heads, dim_head=self.dim_head,
                        dropout=self.dropout, name=f"layers_{i}_fa",
                    )
                branches.append(mod)

            if len(branches) == 1:
                attn_out = branches[0](x, train=train)
            else:
                outs = [m(x, train=train) for m in branches]
                if train and self.has_rng("layer_select"):
                    idx = jax.random.randint(
                        self.make_rng("layer_select"), (), 0, len(outs)
                    )
                else:
                    idx = 0
                attn_out = jax.lax.switch(
                    idx, [lambda o=o: o for o in outs]
                )
            x = attn_out + x
            x = FeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim, dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        if self.num_classes <= 0:
            return x
        return nn.Dense(self.num_classes, name="mlp_head")(x.mean(axis=1))
