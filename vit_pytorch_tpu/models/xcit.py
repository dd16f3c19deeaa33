"""XCiT — cross-covariance image transformer (reference xcit.py:215-285).

Cross-covariance attention is channel×channel (d×d similarity of l2-normed
q,k with a learned log temperature, xcit.py:109-148) — tiny matrices, pure
MXU food.  LocalPatchInteraction is a depthwise-conv block with BatchNorm
(xcit.py:150-167): BN uses flax's ``batch_stats`` collection (train steps
pass ``mutable=['batch_stats']``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.blocks import gelu as _gelu
from ..nn.patch import PatchEmbedding
from .cait import layerscale_init
from einops import rearrange


def layer_keep_mask(rng, depth: int, dropout: float):
    """Stochastic layer dropout keep-mask with ≥1 layer forced on
    (reference xcit.py:25-38 / cait.py:14-27)."""
    drop = jax.random.uniform(rng, (depth,)) < dropout
    forced = jax.nn.one_hot(
        jax.random.randint(jax.random.fold_in(rng, 1), (), 0, depth), depth, dtype=bool
    )
    return (~drop) | (jnp.all(drop) & forced)


class XCAttention(nn.Module):
    """reference xcit.py:109-148."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        shape = x.shape
        x = x.reshape(shape[0], -1, shape[-1])  # pack 'b * d'

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def to_hdn(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 3, 1)  # b h d n

        q, k, v = map(to_hdn, (q, k, v))
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        temperature = self.param("temperature", nn.initializers.ones, (h, 1, 1))
        sim = jnp.einsum(
            "bhin,bhjn->bhij", q, k, preferred_element_type=jnp.float32
        ) * jnp.exp(temperature)

        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        out = jnp.einsum("bhij,bhjn->bhin", attn, v)  # b h d n
        b = out.shape[0]
        out = out.transpose(0, 3, 1, 2).reshape(b, -1, inner)  # b n (h d)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out.reshape(shape[:-1] + (self.dim,))


class LocalPatchInteraction(nn.Module):
    """reference xcit.py:150-167 — LN → dwconv → BN → GELU → dwconv on
    (b, h, w, c)."""

    dim: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.kernel_size % 2 == 1
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = nn.Conv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            feature_group_count=self.dim,
            padding="SAME",
            name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        x = _gelu(x)
        x = nn.Conv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            feature_group_count=self.dim,
            padding="SAME",
            name="conv2",
        )(x)
        return x


class XCiT(nn.Module):
    """reference xcit.py:215 — same keyword constructor."""

    image_size: int
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    cls_depth: int
    heads: int
    mlp_dim: int
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    local_patch_kernel_size: int = 3
    layer_dropout: float = 0.0

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        num_patches = (self.image_size // self.patch_size) ** 2
        b = img.shape[0]
        p = self.patch_size

        patches = rearrange(
            img, "b c (h p1) (w p2) -> b h w (p1 p2 c)", p1=p, p2=p
        )
        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(patches)
        gh, gw = x.shape[1], x.shape[2]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches, self.dim)
        )
        x = x.reshape(b, gh * gw, self.dim)
        x = x + pos[:, : gh * gw].astype(x.dtype)
        x = x.reshape(b, gh, gw, self.dim)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        use_ld = train and self.layer_dropout > 0.0
        if use_ld:
            keep = layer_keep_mask(
                self.make_rng("dropout"), self.depth, self.layer_dropout
            )

        for i in range(self.depth):
            ls = lambda name: self.param(
                name, nn.initializers.constant(layerscale_init(i + 1)), (self.dim,)
            )
            a = XCAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"xca_{i}_attn",
            )(x, train=train) * ls(f"xca_{i}_attn_scale").astype(x.dtype)
            if use_ld:
                a = jnp.where(keep[i], a, 0.0)
            x = a + x
            y = LocalPatchInteraction(
                dim=self.dim,
                kernel_size=self.local_patch_kernel_size,
                name=f"xca_{i}_lpi",
            )(x, train=train) * ls(f"xca_{i}_lpi_scale").astype(x.dtype)
            if use_ld:
                y = jnp.where(keep[i], y, 0.0)
            x = y + x
            f = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"xca_{i}_ff",
            )(x, train=train) * ls(f"xca_{i}_ff_scale").astype(x.dtype)
            if use_ld:
                f = jnp.where(keep[i], f, 0.0)
            x = f + x

        x = x.reshape(b, gh * gw, self.dim)
        x = nn.LayerNorm(epsilon=LN_EPS, name="final_norm")(x)

        cls_token = self.param("cls_token", nn.initializers.normal(1.0), (self.dim,))
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)

        if use_ld:
            keep_cls = layer_keep_mask(
                jax.random.fold_in(self.make_rng("dropout"), 2),
                self.cls_depth,
                self.layer_dropout,
            )
        for i in range(self.cls_depth):
            ls = lambda name: self.param(
                name, nn.initializers.constant(layerscale_init(i + 1)), (self.dim,)
            )
            a = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                kv_include_self=True,
                project_out=True,
                name=f"cls_{i}_attn",
            )(cls, context=x, train=train) * ls(f"cls_{i}_attn_scale").astype(x.dtype)
            if use_ld:
                a = jnp.where(keep_cls[i], a, 0.0)
            cls = a + cls
            f = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"cls_{i}_ff",
            )(cls, train=train) * ls(f"cls_{i}_ff_scale").astype(x.dtype)
            if use_ld:
                f = jnp.where(keep_cls[i], f, 0.0)
            cls = f + cls

        out = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(cls[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(out)
