"""CaiT — class-attention in image transformers (reference cait.py:124-178).

Covers: talking-heads attention (pre/post-softmax head mixing, cait.py:94-99,
materialized-attention path), LayerScale with depth-staged init eps
(cait.py:31-45), stochastic layer dropout (cait.py:14-27) re-done with
explicit jax RNG: a per-forward keep mask over layer pairs, with one random
layer force-kept when all would drop.  Under jit all layers still execute
(static graph); dropped layers contribute zero — equivalent in expectation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import exists


def layerscale_init(depth: int) -> float:
    """cait.py:34-39 — init eps by depth (1-indexed)."""
    if depth <= 18:
        return 0.1
    if depth <= 24:
        return 1e-5
    return 1e-6


class TalkingHeadsAttention(nn.Module):
    """reference cait.py:61-103.  ``context`` is concatenated after x for kv
    (cait.py:87)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        ctx = x if not exists(context) else jnp.concatenate([x, context], axis=1)

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        dots = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale

        pre = self.param("mix_heads_pre_attn", nn.initializers.normal(1.0), (h, h))
        post = self.param("mix_heads_post_attn", nn.initializers.normal(1.0), (h, h))

        dots = jnp.einsum("bhij,hg->bgij", dots, pre.astype(dots.dtype))
        attn = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
        attn = jnp.einsum("bhij,hg->bgij", attn, post.astype(attn.dtype))

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class CaiTTransformer(nn.Module):
    """reference cait.py:105-122 (LayerScale'd layers + layer dropout)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    layer_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        use_layer_drop = train and self.layer_dropout > 0.0
        if use_layer_drop:
            rng = self.make_rng("dropout")
            drop = jax.random.uniform(rng, (self.depth,)) < self.layer_dropout
            forced = jax.nn.one_hot(
                jax.random.randint(jax.random.fold_in(rng, 1), (), 0, self.depth),
                self.depth,
                dtype=bool,
            )
            keep = (~drop) | (jnp.all(drop) & forced)

        for i in range(self.depth):
            scale_a = self.param(
                f"layers_{i}_attn_scale",
                nn.initializers.constant(layerscale_init(i + 1)),
                (1, 1, self.dim),
            )
            scale_f = self.param(
                f"layers_{i}_ff_scale",
                nn.initializers.constant(layerscale_init(i + 1)),
                (1, 1, self.dim),
            )
            a = TalkingHeadsAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, context=context, train=train) * scale_a.astype(x.dtype)
            if use_layer_drop:
                a = jnp.where(keep[i], a, 0.0)
            x = a + x

            f = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) * scale_f.astype(x.dtype)
            if use_layer_drop:
                f = jnp.where(keep[i], f, 0.0)
            x = f + x
        return x


class CaiT(nn.Module):
    """reference cait.py:124 — same keyword constructor."""

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
    layer_dropout: float = 0.0

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert self.image_size % self.patch_size == 0
        num_patches = (self.image_size // self.patch_size) ** 2
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, self.patch_size, self.patch_size)
        )
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches, self.dim)
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )

        x = x + pos[:, :n].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        x = CaiTTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            layer_dropout=self.layer_dropout,
            name="patch_transformer",
        )(x, train=train)

        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        cls = CaiTTransformer(
            dim=self.dim,
            depth=self.cls_depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            layer_dropout=self.layer_dropout,
            name="cls_transformer",
        )(cls, context=x, train=train)

        out = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(cls[:, 0])
        return nn.Dense(self.num_classes, name="mlp_head")(out)
