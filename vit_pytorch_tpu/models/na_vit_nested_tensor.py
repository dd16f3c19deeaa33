"""NaViT, nested-tensor variant (reference na_vit_nested_tensor.py:134-301).

The reference implements NaViT on ``torch.nested`` jagged tensors; XLA has
no ragged arrays, so this runs on the same fixed-shape packed representation
as models/na_vit.py (ops/packing.py) with segment-id block-diagonal masking.
What makes the *variant* distinct from packed NaViT is its architecture, all
of which is implemented here:

  - split q/k/v projections, all bias-free (reference :52-54)
  - qk-norm is a bias-free LayerNorm over dim_head shared across heads
    (reference :59-60) — NOT the per-head-gamma RMSNorm of na_vit.py — and
    the attention scale stays the default 1/sqrt(d) (SDPA default, :102)
  - biased patch-embed LayerNorms (plain nn.LayerNorm, reference :177-181;
    na_vit.py uses bias-free ones)
  - bias-free pre-norm / final-norm / head-norm LayerNorms (:46, :124, :200)
  - attention pooling WITHOUT a residual connection (:291)
  - token keep count per image = int((1-p)·len), min 1 (:239)
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS, FeedForward
from ..ops.attention import dot_product_attention
from ..ops.packing import PackedImages, pack_images
from ..utils.helpers import pair


class NestedAttention(nn.Module):
    """reference na_vit_nested_tensor.py:43-111."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    qk_norm: bool = True

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        *,
        q_segment_ids=None,
        kv_segment_ids=None,
        train: bool = False,
    ):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        x = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="norm")(x)
        # reference :75 — for attention pooling, context stays un-normed
        kv_input = context if context is not None else x

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(kv_input)
        v = nn.Dense(inner, use_bias=False, name="to_v")(kv_input)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        if self.qk_norm:
            # LayerNorm over dim_head, scale only, shared across heads
            # (reference :59-60); scale remains the SDPA default
            q = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="q_norm")(q)
            k = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="k_norm")(k)

        dropout_rng = None
        if self.dropout > 0.0 and train:
            dropout_rng = self.make_rng("dropout")

        out = dot_product_attention(
            q,
            k,
            v,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, use_bias=False, name="to_out")(out)


def NestedFeedForward(*, dim, hidden_dim, dropout=0.0, name=None):
    """reference na_vit_nested_tensor.py:33-41: bias-free LN, biased Linears
    — exactly the shared FeedForward with ``norm_bias=False`` (same param
    tree: norm/fc1/fc2; same dtype-adaptive GELU)."""
    return FeedForward(
        dim=dim, hidden_dim=hidden_dim, dropout=dropout, norm_bias=False, name=name
    )


class NestedTransformer(nn.Module):
    """reference na_vit_nested_tensor.py:113-132."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    qk_norm: bool = True

    @nn.compact
    def __call__(self, x, *, q_segment_ids=None, kv_segment_ids=None, train=False):
        for i in range(self.depth):
            x = (
                NestedAttention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    qk_norm=self.qk_norm,
                    name=f"layers_{i}_attn",
                )(
                    x,
                    q_segment_ids=q_segment_ids,
                    kv_segment_ids=kv_segment_ids,
                    train=train,
                )
                + x
            )
            x = (
                NestedFeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(x, train=train)
                + x
            )
        return nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="norm")(x)


class NaViT(nn.Module):
    """reference na_vit_nested_tensor.py:134 — same keyword constructor."""

    image_size: int | tuple
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
    qk_rmsnorm: bool = True
    token_dropout_prob: Optional[Union[float, Callable]] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        assert (
            image_height % self.patch_size == 0
            and image_width % self.patch_size == 0
        )
        self.patch_height_dim = image_height // self.patch_size
        self.patch_width_dim = image_width // self.patch_size

        # BIASED patch-embed LayerNorms (reference :177-181)
        self.patch_norm_pre = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")
        self.patch_proj = nn.Dense(self.dim, name="patch_proj")
        self.patch_norm_post = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")

        self.pos_embed_height = self.param(
            "pos_embed_height",
            nn.initializers.normal(1.0),
            (self.patch_height_dim, self.dim),
        )
        self.pos_embed_width = self.param(
            "pos_embed_width",
            nn.initializers.normal(1.0),
            (self.patch_width_dim, self.dim),
        )

        self.emb_drop = nn.Dropout(self.emb_dropout)

        self.transformer = NestedTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            qk_norm=self.qk_rmsnorm,
        )

        self.attn_pool_queries = self.param(
            "attn_pool_queries", nn.initializers.normal(1.0), (self.dim,)
        )
        self.attn_pool = NestedAttention(
            dim=self.dim, heads=self.heads, dim_head=self.dim_head, name="attn_pool"
        )

        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="head_norm")
        self.mlp_head = nn.Dense(self.num_classes, use_bias=False, name="mlp_head")

    def __call__(self, packed: PackedImages, *, train: bool = False):
        x = self.patch_norm_post(self.patch_proj(self.patch_norm_pre(packed.patches)))

        h_idx = packed.pos_hw[..., 0]
        w_idx = packed.pos_hw[..., 1]
        x = x + self.pos_embed_height[h_idx] + self.pos_embed_width[w_idx]

        x = self.emb_drop(x, deterministic=not train)

        seg = packed.image_ids  # (b, L), -1 = pad
        x = self.transformer(
            x, q_segment_ids=seg, kv_segment_ids=seg, train=train
        )

        # attention pooling, one query per image, NO residual (reference :291)
        b = x.shape[0]
        nq = packed.max_images
        queries = jnp.broadcast_to(self.attn_pool_queries, (b, nq, self.dim)).astype(
            x.dtype
        )
        q_seg = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32), (b, nq))
        q_seg = jnp.where(packed.is_image, q_seg, -2)

        pooled = self.attn_pool(
            queries, context=x, q_segment_ids=q_seg, kv_segment_ids=seg
        )

        return self.mlp_head(self.head_norm(pooled))


def forward_images(
    model: NaViT,
    params,
    images,
    *,
    train: bool = False,
    rngs=None,
    rng=None,
    max_seq_len: int = 2048,
):
    """Reference call shape (na_vit_nested_tensor.py:208-301): a list of
    (c, H, W) images of arbitrary resolutions → (len(images), num_classes)."""
    import numpy as np

    packed = pack_images(
        images,
        model.patch_size,
        group_images=True,
        max_seq_len=max_seq_len,
        token_dropout_prob=model.token_dropout_prob,
        train=train,
        rng=rng,
    )
    logits = model.apply(params, packed, train=train, rngs=rngs)
    valid = np.asarray(packed.is_image).reshape(-1)
    return np.asarray(logits).reshape(-1, logits.shape[-1])[valid]
