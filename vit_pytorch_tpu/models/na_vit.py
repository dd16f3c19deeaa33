"""NaViT — variable-resolution packed ViT (reference na_vit.py:195-402).

TPU-native redesign (SURVEY §3.2): the host packs images into fixed-shape
arrays (ops/packing.py) and the device model consumes segment ids directly —
the Pallas flash kernel skips cross-segment tiles instead of materializing the
(b, 1, n, n) block-diagonal mask (reference na_vit.py:335-337).

Key reference behaviours preserved:
  - bias-free LayerNorms throughout (na_vit.py:82-89)
  - qk RMSNorm with learned per-head gamma, attention scale = 1
    (na_vit.py:93-101, 161-166)
  - factorized learned h/w positional embeddings (na_vit.py:230-231, 352-359)
  - per-image attention pooling with learned query (na_vit.py:371-387)
  - token dropout at pack time (na_vit.py:306-314 → ops/packing.py)

Output is (b, max_images, num_classes); use ``PackedImages.is_image`` to
select real rows (the reference returns the flattened real images,
na_vit.py:389-402 — ``forward_packed`` below reproduces that exactly).
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, Transformer, LN_EPS
from ..ops.packing import PackedImages, pack_images
from ..utils.helpers import pair


class NaViT(nn.Module):
    """reference na_vit.py:196 — same keyword constructor."""

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
    token_dropout_prob: Optional[Union[float, Callable]] = None
    flash: Optional[bool] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        assert image_height % self.patch_size == 0 and image_width % self.patch_size == 0

        self.patch_height_dim = image_height // self.patch_size
        self.patch_width_dim = image_width // self.patch_size
        patch_dim = self.channels * self.patch_size**2

        # bias-free LN → Linear → bias-free LN (na_vit.py:224-228)
        self.patch_norm_pre = nn.LayerNorm(
            epsilon=LN_EPS, use_bias=False, name="patch_norm_pre"
        )
        self.patch_proj = nn.Dense(self.dim, name="patch_proj")
        self.patch_norm_post = nn.LayerNorm(
            epsilon=LN_EPS, use_bias=False, name="patch_norm_post"
        )

        self.pos_embed_height = self.param(
            "pos_embed_height", nn.initializers.normal(1.0), (self.patch_height_dim, self.dim)
        )
        self.pos_embed_width = self.param(
            "pos_embed_width", nn.initializers.normal(1.0), (self.patch_width_dim, self.dim)
        )

        self.emb_drop = nn.Dropout(self.emb_dropout)

        self.transformer = Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            qk_norm=True,
            norm_bias=False,
            attn_out_bias=False,
            flash=self.flash,
        )

        self.attn_pool_queries = self.param(
            "attn_pool_queries", nn.initializers.normal(1.0), (self.dim,)
        )
        self.attn_pool = Attention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            qk_norm=True,
            norm_bias=False,
            out_bias=False,
            name="attn_pool",
        )

        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="head_norm")
        self.mlp_head = nn.Dense(self.num_classes, use_bias=False, name="mlp_head")

    def __call__(self, packed: PackedImages, *, train: bool = False):
        x = self.patch_norm_post(self.patch_proj(self.patch_norm_pre(packed.patches)))

        h_idx = packed.pos_hw[..., 0]
        w_idx = packed.pos_hw[..., 1]
        x = x + self.pos_embed_height[h_idx] + self.pos_embed_width[w_idx]

        x = self.emb_drop(x, deterministic=not train)

        seg = packed.image_ids  # (b, L), -1 = pad → block-diagonal attention
        x = self.transformer(
            x, q_segment_ids=seg, kv_segment_ids=seg, train=train
        )

        # attention pooling: one learned query per image slot; query i may only
        # attend tokens of image i (na_vit.py:371-387)
        b = x.shape[0]
        nq = packed.max_images
        queries = jnp.broadcast_to(
            self.attn_pool_queries, (b, nq, self.dim)
        ).astype(x.dtype)
        q_seg = jnp.broadcast_to(jnp.arange(nq, dtype=jnp.int32), (b, nq))
        # mask out query slots beyond the real image count
        q_seg = jnp.where(packed.is_image, q_seg, -2)

        pooled = (
            self.attn_pool(
                queries, context=x, q_segment_ids=q_seg, kv_segment_ids=seg
            )
            + queries
        )

        return self.mlp_head(self.head_norm(pooled))


def forward_packed(model: NaViT, params, images, *, train: bool = False, rngs=None, rng=None, group_images: bool = True, group_max_seq_len: int = 2048):
    """Convenience wrapper reproducing the reference call shape
    (na_vit.py:255-402): list of images → (total_images, num_classes)."""
    import numpy as np

    packed = pack_images(
        images,
        model.patch_size,
        group_images=group_images,
        max_seq_len=group_max_seq_len,
        token_dropout_prob=model.token_dropout_prob,
        train=train,
        rng=rng,
    )
    logits = model.apply(params, packed, train=train, rngs=rngs)
    # concrete (host) validity mask → static gather; keeps the result a
    # traceable jnp array so jax.grad can flow through this wrapper
    valid = np.asarray(packed.is_image).reshape(-1)
    return logits.reshape(-1, logits.shape[-1])[valid]
