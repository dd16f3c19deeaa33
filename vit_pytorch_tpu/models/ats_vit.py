"""ATS-ViT — adaptive token sampling (reference ats_vit.py:215-262).

TPU redesign (SURVEY §7.2): the reference uses ``torch.unique`` + ragged
``pad_sequence`` (ats_vit.py:88-89) — dynamic shapes.  Here every sampling
layer has a *static* output budget (``max_tokens_per_depth``), and
deduplication is static-shape: sort, sentinel-mark duplicates, re-sort, mask.
The sequence physically shrinks to budget+1 tokens at each sampling layer
(per-depth static shapes), with a validity mask carrying padding — exactly
the bounded behaviour of the reference (ats_vit.py:178-182).

Gumbel-max sampling uses the explicit 'sampling' RNG collection."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import exists, pair

_BIG = jnp.int32(1 << 30)


def _log(t, eps=1e-6):
    return jnp.log(t + eps)


def unique_sorted_with_pad(ids):
    """Static-shape torch.unique+pad (reference ats_vit.py:88-93): returns
    (ids_sorted_unique_padded_with_zero, valid_mask)."""
    sorted_ids = jnp.sort(ids, axis=-1)
    prev = jnp.pad(sorted_ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    dup = sorted_ids == prev
    marked = jnp.where(dup, _BIG, sorted_ids)
    out = jnp.sort(marked, axis=-1)
    valid = out != _BIG
    return jnp.where(valid, out, 0), valid


class AdaptiveTokenSampling(nn.Module):
    """reference ats_vit.py:42-109."""

    output_num_tokens: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, attn, value, mask):
        heads = attn.shape[1]
        k = self.output_num_tokens

        cls_attn = attn[..., 0, 1:]
        value_norms = jnp.linalg.norm(value[..., 1:, :], axis=-1)
        cls_attn = jnp.einsum("bhn,bhn->bn", cls_attn, value_norms)
        normed = cls_attn / (cls_attn.sum(axis=-1, keepdims=True) + self.eps)

        pseudo_logits = _log(normed, self.eps)
        mask_without_cls = mask[:, 1:]
        mask_value = jnp.finfo(attn.dtype).min / 2
        pseudo_logits = jnp.where(mask_without_cls, pseudo_logits, mask_value)

        pseudo_logits = jnp.broadcast_to(
            pseudo_logits[:, None, :], (pseudo_logits.shape[0], k, pseudo_logits.shape[-1])
        )
        if self.has_rng("sampling"):
            rng = self.make_rng("sampling")
            u = jax.random.uniform(rng, pseudo_logits.shape, minval=0.0, maxval=1.0)
            gumbel = -_log(-_log(u, self.eps), self.eps)
            pseudo_logits = pseudo_logits + gumbel

        sampled = jnp.argmax(pseudo_logits, axis=-1) + 1  # 0 reserved for cls/pad

        unique_ids, new_mask = unique_sorted_with_pad(sampled)
        new_mask = jnp.pad(new_mask, ((0, 0), (1, 0)), constant_values=True)
        unique_ids = jnp.pad(unique_ids, ((0, 0), (1, 0)), constant_values=0)

        # gather sampled attention rows (reference batched_index_select dim=2)
        idx = jnp.broadcast_to(
            unique_ids[:, None, :], (attn.shape[0], heads, k + 1)
        )
        new_attn = jnp.take_along_axis(attn, idx[..., None], axis=2)

        return new_attn, new_mask, unique_ids


class ATSAttention(nn.Module):
    """reference ats_vit.py:127-175."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    output_num_tokens: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, mask, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        scale = dh**-0.5
        num_tokens = x.shape[1]

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        dots = jnp.einsum(
            "bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32
        ) * scale

        if exists(mask):
            dots_mask = mask[:, None, :, None] & mask[:, None, None, :]
            dots = jnp.where(dots_mask, dots, jnp.finfo(dots.dtype).min)

        attn = jax.nn.softmax(dots, axis=-1).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=not train)(attn)

        sampled_token_ids = None
        if exists(self.output_num_tokens) and (num_tokens - 1) > self.output_num_tokens:
            attn, mask, sampled_token_ids = AdaptiveTokenSampling(
                self.output_num_tokens, name="ats"
            )(attn, v, mask)

        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        b = out.shape[0]
        n = out.shape[2]
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out, mask, sampled_token_ids


class ViT(nn.Module):
    """reference ats_vit.py:215 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    max_tokens_per_depth: Tuple[int, ...]
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    @nn.compact
    def __call__(self, img, return_sampled_token_ids: bool = False, *, train: bool = False):
        assert len(self.max_tokens_per_depth) == self.depth
        assert sorted(self.max_tokens_per_depth, reverse=True) == list(
            self.max_tokens_per_depth
        )
        assert min(self.max_tokens_per_depth) > 0

        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        b = img.shape[0]

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (1, num_patches + 1, self.dim)
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        mask = jnp.ones((b, x.shape[1]), bool)
        token_ids = jnp.broadcast_to(jnp.arange(x.shape[1]), (b, x.shape[1]))

        for i, output_num_tokens in enumerate(self.max_tokens_per_depth):
            attn_out, mask, sampled_ids = ATSAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                output_num_tokens=output_num_tokens,
                name=f"layers_{i}_attn",
            )(x, mask=mask, train=train)

            if exists(sampled_ids):
                x = jnp.take_along_axis(x, sampled_ids[..., None], axis=1)
                token_ids = jnp.take_along_axis(token_ids, sampled_ids, axis=1)

            x = x + attn_out
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x

        logits = nn.Dense(self.num_classes, name="mlp_head")(
            nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(x[:, 0])
        )

        if return_sampled_token_ids:
            token_ids = token_ids[:, 1:] - 1
            return logits, token_ids
        return logits
