"""WWT — whole-where transformer / part-whole hierarchy (reference
wwt.py:278-443).

A token stream plus strictly-decreasing slot streams exchange information
via mutual attention with persistent learned masks updated by an MLP each
layer (wwt.py:139-226); slot-softmax normalization, register tokens/slots,
and an optional autoencoding task head over hierarchy pathways
(wwt.py:47-127)."""

from __future__ import annotations

from collections import namedtuple
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, reduce, repeat

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import default, exists, pair

WWTReturn = namedtuple("WWTReturn", ["slot_logits", "token_logits"])
WWTFeatureReturn = namedtuple("WWTFeatureReturn", ["slots", "tokens", "masks"])


def l1norm(t, axis=-1, eps=1e-8):
    return t / jnp.maximum(t.sum(axis=axis, keepdims=True), eps)


class WWTFeedForward(nn.Module):
    """reference wwt.py:129-137 (bias-free LN)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="norm")(x)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(default(self.out_dim, self.dim), name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class MutualAttention(nn.Module):
    """reference wwt.py:139-226."""

    dim: int
    num_slots: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    l1norm_after_tokens_softmax: bool = False
    token_softmax_over_slots: bool = False
    project_mask_groups: bool = False

    @nn.compact
    def __call__(self, tokens, slots, mask, *, train: bool = False):
        h = self.heads
        g = 2 if self.token_softmax_over_slots else 1
        project_masks = self.project_mask_groups and self.token_softmax_over_slots
        mask_groups = 1 if project_masks else g
        dh = self.dim_head
        inner = h * dh
        scale = dh**-0.5

        b, t, _ = tokens.shape
        s = slots.shape[1]

        qv = nn.Dense(inner * (g + 1), use_bias=False, name="to_q_v_tokens")(tokens)
        qv = qv.reshape(b, t, g + 1, h, dh).transpose(2, 0, 3, 1, 4)  # (g+1) b h t d
        q, v_tokens = qv[:-1], qv[-1]
        q = q.transpose(1, 0, 2, 3, 4)  # b g h t d

        kv = nn.Dense(inner * 2, use_bias=False, name="to_k_v_slots")(slots)
        kv = kv.reshape(b, s, 2, h, dh).transpose(2, 0, 3, 1, 4)  # 2 b h s d
        k, v_slots = kv[0], kv[1]

        sim = jnp.einsum("bghtd,bhsd->bghts", q, k) * scale
        mask_prime = mask + sim  # broadcast over groups when mask_groups == 1

        if self.token_softmax_over_slots:
            mask_prime_slots, mask_prime_tokens = mask_prime[:, 0], mask_prime[:, 1]
            attn_tokens = jax.nn.softmax(mask_prime_tokens, axis=-1)
        else:
            mask_prime_slots = mask_prime[:, 0]
            attn_tokens = jax.nn.softmax(mask_prime_slots, axis=-2)

        attn_slots = jax.nn.softmax(mask_prime_slots, axis=-1)
        if self.l1norm_after_tokens_softmax:
            attn_slots = l1norm(attn_slots, axis=-2)

        tokens_agg = jnp.einsum("bhts,bhsd->bhtd", attn_tokens, v_slots)
        tokens_agg = tokens_agg.transpose(0, 2, 1, 3).reshape(b, t, inner)
        tokens_out = nn.Dense(self.dim, name="to_out_tokens")(tokens_agg)
        tokens_out = nn.Dropout(self.dropout, deterministic=not train)(tokens_out)

        slots_agg = jnp.einsum("bhts,bhtd->bhsd", attn_slots, v_tokens)
        slots_agg = slots_agg.transpose(0, 2, 1, 3).reshape(b, s, inner)
        slots_out = nn.Dense(self.dim, name="to_out_slots")(slots_agg)
        slots_out = nn.Dropout(self.dropout, deterministic=not train)(slots_out)

        # mask update (wwt.py:217-224)
        if project_masks:
            mp = rearrange(mask_prime, "b g h t s -> b t s (g h)")
            mp = nn.Dense(h, name="mask_project")(mp)  # 1×1 conv over groups·heads
            mask_prime = rearrange(mp, "b t s h -> b 1 h t s")

        mask_flat = rearrange(mask_prime, "b g h t s -> b t (g h s)")
        mask_next = WWTFeedForward(
            dim=mask_groups * h * self.num_slots + self.dim,
            hidden_dim=self.mlp_dim,
            dropout=self.dropout,
            out_dim=mask_groups * h * self.num_slots,
            name="mlp_mask",
        )(jnp.concatenate([mask_flat, tokens + tokens_out], axis=-1), train=train)
        mask_next = rearrange(
            mask_next, "b t (g h s) -> b g h t s", h=h, g=mask_groups
        )

        return tokens_out, slots_out, mask_next


class AutoencodingHead(nn.Module):
    """reference wwt.py:47-127."""

    image_size: int | tuple
    patch_size: int | tuple
    decoder: Optional[Any] = None
    pathways: Optional[Tuple[Tuple[int, ...], ...]] = None
    patch_pathway_id: int = 0
    channel_first: bool = False

    @nn.compact
    def __call__(self, hierarchy_features, masks, interactions):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        grid_h = image_height // patch_height
        grid_w = image_width // patch_width

        masks = {
            tuple(interaction): reduce(m, "b ... t s -> b t s", "mean")
            for m, interaction in zip(masks, interactions)
        }

        pathways = default(
            self.pathways,
            tuple(
                (j, self.patch_pathway_id)
                for i, j in interactions
                if i == self.patch_pathway_id
            ),
        )
        assert len(pathways) > 0

        def construct(pathway):
            start, end = pathway[0], pathway[-1]
            is_descending = start > end
            features = hierarchy_features[start]
            for source, target in zip(pathway[:-1], pathway[1:]):
                interaction = (target, source) if is_descending else (source, target)
                assert interaction in masks, f"interaction {interaction} is missing"
                mask = masks[interaction]
                if not is_descending:
                    mask = jnp.swapaxes(mask, -1, -2)
                attn = jax.nn.softmax(mask, axis=-1)
                features = jnp.einsum("bts,bsd->btd", attn, features)
            if end == self.patch_pathway_id:
                b, n, d = features.shape
                features = features.reshape(b, grid_h, grid_w, d)
                if self.channel_first:
                    features = features.transpose(0, 3, 1, 2)
            if exists(self.decoder):
                features = self.decoder(features)
            return features

        maps = tuple(construct(p) for p in pathways)
        return maps[0] if len(maps) == 1 else maps


class WWT(nn.Module):
    """reference wwt.py:278 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    num_slots: Union[int, Tuple[int, ...]]
    interactions: Optional[Tuple[Tuple[int, int], ...]] = None
    heads: int = 8
    dim_head: int = 64
    mlp_dim: Optional[int] = None
    channels: int = 3
    dropout: float = 0.0
    return_tokens: bool = False
    l1norm_after_tokens_softmax: bool = False
    token_softmax_over_slots: bool = False
    project_mask_groups: bool = False
    num_register_tokens: int = 0
    num_register_slots: Union[int, Tuple[int, ...]] = 0
    task_heads: Tuple[Any, ...] = ()

    @nn.compact
    def __call__(self, img, return_embeddings: bool = False, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        mlp_dim = default(self.mlp_dim, self.dim * 4)
        b = img.shape[0]

        num_slots = (
            (self.num_slots,) if isinstance(self.num_slots, int) else tuple(self.num_slots)
        )
        for s1, s2 in zip(num_slots[:-1], num_slots[1:]):
            assert s1 > s2, "slots must be strictly decreasing"
        num_hierarchies = 1 + len(num_slots)

        interactions = default(
            self.interactions, tuple((0, i + 1) for i in range(len(num_slots)))
        )
        interactions = tuple(tuple(i) for i in interactions)
        assert len(set(interactions)) == len(interactions)
        for i, j in interactions:
            assert i < j

        num_register_slots = (
            (self.num_register_slots,) * len(num_slots)
            if isinstance(self.num_register_slots, int)
            else tuple(self.num_register_slots)
        )
        assert len(num_register_slots) == len(num_slots)
        num_regs = (self.num_register_tokens, *num_register_slots)

        g = 2 if self.token_softmax_over_slots else 1
        project_masks = self.project_mask_groups and self.token_softmax_over_slots
        mask_groups = 1 if project_masks else g

        seq_lengths = (
            num_patches + self.num_register_tokens,
            *(s + r for s, r in zip(num_slots, num_register_slots)),
        )

        # embed + positions (bias-free LNs, wwt.py:312-317)
        patches = patchify_2d(img, patch_height, patch_width)
        tokens = PatchEmbedding(
            dim=self.dim, norm_bias=False, name="patch_embedding"
        )(patches)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (num_patches, self.dim)
        )
        tokens = tokens + pos.astype(tokens.dtype)

        init = nn.initializers.normal(1.0)
        streams = [tokens]
        for level, n in enumerate(num_slots):
            slot = self.param(f"slots_{level}", init, (n, self.dim))
            streams.append(
                jnp.broadcast_to(slot, (b, n, self.dim)).astype(tokens.dtype)
            )

        # pack registers at the FRONT of each stream (wwt.py:386-392)
        reg_tokens = self.param(
            "register_tokens", init, (self.num_register_tokens, self.dim)
        )
        regs = [jnp.broadcast_to(reg_tokens, (b, self.num_register_tokens, self.dim))]
        for level, n in enumerate(num_register_slots):
            rp = self.param(f"register_slots_{level}", init, (n, self.dim))
            regs.append(jnp.broadcast_to(rp, (b, n, self.dim)))

        streams = [
            jnp.concatenate([r.astype(s.dtype), s], axis=1)
            for r, s in zip(regs, streams)
        ]

        masks = [
            jnp.zeros((b, mask_groups, self.heads, seq_lengths[i], seq_lengths[j]))
            for (i, j) in interactions
        ]

        for layer in range(self.depth):
            norm_x = [
                nn.LayerNorm(
                    epsilon=LN_EPS, use_bias=False, name=f"layers_{layer}_norm_{hi}"
                )(seq)
                for hi, seq in enumerate(streams)
            ]
            delta = [0.0] * len(streams)
            next_masks = []
            for idx, (mask, (i, j)) in enumerate(zip(masks, interactions)):
                tokens_out, slots_out, next_mask = MutualAttention(
                    dim=self.dim,
                    num_slots=seq_lengths[j],
                    heads=self.heads,
                    dim_head=self.dim_head,
                    mlp_dim=mlp_dim,
                    dropout=self.dropout,
                    l1norm_after_tokens_softmax=self.l1norm_after_tokens_softmax,
                    token_softmax_over_slots=self.token_softmax_over_slots,
                    project_mask_groups=self.project_mask_groups,
                    name=f"layers_{layer}_attn_{idx}",
                )(norm_x[i], norm_x[j], mask, train=train)
                delta[i] = delta[i] + tokens_out
                delta[j] = delta[j] + slots_out
                next_masks.append(next_mask)

            streams = [
                seq
                + d
                + WWTFeedForward(
                    dim=self.dim,
                    hidden_dim=mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{layer}_mlp_{hi}",
                )(seq + d, train=train)
                for hi, (seq, d) in enumerate(zip(streams, delta))
            ]
            masks = next_masks

        # unpack registers
        unpacked = [seq[:, num_regs[hi] :] for hi, seq in enumerate(streams)]
        tokens_out, *slots_out = unpacked
        slots_out = tuple(slots_out)
        hierarchy_features = (tokens_out, *slots_out)

        processed_masks = []
        for mask, (i, j) in zip(masks, interactions):
            m = mask[..., num_regs[i] :, num_regs[j] :]
            if not self.token_softmax_over_slots or project_masks:
                m = m[:, 0]
            processed_masks.append(m)

        if return_embeddings:
            return WWTFeatureReturn(
                slots_out,
                tokens_out if self.return_tokens else None,
                processed_masks,
            )

        head_norm = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="head_norm")
        head = nn.Dense(self.num_classes, name="mlp_head")
        pooled_slot_logits = sum(
            head(head_norm(s)).mean(axis=1) for s in slots_out
        ) / len(slots_out)

        if not self.return_tokens:
            out = pooled_slot_logits
        else:
            tok_norm = nn.LayerNorm(
                epsilon=LN_EPS, use_bias=False, name="token_head_norm"
            )
            tok_head = nn.Dense(self.num_classes, name="mlp_head_tokens")
            out = WWTReturn(
                pooled_slot_logits, tok_head(tok_norm(tokens_out)).mean(axis=1)
            )

        if len(self.task_heads) == 0:
            return out

        return (
            out,
            *(
                h(hierarchy_features, processed_masks, interactions)
                for h in self.task_heads
            ),
        )
