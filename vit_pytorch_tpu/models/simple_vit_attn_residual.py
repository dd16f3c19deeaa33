"""SimpleViT with attention-pooled residual stream (reference
simple_vit_attn_residual.py:89-243): each block's input is an attention
pooling over the full history of layer outputs (per-token, learned or
last-token query)."""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import default, exists, pair


class HistoryPool(nn.Module):
    """The attention pooling of AttentionResidual (reference lines 89-118):
    per-token cross attention over the stacked history."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    learned_query: bool = True

    @nn.compact
    def __call__(self, history: List[jnp.ndarray]):
        batch, seq_len = history[0].shape[:2]
        context = jnp.stack(history, axis=2)  # b n l d
        context = context.reshape(batch * seq_len, len(history), self.dim)

        if self.learned_query:
            lq = self.param("learned_query", nn.initializers.normal(1.0), (self.dim,))
            q = jnp.broadcast_to(
                lq, (batch * seq_len, 1, self.dim)
            ).astype(context.dtype)
        else:
            q = history[-1].reshape(batch * seq_len, 1, self.dim)

        pooled = Attention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            norm_context=True,
            out_bias=False,
            project_out=True,
            name="attn",
        )(q, context=context)
        return pooled.reshape(batch, seq_len, self.dim)


class SimpleViTAttnResidual(nn.Module):
    """reference simple_vit_attn_residual.py:156 — same constructor, incl.
    the history-carry API (pass ``history`` back in, get it out with
    ``return_history=True``)."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    learned_query: bool = True

    @nn.compact
    def __call__(self, img, history=None, return_history: bool = False, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )

        history = list(default(history, []))
        history.append(x)

        for i in range(self.depth):
            is_first = i == 0

            # the first attention layer is 'disabled' (acts on the last
            # history entry directly, reference line 178)
            if is_first:
                attn_in = history[-1]
            else:
                attn_in = HistoryPool(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    learned_query=self.learned_query,
                    name=f"layers_{i}_attn_pool",
                )(history)
            history.append(
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    out_bias=False,
                    project_out=True,
                    force_split_qkv=True,
                    name=f"layers_{i}_attn",
                )(attn_in, train=train)
            )

            ff_in = HistoryPool(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                learned_query=self.learned_query,
                name=f"layers_{i}_ff_pool",
            )(history)
            history.append(
                FeedForward(
                    dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
                )(ff_in, train=train)
            )

        final_in = HistoryPool(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            learned_query=self.learned_query,
            name="final_pool",
        )(history)
        out = nn.LayerNorm(epsilon=LN_EPS, name="final_norm")(final_in)

        pooled = out.mean(axis=1)
        logits = nn.Dense(self.num_classes, name="linear_head")(pooled)

        if return_history:
            return logits, history
        return logits
