"""ViT + learnable memory adapter (reference learnable_memory_vit.py:107-218).

The Adapter freezes a pretrained ViT and finetunes only per-layer memory
tokens (appended to k/v, lines 69-73), a memory-cls token, and a head; an
attention mask keeps main tokens from attending to memories so the frozen
ViT's outputs are preserved (lines 193-196).

JAX freezing: the ViT params live under 'vit' in the Adapter's tree — use an
optax ``masked``/``multi_transform`` to zero their updates (see
``adapter_param_labels``)."""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..utils.helpers import exists, pair


class MemoryTransformer(nn.Module):
    """reference learnable_memory_vit.py:90-106 — per-layer kv memories and
    a shared attention mask."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, attn_mask=None, memories=None, train: bool = False):
        for i in range(self.depth):
            layer_memories = memories[i] if exists(memories) else None
            if exists(layer_memories) and layer_memories.ndim == 2:
                layer_memories = jnp.broadcast_to(
                    layer_memories,
                    (x.shape[0],) + layer_memories.shape,
                ).astype(x.dtype)
            # kv_include_self concatenates the NORMED x before the raw
            # memories (learnable_memory_vit.py:64-73); force_split_qkv keeps
            # the q/kv projections identical between the plain and adapter
            # paths.
            x = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                project_out=True,
                kv_include_self=True,
                force_split_qkv=True,
                name=f"layers_{i}_attn",
            )(x, context=layer_memories, mask=attn_mask, train=train) + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        return x


class ViT(nn.Module):
    """reference learnable_memory_vit.py:107 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0

    def setup(self):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}
        self.patch_hw = (patch_height, patch_width)
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        self.num_patches = num_patches

        self.patch_embedding = PatchEmbedding(dim=self.dim)
        self.pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, num_patches + 1, self.dim),
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )
        self.emb_drop = nn.Dropout(self.emb_dropout)
        self.transformer = MemoryTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
        )
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")
        self.mlp_head = nn.Dense(self.num_classes, name="mlp_head")

    def img_to_tokens(self, img, *, train: bool = False):
        x = self.patch_embedding(patchify_2d(img, *self.patch_hw))
        b = x.shape[0]
        cls = jnp.broadcast_to(self.cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self.pos_embedding.astype(x.dtype)
        return self.emb_drop(x, deterministic=not train)

    def __call__(self, img, *, train: bool = False):
        x = self.img_to_tokens(img, train=train)
        x = self.transformer(x, train=train)
        return self.mlp_head(self.head_norm(x[:, 0]))


class Adapter(nn.Module):
    """reference learnable_memory_vit.py:157 — same keyword constructor."""

    vit: ViT
    num_memories_per_layer: int = 10
    num_classes: int = 2

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        vit = self.vit
        dim = vit.dim
        b = img.shape[0]
        num_patches = vit_num_patches = (
            pair(vit.image_size)[0] // pair(vit.patch_size)[0]
        ) * (pair(vit.image_size)[1] // pair(vit.patch_size)[1]) + 1

        memory_cls_token = self.param(
            "memory_cls_token", nn.initializers.normal(1.0), (dim,)
        )
        memories_per_layer = self.param(
            "memories_per_layer",
            nn.initializers.normal(1.0),
            (vit.depth, self.num_memories_per_layer, dim),
        )

        # attention mask (learnable_memory_vit.py:193-196): queries =
        # [mem_cls ∥ main], keys = [mem_cls ∥ main ∥ memories]
        m = self.num_memories_per_layer
        mask = np.ones((num_patches, num_patches), dtype=bool)
        mask = np.pad(mask, ((0, 0), (1, m)), constant_values=False)
        mask = np.pad(mask, ((1, 0), (0, 0)), constant_values=True)
        attn_mask = jnp.asarray(mask)[None, None]

        tokens = vit.img_to_tokens(img, train=train)
        mem_cls = jnp.broadcast_to(memory_cls_token, (b, 1, dim)).astype(
            tokens.dtype
        )
        tokens = jnp.concatenate([mem_cls, tokens], axis=1)

        out = vit.transformer(
            tokens, memories=memories_per_layer, attn_mask=attn_mask, train=train
        )

        out = out[:, 0]
        out = nn.LayerNorm(epsilon=LN_EPS, name="head_norm")(out)
        return nn.Dense(self.num_classes, name="mlp_head")(out)


def adapter_param_labels(params):
    """Labels for optax.multi_transform: 'frozen' for the backbone ViT,
    'train' for adapter params (the reference's freeze_all_layers_,
    learnable_memory_vit.py:18-26)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    labels = {
        k: ("frozen" if k and k[0] == "vit" else "train") for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)
