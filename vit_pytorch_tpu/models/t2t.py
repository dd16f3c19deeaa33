"""T2T-ViT — token-to-token stem (reference t2t.py:26-80).

The stem iterates: unfold (overlapping windows) → single-head depth-1
transformer → re-image, tripling the channel dim per stage (t2t.py:35-49),
then a vanilla ViT transformer runs on the final tokens."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer
from ..nn.patch import unfold_2d


def conv_output_size(image_size, kernel_size, stride, padding):
    return int(((image_size - kernel_size + (2 * padding)) / stride) + 1)


class T2TViT(nn.Module):
    """reference t2t.py:26 — same keyword constructor (external ``transformer``
    modules are passed as a flax module instance)."""

    image_size: int
    num_classes: int
    dim: int
    depth: Optional[int] = None
    heads: Optional[int] = None
    mlp_dim: Optional[int] = None
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    transformer: Optional[nn.Module] = None
    t2t_layers: Tuple[Tuple[int, int], ...] = ((7, 4), (3, 2), (3, 2))

    def embed(self, img, *, train: bool = False, dropout: bool = True):
        """T2T stem + projection + cls + pos emb (t2t.py:35-63).

        ``dropout=False`` skips the trailing emb dropout — DistillableT2TViT
        appends its distill token first (reference distill.py:33-34,79-82
        runs the dropout AFTER the concat).  Helper of the compact
        ``__call__`` so the distillable subclass can reuse it; param names
        are explicit, the tree is identical either way."""
        assert self.pool in {"cls", "mean"}

        layer_dim = self.channels
        output_image_size = self.image_size
        x = img
        b = x.shape[0]

        for i, (kernel_size, stride) in enumerate(self.t2t_layers):
            layer_dim *= kernel_size**2
            is_first = i == 0
            is_last = i == len(self.t2t_layers) - 1

            if not is_first:
                # tokens → image (t2t.py:20-22)
                side = int(math.sqrt(x.shape[1]))
                x = x.transpose(0, 2, 1).reshape(b, x.shape[2], side, side)

            output_image_size = conv_output_size(
                output_image_size, kernel_size, stride, stride // 2
            )
            x = unfold_2d(x, kernel_size, stride, stride // 2)

            if not is_last:
                x = Transformer(
                    dim=layer_dim,
                    depth=1,
                    heads=1,
                    dim_head=layer_dim,
                    mlp_dim=layer_dim,
                    dropout=self.dropout,
                    name=f"t2t_transformer_{i}",
                )(x, train=train)

        x = nn.Dense(self.dim, name="t2t_proj")(x)
        n = x.shape[1]

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, output_image_size**2 + 1, self.dim),
        )
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
        )

        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
        x = x + pos[:, : n + 1].astype(x.dtype)
        if not dropout:
            return x
        return nn.Dropout(self.emb_dropout, deterministic=not train)(x)

    def trunk(self, x, *, train: bool = False):
        """The main transformer (external module or built-in, t2t.py:57)."""
        if self.transformer is not None:
            return self.transformer(x, train=train)
        assert all(v is not None for v in (self.depth, self.heads, self.mlp_dim))
        return Transformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            name="transformer",
        )(x, train=train)

    def head(self, x):
        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, name="mlp_head")(x)

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        x = self.embed(img, train=train)
        x = self.trunk(x, train=train)
        return self.head(x)
