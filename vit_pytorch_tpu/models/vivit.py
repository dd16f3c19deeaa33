"""ViViT — video vision transformer (reference vivit.py:154-281).

Variants: 'factorized_encoder' (spatial transformer per frame → temporal
transformer, vivit.py:244-272) and 'factorized_self_attention' (per-layer
spatial-then-temporal attention, vivit.py:123-152).  Optional frame mask
(b, frames·frame_patch_size) → temporal key-padding mask (vivit.py:239-240).
Attention runs on the shared dispatching core (the reference's
``sdpa_kernel`` backend selection, vivit.py:61-73, is what
ops/attention.py does per-shape)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, Transformer, LN_EPS
from ..utils.helpers import exists, pair
from einops import rearrange, reduce, repeat


class FactorizedTransformer(nn.Module):
    """reference vivit.py:123-152."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x, *, mask=None, train: bool = False):
        batch, frames, seq, _ = x.shape

        kp_mask = None
        if exists(mask):
            # (b, f) key-pad mask repeated per spatial position
            kp = repeat(mask, "b f -> (b n) 1 1 f", n=seq)
            kp_mask = kp

        for i in range(self.depth):
            x = rearrange(x, "b f n d -> (b f) n d")
            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    project_out=True,
                    flash=self.flash,
                    name=f"layers_{i}_spatial_attn",
                )(x, train=train)
                + x
            )
            x = rearrange(x, "(b f) n d -> (b n) f d", b=batch, f=frames)
            x = (
                Attention(
                    dim=self.dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    project_out=True,
                    flash=self.flash,
                    name=f"layers_{i}_temporal_attn",
                )(x, mask=kp_mask, train=train)
                + x
            )
            x = (
                FeedForward(
                    dim=self.dim,
                    hidden_dim=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(x, train=train)
                + x
            )
            x = rearrange(x, "(b n) f d -> b f n d", b=batch, n=seq)

        return nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)


class ViViT(nn.Module):
    """reference vivit.py:154 — same keyword constructor."""

    image_size: int | tuple
    image_patch_size: int | tuple
    frames: int
    frame_patch_size: int
    num_classes: int
    dim: int
    spatial_depth: int
    temporal_depth: int
    heads: int
    mlp_dim: int
    pool: str = "cls"
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    variant: str = "factorized_encoder"
    use_flash_attn: bool = True
    flash: Optional[bool] = None

    @nn.compact
    def __call__(self, video, *, mask=None, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.image_patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.frames % self.frame_patch_size == 0
        assert self.variant in ("factorized_encoder", "factorized_self_attention")
        assert self.pool in {"cls", "mean"}

        num_image_patches = (image_height // patch_height) * (
            image_width // patch_width
        )
        num_frame_patches = self.frames // self.frame_patch_size
        global_average_pool = self.pool == "mean"

        # tubelet embed, keeping the frame axis (vivit.py:195-200)
        x = rearrange(
            video,
            "b c (f pf) (h p1) (w p2) -> b f (h w) (pf p1 p2 c)",
            p1=patch_height,
            p2=patch_width,
            pf=self.frame_patch_size,
        )
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")(x)
        x = nn.Dense(self.dim, name="patch_proj")(x)
        x = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")(x)

        batch, frames, seq, _ = x.shape

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, num_frame_patches, num_image_patches, self.dim),
        )
        x = x + pos[:, :frames, :seq].astype(x.dtype)

        if not global_average_pool:
            spatial_cls = self.param(
                "spatial_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
            )
            cls = jnp.broadcast_to(
                spatial_cls[None], (batch, frames, 1, self.dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=2)

        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        temporal_mask = None
        if exists(mask):
            assert mask.shape[-1] == self.frames, (
                f"frame mask must have shape (batch, {self.frames})"
            )
            temporal_mask = reduce(
                mask, "b (f patch) -> b f", "all", patch=self.frame_patch_size
            )

        if self.variant == "factorized_encoder":
            x = rearrange(x, "b f n d -> (b f) n d")
            x = Transformer(
                dim=self.dim,
                depth=self.spatial_depth,
                heads=self.heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                flash=self.flash,
                name="spatial_transformer",
            )(x, train=train)
            x = rearrange(x, "(b f) n d -> b f n d", b=batch)

            x = x[:, :, 0] if not global_average_pool else x.mean(axis=2)

            tmask = temporal_mask
            if not global_average_pool:
                temporal_cls = self.param(
                    "temporal_cls_token", nn.initializers.normal(1.0), (1, 1, self.dim)
                )
                tcls = jnp.broadcast_to(
                    temporal_cls, (batch, 1, self.dim)
                ).astype(x.dtype)
                x = jnp.concatenate([tcls, x], axis=1)
                if exists(tmask):
                    tmask = jnp.pad(tmask, ((0, 0), (1, 0)), constant_values=True)

            kp = tmask[:, None, None, :] if exists(tmask) else None
            x = Transformer(
                dim=self.dim,
                depth=self.temporal_depth,
                heads=self.heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                flash=self.flash,
                name="temporal_transformer",
            )(x, mask=kp, train=train)

            x = x[:, 0] if not global_average_pool else x.mean(axis=1)
        else:
            assert self.spatial_depth == self.temporal_depth, (
                "Spatial and temporal depth must be the same for factorized "
                "self-attention"
            )
            x = FactorizedTransformer(
                dim=self.dim,
                depth=self.spatial_depth,
                heads=self.heads,
                dim_head=self.dim_head,
                mlp_dim=self.mlp_dim,
                dropout=self.dropout,
                flash=self.flash,
                name="factorized_transformer",
            )(x, mask=temporal_mask, train=train)
            x = (
                x[:, 0, 0]
                if not global_average_pool
                else reduce(x, "b f n d -> b d", "mean")
            )

        return nn.Dense(self.num_classes, name="mlp_head")(x)
