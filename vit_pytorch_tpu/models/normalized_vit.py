"""nViT — nGPT-style fully-normalized ViT (reference normalized_vit.py:148-246).

torch implements weight normalization with ``parametrize`` (weights
re-normalized on every access, normalized_vit.py:37-58) plus an in-place
``norm_weights_()`` post-optimizer hook (212-221).  The JAX design is
functional: ``NormLinear`` l2-normalizes its kernel inside ``__call__`` (so
gradients flow through the normalization, matching the parametrized torch
forward), and ``normalize_weights(params)`` is a pure function to apply
after each optimizer step (the hook's equivalent)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import default, pair
from ..ops.attention import dot_product_attention
from einops import rearrange


def l2norm(t, axis=-1):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=axis, keepdims=True), 1e-12)


class NormLinear(nn.Module):
    """reference normalized_vit.py:37-58.  flax kernel is (in, out);
    ``norm_dim_in=True`` normalizes over the input axis (0)."""

    dim: int
    dim_out: int
    norm_dim_in: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.dim, self.dim_out),
        )
        kernel = l2norm(kernel, axis=0 if self.norm_dim_in else 1)
        return x @ kernel.astype(x.dtype)


class nViTAttention(nn.Module):
    """reference normalized_vit.py:62-111."""

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh

        q = NormLinear(self.dim, inner, name="to_q")(x)
        k = NormLinear(self.dim, inner, name="to_k")(x)
        v = NormLinear(self.dim, inner, name="to_v")(x)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        q, k = l2norm(q), l2norm(k)

        q_scale = self.param(
            "q_scale", nn.initializers.constant(dh**0.25), (h, 1, dh)
        )
        k_scale = self.param(
            "k_scale", nn.initializers.constant(dh**0.25), (h, 1, dh)
        )
        q = q * q_scale.astype(q.dtype)
        k = k * k_scale.astype(k.dtype)

        dropout_rng = (
            self.make_rng("dropout") if self.dropout > 0 and train else None
        )
        out = dot_product_attention(
            q,
            k,
            v,
            scale=1.0,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return NormLinear(inner, self.dim, norm_dim_in=False, name="to_out")(out)


class nViTFeedForward(nn.Module):
    """reference normalized_vit.py:113-144 — gated SiLU with scaled gates."""

    dim: int
    dim_inner: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dim_inner = int(self.dim_inner * 2 / 3)

        hidden = NormLinear(self.dim, dim_inner, name="to_hidden")(x)
        gate = NormLinear(self.dim, dim_inner, name="to_gate")(x)

        hidden_scale = self.param("hidden_scale", nn.initializers.ones, (dim_inner,))
        gate_scale = self.param("gate_scale", nn.initializers.ones, (dim_inner,))

        hidden = hidden * hidden_scale.astype(x.dtype)
        gate = gate * gate_scale.astype(x.dtype) * (self.dim**0.5)

        hidden = jax.nn.silu(gate) * hidden
        hidden = nn.Dropout(self.dropout, deterministic=not train)(hidden)
        return NormLinear(dim_inner, self.dim, norm_dim_in=False, name="to_out")(hidden)


class nViT(nn.Module):
    """reference normalized_vit.py:148 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    channels: int = 3
    dim_head: int = 64
    residual_lerp_scale_init: Optional[float] = None

    @nn.compact
    def __call__(self, images, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        p = self.patch_size
        assert image_height % p == 0 and image_width % p == 0
        num_patches = (image_height // p) * (image_width // p)
        patch_dim = self.channels * p * p
        scale = self.dim**0.5
        lerp_init = default(self.residual_lerp_scale_init, 1.0 / self.depth)

        # channel-first patch flattening '(c p1 p2)' (normalized_vit.py:181)
        patches = rearrange(
            images, "b c (h p1) (w p2) -> b (h w) (c p1 p2)", p1=p, p2=p
        )
        tokens = NormLinear(
            patch_dim, self.dim, norm_dim_in=False, name="patch_embedding"
        )(patches)

        # absolute pos emb as rows of a NormLinear weight (normalized_vit.py:185, 229)
        pos_kernel = self.param(
            "abs_pos_emb",
            nn.initializers.lecun_normal(),
            (self.dim, num_patches),
        )
        pos = l2norm(pos_kernel, axis=0).T[: tokens.shape[1]]
        tokens = l2norm(tokens + pos.astype(tokens.dtype))

        for i in range(self.depth):
            attn_alpha = self.param(
                f"residual_lerp_scales_{i}_attn",
                nn.initializers.constant(lerp_init / scale),
                (self.dim,),
            )
            ff_alpha = self.param(
                f"residual_lerp_scales_{i}_ff",
                nn.initializers.constant(lerp_init / scale),
                (self.dim,),
            )

            attn_out = l2norm(
                nViTAttention(
                    dim=self.dim,
                    dim_head=self.dim_head,
                    heads=self.heads,
                    dropout=self.dropout,
                    name=f"layers_{i}_attn",
                )(tokens, train=train)
            )
            # tokens.lerp(out, alpha*scale) = tokens + alpha*scale*(out - tokens)
            tokens = l2norm(
                tokens + (attn_alpha * scale).astype(tokens.dtype) * (attn_out - tokens)
            )

            ff_out = l2norm(
                nViTFeedForward(
                    dim=self.dim,
                    dim_inner=self.mlp_dim,
                    dropout=self.dropout,
                    name=f"layers_{i}_ff",
                )(tokens, train=train)
            )
            tokens = l2norm(
                tokens + (ff_alpha * scale).astype(tokens.dtype) * (ff_out - tokens)
            )

        pooled = tokens.mean(axis=1)
        logits = NormLinear(self.dim, self.num_classes, name="to_pred")(pooled)
        logit_scale = self.param(
            "logit_scale", nn.initializers.ones, (self.num_classes,)
        )
        return logits * logit_scale.astype(logits.dtype) * scale


def normalize_weights(params: dict) -> dict:
    """Functional equivalent of the reference's in-place ``norm_weights_()``
    post-optimizer hook (normalized_vit.py:212-221): re-project every
    NormLinear kernel (and the abs pos emb) onto the unit sphere."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    out = {}
    for key, value in flat.items():
        path = "/".join(str(k) for k in key)
        if path.endswith("kernel") and any(
            s in path
            for s in (
                "to_q",
                "to_k",
                "to_v",
                "to_out",
                "to_hidden",
                "to_gate",
                "to_pred",
                "patch_embedding",
            )
        ):
            axis = 1 if any(
                s in path for s in ("to_out", "patch_embedding")
            ) else 0
            out[key] = l2norm(value, axis=axis)
        elif path.endswith("abs_pos_emb"):
            out[key] = l2norm(value, axis=0)
        else:
            out[key] = value
    return unflatten_dict(out)
