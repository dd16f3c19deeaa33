"""ViT + decorrelation auxiliary loss (reference vit_with_decorr.py:190-280).

Forward returns ``(logits, decorr_aux_loss)``.  The loss penalizes
off-diagonal Gram entries over sampled tokens / random orthogonal subspaces /
across-depth trajectories (vit_with_decorr.py:28-102).  The reference's
training recipe (train_vit_decorr.py) is ported in
``vit_pytorch_tpu/parallel/train.py`` (``aux_loss_weight``)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..nn.patch import PatchEmbedding, patchify_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import default, exists, pair


class DecorrelationLoss(nn.Module):
    """reference vit_with_decorr.py:28-102."""

    sample_frac: float = 1.0
    soft_validate_num_sampled: bool = False
    use_subspace: bool = False
    dim: Optional[int] = None
    dim_subspace: int = 64
    num_subspaces: int = 1
    mean_center: bool = False
    across_depth: bool = False

    @nn.compact
    def __call__(self, tokens, *, rng: Optional[jax.Array] = None):
        need_sample = self.sample_frac < 1.0 and not self.across_depth
        *lead, seq_len, dim = tokens.shape

        if need_sample:
            num_sampled = int(seq_len * self.sample_frac)
            assert self.soft_validate_num_sampled or num_sampled >= 2
            if num_sampled <= 1:
                return jnp.float32(0.0)
            if rng is None and self.has_rng("decorr"):
                rng = self.make_rng("decorr")
            flat = tokens.reshape(-1, seq_len, dim)
            if rng is not None:
                scores = jax.random.normal(rng, flat.shape[:2])
                idx = jnp.argsort(scores, axis=-1)[:, :num_sampled]
                flat = jnp.take_along_axis(flat, idx[..., None], axis=1)
            else:
                # no rng (e.g. init trace): deterministic prefix
                flat = flat[:, :num_sampled]
            tokens = flat.reshape(*lead, num_sampled, dim)

        if self.use_subspace:
            assert exists(self.dim), "dim must be passed in if using subspaces"
            assert self.dim_subspace < self.dim

            proj = self.variable(
                "buffers",
                "proj",
                lambda: jnp.stack(
                    [
                        nn.initializers.orthogonal()(
                            jax.random.PRNGKey(i), (self.dim, self.dim_subspace)
                        )
                        for i in range(self.num_subspaces)
                    ]
                ),
            ).value
            tokens = jnp.einsum("...nd,sde->...sne", tokens, proj)
            dim = self.dim_subspace
        else:
            tokens = tokens[..., None, :, :]

        if self.mean_center:
            tokens = tokens - tokens.mean(axis=-2, keepdims=True)

        dist = (
            jnp.einsum("...snd,...sne->...sde", tokens, tokens)
            / tokens.shape[-2]
        )
        eye = jnp.eye(dim)
        loss = jnp.square(dist) * (1.0 - eye) / ((dim - 1) * dim)
        # sum over all but the batch axis (reference reduces '... b s d e -> b')
        loss = loss.sum(axis=(-1, -2, -3))
        while loss.ndim > 1:
            loss = loss.sum(axis=0)
        return loss.mean()


class _DecorrAttention(nn.Module):
    """vit.py-style attention also returning its normed input
    (vit_with_decorr.py:122-156)."""

    dim: int
    heads: int
    dim_head: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        normed = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(normed)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            *map(split, (q, k, v)),
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out, normed


class _DecorrFeedForward(nn.Module):
    """vit_with_decorr.py:105-120."""

    dim: int
    hidden_dim: int
    dropout: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        normed = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        out = nn.Dense(self.hidden_dim, name="fc1")(normed)
        out = _gelu(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        out = nn.Dense(self.dim, name="fc2")(out)
        out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out, normed


class ViT(nn.Module):
    """reference vit_with_decorr.py:190 — same keyword constructor; returns
    (logits, decorr_aux_loss)."""

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
    decorr_sample_frac: float = 1.0
    decorr_use_subspace: bool = False
    decorr_dim_subspace: int = 64
    decorr_num_subspaces: int = 1
    decorr_mean_center: bool = False
    decorr_layer_outputs_across_depth: bool = False

    @nn.compact
    def __call__(self, img, return_decorr_aux_loss=None, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        b = img.shape[0]

        # run the decorr module during init too, so its buffers exist
        return_aux = (
            default(return_decorr_aux_loss, train) or self.is_initializing()
        ) and self.decorr_sample_frac > 0.0

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

        normed_inputs = []
        layer_outputs = []
        for i in range(self.depth):
            attn_out, attn_normed = _DecorrAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, train=train)
            layer_outputs.append(attn_out)
            x = attn_out + x

            ff_out, ff_normed = _DecorrFeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train)
            layer_outputs.append(ff_out)
            x = ff_out + x

            normed_inputs.append(attn_normed)
            normed_inputs.append(ff_normed)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        decorr_aux_loss = jnp.float32(0.0)
        if return_aux:
            if self.decorr_layer_outputs_across_depth:
                # (l, b, n, d) → (n, b, l, d): decorrelate across depth
                decorr_inputs = jnp.stack(layer_outputs).transpose(2, 1, 0, 3)
            else:
                decorr_inputs = jnp.stack(normed_inputs)
            decorr_aux_loss = DecorrelationLoss(
                sample_frac=self.decorr_sample_frac,
                use_subspace=self.decorr_use_subspace,
                dim=self.dim,
                dim_subspace=self.decorr_dim_subspace,
                num_subspaces=self.decorr_num_subspaces,
                mean_center=self.decorr_mean_center,
                across_depth=self.decorr_layer_outputs_across_depth,
                name="decorr_loss",
            )(decorr_inputs)

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        return nn.Dense(self.num_classes, name="mlp_head")(x), decorr_aux_loss
