"""VAT — vision-action transformer (reference vat.py:260-511).

Action/register/advantage/extra tokens cross-attend the ViT's per-layer
hidden-state trajectory (selected by ``vit_layer_indices``; index == depth
means the final embedding), with FiLM task conditioning, per-head output
gates on attention (vat.py:95-131), view/time embeddings and an L1 action
loss.  ``freeze_vit`` becomes ``stop_gradient`` over the trajectory."""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..nn.patch import PatchEmbedding, patchify_2d
from ..ops.attention import dot_product_attention
from ..utils.helpers import default, exists, pair


class FiLM(nn.Module):
    """reference vat.py:25-44 (zero-init projection)."""

    dim: int

    @nn.compact
    def __call__(self, tokens, cond):
        gb = nn.Dense(
            self.dim * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj",
        )(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return tokens * gamma[:, None, :] + beta[:, None, :]


class GatedAttention(nn.Module):
    """reference vat.py:66-134 — attention with per-head sigmoid output
    gates computed from the normed queries."""

    dim: int
    dim_context: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    cross_attend: bool = False

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        assert not (self.cross_attend ^ exists(context))
        h, dh = self.heads, self.dim_head
        inner = h * dh
        project_out = not (h == 1 and dh == self.dim)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        kv_input = x
        if self.cross_attend:
            context = nn.LayerNorm(epsilon=LN_EPS, name="context_norm")(context)
            kv_input = context

        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_input)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))

        dropout_rng = self.make_rng("dropout") if self.dropout > 0 and train else None
        out = dot_product_attention(
            q, k, v,
            dropout_rate=self.dropout if train else 0.0,
            dropout_rng=dropout_rng,
        )

        # per-head output gates (vat.py:95-99, 131)
        gates = jax.nn.sigmoid(nn.Dense(h, name="to_out_gates")(x))
        out = out * gates.transpose(0, 2, 1)[..., None]

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class VATFeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = _gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, name="fc2")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class ViT(nn.Module):
    """reference vat.py:177-253 — ViT exposing the representation
    trajectory (pre-layer hidden states, vat.py:162-175)."""

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
    num_register_tokens: int = 0

    @nn.compact
    def __call__(self, img, return_hiddens: bool = False, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert self.pool in {"cls", "mean"}
        num_patches = (image_height // patch_height) * (image_width // patch_width)
        b = img.shape[0]
        R = self.num_register_tokens

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        n = x.shape[1]

        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0), (num_patches, self.dim)
        )
        x = x + pos[:n].astype(x.dtype)

        cls_token = self.param("cls_token", nn.initializers.normal(1.0), (self.dim,))
        registers = self.param(
            "register_tokens", nn.initializers.normal(1e-2), (R, self.dim)
        )

        cls = jnp.broadcast_to(cls_token, (b, 1, self.dim)).astype(x.dtype)
        regs = jnp.broadcast_to(registers, (b, R, self.dim)).astype(x.dtype)
        x = jnp.concatenate([regs, cls, x], axis=1)
        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)

        hiddens = []
        for i in range(self.depth):
            hiddens.append(x)
            x = GatedAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                name=f"layers_{i}_attn",
            )(x, train=train) + x
            x = VATFeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        if return_hiddens:
            return x, jnp.stack(hiddens)

        regs_out, cls_out, tokens = x[:, :R], x[:, R], x[:, R + 1 :]
        pooled = tokens.mean(axis=1) if self.pool == "mean" else cls_out
        return nn.Dense(self.num_classes, name="mlp_head")(pooled)


class VAT(nn.Module):
    """reference vat.py:260 — same keyword constructor (``vit`` may be a ViT
    module or a dict of its kwargs)."""

    vit: Any
    dim: int
    depth: int
    heads: int
    dim_head: int
    dim_action: int
    mlp_dim: int
    num_views: Optional[int] = None
    num_tasks: Optional[int] = None
    dim_extra_token: Optional[int] = None
    num_register_tokens: int = 4
    action_chunk_len: int = 7
    time_seq_len: int = 1
    dropout: float = 0.0
    add_self_attn: bool = True
    self_attn_heads: int = 4
    self_attn_dim_head: int = 32
    vit_layer_indices: Optional[Tuple[int, ...]] = None
    num_advantage_bins: int = 0

    def setup(self):
        vit = self.vit
        if isinstance(vit, dict):
            vit = ViT(**vit)
        self._vit = vit
        self.vit_dim = vit.dim

        assert vit.depth == self.depth or exists(self.vit_layer_indices)
        indices = default(self.vit_layer_indices, tuple(range(self.depth)))
        assert len(indices) == self.depth
        self.layer_indices = indices

        init = nn.initializers.normal(1e-2)
        if self.time_seq_len > 1:
            self.time_pos_emb = self.param(
                "time_pos_emb", init, (self.time_seq_len, self.vit_dim)
            )
        if exists(self.num_views) and self.num_views > 1:
            self.view_emb = self.param(
                "view_emb", init, (self.num_views, self.vit_dim)
            )
        if exists(self.num_tasks):
            self.task_emb = self.param(
                "task_emb", init, (self.num_tasks, self.dim)
            )

        self.vat_register_tokens = self.param(
            "register_tokens", init, (self.num_register_tokens, self.dim)
        )
        self.action_pos_emb = self.param(
            "action_pos_emb", init, (self.action_chunk_len, self.dim)
        )
        if self.num_advantage_bins > 0:
            self.advantage_emb = nn.Embed(
                self.num_advantage_bins + 1, self.dim, name="advantage_emb"
            )

        films, self_attns, cross_attns, ffs = [], [], [], []
        for i in range(self.depth):
            films.append(FiLM(dim=self.dim) if exists(self.num_tasks) else None)
            self_attns.append(
                GatedAttention(
                    dim=self.dim,
                    heads=self.self_attn_heads,
                    dim_head=self.self_attn_dim_head,
                    dropout=self.dropout,
                )
                if self.add_self_attn
                else None
            )
            cross_attns.append(
                GatedAttention(
                    dim=self.dim,
                    dim_context=self.vit_dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    cross_attend=True,
                )
            )
            ffs.append(
                VATFeedForward(
                    dim=self.dim, hidden_dim=self.mlp_dim, dropout=self.dropout
                )
            )
        self.films = films
        self.self_attns = self_attns
        self.cross_attns = cross_attns
        self.ffs = ffs

        self.final_norm = nn.LayerNorm(epsilon=LN_EPS, name="final_norm")
        self.to_pred_action = nn.Dense(
            self.dim_action, use_bias=False, name="to_pred_action"
        )
        if exists(self.dim_extra_token):
            self.to_extra_token = nn.Dense(self.dim, name="to_extra_token")

    def __call__(
        self,
        video_or_image,
        *,
        extra=None,
        tasks=None,
        advantages=None,
        actions=None,
        return_hiddens: bool = False,
        freeze_vit: bool = False,
        train: bool = False,
    ):
        batch = video_or_image.shape[0]
        return_loss = exists(actions)
        is_video = self.time_seq_len > 1

        if video_or_image.ndim == 4:
            video_or_image = video_or_image[:, None]
        if video_or_image.ndim == 5:
            video_or_image = video_or_image[:, :, :, None]
        assert video_or_image.shape[3] == self.time_seq_len

        v = video_or_image.shape[1]
        t = video_or_image.shape[3]
        # (b v c t h w) → ((b v t) c h w)
        images = jnp.moveaxis(video_or_image, 3, 2)  # b v t c h w
        images = images.reshape((-1,) + images.shape[3:])

        embed, hiddens = self._vit(images, return_hiddens=True, train=train)
        if freeze_vit:
            embed = jax.lax.stop_gradient(embed)
            hiddens = jax.lax.stop_gradient(hiddens)

        hiddens = jnp.concatenate([hiddens, embed[None]], axis=0)
        hiddens = hiddens[jnp.asarray(self.layer_indices)]

        l, _, n, d = hiddens.shape
        hiddens = hiddens.reshape(l, batch, v, t, n, d)

        if is_video:
            hiddens = hiddens + self.time_pos_emb[None, None, None, :, None, :].astype(
                hiddens.dtype
            )
        if exists(self.num_views) and self.num_views > 1:
            assert self.view_emb.shape[0] == v
            hiddens = hiddens + self.view_emb[None, None, :, None, None, :].astype(
                hiddens.dtype
            )

        context = hiddens.reshape(l, batch, v * t * n, d)

        action_tokens = jnp.broadcast_to(
            self.action_pos_emb, (batch, self.action_chunk_len, self.dim)
        )

        parts = []
        lens = []
        regs = jnp.broadcast_to(
            self.vat_register_tokens, (batch, self.num_register_tokens, self.dim)
        )
        parts.append(regs)
        lens.append(self.num_register_tokens)

        n_adv = 0
        if self.num_advantage_bins > 0 and exists(advantages):
            if isinstance(advantages, int):
                advantages = jnp.full((batch,), advantages, jnp.int32)
            adv = self.advantage_emb(advantages + 1)[:, None, :]
            parts.append(adv)
            n_adv = 1
        lens.append(n_adv)

        parts.append(action_tokens)
        lens.append(self.action_chunk_len)

        n_extra = 0
        if exists(extra):
            assert exists(self.dim_extra_token)
            parts.append(self.to_extra_token(extra)[:, None, :])
            n_extra = 1
        lens.append(n_extra)

        tokens = jnp.concatenate(parts, axis=1)

        task_cond = None
        if exists(tasks):
            assert exists(self.num_tasks)
            task_cond = self.task_emb[tasks]

        all_hiddens = [tokens]
        for i in range(self.depth):
            if exists(self.films[i]) and exists(task_cond):
                tokens = self.films[i](tokens, task_cond)
            tokens = self.cross_attns[i](tokens, context[i], train=train) + tokens
            if exists(self.self_attns[i]):
                tokens = self.self_attns[i](tokens, train=train) + tokens
            tokens = self.ffs[i](tokens, train=train) + tokens
            all_hiddens.append(tokens)

        start = lens[0] + lens[1]
        action_out = tokens[:, start : start + self.action_chunk_len]
        action_out = self.final_norm(action_out)
        pred_action = self.to_pred_action(action_out)

        if not return_loss:
            if not return_hiddens:
                return pred_action
            return pred_action, jnp.stack(all_hiddens)

        assert pred_action.shape[1] == actions.shape[1]
        return jnp.mean(jnp.abs(pred_action - actions))
