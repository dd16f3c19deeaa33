"""VAAT — vision-audio-action transformer (reference vaat.py:421-780).

VAT plus an audio branch: an AST (audio spectrogram transformer,
vaat.py:205-330) supplies a second per-layer hidden trajectory, and every
VAAT layer cross-attends both trajectories (vaat.py:702-710).  The
torchaudio ``Spectrogram`` becomes ops/spectrogram.py (pure jnp STFT);
spectrograms are auto-cropped to the patch grid as in the reference."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.posemb import posemb_sincos_2d
from ..ops.spectrogram import spectrogram
from ..utils.helpers import default, exists, pair
from .vat import FiLM, GatedAttention, VATFeedForward, ViT  # noqa: F401


class AST(nn.Module):
    """reference vaat.py:205-330 — audio spectrogram transformer with
    register tokens and a hidden-state trajectory."""

    dim: int
    depth: int
    mlp_dim: int
    num_classes: Optional[int] = None
    patch_size: int | tuple = 16
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    accept_spec: bool = False
    accept_spec_time_first: bool = True
    spec_n_fft: int = 128
    spec_power: float = 2.0
    spec_win_length: int = 24
    spec_hop_length: Optional[int] = None
    spec_pad: int = 0
    spec_center: bool = True
    spec_pad_mode: str = "reflect"
    num_register_tokens: int = 4

    @nn.compact
    def __call__(self, raw_audio_or_spec, return_hiddens: bool = False, *, train: bool = False):
        batch = raw_audio_or_spec.shape[0]
        ph, pw = pair(self.patch_size)

        assert (self.accept_spec and raw_audio_or_spec.ndim == 3) or (
            not self.accept_spec and raw_audio_or_spec.ndim == 2
        )

        if self.accept_spec:
            spec = jnp.swapaxes(raw_audio_or_spec, 1, 2)  # b t f -> b f t
        else:
            spec = spectrogram(
                raw_audio_or_spec,
                n_fft=self.spec_n_fft,
                power=self.spec_power,
                win_length=self.spec_win_length,
                hop_length=self.spec_hop_length,
                pad=self.spec_pad,
                center=self.spec_center,
                pad_mode=self.spec_pad_mode,
            )

        # auto-crop to the patch grid (vaat.py:289-296)
        height, width = spec.shape[-2:]
        spec = spec[..., : height // ph * ph, : width // pw * pw]

        h, w = spec.shape[-2] // ph, spec.shape[-1] // pw
        patches = spec.reshape(batch, h, ph, w, pw).transpose(0, 1, 3, 2, 4)
        patches = patches.reshape(batch, h, w, ph * pw)

        tokens = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")(patches)
        tokens = nn.Dense(self.dim, name="patch_proj")(tokens)
        tokens = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")(tokens)

        pe = posemb_sincos_2d(h, w, self.dim, dtype=tokens.dtype)
        tokens = tokens.reshape(batch, h * w, self.dim) + pe

        registers = self.param(
            "register_tokens",
            nn.initializers.normal(1e-2),
            (self.num_register_tokens, self.dim),
        )
        regs = jnp.broadcast_to(
            registers, (batch, self.num_register_tokens, self.dim)
        ).astype(tokens.dtype)
        tokens = jnp.concatenate([regs, tokens], axis=1)

        hiddens = []
        x = tokens
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

        # the reference applies the transformer's trailing norm AND THEN
        # final_norm — two LayerNorms in sequence (vaat.py:199 + :329)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        normed = nn.LayerNorm(epsilon=LN_EPS, name="final_norm")(x)

        if return_hiddens:
            return normed, jnp.stack(hiddens)

        pooled = normed[:, self.num_register_tokens :].mean(axis=1)
        if exists(self.num_classes):
            return nn.Dense(self.num_classes, name="mlp_head")(pooled)
        return pooled


class VAAT(nn.Module):
    """reference vaat.py:421 — same keyword constructor."""

    vit: Any
    ast: Any
    dim: int
    depth: int
    heads: int
    dim_head: int
    dim_action: int
    mlp_dim: int
    num_image_views: Optional[int] = None
    num_audio_views: Optional[int] = None
    num_tasks: Optional[int] = None
    dim_extra_token: Optional[int] = None
    num_register_tokens: int = 4
    action_chunk_len: int = 7
    time_seq_len: int = 1
    dropout: float = 0.0
    add_self_attn: bool = True
    self_attn_heads: int = 4
    self_attn_dim_head: int = 32
    ast_layer_indices: Optional[Tuple[int, ...]] = None
    vit_layer_indices: Optional[Tuple[int, ...]] = None
    num_advantage_bins: int = 0

    def setup(self):
        vit = self.vit
        if isinstance(vit, dict):
            vit = ViT(**vit)
        self._vit = vit
        ast = self.ast
        if isinstance(ast, dict):
            ast = AST(**ast)
        self._ast = ast

        self.vit_dim = vit.dim
        self.ast_dim = ast.dim

        assert vit.depth == self.depth or exists(self.vit_layer_indices)
        self._vit_indices = default(self.vit_layer_indices, tuple(range(self.depth)))
        assert len(self._vit_indices) == self.depth

        assert ast.depth == self.depth or exists(self.ast_layer_indices)
        self._ast_indices = default(self.ast_layer_indices, tuple(range(self.depth)))
        assert len(self._ast_indices) == self.depth

        init = nn.initializers.normal(1e-2)
        if self.time_seq_len > 1:
            self.time_pos_emb = self.param(
                "time_pos_emb", init, (self.time_seq_len, self.vit_dim)
            )
        if exists(self.num_image_views) and self.num_image_views > 1:
            self.image_view_emb = self.param(
                "image_view_emb", init, (self.num_image_views, self.vit_dim)
            )
        if exists(self.num_audio_views) and self.num_audio_views > 1:
            self.audio_view_emb = self.param(
                "audio_view_emb", init, (self.num_audio_views, self.ast_dim)
            )
        if exists(self.num_tasks):
            self.task_emb = self.param("task_emb", init, (self.num_tasks, self.dim))

        self.vaat_register_tokens = self.param(
            "register_tokens", init, (self.num_register_tokens, self.dim)
        )
        self.action_pos_emb = self.param(
            "action_pos_emb", init, (self.action_chunk_len, self.dim)
        )
        if self.num_advantage_bins > 0:
            self.advantage_emb = nn.Embed(
                self.num_advantage_bins + 1, self.dim, name="advantage_emb"
            )

        films, self_attns, img_crosses, audio_crosses, ffs = [], [], [], [], []
        for _ in range(self.depth):
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
            img_crosses.append(
                GatedAttention(
                    dim=self.dim,
                    dim_context=self.vit_dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    cross_attend=True,
                )
            )
            audio_crosses.append(
                GatedAttention(
                    dim=self.dim,
                    dim_context=self.ast_dim,
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
        self.img_crosses = img_crosses
        self.audio_crosses = audio_crosses
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
        audio_or_spec,
        *,
        extra=None,
        tasks=None,
        advantages=None,
        actions=None,
        return_hiddens: bool = False,
        freeze_vit: bool = False,
        freeze_ast: bool = False,
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

        accept_spec = self._ast.accept_spec
        if audio_or_spec.ndim == 2 and not accept_spec:
            audio_or_spec = audio_or_spec[:, None]
        elif audio_or_spec.ndim == 3 and accept_spec:
            audio_or_spec = audio_or_spec[:, None]

        v = video_or_image.shape[1]
        t = video_or_image.shape[3]
        va = audio_or_spec.shape[1]

        images = jnp.moveaxis(video_or_image, 3, 2)
        images = images.reshape((-1,) + images.shape[3:])
        audio = audio_or_spec.reshape((-1,) + audio_or_spec.shape[2:])

        embed, hiddens = self._vit(images, return_hiddens=True, train=train)
        if freeze_vit:
            embed, hiddens = jax.lax.stop_gradient((embed, hiddens))
        hiddens = jnp.concatenate([hiddens, embed[None]], axis=0)
        hiddens = hiddens[jnp.asarray(self._vit_indices)]
        l, _, n, d = hiddens.shape
        hiddens = hiddens.reshape(l, batch, v, t, n, d)

        if is_video:
            hiddens = hiddens + self.time_pos_emb[None, None, None, :, None, :].astype(hiddens.dtype)
        if exists(self.num_image_views) and self.num_image_views > 1:
            hiddens = hiddens + self.image_view_emb[None, None, :, None, None, :].astype(hiddens.dtype)

        audio_embed, audio_hiddens = self._ast(audio, return_hiddens=True, train=train)
        if freeze_ast:
            audio_embed, audio_hiddens = jax.lax.stop_gradient(
                (audio_embed, audio_hiddens)
            )
        audio_hiddens = jnp.concatenate([audio_hiddens, audio_embed[None]], axis=0)
        audio_hiddens = audio_hiddens[jnp.asarray(self._ast_indices)]
        la, _, na, da = audio_hiddens.shape
        audio_hiddens = audio_hiddens.reshape(la, batch, va, na, da)
        if exists(self.num_audio_views) and self.num_audio_views > 1:
            # reference vaat.py: the learned per-view embedding must match
            # the number of audio views actually fed in (a mismatch would
            # otherwise broadcast into an opaque reshape error downstream)
            assert self.audio_view_emb.shape[0] == va, (
                f"audio has {va} view(s) but num_audio_views="
                f"{self.num_audio_views}"
            )
            audio_hiddens = audio_hiddens + self.audio_view_emb[None, None, :, None, :].astype(audio_hiddens.dtype)

        image_context = hiddens.reshape(l, batch, v * t * n, d)
        audio_context = audio_hiddens.reshape(la, batch, va * na, da)

        action_tokens = jnp.broadcast_to(
            self.action_pos_emb, (batch, self.action_chunk_len, self.dim)
        )

        parts, lens = [], []
        regs = jnp.broadcast_to(
            self.vaat_register_tokens, (batch, self.num_register_tokens, self.dim)
        )
        parts.append(regs)
        lens.append(self.num_register_tokens)

        n_adv = 0
        if self.num_advantage_bins > 0 and exists(advantages):
            if isinstance(advantages, int):
                advantages = jnp.full((batch,), advantages, jnp.int32)
            parts.append(self.advantage_emb(advantages + 1)[:, None, :])
            n_adv = 1
        lens.append(n_adv)

        parts.append(action_tokens)
        lens.append(self.action_chunk_len)
        if exists(extra):
            assert exists(self.dim_extra_token)
            parts.append(self.to_extra_token(extra)[:, None, :])

        tokens = jnp.concatenate(parts, axis=1)

        task_cond = self.task_emb[tasks] if exists(tasks) else None

        all_hiddens = [tokens]
        for i in range(self.depth):
            if exists(self.films[i]) and exists(task_cond):
                tokens = self.films[i](tokens, task_cond)
            tokens = self.img_crosses[i](tokens, image_context[i], train=train) + tokens
            tokens = self.audio_crosses[i](tokens, audio_context[i], train=train) + tokens
            if exists(self.self_attns[i]):
                tokens = self.self_attns[i](tokens, train=train) + tokens
            tokens = self.ffs[i](tokens, train=train) + tokens
            all_hiddens.append(tokens)

        start = lens[0] + lens[1]
        action_out = tokens[:, start : start + self.action_chunk_len]
        pred_action = self.to_pred_action(self.final_norm(action_out))

        if not return_loss:
            if not return_hiddens:
                return pred_action
            return pred_action, jnp.stack(all_hiddens)
        return jnp.mean(jnp.abs(pred_action - actions))
