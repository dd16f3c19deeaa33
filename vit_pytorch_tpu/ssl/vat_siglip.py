"""SigLIP-VAT (reference vat_siglip.py:99-521): VAT on a SigLIP vision
tower, plus the HF checkpoint import remapping q/k/v/mlp/LN/patch-conv
weights into this layout (vat_siglip.py:273-343).

Parity notes: SigLIP uses LN eps 1e-6 and tanh-approximated GELU
(SURVEY §7.2).  ``load_siglip`` here takes a LOCAL safetensors path or an
in-memory state dict (this environment has no network egress) and returns
the flax param subtree for the vision tower."""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import default, exists, pair
from ..ops.attention import dot_product_attention
from .vat import FiLM

SIGLIP_EPS = 1e-6


class SigLIPAttention(nn.Module):
    """reference vat_siglip.py:27-85 — biased q/kv, optional cross attention
    and per-head output gates."""

    dim: int
    dim_context: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    norm_eps: float = SIGLIP_EPS
    gate_attn: bool = False

    @nn.compact
    def __call__(self, x, context=None, *, train: bool = False):
        h, dh = self.heads, self.dim_head
        inner = h * dh
        is_cross = exists(self.dim_context)

        x = nn.LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        if is_cross:
            assert exists(context)
            context = nn.LayerNorm(epsilon=self.norm_eps, name="norm_context")(context)
        else:
            context = x

        q = nn.Dense(inner, name="to_q")(x)
        kv = nn.Dense(inner * 2, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        out = dot_product_attention(*map(split, (q, k, v)))

        if self.gate_attn:
            gates = jax.nn.sigmoid(nn.Dense(h, name="to_out_gates")(x))
            out = out * gates.transpose(0, 2, 1)[..., None]

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(self.dim, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=not train)(out)


class SigLIPFeedForward(nn.Module):
    """reference vat_siglip.py:87-97 — tanh GELU."""

    dim: int
    dim_inner: int
    norm_eps: float = SIGLIP_EPS

    @nn.compact
    def __call__(self, x):
        x = nn.LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        x = nn.Dense(self.dim_inner, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=True)
        return nn.Dense(self.dim, name="fc2")(x)


class SigLIP(nn.Module):
    """reference vat_siglip.py:99-151 — same keyword constructor."""

    image_size: int = 224
    patch_size: int = 14
    dim: int = 1152
    depth: int = 27
    heads: int = 16
    mlp_dim: int = 4304
    norm_eps: float = SIGLIP_EPS

    @nn.compact
    def __call__(self, x, return_hiddens: bool = False, *, train: bool = False):
        from ..nn.patch import patchify_2d

        p = self.patch_size
        dim_head = self.dim // self.heads
        num_patches = (self.image_size // p) ** 2

        x = patchify_2d(x, p, p)
        x = nn.Dense(self.dim, name="patch_embed")(x)
        n = x.shape[1]

        pos = self.param(
            "pos_embed", nn.initializers.normal(1.0), (num_patches, self.dim)
        )
        x = x + pos[:n].astype(x.dtype)

        hiddens = []
        for i in range(self.depth):
            hiddens.append(x)
            x = SigLIPAttention(
                dim=self.dim,
                heads=self.heads,
                dim_head=dim_head,
                norm_eps=self.norm_eps,
                name=f"layers_{i}_attn",
            )(x, train=train) + x
            x = SigLIPFeedForward(
                dim=self.dim,
                dim_inner=self.mlp_dim,
                norm_eps=self.norm_eps,
                name=f"layers_{i}_ff",
            )(x) + x

        out = nn.LayerNorm(epsilon=self.norm_eps, name="norm")(x)
        if return_hiddens:
            return out, jnp.stack(hiddens)
        return out


def download_siglip(
    repo_id: str = "google/siglip-so400m-patch14-224",
    folder: str = "checkpoints/siglip",
) -> str:
    """Download the SigLIP checkpoint from the HF hub like reference
    vat_siglip.py:277-285 (snapshot_download of config.json +
    model.safetensors, skipped when already cached) and return the local
    safetensors path — feed it to :func:`load_siglip`.

    Divergence from the reference: the skip-if-cached check is on the
    ``model.safetensors`` FILE, not the folder — the reference's
    folder-exists check leaves an interrupted first download permanently
    broken (folder created, weights missing, never retried)."""
    from pathlib import Path

    folder = Path(folder)
    weights = folder / "model.safetensors"
    if not weights.exists():
        from huggingface_hub import snapshot_download

        snapshot_download(
            repo_id=repo_id,
            local_dir=folder,
            allow_patterns=["config.json", "model.safetensors"],
        )
    return str(weights)


def load_siglip(source, depth: int = 27) -> dict:
    """HF SigLIP vision tower → SigLIP flax params (the remap of
    vat_siglip.py:273-343).  ``source`` may be a local safetensors path, a
    {name: array} dict, or an HF repo id (``namespace/repo`` — downloaded
    via :func:`download_siglip`, matching the reference's hub path; the
    local routes stay the offline-tested ones)."""
    if isinstance(source, str):
        import os

        if not os.path.exists(source):
            # only a plain namespace/repo shape goes to the hub; a
            # multi-slash or .safetensors-suffixed string is a mistyped
            # LOCAL path and should fail loudly, not trigger a network
            # call to a nonsense repo id
            if source.count("/") == 1 and not source.endswith(
                (".safetensors", ".json")
            ):
                source = download_siglip(repo_id=source)
            else:
                raise FileNotFoundError(
                    f"load_siglip: {source!r} does not exist locally and "
                    "does not look like an HF repo id (namespace/repo)"
                )
        from safetensors import safe_open

        tensors = {}
        with safe_open(source, framework="np") as f:
            for k in f.keys():
                tensors[k] = f.get_tensor(k)
    else:
        tensors = {
            k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
            for k, v in source.items()
        }

    keys = tensors.keys()
    vi_p = ""
    if any(
        k.startswith("paligemma_with_expert.paligemma.model.vision_tower.vision_model")
        for k in keys
    ):
        vi_p = "paligemma_with_expert.paligemma.model.vision_tower.vision_model."
    elif any(k.startswith("vision_model") for k in keys):
        vi_p = "vision_model."

    def t(name):
        return np.asarray(tensors[vi_p + name])

    params: dict = {}

    # patch conv → linear rearrange (d c h w → (h w c) d)
    pw = t("embeddings.patch_embedding.weight")
    params["patch_embed"] = {
        "kernel": jnp.asarray(pw.transpose(2, 3, 1, 0).reshape(-1, pw.shape[0])),
        "bias": jnp.asarray(t("embeddings.patch_embedding.bias")),
    }
    params["pos_embed"] = jnp.asarray(t("embeddings.position_embedding.weight"))

    def ln(name):
        return {
            "scale": jnp.asarray(t(name + ".weight")),
            "bias": jnp.asarray(t(name + ".bias")),
        }

    def dense(name):
        return {
            "kernel": jnp.asarray(t(name + ".weight").T),
            "bias": jnp.asarray(t(name + ".bias")),
        }

    for i in range(depth):
        pre = f"encoder.layers.{i}"
        kw = t(f"{pre}.self_attn.k_proj.weight")
        vw = t(f"{pre}.self_attn.v_proj.weight")
        kb = t(f"{pre}.self_attn.k_proj.bias")
        vb = t(f"{pre}.self_attn.v_proj.bias")
        params[f"layers_{i}_attn"] = {
            "norm": ln(f"{pre}.layer_norm1"),
            "to_q": dense(f"{pre}.self_attn.q_proj"),
            "to_kv": {
                "kernel": jnp.asarray(np.concatenate([kw, vw], axis=0).T),
                "bias": jnp.asarray(np.concatenate([kb, vb])),
            },
            "to_out": dense(f"{pre}.self_attn.out_proj"),
        }
        params[f"layers_{i}_ff"] = {
            "norm": ln(f"{pre}.layer_norm2"),
            "fc1": dense(f"{pre}.mlp.fc1"),
            "fc2": dense(f"{pre}.mlp.fc2"),
        }

    params["norm"] = ln("post_layernorm")
    return params


class SigLIPVAT(nn.Module):
    """reference vat_siglip.py:170 — same keyword constructor."""

    dim: int = 512
    depth: int = 27
    heads: int = 8
    dim_head: int = 64
    dim_action: int = 32
    mlp_dim: int = 2048
    num_views: int = 1
    num_tasks: Optional[int] = None
    dim_extra_token: Optional[int] = None
    num_register_tokens: int = 4
    action_chunk_len: int = 50
    time_seq_len: int = 1
    dropout: float = 0.0
    add_self_attn: bool = True
    self_attn_heads: int = 4
    self_attn_dim_head: int = 32
    vit_layer_indices: Optional[Tuple[int, ...]] = None
    num_advantage_bins: int = 0
    siglip_image_size: int = 224
    siglip_patch_size: int = 14
    siglip_dim: int = 1152
    siglip_depth: int = 27
    siglip_heads: int = 16
    siglip_mlp_dim: int = 4304
    siglip_norm_eps: float = SIGLIP_EPS

    def setup(self):
        self.vit = SigLIP(
            image_size=self.siglip_image_size,
            patch_size=self.siglip_patch_size,
            dim=self.siglip_dim,
            depth=self.siglip_depth,
            heads=self.siglip_heads,
            mlp_dim=self.siglip_mlp_dim,
            norm_eps=self.siglip_norm_eps,
        )
        vit_dim = self.siglip_dim
        self._indices = default(self.vit_layer_indices, tuple(range(self.depth)))
        assert len(self._indices) == self.depth

        init = nn.initializers.normal(1e-2)
        if self.time_seq_len > 1:
            self.time_pos_emb = self.param(
                "time_pos_emb", init, (self.time_seq_len, vit_dim)
            )
        if self.num_views > 1:
            self.view_emb = self.param("view_emb", init, (self.num_views, vit_dim))
        if exists(self.num_tasks):
            self.task_emb = self.param("task_emb", init, (self.num_tasks, self.dim))

        self.svat_register_tokens = self.param(
            "register_tokens", init, (self.num_register_tokens, self.dim)
        )
        self.action_pos_emb = self.param(
            "action_pos_emb", init, (self.action_chunk_len, self.dim)
        )
        if self.num_advantage_bins > 0:
            self.advantage_emb = nn.Embed(
                self.num_advantage_bins + 1, self.dim, name="advantage_emb"
            )

        films, self_attns, crosses, ffs = [], [], [], []
        for _ in range(self.depth):
            films.append(FiLM(dim=self.dim) if exists(self.num_tasks) else None)
            self_attns.append(
                SigLIPAttention(
                    dim=self.dim,
                    heads=self.self_attn_heads,
                    dim_head=self.self_attn_dim_head,
                    dropout=self.dropout,
                )
                if self.add_self_attn
                else None
            )
            crosses.append(
                SigLIPAttention(
                    dim=self.dim,
                    dim_context=vit_dim,
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    gate_attn=True,
                )
            )
            ffs.append(SigLIPFeedForward(dim=self.dim, dim_inner=self.mlp_dim))
        self.films = films
        self.self_attns = self_attns
        self.crosses = crosses
        self.ffs = ffs

        self.final_norm = nn.LayerNorm(epsilon=1e-5, name="final_norm")
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
        images = jnp.moveaxis(video_or_image, 3, 2)
        images = images.reshape((-1,) + images.shape[3:])

        embed, hiddens = self.vit(images, return_hiddens=True, train=train)
        if freeze_vit:
            embed, hiddens = jax.lax.stop_gradient((embed, hiddens))
        hiddens = jnp.concatenate([hiddens, embed[None]], axis=0)
        hiddens = hiddens[jnp.asarray(self._indices)]

        l, _, n, d = hiddens.shape
        hiddens = hiddens.reshape(l, batch, v, t, n, d)
        if is_video:
            hiddens = hiddens + self.time_pos_emb[None, None, None, :, None, :].astype(hiddens.dtype)
        if self.num_views > 1:
            hiddens = hiddens + self.view_emb[None, None, :, None, None, :].astype(hiddens.dtype)
        context = hiddens.reshape(l, batch, v * t * n, d)

        action_tokens = jnp.broadcast_to(
            self.action_pos_emb, (batch, self.action_chunk_len, self.dim)
        )
        parts, lens = [], []
        parts.append(
            jnp.broadcast_to(
                self.svat_register_tokens,
                (batch, self.num_register_tokens, self.dim),
            )
        )
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
            tokens = self.crosses[i](tokens, context[i], train=train) + tokens
            if exists(self.self_attns[i]):
                tokens = self.self_attns[i](tokens, train=train) + tokens
            tokens = self.ffs[i](tokens) + tokens
            all_hiddens.append(tokens)

        start = lens[0] + lens[1]
        action_out = tokens[:, start : start + self.action_chunk_len]
        pred_action = self.to_pred_action(self.final_norm(action_out))

        if not return_loss:
            if not return_hiddens:
                return pred_action
            return pred_action, jnp.stack(all_hiddens)
        return jnp.mean(jnp.abs(pred_action - actions))
