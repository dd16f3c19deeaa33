"""NaViT-3D "nested tensor" variant — TPU-packed volumes (reference
na_vit_nested_tensor_3d.py:135-356).

Variable-length *videos* — ``(c, F, H, W)`` with per-video frame counts and
resolutions — are packed into fixed-shape rows with segment ids, the TPU
equivalent of the reference's jagged tensors (see na_vit_nested_tensor.py).
Per-video register tokens are appended at the end of the packed row with the
video's segment id (attention is order-agnostic under block-diagonal
masking, so tail placement is equivalent to the reference's prepend)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence, Union

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..utils.helpers import pair
from .na_vit_nested_tensor import NestedAttention, NestedTransformer


@dataclass
class PackedVolumes:
    patches: jnp.ndarray      # (b, L, patch_dim)
    pos_fhw: jnp.ndarray      # (b, L, 3) int32
    segment_ids: jnp.ndarray  # (b, L), -1 pad
    num_videos: jnp.ndarray   # (b,)
    max_videos: int

    @property
    def is_video(self):
        ar = jnp.arange(self.max_videos)
        return ar[None, :] < self.num_videos[:, None]


def pack_volumes(
    volumes: Sequence,
    patch_size: int,
    frame_patch_size: int,
    *,
    max_seq_len: int = 2048,
    max_videos: Optional[int] = None,
    token_dropout_prob: Optional[float] = None,
    train: bool = False,
    rng: Optional[np.random.Generator] = None,
    dtype=np.float32,
) -> PackedVolumes:
    """Greedy pack of (c, F, H, W) volumes into one fixed row per group."""
    if rng is None:
        rng = np.random.default_rng(0)
    p, pf = patch_size, frame_patch_size

    groups: list[list] = []
    group: list = []
    seq = 0
    for vol in volumes:
        v = np.asarray(vol)
        c, F, H, W = v.shape
        assert F % pf == 0 and H % p == 0 and W % p == 0
        n = (F // pf) * (H // p) * (W // p)
        if token_dropout_prob and train:
            n = int(n * (1 - token_dropout_prob))
        assert n <= max_seq_len
        if seq + n > max_seq_len:
            groups.append(group)
            group, seq = [], 0
        group.append(v)
        seq += n
    if group:
        groups.append(group)

    b = len(groups)
    patch_dim = None
    rows, poss, segs, counts = [], [], [], []
    for vids in groups:
        seq_list, pos_list, seg_list = [], [], []
        for idx, v in enumerate(vids):
            c, F, H, W = v.shape
            f, h, w = F // pf, H // p, W // p
            patches = (
                v.reshape(c, f, pf, h, p, w, p)
                .transpose(1, 3, 5, 0, 2, 4, 6)
                .reshape(f * h * w, c * pf * p * p)
            )
            ff, hh, ww = np.meshgrid(
                np.arange(f), np.arange(h), np.arange(w), indexing="ij"
            )
            pos = np.stack([ff.ravel(), hh.ravel(), ww.ravel()], axis=-1)
            if token_dropout_prob and train:
                keep = rng.permutation(patches.shape[0])[
                    : max(1, int(patches.shape[0] * (1 - token_dropout_prob)))
                ]
                patches, pos = patches[keep], pos[keep]
            seq_list.append(patches)
            pos_list.append(pos)
            seg_list.append(np.full(patches.shape[0], idx, np.int32))
            patch_dim = patches.shape[-1]
        rows.append(np.concatenate(seq_list))
        poss.append(np.concatenate(pos_list))
        segs.append(np.concatenate(seg_list))
        counts.append(len(vids))

    nq = max_videos if max_videos is not None else max(counts)
    L = max_seq_len
    patches_out = np.zeros((b, L, patch_dim), dtype=dtype)
    pos_out = np.zeros((b, L, 3), np.int32)
    seg_out = np.full((b, L), -1, np.int32)
    n_out = np.zeros((b,), np.int32)
    for i in range(b):
        n = rows[i].shape[0]
        patches_out[i, :n] = rows[i]
        pos_out[i, :n] = poss[i]
        seg_out[i, :n] = segs[i]
        n_out[i] = counts[i]

    return PackedVolumes(
        patches=jnp.asarray(patches_out),
        pos_fhw=jnp.asarray(pos_out),
        segment_ids=jnp.asarray(seg_out),
        num_videos=jnp.asarray(n_out),
        max_videos=int(nq),
    )


class NaViT(nn.Module):
    """reference na_vit_nested_tensor_3d.py:135 — same keyword constructor."""

    image_size: int | tuple
    max_frames: int
    patch_size: int
    frame_patch_size: int
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    num_registers: int = 4
    qk_rmsnorm: bool = True
    token_dropout_prob: Optional[float] = None

    def setup(self):
        image_height, image_width = pair(self.image_size)
        assert image_height % self.patch_size == 0 and image_width % self.patch_size == 0
        assert self.max_frames % self.frame_patch_size == 0

        self.patch_norm_pre = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_pre")
        self.patch_proj = nn.Dense(self.dim, name="patch_proj")
        self.patch_norm_post = nn.LayerNorm(epsilon=LN_EPS, name="patch_norm_post")

        init = nn.initializers.normal(0.02)
        self.pos_embed_frame = self.param(
            "pos_embed_frame", init, (self.max_frames // self.frame_patch_size, self.dim)
        )
        self.pos_embed_height = self.param(
            "pos_embed_height", init, (image_height // self.patch_size, self.dim)
        )
        self.pos_embed_width = self.param(
            "pos_embed_width", init, (image_width // self.patch_size, self.dim)
        )
        self.register_tokens = self.param(
            "register_tokens", init, (self.num_registers, self.dim)
        )

        self.emb_drop = nn.Dropout(self.emb_dropout)
        # same Transformer as the 2-D nested-tensor variant (reference
        # na_vit_nested_tensor_3d.py:44-133 is line-identical to
        # na_vit_nested_tensor.py:43-132): split bias-free q/k/v, qk-norm as
        # a bias-free LayerNorm over dim_head (NOT na_vit.py's per-head
        # RMSNorm — it subtracts the mean), default 1/sqrt(d) scale
        self.transformer = NestedTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            qk_norm=self.qk_rmsnorm,
        )
        self.attn_pool_queries = self.param(
            "attn_pool_queries", nn.initializers.normal(1.0), (self.dim,)
        )
        # reference :207: attn_pool keeps the default qk_norm=True
        # regardless of the transformer's qk_rmsnorm flag
        self.attn_pool = NestedAttention(
            dim=self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            name="attn_pool",
        )
        self.head_norm = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="head_norm")
        self.mlp_head = nn.Dense(self.num_classes, use_bias=False, name="mlp_head")

    def __call__(self, packed: PackedVolumes, *, train: bool = False):
        x = self.patch_norm_post(self.patch_proj(self.patch_norm_pre(packed.patches)))

        f_idx = packed.pos_fhw[..., 0]
        h_idx = packed.pos_fhw[..., 1]
        w_idx = packed.pos_fhw[..., 2]
        x = x + (
            self.pos_embed_frame[f_idx]
            + self.pos_embed_height[h_idx]
            + self.pos_embed_width[w_idx]
        ).astype(x.dtype)

        b = x.shape[0]
        nv, R = packed.max_videos, self.num_registers

        # per-video registers appended with the video's segment id
        regs = jnp.broadcast_to(
            self.register_tokens[None, None], (b, nv, R, self.dim)
        ).reshape(b, nv * R, self.dim).astype(x.dtype)
        reg_seg = jnp.repeat(jnp.arange(nv, dtype=jnp.int32), R)[None]
        reg_seg = jnp.broadcast_to(reg_seg, (b, nv * R))
        reg_valid = jnp.repeat(packed.is_video, R, axis=1)
        reg_seg = jnp.where(reg_valid, reg_seg, -1)

        tokens = jnp.concatenate([x, regs], axis=1)
        segs = jnp.concatenate([packed.segment_ids, reg_seg], axis=1)

        tokens = self.emb_drop(tokens, deterministic=not train)
        tokens = self.transformer(
            tokens, q_segment_ids=segs, kv_segment_ids=segs, train=train
        )

        queries = jnp.broadcast_to(
            self.attn_pool_queries, (b, nv, self.dim)
        ).astype(tokens.dtype)
        q_seg = jnp.broadcast_to(jnp.arange(nv, dtype=jnp.int32), (b, nv))
        q_seg = jnp.where(packed.is_video, q_seg, -2)

        pooled = self.attn_pool(
            queries, context=tokens, q_segment_ids=q_seg, kv_segment_ids=segs
        )

        return self.mlp_head(self.head_norm(pooled))
