"""MPP — masked patch prediction, BERT-style pretraining (reference
mpp.py:79-175).

Predicts the discretized mean color of masked patches (2^bits bins per
channel, mpp.py:52-73).  Mask / random-replace / keep probabilities follow
mpp.py:128-154 with explicit jax RNG.  CE over masked positions is computed
as a mask-weighted mean (jit-static shapes instead of boolean gather).

NOTE — the reference reaches into ``transformer.to_patch_embedding[1:]``,
``.cls_token`` (expects an old (1,1,d) shape) and ``.pos_embedding[:, :n+1]``
(old 3-D table) — with today's vit.py shapes those crash; we use the encoder
protocol with the same math."""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import exists


def get_mask_subset_with_prob(rng, batch: int, seq_len: int, prob: float):
    """reference mpp.py:18-27 — topk of uniform noise, ceil(prob·n) masked."""
    max_masked = math.ceil(prob * seq_len)
    rand = jax.random.uniform(rng, (batch, seq_len))
    sampled = jnp.argsort(rand, axis=-1, descending=True)[:, :max_masked]
    return (
        jnp.zeros((batch, seq_len), bool)
        .at[jnp.arange(batch)[:, None], sampled]
        .set(True)
    )


class MPP(nn.Module):
    """reference mpp.py:79 — same constructor (positional ``transformer``)."""

    transformer: Any
    patch_size: int
    dim: int
    output_channel_bits: int = 3
    channels: int = 3
    max_pixel_val: float = 1.0
    mask_prob: float = 0.15
    replace_prob: float = 0.5
    random_patch_prob: float = 0.5
    mean: Optional[Sequence[float]] = None
    std: Optional[Sequence[float]] = None

    def setup(self):
        self.to_bits = nn.Dense(
            2 ** (self.output_channel_bits * self.channels), name="to_bits"
        )
        self.mask_token = self.param(
            "mask_token",
            nn.initializers.normal(1.0),
            (1, 1, self.channels * self.patch_size**2),
        )

    def _loss(self, logits, target_img, mask):
        """reference MPPLoss (mpp.py:33-73)."""
        p, c = self.patch_size, self.channels
        mpv, bits = self.max_pixel_val, self.output_channel_bits
        bin_size = mpv / (2**bits)

        target = target_img
        if exists(self.mean) and exists(self.std):
            mean = jnp.asarray(self.mean).reshape(-1, 1, 1)
            std = jnp.asarray(self.std).reshape(-1, 1, 1)
            target = target * std + mean

        target = jnp.clip(target, a_max=mpv)
        b, _, H, W = target.shape
        avg_target = target.reshape(
            b, c, H // p, p, W // p, p
        ).mean(axis=(3, 5))  # (b, c, h, w)
        avg_target = avg_target.transpose(0, 2, 3, 1).reshape(b, -1, c)

        channel_bins = jnp.arange(bin_size, mpv, bin_size)
        discretized = jnp.searchsorted(channel_bins, avg_target, side="left")

        bin_mask = (2**bits) ** jnp.arange(c)
        target_label = jnp.sum(bin_mask[None, None, :] * discretized, axis=-1)

        logprobs = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logprobs, target_label[..., None], axis=-1)[..., 0]
        return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1)

    def __call__(self, img, *, train: bool = False, masked_positions=None):
        """``masked_positions``: optional (b, n) bool mask overriding the
        random draw — deterministic parity testing (same pattern as MP3's
        injected ``rand_indices``)."""
        p = self.patch_size
        enc = self.transformer

        patches = enc.patchify(img)
        batch, n, _ = patches.shape

        rng = self.make_rng("mask")
        r_mask, r_rand, r_randidx, r_repl = jax.random.split(rng, 4)

        if masked_positions is not None:
            mask = masked_positions
        else:
            mask = get_mask_subset_with_prob(r_mask, batch, n, self.mask_prob)

        masked_input = patches
        if self.random_patch_prob > 0:
            random_patch_sampling_prob = self.random_patch_prob / (
                1 - self.replace_prob
            )
            random_patch_prob = (
                jax.random.uniform(r_rand, (batch, n)) < random_patch_sampling_prob
            )
            bool_random = mask & random_patch_prob
            random_patches = jax.random.randint(r_randidx, (batch, n), 0, n)
            randomized = masked_input[jnp.arange(batch)[:, None], random_patches]
            masked_input = jnp.where(
                bool_random[..., None], randomized, masked_input
            )

        replace_prob = jax.random.uniform(r_repl, (batch, n)) < self.replace_prob
        bool_mask_replace = mask & replace_prob
        masked_input = jnp.where(
            bool_mask_replace[..., None],
            self.mask_token.astype(masked_input.dtype),
            masked_input,
        )

        tokens = enc.patch_embedding(masked_input)

        cls = jnp.broadcast_to(
            enc.cls_token, (batch, enc.num_cls_tokens, self.dim)
        ).astype(tokens.dtype)
        tokens = jnp.concatenate([cls, tokens], axis=1)
        tokens = tokens + enc.pos_embedding[: tokens.shape[1]].astype(tokens.dtype)
        tokens = enc.emb_drop(tokens, deterministic=not train)

        out = enc.transformer(tokens, train=train)
        logits = self.to_bits(out)[:, enc.num_cls_tokens :, :]

        return self._loss(logits, img, mask)
