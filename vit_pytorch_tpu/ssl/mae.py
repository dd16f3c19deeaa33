"""MAE — masked autoencoder pretraining wrapper (reference mae.py:8-104).

JAX redesign notes (SURVEY §3.3):
  - ``torch.rand().argsort()`` on implicit global RNG → explicit
    ``jax.random.permutation`` via the 'mask' RNG collection (or a caller-
    provided permutation for deterministic tests).
  - index-assignment scatter (mae.py:91-93) → ``.at[...].set``.
  - instead of reaching into ``encoder.to_patch_embedding[i]`` (mae.py:28-31),
    the encoder protocol supplies ``patchify`` / ``patch_embedding`` /
    ``pos_embedding`` / ``transformer`` / ``pool``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Transformer


class MAE(nn.Module):
    """reference mae.py:8 — same keyword constructor (encoder is a module)."""

    encoder: Any
    decoder_dim: int
    masking_ratio: float = 0.75
    decoder_depth: int = 1
    decoder_heads: int = 8
    decoder_dim_head: int = 64

    def setup(self):
        assert 0 < self.masking_ratio < 1, "masking ratio must be kept between 0 and 1"
        self.enc_dim = self.encoder.dim
        self.enc_to_dec = (
            nn.Dense(self.decoder_dim, name="enc_to_dec")
            if self.enc_dim != self.decoder_dim
            else None
        )
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (self.decoder_dim,)
        )
        self.decoder = Transformer(
            dim=self.decoder_dim,
            depth=self.decoder_depth,
            heads=self.decoder_heads,
            dim_head=self.decoder_dim_head,
            mlp_dim=self.decoder_dim * 4,
        )
        from ..utils.helpers import pair

        p1, p2 = pair(self.encoder.patch_size)
        num_patches_total = 1
        for s, p in zip(pair(self.encoder.image_size), (p1, p2)):
            num_patches_total *= s // p
        self.decoder_pos_emb = nn.Embed(
            num_patches_total, self.decoder_dim, name="decoder_pos_emb"
        )
        # pixel_values_per_patch (mae.py:31)
        patch_dim = self.encoder.channels * p1 * p2
        self.to_pixels = nn.Dense(patch_dim, name="to_pixels")

    def __call__(
        self,
        img,
        *,
        rand_indices: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        patches = self.encoder.patchify(img)
        batch, num_patches, patch_dim = patches.shape

        tokens = self.encoder.patch_embedding(patches)
        # pos emb offset: cls models skip index 0 (mae.py:52-55)
        if self.encoder.pool == "cls":
            tokens = tokens + self.encoder.pos_embedding[1 : num_patches + 1]
        else:
            tokens = tokens + self.encoder.pos_embedding[:num_patches]

        num_masked = int(self.masking_ratio * num_patches)
        if rand_indices is None:
            rng = self.make_rng("mask")
            rand_indices = jnp.argsort(
                jax.random.uniform(rng, (batch, num_patches)), axis=-1
            )
        masked_indices = rand_indices[:, :num_masked]
        unmasked_indices = rand_indices[:, num_masked:]

        batch_range = jnp.arange(batch)[:, None]
        tokens = tokens[batch_range, unmasked_indices]
        masked_patches = patches[batch_range, masked_indices]

        encoded_tokens = self.encoder.transformer(tokens, train=train)

        decoder_tokens = (
            self.enc_to_dec(encoded_tokens)
            if self.enc_to_dec is not None
            else encoded_tokens
        )

        unmasked_decoder_tokens = decoder_tokens + self.decoder_pos_emb(
            unmasked_indices
        )
        mask_tokens = (
            jnp.broadcast_to(
                self.mask_token, (batch, num_masked, self.decoder_dim)
            )
            + self.decoder_pos_emb(masked_indices)
        )

        # scatter into full-length buffer (mae.py:91-93 → .at[].set)
        full = jnp.zeros(
            (batch, num_patches, self.decoder_dim), decoder_tokens.dtype
        )
        full = full.at[batch_range, unmasked_indices].set(unmasked_decoder_tokens)
        full = full.at[batch_range, masked_indices].set(mask_tokens)

        decoded_tokens = self.decoder(full, train=train)

        pred_pixel_values = self.to_pixels(
            decoded_tokens[batch_range, masked_indices]
        )

        return jnp.mean(jnp.square(pred_pixel_values - masked_patches))
