"""SimMIM — masked image modeling with a linear pixel head (reference
simmim.py:6-87).

NOTE — reference-bug divergence: simmim.py:46 indexes
``pos_embedding[:, 1:n+1]``, written for an old 3-D (1, n+1, d) table; with
the current 2-D table (vit.py:107) that slices the *feature* dim and the
forward crashes (verified).  We implement the intent: positional rows
1..n for cls-pooled encoders, 0..n for mean-pooled (same convention as
mae.py:52-55)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class SimMIM(nn.Module):
    """reference simmim.py:6 — same keyword constructor."""

    encoder: Any
    masking_ratio: float = 0.5

    def setup(self):
        assert 0 < self.masking_ratio < 1, "masking ratio must be kept between 0 and 1"
        from ..utils.helpers import pair

        p1, p2 = pair(self.encoder.patch_size)
        patch_dim = self.encoder.channels * p1 * p2
        self.mask_token = self.param(
            "mask_token", nn.initializers.normal(1.0), (self.encoder.dim,)
        )
        self.to_pixels = nn.Dense(patch_dim, name="to_pixels")

    def __call__(
        self,
        img,
        *,
        masked_indices: Optional[jnp.ndarray] = None,
        train: bool = False,
    ):
        patches = self.encoder.patchify(img)
        batch, num_patches, _ = patches.shape

        if self.encoder.pool == "cls":
            pos_emb = self.encoder.pos_embedding[1 : num_patches + 1]
        else:
            pos_emb = self.encoder.pos_embedding[:num_patches]

        tokens = self.encoder.patch_embedding(patches) + pos_emb
        mask_tokens = self.mask_token[None, None, :] + pos_emb[None]

        num_masked = int(self.masking_ratio * num_patches)
        if masked_indices is None:
            rng = self.make_rng("mask")
            scores = jax.random.uniform(rng, (batch, num_patches))
            masked_indices = jnp.argsort(scores, axis=-1, descending=True)[
                :, :num_masked
            ]

        masked_bool = (
            jnp.zeros((batch, num_patches), bool)
            .at[jnp.arange(batch)[:, None], masked_indices]
            .set(True)
        )

        tokens = jnp.where(
            masked_bool[..., None], mask_tokens.astype(tokens.dtype), tokens
        )

        encoded = self.encoder.transformer(tokens, train=train)

        batch_range = jnp.arange(batch)[:, None]
        encoded_mask_tokens = encoded[batch_range, masked_indices]
        pred_pixel_values = self.to_pixels(encoded_mask_tokens)
        masked_patches = patches[batch_range, masked_indices]

        # L1 / num_masked (simmim.py:86)
        return (
            jnp.mean(jnp.abs(pred_pixel_values - masked_patches)) / num_masked
        )
