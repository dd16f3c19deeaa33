"""SimpleViT + FFT token stream (reference simple_vit_with_fft.py:81-146):
a parallel token stream from the real/imag parts of fft2(img), packed before
the image tokens; pooling uses only the image tokens."""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from ..nn.blocks import LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair
from .simple_vit import SimpleTransformer


class SimpleViT(nn.Module):
    """reference simple_vit_with_fft.py:81 — same keyword constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    freq_patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    channels: int = 3
    dim_head: int = 64

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        fph, fpw = pair(self.freq_patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        assert image_height % fph == 0 and image_width % fpw == 0

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )

        # fft over the last two (spatial) dims, stacked real/imag (line 130)
        freqs = jnp.fft.fft2(img)
        freqs = jnp.stack([freqs.real, freqs.imag], axis=-1)  # b c h w ri
        fpatches = rearrange(
            freqs,
            "b c (h p1) (w p2) ri -> b (h w) (p1 p2 ri c)",
            p1=fph,
            p2=fpw,
        )
        f = PatchEmbedding(dim=self.dim, name="freq_embedding")(fpatches)

        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )
        f = f + posemb_sincos_2d(
            image_height // fph, image_width // fpw, self.dim, dtype=f.dtype
        )

        n_freq = f.shape[1]
        tokens = jnp.concatenate([f, x], axis=1)

        tokens = SimpleTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            name="transformer",
        )(tokens, train=train)

        x = tokens[:, n_freq:]  # unpack: image tokens only (line 142)
        return nn.Dense(self.num_classes, name="linear_head")(x.mean(axis=1))
