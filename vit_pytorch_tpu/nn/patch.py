"""Patch-embedding blocks (reference §2.6 motif 1).

The canonical form is
``Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)') → LN → Linear → LN``
(reference vit.py:99-104).  The rearrange is pure data movement; XLA folds it
into the following matmul's operand layout, which is exactly the fused
patchify+embed the MXU wants.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

LN_EPS = 1e-5


def patchify_2d(img: jnp.ndarray, p1: int, p2: int) -> jnp.ndarray:
    """(b, c, h·p1, w·p2) → (b, h·w, p1·p2·c) — channel-last patch flattening
    matching the reference's einops pattern (vit.py:100)."""
    return rearrange(img, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=p1, p2=p2)


def unpatchify_2d(x: jnp.ndarray, h: int, w: int, p1: int, p2: int, c: int) -> jnp.ndarray:
    return rearrange(
        x, "b (h w) (p1 p2 c) -> b c (h p1) (w p2)", h=h, w=w, p1=p1, p2=p2, c=c
    )


def patchify_3d(video: jnp.ndarray, pf: int, p1: int, p2: int) -> jnp.ndarray:
    """(b, c, f·pf, h·p1, w·p2) → (b, f·h·w, pf·p1·p2·c) (reference vit_3d.py:95-101)."""
    return rearrange(
        video,
        "b c (f pf) (h p1) (w p2) -> b (f h w) (pf p1 p2 c)",
        pf=pf,
        p1=p1,
        p2=p2,
    )


def patchify_1d(series: jnp.ndarray, p: int) -> jnp.ndarray:
    """(b, c, n·p) → (b, n, p·c) (reference vit_1d.py:81)."""
    return rearrange(series, "b c (n p) -> b n (p c)", p=p)


class PatchEmbedding(nn.Module):
    """LN → Linear → LN patch embedding (reference vit.py:99-104).

    Input is already-patchified tokens (b, n, patch_dim).  Keeping patchify
    outside the module lets MAE/SimMIM reuse the embed on raw patches
    (reference mae.py:28-31 slices ``to_patch_embedding[0]`` vs ``[1:]``).
    """

    dim: int
    norm_input: bool = True
    norm_output: bool = True

    @nn.compact
    def __call__(self, patches):
        x = patches
        if self.norm_input:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm_pre")(x)
        x = nn.Dense(self.dim, name="proj")(x)
        if self.norm_output:
            x = nn.LayerNorm(epsilon=LN_EPS, name="norm_post")(x)
        return x
