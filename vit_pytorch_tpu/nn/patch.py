"""Patch-embedding blocks (reference §2.6 motif 1).

The canonical form is
``Rearrange('b c (h p1) (w p2) -> b (h w) (p1 p2 c)') → LN → Linear → LN``
(reference vit.py:99-104).  The rearrange is pure data movement; XLA folds it
into the following matmul's operand layout, which is exactly the fused
patchify+embed the MXU wants.
"""

from __future__ import annotations

import os

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


def unfold_2d(x: jnp.ndarray, kernel_size: int, stride: int, padding: int) -> jnp.ndarray:
    """torch ``nn.Unfold`` equivalent: (b, c, h, w) → (b, L, c·k·k) with the
    channel-slowest ordering torch uses (t2t.py:43, pit.py:140-144).

    Implemented with ``lax.conv_general_dilated_patches`` — lowers to an XLA
    gather/conv the TPU handles natively.
    """
    import jax

    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kernel_size, kernel_size),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )  # (b, c*k*k, oh, ow), feature dim ordered (c, kh, kw) slowest-first
    b, ckk, oh, ow = patches.shape
    return patches.reshape(b, ckk, oh * ow).transpose(0, 2, 1)


class PatchDropout(nn.Module):
    """Keep a random static-size subset of tokens at train time
    (reference simple_vit_with_patch_dropout.py:27-44: topk over randn).

    Static shapes under jit: ``num_keep`` is computed from the static token
    count, so the output shape is fixed.
    """

    prob: float

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert 0 <= self.prob < 1.0
        if not train or self.prob == 0.0:
            return x
        import jax

        b, n, _ = x.shape
        num_keep = max(1, int(n * (1 - self.prob)))
        rng = self.make_rng("dropout")
        scores = jax.random.normal(rng, (b, n))
        idx = jnp.argsort(scores, axis=-1, descending=True)[:, :num_keep]
        return jnp.take_along_axis(x, idx[..., None], axis=1)


class PatchEmbedding(nn.Module):
    """LN → Linear → LN patch embedding (reference vit.py:99-104).

    Input is already-patchified tokens (b, n, patch_dim).  Keeping patchify
    outside the module lets MAE/SimMIM reuse the embed on raw patches
    (reference mae.py:28-31 slices ``to_patch_embedding[0]`` vs ``[1:]``).
    """

    dim: int
    norm_input: bool = True
    norm_output: bool = True
    norm_bias: bool = True

    @nn.compact
    def __call__(self, patches):
        x = patches
        # bf16 inputs: XLA hoists the pre-LN f32 convert ABOVE the patchify
        # rearrange, doubling the copy bytes (profiled ~0.5 ms/step on
        # ViT-B bs=128, docs/PERF_NOTES.md round 4).  The barrier pins the
        # convert after the copies; LN statistics still run in f32.
        # Opt-in until A/B'd on hardware.
        if (
            x.dtype == jnp.bfloat16
            and self.norm_input  # without the pre-LN there is no hoisted
            # f32 convert to pin — the barrier would only inhibit fusion
            and os.environ.get("VIT_TPU_BF16_PATCHIFY", "0") == "1"
        ):
            import jax

            x = jax.lax.optimization_barrier(x)
        if self.norm_input:
            x = nn.LayerNorm(
                epsilon=LN_EPS, use_bias=self.norm_bias, name="norm_pre"
            )(x)
        x = nn.Dense(self.dim, name="proj")(x)
        if self.norm_output:
            x = nn.LayerNorm(
                epsilon=LN_EPS, use_bias=self.norm_bias, name="norm_post"
            )(x)
        return x
