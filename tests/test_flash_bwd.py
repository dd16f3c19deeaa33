"""Gradient parity of the Pallas flash backward vs the XLA reference.

The backward kernels (flash_attention.py) recompute p = exp(s - lse) per
tile; these tests check dq/dk/dv against jax.grad through plain XLA
attention, in interpret mode (CPU), covering uneven lengths, causal,
segment ids (NaViT packing) and the bias fallback path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu.ops.flash_attention import flash_attention, _reference_attention

_RNG = np.random.default_rng(0)


def _grads(b, h, n, m, d, *, causal=False, segs=False, bias=False, block=128):
    q = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(_RNG.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(_RNG.normal(size=(b, h, m, d)), jnp.float32)
    qs = ks = None
    if segs:
        qs = jnp.asarray(_RNG.integers(-1, 3, size=(b, n)), jnp.int32)
        ks = jnp.asarray(_RNG.integers(-1, 3, size=(b, m)), jnp.int32)
    bi = jnp.asarray(_RNG.normal(size=(1, h, n, m)), jnp.float32) if bias else None
    scale = d**-0.5
    w = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(
            q, k, v, scale=scale, bias=bi, q_segment_ids=qs, kv_segment_ids=ks,
            causal=causal, block_q=block, block_k=block, interpret=True,
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(_reference_attention(q, k, v, bi, qs, ks, scale, causal) * w)

    return (
        jax.grad(loss_flash, (0, 1, 2))(q, k, v),
        jax.grad(loss_ref, (0, 1, 2))(q, k, v),
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(b=1, h=2, n=256, m=256, d=32),
        dict(b=1, h=2, n=200, m=264, d=32),
        dict(b=1, h=2, n=256, m=256, d=32, causal=True),
        dict(b=2, h=2, n=200, m=264, d=32, segs=True),
        dict(b=1, h=2, n=128, m=128, d=32, bias=True),
    ],
    ids=["plain", "uneven", "causal", "segments", "bias-fallback"],
)
def test_flash_backward_matches_xla(kw):
    got, want = _grads(**kw)
    for g, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=2e-4, rtol=1e-3)


def test_short_attention_vmem_fallback():
    """Shapes whose single-slice working set exceeds the short kernel's VMEM
    budget must fall back to the XLA composite instead of emitting a kernel
    Mosaic can't compile (n=m=1024, d=256: logits alone are 4 MB fp32 and
    the grouped q/k/v blocks blow the 12 MB budget at any group>1)."""
    import numpy as np

    from vit_pytorch_tpu.ops.attention import xla_attention
    from vit_pytorch_tpu.ops.short_attention import _vmem_bytes, short_attention

    assert _vmem_bytes(8, 1024, 1024, 256, 2) > 12 * 1024 * 1024

    q = jnp.asarray(_RNG.normal(size=(1, 2, 1024, 256)), jnp.float32) * 0.1
    k = jnp.asarray(_RNG.normal(size=(1, 2, 1024, 256)), jnp.float32) * 0.1
    v = jnp.asarray(_RNG.normal(size=(1, 2, 1024, 256)), jnp.float32) * 0.1
    got = short_attention(q, k, v)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_default_blocks_adaptive():
    """Block-size policy (PERF_NOTES round 5): env override wins; 1024 when
    it divides the sequence (measured +9.3% at 2048-token packs), else 512."""
    from vit_pytorch_tpu.ops.flash_attention import default_blocks

    assert default_blocks(2048, 2048) == (1024, 1024)
    assert default_blocks(1024, 4096) == (1024, 1024)
    assert default_blocks(197, 197) == (512, 512)
    assert default_blocks(1536, 2048) == (512, 1024)
