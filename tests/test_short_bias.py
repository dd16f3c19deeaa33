"""Per-head-bias short-attention kernel (windowed attention path).

MaxViT/LeViT-style windowed attention adds a learned rel-pos table —
shape (h, n, m), shared by every window in the batch (reference
max_vit.py:150-189).  These tests check the short kernel's bias path
(forward and the XLA-remat backward, incl. dbias) in interpret mode, and
that MaxViT's WindowAttention routes through the dispatcher identically
on both backends.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu.ops.attention import dot_product_attention, xla_attention
from vit_pytorch_tpu.ops.short_attention import short_attention

_RNG = np.random.default_rng(0)


def _qkvb(b, h, n, m, d):
    q = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(_RNG.normal(size=(b, h, m, d)), jnp.float32)
    v = jnp.asarray(_RNG.normal(size=(b, h, m, d)), jnp.float32)
    bias = jnp.asarray(_RNG.normal(size=(h, n, m)), jnp.float32)
    return q, k, v, bias


@pytest.mark.parametrize(
    "b,h,n,m,d,group",
    [
        (6, 4, 49, 49, 32, 8),   # MaxViT window shape (group > h → shrinks)
        (2, 3, 49, 49, 32, 8),   # h not a power of two → group falls to 1
        (1, 8, 65, 130, 64, 4),  # rectangular n≠m (LeViT downsampling)
    ],
)
def test_short_bias_forward(b, h, n, m, d, group):
    q, k, v, bias = _qkvb(b, h, n, m, d)
    got = short_attention(q, k, v, bias=bias, group=group, interpret=True)
    want = xla_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_short_bias_dv_neq_dk():
    """LeViT shapes: dim_key=32, dim_value=64 (reference levit.py:41)."""
    b, h, n, m, dk, dv = 2, 4, 49, 49, 32, 64
    q = jnp.asarray(_RNG.normal(size=(b, h, n, dk)), jnp.float32)
    k = jnp.asarray(_RNG.normal(size=(b, h, m, dk)), jnp.float32)
    v = jnp.asarray(_RNG.normal(size=(b, h, m, dv)), jnp.float32)
    bias = jnp.asarray(_RNG.normal(size=(h, n, m)), jnp.float32)
    got = short_attention(q, k, v, bias=bias, interpret=True)
    want = xla_attention(q, k, v, bias=bias)
    assert got.shape == (b, h, n, dv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # no-bias path too
    got = short_attention(q, k, v, interpret=True)
    want = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_short_bias_grads_including_dbias():
    q, k, v, bias = _qkvb(2, 4, 49, 49, 32)
    w = jnp.asarray(_RNG.normal(size=q.shape), jnp.float32)

    def loss_kernel(q, k, v, bias):
        return jnp.sum(short_attention(q, k, v, bias=bias, interpret=True) * w)

    def loss_ref(q, k, v, bias):
        return jnp.sum(xla_attention(q, k, v, bias=bias) * w)

    got = jax.grad(loss_kernel, (0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, (0, 1, 2, 3))(q, k, v, bias)
    assert got[3].shape == bias.shape  # dbias reduced over batch
    for g, e in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(e), atol=2e-4, rtol=1e-3)


def test_short_bias_shape_validation():
    q, k, v, bias = _qkvb(1, 2, 16, 16, 8)
    with pytest.raises(ValueError):
        short_attention(q, k, v, bias=bias[:1], interpret=True)


def test_dispatcher_routes_per_head_bias():
    """Explicit use_flash=True sends (h, n, m)-bias shapes to the short
    kernel (the auto-route keeps XLA — measured final, PERF_NOTES round 5);
    the result must match the default XLA route in f32 softmax terms."""
    q, k, v, bias = _qkvb(2, 4, 49, 49, 32)
    base = dot_product_attention(q, k, v, bias=bias)

    routed = dot_product_attention(q, k, v, bias=bias, use_flash=True)
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base), atol=2e-5)

    # batch-varying bias stays on XLA even when opted in (no kernel support)
    bias4 = jnp.broadcast_to(bias, (2, 4, 49, 49))
    got = dot_product_attention(q, k, v, bias=bias4, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=2e-5)


def test_per_head_bias_flash_fallthrough():
    """A per-head (h, n, m) bias that passes kernel_ok but misses the short
    path (here: causal) must reach the flash kernel as an expanded
    (1, h, n, m) bias instead of raising (advisor round-4 medium)."""
    b, h, n, d = 1, 2, 128, 32
    q = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)
    k = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)
    v = jnp.asarray(_RNG.normal(size=(b, h, n, d)), jnp.float32)
    bias = jnp.asarray(_RNG.normal(size=(h, n, n)), jnp.float32)

    got = dot_product_attention(q, k, v, bias=bias, causal=True, use_flash=True)
    want = dot_product_attention(q, k, v, bias=bias, causal=True, use_flash=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_maxvit_window_attention_same_on_both_routes(monkeypatch):
    from vit_pytorch_tpu.models.max_vit import WindowAttention

    x = jnp.asarray(_RNG.normal(size=(2, 2, 2, 7, 7, 64)), jnp.float32)
    m = WindowAttention(dim=64, dim_head=32, window_size=7)
    params = m.init(jax.random.PRNGKey(0), x)

    base = m.apply(params, x)
    # the auto-route keeps XLA for windowed shapes (measured final); force
    # the kernel route via explicit use_flash to exercise it end-to-end
    from vit_pytorch_tpu.ops import attention as attn_mod

    calls = {}
    orig = attn_mod.dot_product_attention

    def spy(*a, **kw):
        calls["bias_ndim"] = kw.get("bias").ndim if kw.get("bias") is not None else None
        kw["use_flash"] = True
        return orig(*a, **kw)

    monkeypatch.setattr("vit_pytorch_tpu.models.max_vit.dot_product_attention", spy)
    routed = m.apply(params, x)
    assert calls["bias_ndim"] == 3  # per-head table reached the dispatcher
    np.testing.assert_allclose(np.asarray(routed), np.asarray(base), atol=2e-5)
