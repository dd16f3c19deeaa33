"""Kernel-vs-XLA equivalence for the fused attention-block Pallas kernel
(ops/fused_block.py) — run in interpreter mode on CPU (SURVEY §4:
kernel-vs-XLA-reference tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_pytorch_tpu.ops.fused_block import (
    _xla_reference,
    fused_attention_block,
)

B, H, N, D = 2, 4, 23, 16
DIM = H * D


def _inputs(dtype, qkv_bias=True, out_bias=True):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (B, N, DIM), dtype)
    res = jax.random.normal(ks[1], (B, N, DIM), dtype)
    w_qkv = jax.random.normal(ks[2], (DIM, 3 * DIM), dtype) * 0.05
    b_qkv = jax.random.normal(ks[3], (3 * DIM,), dtype) * 0.05 if qkv_bias else None
    w_out = jax.random.normal(ks[4], (DIM, DIM), dtype) * 0.05
    b_out = jax.random.normal(ks[5], (DIM,), dtype) * 0.05 if out_bias else None
    lns = 1.0 + 0.1 * jax.random.normal(ks[6], (DIM,), dtype)
    lnb = 0.1 * jax.random.normal(ks[7], (DIM,), dtype)
    return x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb


@pytest.mark.parametrize("qkv_bias,out_bias", [(True, True), (False, True), (False, False)])
def test_fused_block_matches_xla_reference(qkv_bias, out_bias):
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb = _inputs(
        jnp.float32, qkv_bias, out_bias
    )
    kw = dict(heads=H, dim_head=D)
    want = _xla_reference(
        x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, scale=D**-0.5, eps=1e-5, **kw
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_block_no_residual():
    """residual=None: the kernel takes no res operand (no zeros streamed)
    and returns the bare block output; grads must still match."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb = _inputs(jnp.float32)
    kw = dict(heads=H, dim_head=D)
    want = _xla_reference(
        x, None, w_qkv, b_qkv, w_out, b_out, lns, lnb, scale=D**-0.5, eps=1e-5, **kw
    )
    got = fused_attention_block(
        x, None, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    g_fused = jax.grad(
        lambda x: jnp.sum(
            fused_attention_block(
                x, None, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
                interpret=True, **kw
            )
            ** 2
        )
    )(x)
    g_ref = jax.grad(
        lambda x: jnp.sum(
            _xla_reference(
                x, None, w_qkv, b_qkv, w_out, b_out, lns, lnb,
                scale=D**-0.5, eps=1e-5, **kw
            )
            ** 2
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=5e-4, rtol=1e-3)


def test_fused_block_odd_batch():
    """b=3 forces imgs_per_step=1 — both grid layouts must match the XLA
    composite."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb = _inputs(jnp.float32)
    x = jnp.concatenate([x, x[:1] * 0.7], axis=0)
    res = jnp.concatenate([res, res[:1] * 0.7], axis=0)
    kw = dict(heads=H, dim_head=D)
    want = _xla_reference(
        x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, scale=D**-0.5, eps=1e-5, **kw
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        interpret=True, **kw
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_fused_block_grad_matches_reference():
    """custom_vjp backward is the vjp of the XLA composite — grads must agree
    with differentiating the composite directly."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb = _inputs(jnp.float32)
    kw = dict(heads=H, dim_head=D)

    def loss_fused(x, w_qkv, w_out, lns, lnb):
        out = fused_attention_block(
            x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
            interpret=True, **kw
        )
        return jnp.sum(out**2)

    def loss_ref(x, w_qkv, w_out, lns, lnb):
        out = _xla_reference(
            x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb,
            scale=D**-0.5, eps=1e-5, **kw
        )
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, lns, lnb)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w_qkv, w_out, lns, lnb)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3)


def test_bwd_vmem_fallback(monkeypatch):
    """When the Pallas backward's working set exceeds the VMEM budget,
    _fused_bwd differentiates the XLA composite instead — grads must be
    identical to the composite's (and the fused FORWARD stays available)."""
    import vit_pytorch_tpu.ops.fused_block as fb

    monkeypatch.setattr(fb, "_VMEM_LIMIT_BWD", 0)  # force the fallback
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb = _inputs(jnp.float32)
    kw = dict(heads=H, dim_head=D)

    def loss_fused(x, w_qkv, w_out):
        out = fused_attention_block(
            x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
            interpret=True, **kw
        )
        return jnp.sum(out**2)

    def loss_ref(x, w_qkv, w_out):
        out = _xla_reference(
            x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb,
            scale=D**-0.5, eps=1e-5, **kw
        )
        return jnp.sum(out**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w_qkv, w_out)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w_qkv, w_out)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


def test_attention_module_residual_kwarg():
    """Attention(residual=x) equals Attention(x) + x on the module path."""
    from vit_pytorch_tpu.nn.blocks import Attention

    attn = Attention(dim=DIM, heads=H, dim_head=D)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    params = attn.init(jax.random.PRNGKey(0), x)
    plain = attn.apply(params, x) + x
    folded = attn.apply(params, x, residual=x)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(plain), atol=1e-6)


def test_fused_block_vitl_width():
    """dim=1024 / heads=16 — the ViT-L width newly admitted by the 16 MB
    attention-block gate (PERF_NOTES round 5: +22.8% over pure XLA on
    hardware).  Tiny n keeps the interpret run fast; the gate itself is
    shape-exact at n=197 (see test below)."""
    from vit_pytorch_tpu.ops.fused_block import fused_block_supported

    h, d = 16, 64
    dim = h * d
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (1, 9, dim), jnp.float32)
    res = jax.random.normal(ks[1], (1, 9, dim), jnp.float32)
    w_qkv = jax.random.normal(ks[2], (dim, 3 * dim), jnp.float32) * 0.03
    w_out = jax.random.normal(ks[3], (dim, dim), jnp.float32) * 0.03
    lns = jnp.ones((dim,), jnp.float32)
    lnb = jnp.zeros((dim,), jnp.float32)
    want = _xla_reference(
        x, res, w_qkv, None, w_out, None, lns, lnb,
        scale=d**-0.5, eps=1e-5, heads=h, dim_head=d,
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, heads=h, dim_head=d, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # the production gate admits ViT-L (21 MB ceiling, estimate 12.5 MB)
    assert fused_block_supported((64, 197, 1024), jnp.bfloat16, 16, 64, 1024)


def test_fused_block_vith_width():
    """dim=1280 / heads=16 / dim_head=80 — the ViT-H width admitted by the
    21 MB attention-block gate (PERF_NOTES round 5: +39.7% over pure XLA on
    hardware, tools/bench_vith.py).  Tiny n keeps the interpret run fast;
    the gate itself is shape-exact at n=257 below."""
    from vit_pytorch_tpu.ops.fused_block import fused_block_supported

    h, d = 16, 80
    dim = h * d
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (1, 9, dim), jnp.float32)
    res = jax.random.normal(ks[1], (1, 9, dim), jnp.float32)
    w_qkv = jax.random.normal(ks[2], (dim, 3 * dim), jnp.float32) * 0.03
    w_out = jax.random.normal(ks[3], (dim, dim), jnp.float32) * 0.03
    lns = jnp.ones((dim,), jnp.float32)
    lnb = jnp.zeros((dim,), jnp.float32)
    want = _xla_reference(
        x, res, w_qkv, None, w_out, None, lns, lnb,
        scale=d**-0.5, eps=1e-5, heads=h, dim_head=d,
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, heads=h, dim_head=d, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # the gate admits ViT-H/14 @224 (n=257, estimate 19.9 MB)
    assert fused_block_supported((64, 257, 1280), jnp.bfloat16, 16, 80, 1280)


def test_fused_block_vitg_width():
    """dim=1408 / heads=16 / dim_head=88 — the ViT-g width admitted by the
    25 MB attention-block gate (PERF_NOTES round 5: +42.9% over pure XLA on
    hardware, tools/bench_vitg.py).  Tiny n keeps the interpret run fast;
    the gate itself is shape-exact at n=257 below."""
    from vit_pytorch_tpu.ops.fused_block import fused_block_supported

    h, d = 16, 88
    dim = h * d
    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (1, 9, dim), jnp.float32)
    res = jax.random.normal(ks[1], (1, 9, dim), jnp.float32)
    w_qkv = jax.random.normal(ks[2], (dim, 3 * dim), jnp.float32) * 0.03
    w_out = jax.random.normal(ks[3], (dim, dim), jnp.float32) * 0.03
    lns = jnp.ones((dim,), jnp.float32)
    lnb = jnp.zeros((dim,), jnp.float32)
    want = _xla_reference(
        x, res, w_qkv, None, w_out, None, lns, lnb,
        scale=d**-0.5, eps=1e-5, heads=h, dim_head=d,
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, heads=h, dim_head=d, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)

    # the gate admits ViT-g/14 @224 (n=257, estimate 24.4 MB) and still
    # rejects ViT-G width (dim=1664, estimate 32.1 MB) until measured
    assert fused_block_supported((64, 257, 1408), jnp.bfloat16, 16, 88, 1408)
    assert not fused_block_supported((64, 257, 1664), jnp.bfloat16, 16, 104, 1664)
