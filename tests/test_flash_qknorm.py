"""qk-RMSNorm fused into the flash attention kernels (ops/flash_attention.py):
in-kernel normalization (forward + both backward kernels) vs the eager
rms_norm→attention composite, with segment ids (the packed-NaViT training
shape, reference na_vit.py:93-103, 161-166, 335-337), plus the dispatcher
routing (gamma passthrough on the flash path, eager norm elsewhere)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_pytorch_tpu.ops.attention import (
    build_segment_mask,
    dot_product_attention,
    xla_attention,
)
from vit_pytorch_tpu.ops.flash_attention import flash_attention, rms_norm

B, H, N, D = 2, 3, 256, 64


def _inputs(key=0, n=N, d=D):
    ks = jax.random.split(jax.random.PRNGKey(key), 5)
    q = jax.random.normal(ks[0], (B, H, n, d))
    k = jax.random.normal(ks[1], (B, H, n, d))
    v = jax.random.normal(ks[2], (B, H, n, d))
    # module-shaped (heads, 1, d) gammas, non-trivial values
    gq = 1.0 + 0.2 * jax.random.normal(ks[3], (H, 1, d))
    gk = 1.0 + 0.2 * jax.random.normal(ks[4], (H, 1, d))
    return q, k, v, gq, gk


def _segs(n=N, pieces=4):
    seg = jnp.repeat(jnp.arange(pieces), n // pieces)
    return jnp.broadcast_to(seg, (B, n)).astype(jnp.int32)


def _ref(q, k, v, gq, gk, segs=None):
    qn, kn = rms_norm(q, gq), rms_norm(k, gk)
    mask = None
    if segs is not None:
        mask = build_segment_mask(segs, segs, q.shape[2], k.shape[2])
    return xla_attention(qn, kn, v, scale=1.0, mask=mask)


@pytest.mark.parametrize("with_segs", [False, True])
def test_flash_qknorm_forward_matches_eager(with_segs):
    q, k, v, gq, gk = _inputs()
    segs = _segs() if with_segs else None
    want = _ref(q, k, v, gq, gk, segs)
    got = flash_attention(
        q, k, v, scale=1.0, gamma_q=gq, gamma_k=gk,
        q_segment_ids=segs, kv_segment_ids=segs,
        block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_flash_qknorm_grads_match_eager():
    """All five gradients (q, k, v, gamma_q, gamma_k): the kernels emit
    normalized-space dq/dk and the host epilogue closes the RMSNorm VJP."""
    q, k, v, gq, gk = _inputs(key=1)
    segs = _segs()

    def loss_fused(args):
        out = flash_attention(
            *args[:3], scale=1.0, gamma_q=args[3], gamma_k=args[4],
            q_segment_ids=segs, kv_segment_ids=segs,
            block_q=128, block_k=128, interpret=True,
        )
        return jnp.sum(jnp.sin(out))

    def loss_ref(args):
        return jnp.sum(jnp.sin(_ref(*args, segs)))

    got = jax.grad(loss_fused)((q, k, v, gq, gk))
    want = jax.grad(loss_ref)((q, k, v, gq, gk))
    for name, g, w in zip("q k v gamma_q gamma_k".split(), got, want):
        scale = max(float(jnp.abs(w).max()), 1.0)
        np.testing.assert_allclose(
            g, w, atol=5e-5 * scale, rtol=5e-4, err_msg=f"d{name}"
        )


def test_dispatcher_routes_gammas_to_flash(monkeypatch):
    """dot_product_attention(gamma_q=..., use_flash=True) must match the
    eager-norm composite — both with the default (eager XLA norm, the
    measured-faster configuration) and with the opt-in in-kernel fusion."""
    q, k, v, gq, gk = _inputs(key=2)
    segs = _segs()
    want = _ref(q, k, v, gq, gk, segs)
    for fuse in ("", "1"):
        monkeypatch.setenv("VIT_TPU_FUSE_QKNORM", fuse)
        got = dot_product_attention(
            q, k, v, scale=1.0, gamma_q=gq, gamma_k=gk,
            q_segment_ids=segs, kv_segment_ids=segs, use_flash=True,
        )
        np.testing.assert_allclose(
            got, want, atol=2e-5, rtol=2e-5, err_msg=f"fuse={fuse!r}"
        )


def test_dispatcher_applies_gammas_eagerly_on_xla_path():
    q, k, v, gq, gk = _inputs(key=3)
    want = _ref(q, k, v, gq, gk)
    got = dot_product_attention(
        q, k, v, scale=1.0, gamma_q=gq, gamma_k=gk, use_flash=False,
    )
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_gamma_validation():
    q, k, v, gq, gk = _inputs(key=4)
    with pytest.raises(ValueError, match="both q and k"):
        flash_attention(q, k, v, gamma_q=gq, interpret=True)
    with pytest.raises(ValueError, match="unsupported with bias"):
        flash_attention(
            q, k, v, gamma_q=gq, gamma_k=gk,
            bias=jnp.zeros((H, N, N)), interpret=True,
        )


def _tpu_device():
    if os.environ.get("VIT_TPU_SKIP_TPU_TESTS"):
        return None
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return None


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
def test_flash_qknorm_tpu_bf16():
    """Hardware Mosaic lowering of the fused qk-norm (f32 in-tile stats on
    bf16 inputs), forward + grads, packed segments.

    Comparison: both the fused bf16 kernel AND a bf16 XLA composite are
    measured against an f32 ground truth; the kernel must be no farther
    from truth than the bf16 reference's own rounding noise (measured
    2026-08-19: kernel ~2× CLOSER — its statistics/accumulators are f32)."""
    with jax.default_device(_tpu_device()):
        q, k, v, gq, gk = _inputs(key=5, n=1024)
        segs = _segs(n=1024, pieces=8)

        def loss_fused(args):
            out = flash_attention(
                *(t.astype(jnp.bfloat16) for t in args[:3]),
                scale=1.0, gamma_q=args[3], gamma_k=args[4],
                q_segment_ids=segs, kv_segment_ids=segs, interpret=False,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_ref(args, dtype):
            cast = [t.astype(dtype) for t in args]
            return jnp.sum(_ref(*cast, segs).astype(jnp.float32) ** 2)

        args = (q, k, v, gq, gk)
        got = jax.jit(jax.grad(loss_fused))(args)
        truth = jax.jit(jax.grad(lambda a: loss_ref(a, jnp.float32)))(args)
        noise = jax.jit(jax.grad(lambda a: loss_ref(a, jnp.bfloat16)))(args)
        for name, g, t, r in zip("q k v gq gk".split(), got, truth, noise):
            g, t, r = (np.asarray(x, np.float32) for x in (g, t, r))
            kernel_err = np.abs(g - t).max()
            ref_err = np.abs(r - t).max()
            assert kernel_err <= 1.5 * ref_err + 1e-3, (
                f"d{name}: fused kernel is farther from f32 truth "
                f"({kernel_err:.4f}) than the bf16 XLA reference "
                f"({ref_err:.4f}) allows"
            )
