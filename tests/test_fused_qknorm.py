"""qk-RMSNorm inside the fused attention-block kernel (ops/fused_block.py):
kernel-vs-XLA equivalence in interpreter mode, gradient correctness through
the composite backward, eligibility gating, and the module-level dispatch
(reference na_vit.py:93-103, simple_vit_with_qk_norm.py:29-63)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_pytorch_tpu.nn.blocks import fused_block_eligible
from vit_pytorch_tpu.ops.fused_block import (
    _xla_reference,
    fused_attention_block,
)

B, H, N, D = 2, 4, 23, 16
DIM = H * D


def _inputs(dtype):
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (B, N, DIM), dtype)
    res = jax.random.normal(ks[1], (B, N, DIM), dtype)
    w_qkv = jax.random.normal(ks[2], (DIM, 3 * DIM), dtype) * 0.05
    b_qkv = jax.random.normal(ks[3], (3 * DIM,), dtype) * 0.05
    w_out = jax.random.normal(ks[4], (DIM, DIM), dtype) * 0.05
    b_out = jax.random.normal(ks[5], (DIM,), dtype) * 0.05
    lns = 1.0 + 0.1 * jax.random.normal(ks[6], (DIM,), dtype)
    lnb = 0.1 * jax.random.normal(ks[7], (DIM,), dtype)
    # module-shaped (heads, 1, dim_head) gammas, non-trivial values
    gq = 1.0 + 0.2 * jax.random.normal(ks[8], (H, 1, D), dtype)
    gk = 1.0 + 0.2 * jax.random.normal(ks[9], (H, 1, D), dtype)
    return x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, gq, gk


@pytest.mark.parametrize("with_biases,with_res", [(True, True), (False, False)])
def test_qknorm_kernel_matches_xla_reference(with_biases, with_res):
    """(False, False) is simple_vit_with_qk_norm's exact flag combo
    (out_bias=False, residual added outside the module)."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, gq, gk = _inputs(jnp.float32)
    if not with_biases:
        b_qkv = b_out = None
    if not with_res:
        res = None
    want = _xla_reference(
        x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb,
        gq.reshape(H, D), gk.reshape(H, D),
        heads=H, dim_head=D, scale=1.0, eps=1e-5,
    )
    got = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        gamma_q=gq, gamma_k=gk, heads=H, dim_head=D, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4)


def test_qknorm_differs_from_unnormed():
    """Sanity: the gammas actually change the output (the kernel isn't
    silently skipping the norm)."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, gq, gk = _inputs(jnp.float32)
    with_norm = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        gamma_q=gq, gamma_k=gk, heads=H, dim_head=D, interpret=True,
    )
    without = fused_attention_block(
        x, res, w_qkv, w_out, lns, lnb, b_qkv=b_qkv, b_out=b_out,
        heads=H, dim_head=D, interpret=True,
    )
    assert float(jnp.max(jnp.abs(with_norm - without))) > 1e-3


def test_qknorm_grads_match_composite():
    """The qk-norm Pallas backward (round 4: in-kernel RMSNorm recompute +
    f32 dgamma accumulators, interpret mode here) — every operand's
    gradient (incl. both gammas) must match differentiating the reference
    directly."""
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, gq, gk = _inputs(jnp.float32)

    def loss_fused(ops):
        out = fused_attention_block(
            ops["x"], ops["res"], ops["w_qkv"], ops["w_out"], ops["lns"],
            ops["lnb"], b_qkv=ops["b_qkv"], b_out=ops["b_out"],
            gamma_q=ops["gq"], gamma_k=ops["gk"],
            heads=H, dim_head=D, interpret=True,
        )
        return jnp.sum(out * jnp.cos(out))

    def loss_ref(ops):
        out = _xla_reference(
            ops["x"], ops["res"], ops["w_qkv"], ops["b_qkv"], ops["w_out"],
            ops["b_out"], ops["lns"], ops["lnb"],
            ops["gq"].reshape(H, D), ops["gk"].reshape(H, D),
            heads=H, dim_head=D, scale=1.0, eps=1e-5,
        )
        return jnp.sum(out * jnp.cos(out))

    ops = dict(x=x, res=res, w_qkv=w_qkv, b_qkv=b_qkv, w_out=w_out,
               b_out=b_out, lns=lns, lnb=lnb, gq=gq, gk=gk)
    g_fused = jax.grad(loss_fused)(ops)
    g_ref = jax.grad(loss_ref)(ops)
    for name in ops:
        np.testing.assert_allclose(
            np.asarray(g_fused[name]).reshape(-1),
            np.asarray(g_ref[name]).reshape(-1),
            atol=3e-5, rtol=1e-4, err_msg=name,
        )


def test_qknorm_eligibility(monkeypatch):
    import vit_pytorch_tpu.nn.blocks as blocks_mod

    monkeypatch.setattr(blocks_mod, "on_tpu", lambda: True)
    common = dict(
        x_shape=(8, 197, 768), x_dtype=jnp.bfloat16, heads=12, dim_head=64,
        dim=768, flash=None, project_out=True, qk_norm=True,
    )
    # round 4: the Pallas backward recomputes the RMSNorms and replays the
    # in-kernel dropout masks, so qk-norm fuses in EVERY train/dropout combo
    assert fused_block_eligible(**common, dropout=0.0, train=True)
    assert fused_block_eligible(**common, dropout=0.1, train=False)
    assert fused_block_eligible(**common, dropout=0.1, train=True)


def test_qknorm_wrapper_guards():
    x, res, w_qkv, b_qkv, w_out, b_out, lns, lnb, gq, gk = _inputs(jnp.float32)
    with pytest.raises(ValueError, match="together"):
        fused_attention_block(
            x, res, w_qkv, w_out, lns, lnb, gamma_q=gq,
            heads=H, dim_head=D, interpret=True,
        )
    with pytest.raises(ValueError, match="dropout"):
        fused_attention_block(
            x, res, w_qkv, w_out, lns, lnb, gamma_q=gq, gamma_k=gk,
            heads=H, dim_head=D, dropout_rate=0.1, dropout_seed=0,
            interpret=True,
        )


def test_attention_module_qknorm_dispatch(monkeypatch):
    """Attention(qk_norm=True) on (mocked) TPU takes the fused kernel with
    the SAME param tree as the module path and matches its output; the
    Transformer keeps the two-step path (whole-layer kernel has no qk-norm)."""
    import vit_pytorch_tpu.nn.blocks as blocks_mod
    import vit_pytorch_tpu.ops.attention as att
    import vit_pytorch_tpu.ops.fused_block as fb

    attn = blocks_mod.Attention(dim=DIM, heads=H, dim_head=D, qk_norm=True)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (B, N, DIM))
    params = attn.init(jax.random.PRNGKey(0), x32)
    ref_out = attn.apply(params, x32)  # CPU → module path

    monkeypatch.setattr(blocks_mod, "on_tpu", lambda: True)
    monkeypatch.setattr(att, "on_tpu", lambda: True)
    monkeypatch.setattr(blocks_mod, "fused_block_supported", lambda *a, **k: True)
    called = {}
    orig = fb._pallas_forward

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **{**k, "interpret": True})

    monkeypatch.setattr(fb, "_pallas_forward", spy)
    xb = x32.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
    out = attn.apply(pb, xb)  # same tree → containers alias the module names
    assert called.get("yes"), "fused path was not taken"
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref_out, np.float32),
        atol=0.08, rtol=0.05,
    )

    # Transformer with qk_norm: fused attention kernel + module FF (no
    # whole-layer), still matching the CPU module path
    model = blocks_mod.Transformer(
        dim=DIM, depth=2, heads=H, dim_head=D, mlp_dim=2 * DIM, qk_norm=True
    )
    tp = model.init(jax.random.PRNGKey(0), x32)
    t_ref = model.apply(tp, x32)
    called.clear()
    t_out = model.apply(jax.tree.map(lambda t: t.astype(jnp.bfloat16), tp), xb)
    assert called.get("yes"), "Transformer did not reach the fused attention kernel"
    np.testing.assert_allclose(
        np.asarray(t_out, np.float32), np.asarray(t_ref, np.float32),
        atol=0.12, rtol=0.05,
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
def test_qknorm_dropout_grads_on_tpu():
    """qk-norm + kernel-tier train dropout (the round-4 unlock): grads from
    the Pallas backward (which recomputes the RMSNorms AND replays the PRNG
    masks) vs autodiff of an XLA composite with the same masks injected via
    dropout_masks."""
    import vit_pytorch_tpu.ops.fused_block as fb

    b, h, n, d = 4, 4, 197, 64
    dim = h * d
    rate, seed = 0.1, 77
    root = float(d) ** 0.5

    with jax.default_device(_tpu_device()):
        ks = jax.random.split(jax.random.PRNGKey(5), 5)
        dt = jnp.bfloat16
        x = jax.random.normal(ks[0], (b, n, dim), dt)
        w_qkv = jax.random.normal(ks[1], (dim, 3 * dim), dt) * 0.05
        w_out = jax.random.normal(ks[2], (dim, dim), dt) * 0.05
        lns = jnp.ones((dim,), dt)
        lnb = jnp.zeros((dim,), dt)
        gq = 1.0 + 0.2 * jax.random.normal(ks[3], (h, 1, d), dt)
        gk = 1.0 + 0.2 * jax.random.normal(ks[4], (h, 1, d), dt)
        akeep, okeep = fb.dropout_masks(seed, b, n, dim, h, rate)
        inv = 1.0 / (1.0 - rate)

        def ref(x, w_qkv, w_out, gq, gk):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            ln = (ln * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
            qkv = jnp.dot(ln, w_qkv, preferred_element_type=jnp.float32).astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            rs = lambda t: t.reshape(b, n, h, d).transpose(0, 2, 1, 3)
            q, k, v = rs(q), rs(k), rs(v)
            nrm = lambda t: t.astype(jnp.float32) * jax.lax.rsqrt(
                jnp.sum(t.astype(jnp.float32) ** 2, -1, keepdims=True) + 1e-12
            )
            q = (nrm(q) * (gq.astype(jnp.float32) * root)[None]).astype(x.dtype)
            k = (nrm(k) * (gk.astype(jnp.float32) * root)[None]).astype(x.dtype)
            dots = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                              preferred_element_type=jnp.float32)
            dots = dots - jnp.max(dots, -1, keepdims=True)
            p = jnp.exp(dots)
            p = p / jnp.sum(p, -1, keepdims=True)
            p = jnp.where(akeep.astype(bool), p, 0.0) * inv
            o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(x.dtype), v,
                           preferred_element_type=jnp.float32)
            o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, dim)
            out = jnp.dot(o, w_out, preferred_element_type=jnp.float32)
            out = jnp.where(okeep.astype(bool), out, 0.0) * inv
            return (out + x.astype(jnp.float32)).astype(x.dtype)

        def loss_k(x, w_qkv, w_out, gq, gk):
            out = fb.fused_attention_block(
                x, x, w_qkv, w_out, lns, lnb, gamma_q=gq, gamma_k=gk,
                heads=h, dim_head=d, dropout_rate=rate, dropout_seed=seed,
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_r(x, w_qkv, w_out, gq, gk):
            return jnp.sum(ref(x, w_qkv, w_out, gq, gk).astype(jnp.float32) ** 2)

        argnums = (0, 1, 2, 3, 4)
        g_k = jax.grad(loss_k, argnums)(x, w_qkv, w_out, gq, gk)
        g_r = jax.grad(loss_r, argnums)(x, w_qkv, w_out, gq, gk)
        for name, a, bb in zip(("x", "w_qkv", "w_out", "gq", "gk"), g_k, g_r):
            a = np.asarray(a, np.float32)
            bb = np.asarray(bb, np.float32)
            denom = max(float(np.max(np.abs(bb))), 1e-3)
            rel = float(np.max(np.abs(a - bb))) / denom
            assert rel < 0.06, (name, rel)


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
def test_qknorm_kernel_on_tpu():
    """Compiled (Mosaic) qk-norm kernel vs the XLA composite on the chip,
    bf16 at a simple_vit_with_qk_norm-shaped config — exercises the 64-lane
    gamma slices through the real lowering, not just the interpreter."""
    h, d = 12, 64
    dim = h * d
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    dt = jnp.bfloat16
    # conftest pins the default device to host CPU — place this test's work
    # on the chip explicitly (same pattern as test_fused_dropout)
    with jax.default_device(_tpu_device()):
        x = jax.random.normal(ks[0], (8, 197, dim), dt)
        res = jax.random.normal(ks[1], (8, 197, dim), dt)
        w_qkv = jax.random.normal(ks[2], (dim, 3 * dim), dt) * 0.05
        w_out = jax.random.normal(ks[3], (dim, dim), dt) * 0.05
        lns = jnp.ones((dim,), dt)
        lnb = jnp.zeros((dim,), dt)
        gq = 1.0 + 0.2 * jax.random.normal(ks[4], (h, 1, d), dt)
        gk = 1.0 + 0.2 * jax.random.normal(ks[5], (h, 1, d), dt)
        want = _xla_reference(
            x, res, w_qkv, None, w_out, None, lns, lnb,
            gq.reshape(h, d), gk.reshape(h, d),
            heads=h, dim_head=d, scale=1.0, eps=1e-5,
        )
        got = fused_attention_block(
            x, res, w_qkv, w_out, lns, lnb, gamma_q=gq, gamma_k=gk,
            heads=h, dim_head=d, use_pallas=True,
        )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.08, rtol=0.05,
    )
