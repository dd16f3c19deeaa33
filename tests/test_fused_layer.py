"""Kernel-vs-XLA equivalence for the whole-LAYER fused kernel
(ops/fused_block.py fused_transformer_layer: attn block + FF in one Pallas
call) — interpreter mode on CPU, forward AND the decomposed custom_vjp."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_pytorch_tpu.ops.fused_block import (
    _ff_reference,
    _xla_reference,
    fused_transformer_layer,
    whole_layer_supported,
)

B, H, N, D = 2, 4, 23, 16
DIM = H * D
MLP = 2 * DIM


def _inputs(dtype, qkv_bias=False, out_bias=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 12)
    x = jax.random.normal(ks[0], (B, N, DIM), dtype)
    w_qkv = jax.random.normal(ks[1], (DIM, 3 * DIM), dtype) * 0.05
    b_qkv = jax.random.normal(ks[2], (3 * DIM,), dtype) * 0.05 if qkv_bias else None
    w_out = jax.random.normal(ks[3], (DIM, DIM), dtype) * 0.05
    b_out = jax.random.normal(ks[4], (DIM,), dtype) * 0.05 if out_bias else None
    ln1s = 1.0 + 0.1 * jax.random.normal(ks[5], (DIM,), dtype)
    ln1b = 0.1 * jax.random.normal(ks[6], (DIM,), dtype)
    ln2s = 1.0 + 0.1 * jax.random.normal(ks[7], (DIM,), dtype)
    ln2b = 0.1 * jax.random.normal(ks[8], (DIM,), dtype)
    w1 = jax.random.normal(ks[9], (DIM, MLP), dtype) * 0.05
    b1 = 0.05 * jax.random.normal(ks[10], (MLP,), dtype)
    w2 = jax.random.normal(ks[11], (MLP, DIM), dtype) * 0.05
    b2 = jnp.zeros((DIM,), dtype)
    return x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2


def _composite(x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
    y = _xla_reference(
        x, x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b,
        heads=H, dim_head=D, scale=D**-0.5, eps=1e-5,
    )
    return _ff_reference(y, ln2s, ln2b, w1, b1, w2, b2, eps=1e-5)


@pytest.mark.parametrize("qkv_bias", [False, True])
def test_whole_layer_matches_composite(qkv_bias):
    args = _inputs(jnp.float32, qkv_bias=qkv_bias)
    x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2 = args
    want = _composite(*args)
    got = fused_transformer_layer(
        x, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
        heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5, rtol=1e-4)


def test_whole_layer_grads_match_composite():
    """The decomposed custom_vjp (Pallas attn bwd + XLA FF vjp) must agree
    with autodiff through the XLA composite on every operand."""
    args = _inputs(jnp.float32, qkv_bias=True)
    x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2 = args

    def loss_kernel(x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        out = fused_transformer_layer(
            x, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
            heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
        )
        return jnp.sum(out**2)

    def loss_ref(*a):
        return jnp.sum(_composite(*a)**2)

    argnums = tuple(range(13))
    gk = jax.grad(loss_kernel, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ("x", "w_qkv", "b_qkv", "w_out", "b_out", "ln1s", "ln1b",
             "ln2s", "ln2b", "w1", "b1", "w2", "b2")
    for name, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=2e-3, err_msg=name
        )


@pytest.mark.parametrize("hybrid", [False, True])
def test_ff_pallas_backward_matches_vjp(hybrid):
    """The row-tiled Pallas FF backward (opt-in, VIT_TPU_FF_BWD=full|hybrid)
    must agree with autodiff through _ff_reference on every operand —
    multi-tile shape (M=192 → three 64-row grid steps) so the f32
    accumulator carry across the sequential grid is exercised."""
    from vit_pytorch_tpu.ops.fused_block import (
        _ff_bwd_rows, _ff_pallas_backward, ff_bwd_mode,
    )

    b, n = 2, 96
    assert _ff_bwd_rows(b * n) == 64
    os.environ["VIT_TPU_FF_BWD"] = "hybrid" if hybrid else "full"
    try:
        assert ff_bwd_mode((b, n, DIM), jnp.float32, DIM, MLP) == (
            "hybrid" if hybrid else "full"
        )
    finally:
        os.environ.pop("VIT_TPU_FF_BWD", None)
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    y = jax.random.normal(ks[0], (b, n, DIM), jnp.float32)
    g = jax.random.normal(ks[1], (b, n, DIM), jnp.float32)
    ln2s = 1.0 + 0.1 * jax.random.normal(ks[2], (DIM,), jnp.float32)
    ln2b = 0.1 * jax.random.normal(ks[3], (DIM,), jnp.float32)
    w1 = jax.random.normal(ks[4], (DIM, MLP), jnp.float32) * 0.05
    b1 = 0.05 * jax.random.normal(ks[5], (MLP,), jnp.float32)
    w2 = jax.random.normal(ks[6], (MLP, DIM), jnp.float32) * 0.05
    b2 = 0.05 * jax.random.normal(ks[7], (DIM,), jnp.float32)

    _, vjp = jax.vjp(
        lambda y, ln2s, ln2b, w1, b1, w2, b2: _ff_reference(
            y, ln2s, ln2b, w1, b1, w2, b2, eps=1e-5
        ),
        y, ln2s, ln2b, w1, b1, w2, b2,
    )
    want = vjp(g)
    got = _ff_pallas_backward(y, g, ln2s, ln2b, w1, b1, w2, eps=1e-5,
                              interpret=True, hybrid=hybrid)
    names = ("dy", "dln2s", "dln2b", "dw1", "db1", "dw2", "db2")
    for name, a, b_ in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5, rtol=2e-4, err_msg=name
        )


def test_whole_layer_grads_with_ff_kernel(monkeypatch):
    """Whole-layer decomposed custom_vjp with the (opt-in) Pallas FF
    backward engaged vs autodiff through the XLA composite."""
    from vit_pytorch_tpu.ops.fused_block import ff_bwd_supported

    monkeypatch.setenv("VIT_TPU_ENABLE_FF_BWD", "1")
    global N  # _inputs uses module-level N
    n_saved = N
    try:
        globals()["N"] = 32  # B*N = 64 → _ff_bwd_rows hits, kernel engages
        args = _inputs(jnp.float32, qkv_bias=True)
    finally:
        globals()["N"] = n_saved
    x = args[0]
    assert ff_bwd_supported(x.shape, x.dtype, DIM, MLP)

    def loss_kernel(x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        out = fused_transformer_layer(
            x, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
            heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
        )
        return jnp.sum(out**2)

    def loss_ref(*a):
        return jnp.sum(_composite(*a)**2)

    argnums = tuple(range(13))
    gk = jax.grad(loss_kernel, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ("x", "w_qkv", "b_qkv", "w_out", "b_out", "ln1s", "ln1b",
             "ln2s", "ln2b", "w1", "b1", "w2", "b2")
    for name, a, b_ in zip(names, gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=2e-3, err_msg=name
        )


def test_layer_bwd_kernel_matches_decomposed(monkeypatch):
    """The single-kernel whole-layer backward (in-VMEM dW accumulation,
    opt-in via VIT_TPU_ENABLE_WHOLE_LAYER_BWD) must agree with the default
    decomposed backward (XLA FF vjp + Pallas attn bwd) on every operand."""
    args = _inputs(jnp.float32, qkv_bias=True)

    def loss(*a):
        x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2 = a
        out = fused_transformer_layer(
            x, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
            heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
        )
        return jnp.sum(out**2)

    argnums = tuple(range(13))
    from vit_pytorch_tpu.ops import fused_block as fb

    monkeypatch.setenv("VIT_TPU_ENABLE_WHOLE_LAYER_BWD", "1")
    assert fb.layer_bwd_supported((B, N, DIM), jnp.float32, H, D, DIM, MLP)
    g_kernel = jax.grad(loss, argnums=argnums)(*args)
    monkeypatch.delenv("VIT_TPU_ENABLE_WHOLE_LAYER_BWD")
    assert not fb.layer_bwd_supported((B, N, DIM), jnp.float32, H, D, DIM, MLP)
    g_decomp = jax.grad(loss, argnums=argnums)(*args)
    names = ("x", "w_qkv", "b_qkv", "w_out", "b_out", "ln1s", "ln1b",
             "ln2s", "ln2b", "w1", "b1", "w2", "b2")
    for name, a, b in zip(names, g_kernel, g_decomp):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3, err_msg=name
        )


def test_whole_layer_supported_gate():
    # the hardware-proven ViT-B config passes; ViT-L width estimates above
    # the ViT-B-calibrated ceiling and falls back — measured perf-identical
    # there anyway (tools/bench_vitl.py: 1,056 vs 1,058 img/s), so the
    # two-step path at wide dims is by merit, not a VMEM blocker
    assert whole_layer_supported((128, 197, 768), jnp.bfloat16, 12, 64, 768, 3072)
    assert not whole_layer_supported((128, 197, 1024), jnp.bfloat16, 16, 64, 1024, 4096)
    assert not whole_layer_supported((128, 197, 768), jnp.float32, 12, 64, 768, 3072)


def test_transformer_selects_whole_layer(monkeypatch):
    """On (mocked) TPU with bf16 the Transformer must produce identical
    params through the whole-layer containers as through the module path,
    and matching outputs."""
    import vit_pytorch_tpu.nn.blocks as blocks_mod

    model = blocks_mod.Transformer(dim=DIM, depth=2, heads=H, dim_head=D, mlp_dim=MLP)
    x32 = jax.random.normal(jax.random.PRNGKey(1), (2, N, DIM))
    params = model.init(jax.random.PRNGKey(0), x32)
    ref_out = model.apply(params, x32)

    # same param tree must feed the whole-layer path (containers alias the
    # module names); interpret-mode pallas on CPU
    monkeypatch.setattr(blocks_mod, "on_tpu", lambda: True)
    monkeypatch.setattr(
        blocks_mod, "fused_block_supported", lambda *a, **k: True
    )
    monkeypatch.setattr(blocks_mod, "whole_layer_supported", lambda *a, **k: True)
    import vit_pytorch_tpu.ops.fused_block as fb

    orig = fb._layer_pallas_forward
    monkeypatch.setattr(
        fb, "_layer_pallas_forward",
        lambda *a, **k: orig(*a, **{**k, "interpret": True}),
    )
    orig_stack = fb._stack_pallas_forward
    monkeypatch.setattr(
        fb, "_stack_pallas_forward",
        lambda *a, **k: orig_stack(*a, **{**k, "interpret": True}),
    )
    xb = x32.astype(jnp.bfloat16)
    pb = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
    out = model.apply(pb, xb)
    assert out.dtype == jnp.bfloat16
    ref_b = ref_out.astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(ref_b),
        atol=0.08, rtol=0.05,
    )


def _stack_layers(n_layers, dtype=jnp.float32, qkv_bias=True):
    layers = []
    for li in range(n_layers):
        (x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1,
         w2, b2) = _inputs(dtype, qkv_bias=qkv_bias)
        r = 1.0 + 0.1 * li
        layers.append(
            (w_qkv * r, None if b_qkv is None else b_qkv * r, w_out * r,
             b_out, ln1s, ln1b, ln2s, ln2b, w1 * r, b1, w2, b2)
        )
    return x, layers


@pytest.mark.parametrize("n_layers", [2, 3])
def test_stack_matches_sequential_layers(n_layers):
    """fused_transformer_stack == the same layers applied one
    fused_transformer_layer at a time (shared _layer_rows body ⇒ the only
    difference is where HBM boundaries fall)."""
    from vit_pytorch_tpu.ops.fused_block import fused_transformer_stack

    x, layers = _stack_layers(n_layers)
    want = x
    for (w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2) in layers:
        want = fused_transformer_layer(
            want, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
            heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
        )
    got = fused_transformer_stack(
        x, layers, heads=H, dim_head=D, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6, rtol=1e-6)


def test_stack_grads_match_sequential_chain():
    """The stack's custom_vjp (recompute through the per-layer chain) must
    agree with differentiating the per-layer chain directly — on x and on
    every weight of every layer."""
    from vit_pytorch_tpu.ops.fused_block import fused_transformer_stack

    x, layers = _stack_layers(2)

    def loss_stack(x, layers):
        out = fused_transformer_stack(
            x, layers, heads=H, dim_head=D, interpret=True
        )
        return jnp.sum(out**2)

    def loss_chain(x, layers):
        for (w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1,
             w2, b2) in layers:
            x = fused_transformer_layer(
                x, w_qkv, w_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
                heads=H, dim_head=D, b_qkv=b_qkv, b_out=b_out, interpret=True,
            )
        return jnp.sum(x**2)

    gs = jax.grad(loss_stack, argnums=(0, 1))(x, tuple(map(tuple, layers)))
    gc = jax.grad(loss_chain, argnums=(0, 1))(x, tuple(map(tuple, layers)))
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_stack_group_gate(monkeypatch):
    from vit_pytorch_tpu.ops.fused_block import whole_layer_stack_group

    vitb = ((128, 197, 768), jnp.bfloat16, 12, 64, 768, 3072)
    # default: stacking is opt-in (in-model L=6 measured SLOWER than
    # per-layer on the flagship — PERF_NOTES round 3)
    monkeypatch.delenv("VIT_TPU_STACK_LAYERS", raising=False)
    assert whole_layer_stack_group(*vitb, depth=12) == 1
    # forced: ViT-B fits 6 layers of resident weights (6 x ~13.5 MiB)
    monkeypatch.setenv("VIT_TPU_STACK_LAYERS", "6")
    assert whole_layer_stack_group(*vitb, depth=12) == 6
    # never exceeds depth
    assert whole_layer_stack_group(*vitb, depth=4) == 4
    # unsupported base config (fp32) -> per-layer even when forced
    assert whole_layer_stack_group(
        (128, 197, 768), jnp.float32, 12, 64, 768, 3072, depth=12
    ) == 1
    # a forced group that cannot fit VMEM shrinks to what fits
    monkeypatch.setenv("VIT_TPU_STACK_LAYERS", "64")
    assert whole_layer_stack_group(*vitb, depth=64) == 6
    # malformed env value names the variable instead of exploding inside
    # model tracing with a bare int() error
    monkeypatch.setenv("VIT_TPU_STACK_LAYERS", "six")
    with pytest.raises(ValueError, match="VIT_TPU_STACK_LAYERS"):
        whole_layer_stack_group(*vitb, depth=12)


def test_stack_group_vmem_shrink(monkeypatch):
    """The VMEM-fit loop itself (not the _STACK_MAX_LAYERS clamp) must bind:
    with a lowered budget the forced group shrinks to exactly the largest g
    with base + (g-1)*per_layer <= limit."""
    from vit_pytorch_tpu.ops import fused_block as fb

    vitb = ((128, 197, 768), jnp.bfloat16, 12, 64, 768, 3072)
    monkeypatch.setenv("VIT_TPU_STACK_LAYERS", "6")
    base = fb._vmem_bytes_whole(197, 768, 768, 3072, 2, fb._whole_layer_ips(128, 197, 768))
    per_layer = fb._layer_weight_bytes(768, 768, 3072, 2)
    # budget that admits exactly 3 layers' extra weights
    monkeypatch.setattr(fb, "_STACK_EST_LIMIT", base + 2 * per_layer)
    assert fb.whole_layer_stack_group(*vitb, depth=12) == 3
    # budget below even the single-layer working set floors at 1 (per-layer)
    monkeypatch.setattr(fb, "_STACK_EST_LIMIT", base - 1)
    assert fb.whole_layer_stack_group(*vitb, depth=12) == 1


def test_stack_rejects_mixed_biases():
    from vit_pytorch_tpu.ops.fused_block import fused_transformer_stack

    x, layers = _stack_layers(2)
    broken = [layers[0], layers[1][:1] + (None,) + layers[1][2:]]
    with pytest.raises(ValueError, match="uniformly"):
        fused_transformer_stack(x, broken, heads=H, dim_head=D, interpret=True)


def _tpu_device():
    import os

    if os.environ.get("VIT_TPU_SKIP_TPU_TESTS"):
        return None
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return None


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
def test_stacked_vit_matches_per_layer_on_tpu(monkeypatch):
    """Model-level, real chip: a bf16 ViT whose Transformer dispatches the
    multi-layer stack must match the same model forced onto per-layer
    whole-layer kernels (VIT_TPU_DISABLE_STACK=1) — forward bit-for-bit
    (shared _layer_rows body) and grads exactly (the stack's custom_vjp IS
    the per-layer grad path)."""
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.ops.fused_block import whole_layer_stack_group

    kw = dict(image_size=64, patch_size=16, num_classes=5, dim=256, depth=3,
              heads=4, dim_head=64, mlp_dim=512)
    model = ViT(**kw)
    with jax.default_device(_tpu_device()):
        x32 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), x32)
        params = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        x = x32.astype(jnp.bfloat16)
        # stacking is opt-in; force it and check the gate engages
        monkeypatch.setenv("VIT_TPU_STACK_LAYERS", "3")
        assert whole_layer_stack_group(
            (4, 17, 256), jnp.bfloat16, 4, 64, 256, 512, depth=3
        ) == 3

        def loss(p):
            return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

        monkeypatch.delenv("VIT_TPU_DISABLE_STACK", raising=False)
        out_stack = model.apply(params, x)
        g_stack = jax.grad(loss)(params)
        monkeypatch.setenv("VIT_TPU_DISABLE_STACK", "1")
        out_layer = model.apply(params, x)
        g_layer = jax.grad(loss)(params)
        monkeypatch.delenv("VIT_TPU_DISABLE_STACK", raising=False)

    np.testing.assert_array_equal(
        np.asarray(out_stack, np.float32), np.asarray(out_layer, np.float32)
    )
    for a, b in zip(jax.tree.leaves(g_stack), jax.tree.leaves(g_layer)):
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )
