"""End-to-end gradient parity for the risky backward paths (VERDICT r2 #6):

(a) packed NaViT vs the reference masked NaViT (na_vit.py:255+) — full
    parameter tree, via the insight that the weight converter maps GRADIENT
    state dicts exactly like weight state dicts (transpose/fuse/reshape all
    commute with d/dW),
(b) MaxViT in train mode (BatchNorm batch-stats backward),
(c) a fused-eligible bf16 ViT on the real TPU — the fused-block custom_vjp
    at MODEL level vs the XLA composite path (VIT_TPU_DISABLE_FUSED).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


def _tree_items(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_items(v, f"{prefix}/{k}")
    else:
        yield prefix, tree


def _compare_trees(expected, got, *, atol, rtol, skip=()):
    got_flat = dict(_tree_items(got))
    n = 0
    for name, want in _tree_items(expected):
        if any(s in name for s in skip):
            continue
        assert name in got_flat, f"missing grad leaf {name}"
        np.testing.assert_allclose(
            np.asarray(got_flat[name], dtype=np.float32),
            np.asarray(want, dtype=np.float32),
            atol=atol,
            rtol=rtol,
            err_msg=name,
        )
        n += 1
    assert n > 10, f"only {n} leaves compared"


@pytest.mark.parity
def test_navit_packed_param_grads_match_torch(reference, torch):
    """The packed static-shape path must backprop identically to the
    reference's jagged/masked path — every parameter leaf."""
    from vit_pytorch.na_vit import NaViT as RefNaViT
    from vit_pytorch_tpu.models.na_vit import NaViT, forward_packed
    from vit_pytorch_tpu.utils.convert import convert_na_vit

    kw = dict(image_size=64, patch_size=16, num_classes=11, dim=64, depth=2,
              heads=4, dim_head=16, mlp_dim=128)
    ref = RefNaViT(**kw).eval()

    rng = np.random.default_rng(0)
    sizes = [(64, 64), (32, 32), (32, 64), (64, 32), (16, 16)]
    imgs_np = [rng.standard_normal((3, h, w)).astype(np.float32) for h, w in sizes]
    imgs_t = [torch.tensor(im) for im in imgs_np]

    out = ref(imgs_t, group_images=True, group_max_seq_len=24)
    (out.to(torch.float32) ** 2).sum().backward()
    grad_sd = {k: p.grad for k, p in ref.named_parameters()}
    # the converter maps d/dW exactly like W (transposes, qkv fusion, and
    # reshapes are linear) → expected grads arrive already in flax layout
    expected = convert_na_vit(grad_sd)["params"]

    model = NaViT(**kw)
    params = convert_na_vit(ref.state_dict())

    def loss(p):
        o = forward_packed(model, p, imgs_np, group_max_seq_len=24)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    got = jax.grad(loss)(params)["params"]
    _compare_trees(expected, got, atol=5e-4, rtol=2e-3)


@pytest.mark.parity
def test_max_vit_train_mode_grads_match_torch(reference, torch):
    """Train-mode gradients: BatchNorm normalizes by BATCH statistics, whose
    backward (the -mean/-var correction terms) only this mode exercises."""
    from vit_pytorch.max_vit import MaxViT as RefMaxViT
    from vit_pytorch_tpu.models.max_vit import MaxViT
    from vit_pytorch_tpu.utils.convert import convert_max_vit

    kw = dict(num_classes=13, dim=32, dim_head=16, depth=(1, 1), window_size=4,
              dim_conv_stem=24, dropout=0.0)
    ref = RefMaxViT(**kw).train()
    img = torch.randn(2, 3, 64, 64)
    out = ref(img)
    (out.to(torch.float32) ** 2).sum().backward()
    grad_sd = {k: p.grad for k, p in ref.named_parameters()}
    expected = convert_max_vit(grad_sd)["params"]

    model = MaxViT(**kw)
    variables = convert_max_vit(ref.state_dict())
    xj = jnp.asarray(img.numpy())

    def loss(p):
        o, _ = model.apply(
            {**variables, "params": p}, xj, train=True, mutable=["batch_stats"]
        )
        return jnp.sum(o.astype(jnp.float32) ** 2)

    got = jax.grad(loss)(variables["params"])
    _compare_trees(expected, got, atol=2e-3, rtol=5e-3)


def _tpu_device():
    if os.environ.get("VIT_TPU_SKIP_TPU_TESTS"):
        return None
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return None


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
def test_fused_vit_model_level_grads_vs_xla_tpu(monkeypatch):
    """bf16 ViT whose attention takes the fused-block custom_vjp — model
    level parameter grads vs the same model forced onto the XLA composite
    (VIT_TPU_DISABLE_FUSED=1).  bf16 accumulation-order noise only."""
    from vit_pytorch_tpu.models.vit import ViT

    kw = dict(image_size=64, patch_size=16, num_classes=5, dim=256, depth=2,
              heads=4, dim_head=64, mlp_dim=512)
    model = ViT(**kw)
    with jax.default_device(_tpu_device()):
        x32 = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 64, 64))
        params = model.init(jax.random.PRNGKey(0), x32)
        params = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        x = x32.astype(jnp.bfloat16)

        def loss(p):
            return jnp.sum(model.apply(p, x).astype(jnp.float32) ** 2)

        monkeypatch.delenv("VIT_TPU_DISABLE_FUSED", raising=False)
        g_fused = jax.grad(loss)(params)
        monkeypatch.setenv("VIT_TPU_DISABLE_FUSED", "1")
        g_xla = jax.grad(loss)(params)
        monkeypatch.delenv("VIT_TPU_DISABLE_FUSED", raising=False)

    for name, a in _tree_items(g_fused["params"]):
        b = dict(_tree_items(g_xla["params"]))[name]
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        denom = np.abs(b).max() + 1e-6
        rel = np.abs(a - b).max() / denom
        assert rel < 0.12, (name, rel)


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
def test_navit_packed_flash_bwd_vs_xla_tpu():
    """Packed NaViT grads through the segment-masked Pallas flash backward
    (flash=None auto-selects it on TPU) vs the same params through the
    XLA masked path (flash=False)."""
    from vit_pytorch_tpu.models.na_vit import NaViT, forward_packed

    # depth 1: the kernel-vs-XLA comparison is per-layer; depth 2 doubles
    # the unrolled flash fwd+bwd compile time (467 s cold through the
    # tunnel) without adding coverage
    kw = dict(image_size=64, patch_size=16, num_classes=11, dim=64, depth=1,
              heads=4, dim_head=16, mlp_dim=128)
    rng = np.random.default_rng(0)
    imgs = [rng.standard_normal((3, h, w)).astype(np.float32)
            for h, w in [(64, 64), (32, 32), (32, 64)]]

    with jax.default_device(_tpu_device()):
        m_flash = NaViT(**kw)
        m_xla = NaViT(**kw, flash=False)
        from vit_pytorch_tpu.ops.packing import pack_images

        packed = pack_images(imgs, 16, max_seq_len=64)
        params = m_flash.init(jax.random.PRNGKey(0), packed)

        def loss(model, p):
            o = forward_packed(model, p, imgs, group_max_seq_len=64)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g_flash = jax.grad(lambda p: loss(m_flash, p))(params)["params"]
        g_xla = jax.grad(lambda p: loss(m_xla, p))(params)["params"]

    flat_xla = dict(_tree_items(g_xla))
    for name, a in _tree_items(g_flash):
        b = flat_xla[name]
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b, dtype=np.float32)
        denom = np.abs(b).max() + 1e-6
        rel = np.abs(a - b).max() / denom
        assert rel < 0.03, (name, rel)
