"""Smoke tests, batch 5: maxvit+registers, cct_3d, navit packed variants."""

import numpy as np
import jax
import jax.numpy as jnp


def test_max_vit_with_registers():
    from vit_pytorch_tpu.models.max_vit_with_registers import MaxViT

    m = MaxViT(num_classes=10, dim=32, dim_head=16, depth=(1, 1), window_size=4, num_register_tokens=2, dropout=0.0)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_cct_3d():
    from vit_pytorch_tpu.models.cct_3d import cct_2

    m = cct_2(img_size=32, num_frames=4, num_classes=10, positional_embedding="learnable")
    x = jnp.zeros((2, 3, 4, 32, 32))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_na_vit_nested_tensor_architecture():
    # the variant's real deltas: split q/k/v, LN qk-norm, biased patch LNs
    from flax.traverse_util import flatten_dict
    from vit_pytorch_tpu.models.na_vit_nested_tensor import NaViT
    from vit_pytorch_tpu.ops.packing import pack_images

    rng = np.random.default_rng(0)
    imgs = [rng.standard_normal((3, 32, 32)).astype(np.float32)]
    packed = pack_images(imgs, 16, max_seq_len=8)
    m = NaViT(image_size=32, patch_size=16, num_classes=5, dim=32, depth=1,
              heads=2, dim_head=16, mlp_dim=64)
    p = m.init(jax.random.PRNGKey(0), packed)
    flat = {"/".join(map(str, k)) for k in flatten_dict(p["params"])}
    assert "transformer/layers_0_attn/to_q/kernel" in flat
    assert "transformer/layers_0_attn/to_k/kernel" in flat
    assert "transformer/layers_0_attn/to_v/kernel" in flat
    assert "transformer/layers_0_attn/q_norm/scale" in flat
    assert "patch_norm_pre/bias" in flat  # biased patch-embed LN
    assert m.apply(p, packed).shape == (1, 1, 5)


def test_na_vit_nested_tensor_3d():
    from vit_pytorch_tpu.models.na_vit_nested_tensor_3d import NaViT, pack_volumes

    rng = np.random.default_rng(0)
    vols = [
        rng.standard_normal((3, 4, 32, 32)).astype(np.float32),
        rng.standard_normal((3, 2, 16, 16)).astype(np.float32),
        rng.standard_normal((3, 2, 32, 16)).astype(np.float32),
    ]
    packed = pack_volumes(vols, patch_size=16, frame_patch_size=2, max_seq_len=32)
    m = NaViT(image_size=32, max_frames=4, patch_size=16, frame_patch_size=2,
              num_classes=11, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64, num_registers=2)
    p = m.init(jax.random.PRNGKey(0), packed)
    out = m.apply(p, packed)
    assert out.shape == (1, 3, 11)
    assert np.all(np.isfinite(out))

    # packing each video alone gives the same logits (mask correctness)
    packed1 = pack_volumes([vols[1]], patch_size=16, frame_patch_size=2, max_seq_len=32)
    out1 = m.apply(p, packed1)
    np.testing.assert_allclose(
        np.asarray(out[0, 1]), np.asarray(out1[0, 0]), atol=1e-4, rtol=1e-4
    )


def test_jet_vit():
    from vit_pytorch_tpu.models.jet_vit import JetViT

    m = JetViT(image_size=64, patch_size=8, num_classes=10, dim=32, depth=3, heads=2, dim_head=16, mlp_dim=64,
               window_size=4, attn_layers=("FA", "WA", ("LA", "FA")))
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init({"params": jax.random.PRNGKey(0), "layer_select": jax.random.PRNGKey(1)}, x)
    assert m.apply(p, x).shape == (2, 10)
    out_t = m.apply(p, x, train=True, rngs={"layer_select": jax.random.PRNGKey(2)})
    assert out_t.shape == (2, 10)


def test_vit_detpool():
    from vit_pytorch_tpu.models.vit_detpool import ViTDetPool

    m = ViTDetPool(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)
    pixel_mask = jnp.zeros((2, 64, 64), bool).at[:, :32, :32].set(True)
    assert m.apply(p, x, pixel_mask).shape == (2, 10)
    token_mask = jnp.ones((2, 16), bool)
    assert m.apply(p, x, token_mask).shape == (2, 10)


def test_accept_video_wrapper():
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.wrappers.accept_video_wrapper import AcceptVideoWrapper

    v = ViT(image_size=32, patch_size=8, num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64)
    w = AcceptVideoWrapper(image_net=v, add_time_pos_emb=True, time_seq_len=12, dim_emb=10)
    videos = jnp.zeros((1, 3, 7, 32, 32))
    p = w.init(jax.random.PRNGKey(0), videos)
    assert w.apply(p, videos, True).shape == (1, 7, 10)


def test_simple_vit_remaining_variants():
    from vit_pytorch_tpu.models.simple_vit_orthog_residual_update import SimpleViT as OViT
    from vit_pytorch_tpu.models.simple_vit_with_hyper_connections import SimpleViT as HViT
    from vit_pytorch_tpu.models.simple_vit_with_specialized_cls import SimpleViT as SViT
    from vit_pytorch_tpu.models.simple_vit_attn_residual import SimpleViTAttnResidual

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))

    m = OViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64, orthog_learned=True)
    assert m.apply(m.init(jax.random.PRNGKey(0), x), x).shape == (2, 10)

    m = HViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64, num_residual_streams=4)
    assert m.apply(m.init(jax.random.PRNGKey(0), x), x).shape == (2, 10)

    m = SViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=3, heads=2, mlp_dim=64)
    assert m.apply(m.init(jax.random.PRNGKey(0), x), x).shape == (2, 10)

    m = SimpleViTAttnResidual(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    p = m.init(jax.random.PRNGKey(0), x)
    logits, hist = m.apply(p, x, None, True)
    assert logits.shape == (2, 10) and len(hist) == 5
    logits2, _ = m.apply(p, x, hist, True)
    assert logits2.shape == (2, 10)
