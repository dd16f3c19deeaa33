"""Smoke tests, batch 2: t2t, xcit, cross_vit, pit, parallel, patch merger,
small-dataset, local_vit."""

import jax
import jax.numpy as jnp


def _run(model, x, **kw):
    params = model.init(jax.random.PRNGKey(0), x, **kw)
    return model.apply(params, x, **kw), params


def test_t2t():
    from vit_pytorch_tpu.models.t2t import T2TViT

    v = T2TViT(image_size=64, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_xcit():
    from vit_pytorch_tpu.models.xcit import XCiT

    v = XCiT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, cls_depth=1, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_cross_vit():
    from vit_pytorch_tpu.models.cross_vit import CrossViT

    v = CrossViT(
        image_size=48,
        num_classes=10,
        sm_dim=24,
        lg_dim=32,
        sm_patch_size=8,
        lg_patch_size=16,
        sm_enc_depth=1,
        lg_enc_depth=1,
        sm_enc_heads=2,
        lg_enc_heads=2,
        sm_enc_mlp_dim=48,
        lg_enc_mlp_dim=64,
        cross_attn_depth=1,
        cross_attn_heads=2,
        depth=1,
    )
    out, _ = _run(v, jnp.zeros((2, 3, 48, 48)))
    assert out.shape == (2, 10)


def test_pit():
    from vit_pytorch_tpu.models.pit import PiT

    v = PiT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=(1, 1), heads=(2, 2), mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_parallel_vit():
    from vit_pytorch_tpu.models.parallel_vit import ViT

    v = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_patch_merger():
    from vit_pytorch_tpu.models.vit_with_patch_merger import ViT

    v = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=4, heads=2, mlp_dim=64, patch_merge_num_tokens=4)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_small_dataset_vit():
    from vit_pytorch_tpu.models.vit_for_small_dataset import ViT

    v = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_local_vit():
    from vit_pytorch_tpu.models.local_vit import LocalViT

    v = LocalViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_jumbo_vit():
    from vit_pytorch_tpu.models.jumbo_vit import JumboViT

    v = JumboViT(image_size=64, patch_size=8, num_classes=10, dim=16, depth=2, heads=2, mlp_dim=32, jumbo_cls_k=3, jumbo_ff_mult=2)
    out, _ = _run(v, jnp.zeros((1, 3, 64, 64)))
    assert out.shape == (1, 10)


def test_simple_uvit():
    from vit_pytorch_tpu.models.simple_uvit import SimpleUViT

    v = SimpleUViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=3, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)
