"""Smoke tests, batch 4: sep_vit, scalable_vit, rvt, ats_vit."""

import jax
import jax.numpy as jnp
import numpy as np


def test_sep_vit():
    from vit_pytorch_tpu.models.sep_vit import SepViT

    m = SepViT(num_classes=10, dim=16, dim_head=8, heads=(1, 2, 4, 8), depth=(1, 1, 1, 1), window_size=2)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_scalable_vit():
    from vit_pytorch_tpu.models.scalable_vit import ScalableViT

    m = ScalableViT(num_classes=10, dim=16, depth=(1, 1), heads=(2, 2), reduction_factor=(2, 1),
                    window_size=(4, 2), ssa_dim_key=8, ssa_dim_value=8, iwsa_dim_key=8, iwsa_dim_value=8)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_rvt():
    from vit_pytorch_tpu.models.rvt import RvT

    m = RvT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_ats_vit():
    from vit_pytorch_tpu.models.ats_vit import ViT

    m = ViT(image_size=64, patch_size=8, num_classes=10, dim=32, depth=4,
            max_tokens_per_depth=(32, 32, 16, 8), heads=2, mlp_dim=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    p = m.init({"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)}, x)
    logits, ids = m.apply(p, x, True, rngs={"sampling": jax.random.PRNGKey(2)})
    assert logits.shape == (2, 10)
    # final token count bounded by the last budget (reference ats_vit.py:178-182)
    assert ids.shape == (2, 8)
    # padding marked with -1; real ids within range
    ids = np.asarray(ids)
    assert ((ids >= -1) & (ids < 64)).all()


def test_vit_nd_family():
    from vit_pytorch_tpu.models.vit_nd import ViTND
    from vit_pytorch_tpu.models.vit_nd_rotary import ViTND as RotViTND
    from vit_pytorch_tpu.models.vit_nd_pope import ViTND as PopeViTND

    m = ViTND(ndim=4, input_shape=(4, 8, 8, 16), patch_size=(2, 2, 4, 8), num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64)
    x = jnp.zeros((2, 3, 4, 8, 8, 16))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)

    m2 = RotViTND(ndim=3, input_shape=(4, 8, 16), patch_size=(2, 4, 8), num_classes=10, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64)
    x2 = jnp.zeros((2, 3, 4, 8, 16))
    p2 = m2.init(jax.random.PRNGKey(0), x2)
    assert m2.apply(p2, x2).shape == (2, 10)
    assert m2.apply(p2, x2, True).shape == (2, 2, 2, 2, 32)

    m3 = PopeViTND(ndim=3, input_shape=(4, 8, 16), patch_size=(2, 4, 8), num_classes=10, dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64)
    p3 = m3.init(jax.random.PRNGKey(0), x2)
    assert m3.apply(p3, x2).shape == (2, 10)


def test_crossformer():
    from vit_pytorch_tpu.models.crossformer import CrossFormer

    m = CrossFormer(dim=(32, 48, 64, 96), depth=(1, 1, 1, 1), global_window_size=(4, 2, 2, 1), local_window_size=2,
                    cross_embed_kernel_sizes=((2, 4), (2, 4), (2, 4), (2, 4)), cross_embed_strides=(2, 2, 2, 2), num_classes=10)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)


def test_regionvit():
    from vit_pytorch_tpu.models.regionvit import RegionViT

    m = RegionViT(dim=(16, 24, 32, 48), depth=(1, 1, 1, 1), window_size=2, local_patch_size=2, num_classes=10, use_peg=True)
    x = jnp.zeros((2, 3, 64, 64))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 10)
