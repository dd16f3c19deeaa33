"""Per-variant shape smoke tests — ports of the reference's ``__main__``
blocks and README usage examples (SURVEY §4), at small dims for CPU speed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _run(model, x, **apply_kw):
    params = model.init(jax.random.PRNGKey(0), x, **apply_kw)
    return model.apply(params, x, **apply_kw), params


def test_vit_1d():
    from vit_pytorch_tpu.models.vit_1d import ViT

    v = ViT(seq_len=256, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((4, 3, 256)))
    assert out.shape == (4, 10)


def test_vit_3d():
    from vit_pytorch_tpu.models.vit_3d import ViT

    v = ViT(
        image_size=32,
        image_patch_size=16,
        frames=8,
        frame_patch_size=2,
        num_classes=10,
        dim=32,
        depth=2,
        heads=2,
        mlp_dim=64,
    )
    out, _ = _run(v, jnp.zeros((2, 3, 8, 32, 32)))
    assert out.shape == (2, 10)


def test_simple_vit_1d():
    from vit_pytorch_tpu.models.simple_vit_1d import SimpleViT

    v = SimpleViT(seq_len=256, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((4, 3, 256)))
    assert out.shape == (4, 10)


def test_simple_vit_3d():
    from vit_pytorch_tpu.models.simple_vit_3d import SimpleViT

    v = SimpleViT(
        image_size=32,
        image_patch_size=16,
        frames=8,
        frame_patch_size=2,
        num_classes=10,
        dim=36,
        depth=2,
        heads=2,
        mlp_dim=64,
    )
    out, _ = _run(v, jnp.zeros((2, 3, 8, 32, 32)))
    assert out.shape == (2, 10)


def test_simple_vit_register_tokens():
    from vit_pytorch_tpu.models.simple_vit_with_register_tokens import SimpleViT

    v = SimpleViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_simple_vit_patch_dropout():
    from vit_pytorch_tpu.models.simple_vit_with_patch_dropout import SimpleViT

    v = SimpleViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64, patch_dropout=0.5)
    x = jnp.ones((2, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), x)
    out_eval = v.apply(params, x)
    assert out_eval.shape == (2, 10)
    out_train = v.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_train.shape == (2, 10)
    assert not np.allclose(out_eval, out_train)


def test_simple_vit_qk_norm():
    from vit_pytorch_tpu.models.simple_vit_with_qk_norm import SimpleViT

    v = SimpleViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    # reference head is a LayerNorm: output dim is `dim` (line 129)
    assert out.shape == (2, 32)


def test_vit_patch_dropout():
    from vit_pytorch_tpu.models.vit_with_patch_dropout import ViT

    v = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_deepvit():
    from vit_pytorch_tpu.models.deepvit import DeepViT

    v = DeepViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_cait():
    from vit_pytorch_tpu.models.cait import CaiT

    v = CaiT(
        image_size=64,
        patch_size=16,
        num_classes=10,
        dim=32,
        depth=2,
        cls_depth=1,
        heads=2,
        mlp_dim=64,
        layer_dropout=0.1,
    )
    x = jnp.ones((2, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), x)
    out = v.apply(params, x)
    assert out.shape == (2, 10)
    out_t = v.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_t.shape == (2, 10)


def test_mae():
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ssl.mae import MAE

    enc = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    mae = MAE(encoder=enc, decoder_dim=24, masking_ratio=0.75, decoder_depth=1)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 64, 64))
    params = mae.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, img)
    loss = mae.apply(params, img, rngs={"mask": jax.random.PRNGKey(2)})
    assert loss.shape == ()
    assert float(loss) > 0

    # gradient flows
    g = jax.grad(
        lambda p: mae.apply(p, img, rngs={"mask": jax.random.PRNGKey(2)})
    )(params)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)
