"""ViT / SimpleViT: shape tests (port of reference tests/test_vit.py:1-21)
and fp32 logit parity against the PyTorch reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu import ViT, SimpleViT
from vit_pytorch_tpu.utils.convert import convert_vit, convert_simple_vit


def test_vit_shapes():
    v = ViT(
        image_size=256,
        patch_size=32,
        num_classes=1000,
        dim=64,
        depth=2,
        heads=4,
        mlp_dim=128,
        dropout=0.1,
        emb_dropout=0.1,
    )
    img = jnp.zeros((1, 3, 256, 256))
    params = v.init(jax.random.PRNGKey(0), img)
    preds = v.apply(params, img)
    assert preds.shape == (1, 1000)


def test_vit_mean_pool_and_no_head():
    v = ViT(
        image_size=64,
        patch_size=16,
        num_classes=0,
        dim=32,
        depth=1,
        heads=2,
        mlp_dim=64,
        pool="mean",
    )
    img = jnp.zeros((2, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), img)
    tokens = v.apply(params, img)
    # num_classes=0 → raw tokens (reference vit.py:116,132-133); mean pool → no cls
    assert tokens.shape == (2, 16, 32)


def test_vit_train_dropout_rng():
    v = ViT(
        image_size=64,
        patch_size=16,
        num_classes=10,
        dim=32,
        depth=1,
        heads=2,
        mlp_dim=64,
        dropout=0.5,
        emb_dropout=0.5,
    )
    img = jnp.ones((2, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), img)
    out1 = v.apply(params, img, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    out2 = v.apply(params, img, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(out1, out2)
    out_eval = v.apply(params, img)
    assert np.all(np.isfinite(out_eval))


def test_simple_vit_shapes():
    v = SimpleViT(
        image_size=256, patch_size=32, num_classes=1000, dim=64, depth=2, heads=4, mlp_dim=128
    )
    img = jnp.zeros((1, 3, 256, 256))
    params = v.init(jax.random.PRNGKey(0), img)
    preds = v.apply(params, img)
    assert preds.shape == (1, 1000)


@pytest.mark.parity
def test_vit_parity(reference, torch):
    ref = reference.ViT(
        image_size=64,
        patch_size=16,
        num_classes=37,
        dim=128,
        depth=3,
        heads=4,
        mlp_dim=256,
        dropout=0.0,
        emb_dropout=0.0,
    ).eval()
    img_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(img_t).numpy()

    ours = ViT(
        image_size=64,
        patch_size=16,
        num_classes=37,
        dim=128,
        depth=3,
        heads=4,
        mlp_dim=256,
    )
    params = convert_vit(ref.state_dict())
    got = ours.apply(params, jnp.asarray(img_t.numpy()))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)


@pytest.mark.parity
def test_simple_vit_parity(reference, torch):
    ref = reference.SimpleViT(
        image_size=64, patch_size=16, num_classes=37, dim=128, depth=3, heads=4, mlp_dim=256
    ).eval()
    img_t = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(img_t).numpy()

    ours = SimpleViT(
        image_size=64, patch_size=16, num_classes=37, dim=128, depth=3, heads=4, mlp_dim=256
    )
    params = convert_simple_vit(ref.state_dict())
    got = ours.apply(params, jnp.asarray(img_t.numpy()))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-4)
