"""Orbax checkpoint round-trip (SURVEY §5 checkpoint/resume): save a train
state mid-run, restore into a fresh state, continue identically."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest


def test_checkpoint_roundtrip(tmp_path):
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.parallel.train import create_train_state, make_train_step
    from vit_pytorch_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

    model = ViT(image_size=32, patch_size=8, num_classes=5, dim=32, depth=1,
                heads=2, mlp_dim=64)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)), optax.adam(1e-3)
    )
    step = make_train_step(model, donate=False)

    imgs = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    labels = jnp.array([0, 1, 2, 3])
    rng = jax.random.PRNGKey(2)

    state, _ = step(state, imgs, labels, rng)
    save_checkpoint(str(tmp_path / "ckpt"), state, step=1)

    # fresh state restores to the saved one
    fresh = create_train_state(
        model, jax.random.PRNGKey(9), jnp.zeros((1, 3, 32, 32)), optax.adam(1e-3)
    )
    restored = restore_checkpoint(str(tmp_path / "ckpt"), fresh, step=1)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restore matches continuing from the original
    s1, m1 = step(state, imgs, labels, rng)
    s2, m2 = step(restored.replace(step=state.step), imgs, labels, rng)
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-6
    )
