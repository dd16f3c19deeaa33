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


def test_checkpoint_manager_retention_and_latest(tmp_path):
    """keep-N retention + step discovery (VERDICT r3 #8)."""
    from vit_pytorch_tpu.utils.checkpoint import CheckpointManager

    state = {"w": jnp.arange(4.0), "count": jnp.int32(0)}
    with CheckpointManager(str(tmp_path / "ckpts"), max_to_keep=2) as mgr:
        assert mgr.latest_step() is None
        with pytest.raises(FileNotFoundError):
            mgr.restore(state)
        for step in range(1, 6):
            mgr.save(step, {"w": state["w"] * step, "count": jnp.int32(step)})
        mgr.wait_until_finished()
        assert mgr.latest_step() == 5
        assert list(mgr.all_steps()) == [4, 5]

    # a fresh manager discovers the steps on disk
    with CheckpointManager(str(tmp_path / "ckpts")) as mgr2:
        assert mgr2.latest_step() == 5
        restored = mgr2.restore(state)
        np.testing.assert_array_equal(np.asarray(restored["w"]),
                                      np.arange(4.0) * 5)
        restored4 = mgr2.restore(state, step=4)
        assert int(restored4["count"]) == 4


def _digits_train(epochs, ckpt_dir, resume, n=256):
    """Miniature of examples/train_digits.py's loop (same per-epoch derived
    RNG + CheckpointManager wiring) on the real sklearn digits data."""
    import optax
    from examples.train_digits import load_data
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.utils.checkpoint import CheckpointManager
    from vit_pytorch_tpu.utils.data import minibatches

    x_train, y_train, _, _ = load_data()
    x_train, y_train = x_train[:n], y_train[:n]

    model = ViT(image_size=8, patch_size=2, num_classes=10, dim=16, depth=1,
                heads=2, dim_head=8, mlp_dim=32, channels=1, dropout=0.1,
                emb_dropout=0.1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8)))["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, imgs, labels, dropout_rng):
        def loss_fn(p):
            logits = model.apply({"params": p}, imgs, train=True,
                                 rngs={"dropout": dropout_rng})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with CheckpointManager(ckpt_dir, max_to_keep=3) as mgr:
        start_epoch = 0
        if resume and mgr.latest_step() is not None:
            restored = mgr.restore({"params": params, "opt_state": opt_state})
            params, opt_state = restored["params"], restored["opt_state"]
            start_epoch = mgr.latest_step()
        for epoch in range(start_epoch, epochs):
            key = jax.random.fold_in(jax.random.PRNGKey(1), epoch)
            data_rng = np.random.default_rng((1, epoch))
            for batch in minibatches({"x": x_train, "y": y_train}, 64,
                                     rng=data_rng):
                key, dk = jax.random.split(key)
                params, opt_state, _ = train_step(
                    params, opt_state, batch["x"], batch["y"], dk
                )
            mgr.save(epoch + 1, {"params": params, "opt_state": opt_state})
    return params


def test_resume_mid_training_bit_exact(tmp_path):
    """Interrupt after 2 epochs, resume from the checkpoint, finish at 4 —
    the params must be BIT-exact with an uninterrupted 4-epoch run
    (train_digits.py --resume contract, VERDICT r3 #8)."""
    p_full = _digits_train(4, str(tmp_path / "full"), resume=False)
    _digits_train(2, str(tmp_path / "split"), resume=False)
    p_resumed = _digits_train(4, str(tmp_path / "split"), resume=True)

    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_resumed)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
