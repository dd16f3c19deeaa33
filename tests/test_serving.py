"""Serving layer (vit_pytorch_tpu/serving.py): bucket padding, chunking,
AOT compilation, and mesh-sharded serving on the virtual 8-device CPU mesh.
No reference counterpart (the reference serves eager torch modules)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_pytorch_tpu import ViT
from vit_pytorch_tpu.parallel.mesh import make_mesh
from vit_pytorch_tpu.serving import Predictor

DIMS = dict(
    image_size=16,
    patch_size=4,
    num_classes=7,
    dim=24,
    depth=1,
    heads=2,
    mlp_dim=32,
    dim_head=12,
)
EX = (3, 16, 16)


@pytest.fixture(scope="module")
def model_and_vars():
    model = ViT(**DIMS)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, *EX)))
    return model, variables


def test_padding_matches_direct_apply(model_and_vars):
    """A padded bucket run must equal applying the model directly (fp32
    serving dtype so there is no cast discrepancy)."""
    model, variables = model_and_vars
    p = Predictor(
        model,
        variables,
        example_shape=EX,
        batch_sizes=(4, 8),
        param_dtype=jnp.float32,
        aot=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (3, *EX))  # pads 3 -> 4
    want = model.apply(variables, x)
    got = p(x)
    assert got.shape == (3, DIMS["num_classes"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_chunking_beyond_largest_bucket(model_and_vars):
    """k=11 with buckets (2, 4): chunks of 4, 4, 3(padded to 4)."""
    model, variables = model_and_vars
    p = Predictor(
        model,
        variables,
        example_shape=EX,
        batch_sizes=(2, 4),
        param_dtype=jnp.float32,
        aot=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (11, *EX))
    want = model.apply(variables, x)
    got = p(x)
    assert got.shape == (11, DIMS["num_classes"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_aot_compiles_all_buckets(model_and_vars):
    model, variables = model_and_vars
    p = Predictor(
        model,
        variables,
        example_shape=EX,
        batch_sizes=(2, 4),
        param_dtype=jnp.float32,
    )
    assert p.compiled_buckets == (2, 4)
    cost = p.cost_analysis(4)
    assert cost.get("flops", 0) > 0


def test_bf16_serving_dtype(model_and_vars):
    """Default bf16 cast: outputs close to fp32 at bf16 tolerance."""
    model, variables = model_and_vars
    p = Predictor(model, variables, example_shape=EX, batch_sizes=(2,), aot=False)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, *EX))
    want = model.apply(variables, x)
    got = p(x)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.1
    )


def test_mesh_sharded_serving_matches_single_device(model_and_vars):
    """Params replicated + batch sharded on 'data' over 8 virtual devices
    must produce the same logits as unsharded serving."""
    model, variables = model_and_vars
    mesh = make_mesh(data=8, devices=jax.devices("cpu"))
    p_single = Predictor(
        model,
        variables,
        example_shape=EX,
        batch_sizes=(8,),
        param_dtype=jnp.float32,
        aot=False,
    )
    p_mesh = Predictor(
        model,
        variables,
        example_shape=EX,
        batch_sizes=(8,),
        param_dtype=jnp.float32,
        mesh=mesh,
        aot=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(4), (8, *EX))
    np.testing.assert_allclose(
        np.asarray(p_mesh(x)), np.asarray(p_single(x)), atol=1e-5
    )


def test_mesh_rejects_indivisible_buckets(model_and_vars):
    model, variables = model_and_vars
    mesh = make_mesh(data=8, devices=jax.devices("cpu"))
    with pytest.raises(ValueError, match="multiples"):
        Predictor(
            model,
            variables,
            example_shape=EX,
            batch_sizes=(3,),
            mesh=mesh,
            aot=False,
        )


def test_from_checkpoint_roundtrip(model_and_vars, tmp_path):
    """save_checkpoint -> Predictor.from_checkpoint serves the restored
    weights (same logits as the in-memory Predictor)."""
    from vit_pytorch_tpu.utils.checkpoint import save_checkpoint

    model, variables = model_and_vars
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, variables)

    p = Predictor.from_checkpoint(
        model,
        path,
        jnp.zeros((1, *EX)),
        batch_sizes=(2,),
        param_dtype=jnp.float32,
        aot=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(9), (2, *EX))
    want = model.apply(variables, x)
    np.testing.assert_allclose(np.asarray(p(x)), np.asarray(want), atol=1e-5)


def test_shape_validation(model_and_vars):
    model, variables = model_and_vars
    p = Predictor(model, variables, example_shape=EX, batch_sizes=(2,), aot=False)
    with pytest.raises(ValueError, match="expected"):
        p(jnp.ones((2, 3, 8, 8)))
