"""Portable model artifacts (serving.export_model / load_model): round-trip
equality, symbolic-batch generality, program-only artifacts, file I/O.
The reference deploys via torch state_dicts + model code; this is the
TPU-native equivalent (StableHLO program + separate checkpoint)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu import ViT
from vit_pytorch_tpu.serving import export_model, load_model


@pytest.fixture(scope="module")
def _vit():
    model = ViT(image_size=32, patch_size=8, num_classes=10, dim=64,
                depth=2, heads=4, dim_head=16, mlp_dim=128)
    x = jnp.zeros((1, 3, 32, 32), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables


def test_export_roundtrip_matches_apply(_vit):
    model, variables = _vit
    blob = export_model(model, variables, (3, 32, 32))
    fn = load_model(blob)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    np.testing.assert_allclose(
        np.asarray(fn(variables, x)),
        np.asarray(model.apply(variables, x)),
        atol=1e-6, rtol=1e-6,
    )


def test_export_symbolic_batch_serves_any_size(_vit):
    model, variables = _vit
    fn = load_model(export_model(model, variables, (3, 32, 32)))
    for k in (1, 3, 8):
        x = jnp.ones((k, 3, 32, 32))
        out = fn(variables, x)
        assert out.shape == (k, 10)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model.apply(variables, x)),
            atol=1e-6, rtol=1e-6,
        )


def test_export_artifact_is_program_only(_vit):
    """Weights travel separately: the blob is orders of magnitude smaller
    than the parameters, and different weights flow through the same
    artifact."""
    model, variables = _vit
    blob = export_model(model, variables, (3, 32, 32))
    param_bytes = sum(
        np.asarray(leaf).nbytes for leaf in jax.tree.leaves(variables)
    )
    assert len(blob) < param_bytes / 4
    fn = load_model(blob)
    doubled = jax.tree.map(lambda a: a * 2, variables)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    assert not np.allclose(
        np.asarray(fn(variables, x)), np.asarray(fn(doubled, x))
    )
    np.testing.assert_allclose(
        np.asarray(fn(doubled, x)), np.asarray(model.apply(doubled, x)),
        atol=1e-5, rtol=1e-5,
    )


def test_export_to_file_and_load(tmp_path, _vit):
    model, variables = _vit
    path = str(tmp_path / "vit.stablehlo")
    blob = export_model(model, variables, (3, 32, 32), path=path)
    assert (tmp_path / "vit.stablehlo").read_bytes() == blob
    fn = load_model(path)
    x = jnp.ones((2, 3, 32, 32))
    np.testing.assert_allclose(
        np.asarray(fn(variables, x)),
        np.asarray(model.apply(variables, x)),
        atol=1e-6, rtol=1e-6,
    )


def test_export_custom_apply_fn(_vit):
    """apply_fn overrides the default forward (e.g. feature extraction)."""
    model, variables = _vit

    def features(v, images):
        return model.apply(v, images) * 10.0

    fn = load_model(
        export_model(model, variables, (3, 32, 32), apply_fn=features)
    )
    x = jnp.ones((2, 3, 32, 32))
    np.testing.assert_allclose(
        np.asarray(fn(variables, x)),
        np.asarray(model.apply(variables, x)) * 10.0,
        atol=1e-5, rtol=1e-5,
    )


def test_loaded_model_composes_with_jit(_vit):
    model, variables = _vit
    fn = load_model(export_model(model, variables, (3, 32, 32)))

    @jax.jit
    def serve(v, x):
        return jax.nn.softmax(fn(v, x), axis=-1)

    out = serve(variables, jnp.ones((2, 3, 32, 32)))
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)


def test_export_mesh_sharded_serving(_vit):
    """Multi-chip serving artifact: exported with the Predictor layout
    (params replicated, batch on 'data'), loaded onto an equal-size mesh,
    must match the unsharded forward for every admissible batch size."""
    from vit_pytorch_tpu.parallel.mesh import make_mesh

    model, variables = _vit
    mesh = make_mesh(data=4, model=2, devices=jax.devices("cpu"))
    blob = export_model(model, variables, (3, 32, 32), mesh=mesh)
    fn = load_model(blob, mesh=mesh)
    for k in (4, 8):
        x = jax.random.normal(jax.random.PRNGKey(k), (k, 3, 32, 32))
        out = fn(variables, x)
        assert "data" in str(out.sharding.spec) or out.sharding.is_fully_replicated
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(model.apply(variables, x)),
            atol=1e-5, rtol=1e-5,
        )


def test_export_mesh_device_count_checked(_vit):
    from vit_pytorch_tpu.parallel.mesh import make_mesh

    model, variables = _vit
    mesh8 = make_mesh(data=8, devices=jax.devices("cpu"))
    blob = export_model(model, variables, (3, 32, 32), mesh=mesh8)
    with pytest.raises(ValueError, match="8 devices"):
        load_model(blob)  # single-device load of an 8-device artifact
    mesh4 = make_mesh(data=4, devices=jax.devices("cpu")[:4])
    with pytest.raises(ValueError, match="8 devices"):
        load_model(blob, mesh=mesh4)


def test_export_accepts_pathlib_and_host_params(tmp_path, _vit):
    """load_model takes os.PathLike; export_model reads shapes/dtypes from
    host-numpy variables without materializing them on device."""
    model, variables = _vit
    host_vars = jax.tree.map(lambda a: np.asarray(a), variables)
    path = tmp_path / "vit.stablehlo"
    export_model(model, host_vars, (3, 32, 32), path=path)
    fn = load_model(path)  # pathlib.Path, not str
    x = jnp.ones((2, 3, 32, 32))
    np.testing.assert_allclose(
        np.asarray(fn(host_vars, x)),
        np.asarray(model.apply(variables, x)),
        atol=1e-6, rtol=1e-6,
    )


def test_export_rejects_kwargs_with_custom_apply_fn(_vit):
    model, variables = _vit
    with pytest.raises(ValueError, match="apply_kwargs"):
        export_model(
            model, variables, (3, 32, 32),
            apply_fn=lambda v, x: model.apply(v, x), train=False,
        )
