"""Multi-host entry point (SURVEY §2.5 comms row / VERDICT r3 #7).

Launches TWO separate processes, each with 2 virtual CPU devices, that join
one jax.distributed cluster (gloo CPU collectives), build one GLOBAL 4-device
mesh via ``initialize_distributed`` + ``make_mesh``, feed per-process batch
slices through ``process_local_slice`` → ``prefetch_to_device(mesh=...)``,
and run one data-parallel train step.  Both processes must agree with each
other AND with a single-process run over the same global batch.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax

from vit_pytorch_tpu.parallel.mesh import initialize_distributed, make_mesh

pid = int(sys.argv[1])
idx, cnt = initialize_distributed(
    coordinator_address="localhost:{port}", num_processes=2, process_id=pid,
)
assert (idx, cnt) == (pid, 2), (idx, cnt)
# idempotent: a second call must be a no-op, not a crash
assert initialize_distributed() == (pid, 2)
assert jax.device_count() == 4 and jax.local_device_count() == 2

import jax.numpy as jnp
import optax
from vit_pytorch_tpu.models.vit import ViT
from vit_pytorch_tpu.parallel.train import (
    create_train_state, make_sharded_train_step, shard_train_state,
)
from vit_pytorch_tpu.utils.data import process_local_slice, prefetch_to_device

mesh = make_mesh(data=4, model=1)

model = ViT(image_size=16, patch_size=8, num_classes=5, dim=32, depth=1,
            heads=2, mlp_dim=64)
state = create_train_state(
    model, jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)), optax.adam(1e-3)
)
state = shard_train_state(state, mesh)
step = make_sharded_train_step(model, mesh, donate=False)

# identical global data on every process (seeded identically)
g = np.random.default_rng(7)
X = g.normal(size=(8, 3, 16, 16)).astype(np.float32)
Y = g.integers(0, 5, size=(8,)).astype(np.int32)

local = process_local_slice({{"x": X, "y": Y}})
assert local["x"].shape[0] == 4
batches = prefetch_to_device(iter([local]), mesh=mesh)
b = next(batches)
assert b["x"].shape == (8, 3, 16, 16)  # reassembled GLOBAL shape

state, metrics = step(state, b["x"], b["y"], jax.random.PRNGKey(3))
print("LOSS", float(metrics["loss"]), flush=True)
"""


@pytest.mark.multihost
def test_two_process_global_mesh_matches_single_process(tmp_path):
    port = 23000 + os.getpid() % 2000
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=REPO, port=port))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    ).strip()

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"

    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSS ")]
        assert line, out
        losses.append(float(line[0].split()[1]))
    assert losses[0] == losses[1]

    # single-process ground truth over the same global batch
    import jax
    import jax.numpy as jnp
    import optax
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.parallel.train import create_train_state, make_train_step

    model = ViT(image_size=16, patch_size=8, num_classes=5, dim=32, depth=1,
                heads=2, mlp_dim=64)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)), optax.adam(1e-3)
    )
    g = np.random.default_rng(7)
    X = g.normal(size=(8, 3, 16, 16)).astype(np.float32)
    Y = g.integers(0, 5, size=(8,)).astype(np.int32)
    step = make_train_step(model, donate=False)
    _, metrics = step(state, jnp.asarray(X), jnp.asarray(Y), jax.random.PRNGKey(3))

    np.testing.assert_allclose(losses[0], float(metrics["loss"]),
                               rtol=2e-5, atol=1e-6)
