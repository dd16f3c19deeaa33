"""Device mesh + sharding utilities.

The reference delegates all parallelism to HuggingFace ``accelerate``
(train_vit_decorr.py:74-78).  Here parallelism is first-class and TPU-native:
a ``jax.sharding.Mesh`` over ('data', 'model') axes, params annotated with
``PartitionSpec``s, and XLA inserting the collectives over ICI.

Data parallel  : batch sharded on 'data'; gradients all-reduced by XLA.
Tensor parallel: attention qkv / mlp hidden sharded on 'model'
                 (Megatron-style column→row parallel pairs), optional — ViTs
                 are small, so 'model' usually stays size 1.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _available_devices(min_count: int = 1, allow_cpu_fallback: bool = False):
    """Devices for mesh building.  Uses the default backend; only falls back
    to host CPU devices (xla_force_host_platform_device_count) when the
    caller explicitly opts in — a mis-sized request on a real multi-chip job
    must error, not silently run on host CPUs."""
    devs = jax.devices()
    if len(devs) >= min_count:
        return devs
    if allow_cpu_fallback:
        try:
            cpu = jax.devices("cpu")
            if len(cpu) >= min_count:
                return cpu
        except RuntimeError:
            pass
    raise ValueError(
        f"make_mesh needs {min_count} devices but the default backend has "
        f"{len(devs)} ({devs[0].platform if devs else 'none'}). Pass "
        f"devices=jax.devices('cpu') (with xla_force_host_platform_device_count "
        f"set) to validate shardings on a virtual CPU mesh, or "
        f"allow_cpu_fallback=True to opt into the fallback explicitly."
    )


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
    **kwargs,
):
    """Multi-host entry point (SURVEY §2.5 comms row).

    Wraps ``jax.distributed.initialize``: on TPU pods every argument is
    auto-detected from the environment (call it with no args, one call per
    process, before any other JAX API); on CPU/GPU clusters pass
    ``coordinator_address`` ('host:port' of process 0), ``num_processes``
    and ``process_id``.  Idempotent — safe to call when the runtime is
    already initialized.

    After it returns, ``jax.devices()`` is the GLOBAL device set, so
    ``make_mesh()`` builds a global mesh whose collectives ride ICI within
    a slice and DCN across slices.  Feed each process its local slice of
    the batch (``utils.data.process_local_slice`` →
    ``prefetch_to_device(..., mesh=mesh)``) — the pipeline assembles
    global arrays via ``jax.make_array_from_process_local_data``.

    Returns ``(process_index, process_count)``.
    """
    from jax._src import distributed as _distributed

    if getattr(_distributed.global_state, "client", None) is None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
            **kwargs,
        )
    return jax.process_index(), jax.process_count()


def global_array_from_process_local(local, mesh: Mesh, spec: Optional[P] = None):
    """Assemble globally-sharded ``jax.Array``s from this process's shard of
    each leaf (leading axis split over 'data' by default).  Works
    single-process too (then it is just a sharded device_put)."""
    if spec is None:
        spec = P("data")
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(
            sharding, np.asarray(a)
        ),
        local,
    )


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices=None,
    allow_cpu_fallback: bool = False,
) -> Mesh:
    """Build a ('data', 'model') mesh.  ``data`` defaults to filling all
    devices after 'model' is taken."""
    if devices is None:
        devices = _available_devices(
            model if data is None else data * model, allow_cpu_fallback
        )
    n = len(devices)
    if data is None:
        data = n // model  # floor: the slice below uses the first data*model
        assert data >= 1, f"need at least {model} devices for model={model}, got {n}"
        if data * model < n:
            import warnings

            warnings.warn(
                f"make_mesh: {n} devices do not divide by model={model}; "
                f"using a {data}x{model} mesh and leaving "
                f"{n - data * model} device(s) idle",
                stacklevel=2,
            )
    assert data * model <= n, (
        f"mesh {data}x{model} needs {data * model} devices, got {n}"
    )
    dev_array = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


# (regex on '/'-joined param path, PartitionSpec) — first match wins.
# Column-parallel (output sharded): qkv, q, kv, fc1.  Row-parallel (input
# sharded, output all-reduced by XLA): to_out, fc2.
_TP_RULES = [
    (r".*/(to_qkv|to_q|to_kv)/kernel$", P(None, "model")),
    (r".*/fc1/kernel$", P(None, "model")),
    (r".*/fc1/bias$", P("model")),
    (r".*/(to_out|fc2)/kernel$", P("model", None)),
]


def param_partition_spec(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def infer_param_shardings(params, mesh: Mesh):
    """PartitionSpec pytree for a params pytree (tensor-parallel layout)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    specs = {}
    for key, value in flat.items():
        path = "/".join(str(k) for k in key)
        spec = param_partition_spec(path)
        # guard: axis must divide the dim, else replicate
        ok = True
        for dim, axis in zip(value.shape, spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                ok = False
        if not ok or len(spec) > value.ndim:
            spec = P()
        specs[key] = NamedSharding(mesh, spec)
    return unflatten_dict(specs)


def infer_param_shardings_fsdp(
    params, mesh: Mesh, *, min_size: int = 2**14
):
    """FSDP / ZeRO-3 layout: on top of the TP specs, shard each parameter's
    first still-unsharded divisible dimension over the 'data' axis.  XLA
    SPMD inserts the all-gathers before use and reduce-scatters the grads —
    the TPU-native formulation of FSDP (weights live sharded in HBM, ride
    ICI on demand).  Parameters smaller than ``min_size`` elements stay
    replicated (gather latency would dominate)."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    data_size = mesh.shape["data"]
    flat = flatten_dict(params)
    specs = {}
    for key, value in flat.items():
        path = "/".join(str(k) for k in key)
        tp_spec = param_partition_spec(path)
        # guard TP spec divisibility (same rule as infer_param_shardings)
        ok = True
        for dim, axis in zip(value.shape, tp_spec):
            if axis is not None and dim % mesh.shape[axis] != 0:
                ok = False
        if not ok or len(tp_spec) > value.ndim:
            tp_spec = P()

        axes = list(tp_spec) + [None] * (value.ndim - len(tp_spec))
        if value.size >= min_size:
            for d in range(value.ndim):
                if axes[d] is None and value.shape[d] % data_size == 0:
                    axes[d] = "data"
                    break
        specs[key] = NamedSharding(mesh, P(*axes))
    return unflatten_dict(specs)


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
