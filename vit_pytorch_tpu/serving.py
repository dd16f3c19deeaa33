"""Serving layer: ahead-of-time-compiled, bucket-batched TPU inference.

No reference counterpart — the reference (lucidrains/vit-pytorch) serves by
calling the torch module eagerly.  On TPU that strategy fails three ways:

1. XLA requires **static shapes**: every distinct batch size is a separate
   compilation, and the first ViT-B compile costs tens of seconds.  A server
   that compiles on the first request of each size has unbounded tail
   latency.
2. Serving weights should be **bf16** (2x HBM bandwidth, MXU-native), while
   training checkpoints are fp32.
3. Multi-chip serving wants the batch **sharded over a mesh** with the
   params replicated — XLA inserts the collectives; the caller should not
   hand-roll any of it.

``Predictor`` solves all three: it pads every request up to a fixed set of
batch-size buckets, AOT-compiles one executable per bucket at construction
time (``jax.jit(...).lower(...).compile()``), casts params once to the
serving dtype, and optionally lays params/batch out over a
``jax.sharding.Mesh``.  Requests larger than the biggest bucket are chunked.

Example::

    model = ViT(image_size=224, patch_size=16, num_classes=1000, ...)
    variables = model.init(key, jnp.ones((1, 3, 224, 224)))
    p = Predictor(model, variables, example_shape=(3, 224, 224),
                  batch_sizes=(1, 8, 32, 128))
    logits = p(images)          # images: (k, 3, 224, 224), any k
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cast_floating(tree, dtype):
    def cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return jnp.asarray(x)

    return jax.tree.map(cast, tree)


def _serving_shardings(mesh: Mesh, example_rank: int):
    """THE serving layout, defined once: params replicated, batch sharded
    over the mesh's ``'data'`` axis.  Shared by Predictor, export_model,
    and load_model so the three can never drift."""
    if "data" not in mesh.axis_names:
        raise ValueError(f"mesh must have a 'data' axis, got {mesh.axis_names}")
    param_sharding = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P("data", *([None] * example_rank)))
    return param_sharding, batch_sharding


class Predictor:
    """Bucket-batched, AOT-compiled inference wrapper for any zoo model.

    Args:
        model: a Flax module from the zoo (or ``None`` when ``apply_fn`` is
            given).
        variables: the model's variable dict (``{'params': ...}`` plus any
            ``batch_stats`` etc.).  Floating leaves are cast to
            ``param_dtype`` once, up front.
        example_shape: per-example input shape, e.g. ``(3, 224, 224)``.
        batch_sizes: bucket sizes, ascending.  Each gets its own compiled
            executable; requests are padded up to the smallest bucket that
            fits (and chunked by the largest when bigger).
        param_dtype: serving dtype for params (default bf16 — the MXU-native
            choice; pass ``jnp.float32`` to serve exactly the checkpoint).
        input_dtype: dtype the batch is cast to (defaults to
            ``param_dtype``).
        apply_fn: optional override ``(variables, batch) -> out`` for models
            whose ``apply`` needs extra kwargs (masks, ``train=False`` flags
            that are not the default, wrapper methods, ...).
        mesh: optional ``jax.sharding.Mesh`` with a ``'data'`` axis.  Params
            are replicated, the batch is sharded on ``'data'`` — each bucket
            size must be a multiple of the data-axis size.
        aot: compile all buckets at construction (default).  With
            ``aot=False`` each bucket compiles lazily on first use
            (``warmup()`` compiles the rest).
    """

    def __init__(
        self,
        model,
        variables,
        *,
        example_shape: Sequence[int],
        batch_sizes: Sequence[int] = (1, 8, 32, 128),
        param_dtype=jnp.bfloat16,
        input_dtype=None,
        apply_fn: Optional[Callable] = None,
        mesh: Optional[Mesh] = None,
        aot: bool = True,
    ):
        if not batch_sizes:
            raise ValueError("need at least one batch-size bucket")
        self.batch_sizes = tuple(sorted(set(int(b) for b in batch_sizes)))
        self.example_shape = tuple(example_shape)
        self.param_dtype = param_dtype
        self.input_dtype = input_dtype or param_dtype
        self.mesh = mesh

        if apply_fn is None:
            if model is None:
                raise ValueError("pass either model or apply_fn")
            apply_fn = lambda v, x: model.apply(v, x)
        self._apply = apply_fn

        if mesh is not None:
            self._param_sharding, self._batch_sharding = _serving_shardings(
                mesh, len(self.example_shape)
            )
            ndata = mesh.shape["data"]
            bad = [b for b in self.batch_sizes if b % ndata]
            if bad:
                raise ValueError(
                    f"bucket sizes {bad} are not multiples of the data-axis "
                    f"size {ndata} — each bucket shards evenly over 'data'"
                )
        else:
            self._param_sharding = None
            self._batch_sharding = None

        variables = _cast_floating(variables, param_dtype)
        if self._param_sharding is not None:
            variables = jax.device_put(
                variables, jax.tree.map(lambda _: self._param_sharding, variables)
            )
        self.variables = variables

        self._compiled = {}
        if aot:
            self.warmup()

    @classmethod
    def from_checkpoint(cls, model, path, sample_input, **kwargs):
        """Restore params from an orbax checkpoint written by
        ``utils.checkpoint.save_checkpoint({'params': ...})`` (or of a full
        variables dict) and build a Predictor in one call.

        ``sample_input``: one example WITH batch dim, e.g.
        ``jnp.zeros((1, 3, 224, 224))`` — used both to derive the restore
        structure via ``jax.eval_shape`` (no FLOPs) and as the default
        ``example_shape``.
        """
        from .utils.checkpoint import restore_checkpoint

        # abstract target only (materializing zeros would double peak memory
        # at load) — but orbax needs a concrete sharding per leaf, so attach
        # the default device's (a scalar probe respects jax.default_device)
        dev_sharding = jax.sharding.SingleDeviceSharding(
            next(iter(jnp.zeros(()).devices()))
        )
        target = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), sample_input)
        )
        target = jax.tree.map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=dev_sharding),
            target,
        )
        variables = restore_checkpoint(path, target)
        kwargs.setdefault("example_shape", sample_input.shape[1:])
        return cls(model, variables, **kwargs)

    # -- compilation ------------------------------------------------------

    def _compile(self, bucket: int):
        x_struct = jax.ShapeDtypeStruct(
            (bucket, *self.example_shape), self.input_dtype
        )
        if self._batch_sharding is not None:
            x_struct = jax.ShapeDtypeStruct(
                x_struct.shape, x_struct.dtype, sharding=self._batch_sharding
            )
        # concrete params are fine for lower(): only their avals (+committed
        # shardings) are used — no forward runs here
        return jax.jit(self._apply).lower(self.variables, x_struct).compile()

    def warmup(self):
        """Compile every bucket that is not compiled yet (blocking)."""
        for b in self.batch_sizes:
            if b not in self._compiled:
                self._compiled[b] = self._compile(b)
        return self

    @property
    def compiled_buckets(self):
        return tuple(sorted(self._compiled))

    def cost_analysis(self, bucket: Optional[int] = None):
        """XLA cost analysis (flops, bytes accessed) for one bucket."""
        b = bucket or self.batch_sizes[-1]
        if b not in self._compiled:
            self._compiled[b] = self._compile(b)
        return self._compiled[b].cost_analysis()

    # -- dispatch ---------------------------------------------------------

    def _bucket_for(self, k: int) -> int:
        for b in self.batch_sizes:
            if b >= k:
                return b
        return self.batch_sizes[-1]

    def _run_padded(self, x):
        """x.shape[0] <= largest bucket: pad up, run, slice back."""
        k = x.shape[0]
        b = self._bucket_for(k)
        if b not in self._compiled:
            self._compiled[b] = self._compile(b)
        if k != b:
            pad = jnp.zeros((b - k, *self.example_shape), self.input_dtype)
            x = jnp.concatenate([x, pad], axis=0)
        if self._batch_sharding is not None:
            x = jax.device_put(x, self._batch_sharding)
        out = self._compiled[b](self.variables, x)
        return jax.tree.map(lambda o: o[:k], out)

    def __call__(self, x):
        """Run inference on ``x`` of shape ``(k, *example_shape)``, any k."""
        x = jnp.asarray(x, self.input_dtype)
        if x.shape[1:] != self.example_shape:
            raise ValueError(
                f"expected (k, {self.example_shape}), got {x.shape}"
            )
        k = x.shape[0]
        big = self.batch_sizes[-1]
        if k <= big:
            return self._run_padded(x)
        # chunk by the largest bucket; the remainder pads into its own bucket
        outs = [
            self._run_padded(x[i : i + big]) for i in range(0, k, big)
        ]
        return jax.tree.map(lambda *os: jnp.concatenate(os, axis=0), *outs)


# ---------------------------------------------------------------------------
# Portable model artifacts (jax.export / StableHLO)
#
# The reference's deployment story is torch's (state_dict + python code, or
# torchscript/ONNX).  The TPU-native equivalent is a serialized StableHLO
# program with a SYMBOLIC batch dimension: one artifact serves any batch
# size, can be loaded in a process that does not have (or import) the model
# code, and recompiles locally on load — which also sidesteps the axon
# plugin's broken compiled-executable serialization.  The artifact contains
# the PROGRAM only; parameters ship separately (orbax checkpoints), so
# weight updates do not re-export.
# ---------------------------------------------------------------------------


def export_model(
    model,
    variables,
    example_shape: Sequence[int],
    *,
    input_dtype=jnp.float32,
    batch_symbol: str = "b",
    platforms: Optional[Sequence[str]] = None,
    path: Optional[str] = None,
    apply_fn: Optional[Callable] = None,
    mesh: Optional[Mesh] = None,
    **apply_kwargs,
) -> bytes:
    """Serialize ``model.apply(variables, images)`` as a portable artifact.

    The batch dimension is exported symbolically (``batch_symbol``), so the
    loaded program accepts any batch size without re-export.  ``variables``
    is used only for its shapes/dtypes — the artifact takes parameters as a
    call argument, pairing naturally with checkpoints.

    ``platforms`` pins the lowering targets (e.g. ``("tpu", "cpu")``);
    default is the export-time backend.  Kernel dispatch (Pallas vs XLA) is
    decided at trace time: export from a CPU process for a
    run-anywhere XLA artifact, export on TPU for the kernel-optimal one.

    ``mesh`` exports a MULTI-CHIP serving program with the Predictor's
    layout baked in (params replicated, batch sharded over the ``'data'``
    axis — XLA inserts the collectives).  The symbolic batch is constrained
    to multiples of the data-axis size, and the artifact must be loaded
    with an equal-size mesh (``load_model(..., mesh=...)``).

    Returns the serialized bytes; also writes ``path`` when given.
    """
    from jax import export as jexport

    if apply_fn is None:
        def apply_fn(v, images):
            return model.apply(v, images, **apply_kwargs)
    elif apply_kwargs:
        raise ValueError(
            f"apply_kwargs {sorted(apply_kwargs)} are folded into the DEFAULT "
            "apply_fn — with a custom apply_fn, bake them into it instead"
        )

    jit_kw = {}
    if mesh is not None:
        param_sh, batch_sh = _serving_shardings(mesh, len(tuple(example_shape)))
        ndata = mesh.shape["data"]
        batch_symbol = f"{ndata}*{batch_symbol}" if ndata > 1 else batch_symbol
        jit_kw["in_shardings"] = (param_sh, batch_sh)

    (b,) = jexport.symbolic_shape(batch_symbol)
    xspec = jax.ShapeDtypeStruct((b, *tuple(example_shape)), input_dtype)
    # shapes/dtypes only — never materialize the leaves (host numpy params
    # must not pay a device transfer just to be inspected)
    vspec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        variables,
    )
    if platforms is None:
        # respect a jax_default_device override the same way on_tpu() does:
        # under a pinned-CPU process (tests; the axon plugin ignores
        # JAX_PLATFORMS) jax.export would otherwise target the idle TPU
        # backend and the loaded program would refuse to run on CPU
        dev = jax.config.jax_default_device
        if dev is not None:
            plat = dev.split(":")[0] if isinstance(dev, str) else dev.platform
            platforms = (plat.lower(),)
    kw = {} if platforms is None else {"platforms": tuple(platforms)}
    exported = jexport.export(jax.jit(apply_fn, **jit_kw), **kw)(vspec, xspec)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


def load_model(blob_or_path, *, mesh: Optional[Mesh] = None) -> Callable:
    """Load an :func:`export_model` artifact; returns
    ``fn(variables, images) -> outputs`` (jit-compatible, any batch size).

    Accepts the raw bytes or a filesystem path.  The program recompiles
    locally on first call — no model code import needed.

    An artifact exported with a mesh must be loaded with a mesh of the
    same device count; ``fn`` then places params replicated and the batch
    on the ``'data'`` axis before each call (a no-op for already-placed
    arrays), matching the layout baked in at export.
    """
    import os

    from jax import export as jexport

    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as f:
            blob = f.read()
    else:
        blob = blob_or_path
    exported = jexport.deserialize(blob)
    if mesh is not None and mesh.size != exported.nr_devices:
        raise ValueError(
            f"artifact was exported for {exported.nr_devices} devices; "
            f"the given mesh has {mesh.size}"
        )
    if mesh is None and exported.nr_devices > 1:
        raise ValueError(
            f"artifact was exported for {exported.nr_devices} devices — "
            "pass load_model(..., mesh=...) with an equal-size mesh"
        )

    if mesh is None:
        def fn(variables, images):
            return exported.call(variables, images)
    else:
        def fn(variables, images):
            images = jnp.asarray(images)
            rep, batch_sh = _serving_shardings(mesh, images.ndim - 1)
            variables = jax.device_put(
                variables, jax.tree.map(lambda _: rep, variables)
            )
            return exported.call(variables, jax.device_put(images, batch_sh))

    return fn
