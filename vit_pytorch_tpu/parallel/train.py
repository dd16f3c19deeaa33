"""Training layer: optax train step under jit over a device mesh.

Replaces the reference's ``accelerate``-based loop (train_vit_decorr.py:74-111)
with the TPU-native recipe: params laid out by PartitionSpec, batch sharded on
the 'data' mesh axis, gradient all-reduce + TP collectives inserted by XLA,
buffers donated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from .mesh import batch_sharding, infer_param_shardings, make_mesh, replicated


class TrainState(train_state.TrainState):
    pass


def cross_entropy_loss(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def create_train_state(
    model,
    rng,
    sample_input,
    tx: Optional[optax.GradientTransformation] = None,
    init_kwargs: Optional[dict] = None,
) -> TrainState:
    tx = tx if tx is not None else optax.adam(3e-4)
    params = model.init(rng, sample_input, **(init_kwargs or {}))["params"]
    return TrainState.create(
        apply_fn=model.apply, params=params, tx=tx
    )


def make_train_step(
    model,
    loss_fn: Callable = cross_entropy_loss,
    *,
    aux_loss_weight: float = 0.0,
    donate: bool = True,
    grad_accum: int = 1,
):
    """Build a jitted (state, images, labels, rng) → (state, metrics) step.

    ``aux_loss_weight``: for models returning (logits, aux_loss) like
    ViT+decorr (reference vit_with_decorr.py:190, train_vit_decorr.py:96-103).

    ``grad_accum``: number of microbatches per optimizer step.  The batch
    (whose leading dim must divide by it) is processed as ``grad_accum``
    sequential microbatches inside ONE jitted step — a ``lax.scan`` whose
    carry is the fp32 gradient sum — so a global batch whose activations
    exceed HBM still takes exactly one optimizer update.  Each microbatch
    gets its own dropout fold.  Gradients are averaged in fp32 before the
    update — equal to the full-batch mean for mean-reduced losses up to
    fp32 reduction-order rounding (equivalence-tested at atol 1e-6).
    """

    # honor the model argument: the step applies THIS model's forward, not
    # whatever apply_fn the state was created with (they normally agree, but
    # passing a different model must not be silently ignored)
    apply_fn = model.apply

    def grads_and_metrics(state, params, images, labels, dropout_rng):
        def compute_loss(params):
            out = apply_fn(
                {"params": params},
                images,
                train=True,
                rngs={
                    "dropout": dropout_rng,
                    "mask": jax.random.fold_in(dropout_rng, 1),
                    "decorr": jax.random.fold_in(dropout_rng, 2),
                },
            )
            if isinstance(out, tuple):
                logits, aux = out
                loss = loss_fn(logits, labels) + aux_loss_weight * aux
            else:
                logits = out
                loss = loss_fn(logits, labels)
            acc = jnp.mean(jnp.argmax(logits, -1) == labels)
            return loss, acc

        return jax.value_and_grad(compute_loss, has_aux=True)(params)

    def step(state: TrainState, images, labels, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        if grad_accum == 1:
            (loss, acc), grads = grads_and_metrics(
                state, state.params, images, labels, dropout_rng
            )
            state = state.apply_gradients(grads=grads)
            return state, {"loss": loss, "accuracy": acc}

        b = images.shape[0]
        assert b % grad_accum == 0, (b, grad_accum)
        mb = b // grad_accum
        images = images.reshape(grad_accum, mb, *images.shape[1:])
        labels = labels.reshape(grad_accum, mb, *labels.shape[1:])

        def micro(carry, xs):
            gsum, loss_sum, acc_sum = carry
            im, lab, i = xs
            (loss, acc), g = grads_and_metrics(
                state, state.params, im, lab, jax.random.fold_in(dropout_rng, i)
            )
            gsum = jax.tree.map(
                lambda a, x: a + x.astype(jnp.float32), gsum, g
            )
            return (gsum, loss_sum + loss, acc_sum + acc), None

        gsum0 = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params
        )
        (gsum, loss_sum, acc_sum), _ = jax.lax.scan(
            micro,
            (gsum0, jnp.float32(0.0), jnp.float32(0.0)),
            (images, labels, jnp.arange(grad_accum)),
        )
        grads = jax.tree.map(
            lambda g, p: (g / grad_accum).astype(p.dtype), gsum, state.params
        )
        state = state.apply_gradients(grads=grads)
        return state, {
            "loss": loss_sum / grad_accum,
            "accuracy": acc_sum / grad_accum,
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def shard_train_state(
    state: TrainState, mesh, *, fsdp: bool = False, fsdp_min_size: int = 2**14
) -> TrainState:
    """Lay out params (TP specs where they divide; replicated otherwise) and
    optimizer state across the mesh.

    ``fsdp=True`` additionally shards each parameter over the 'data' axis
    (ZeRO-3: weights + Adam moments live sharded in HBM; XLA all-gathers
    them on use and reduce-scatters grads over ICI).

    Optimizer moments (e.g. Adam mu/nu) are param-shaped pytrees inside the
    optax state — they follow the param PartitionSpecs, so TP/FSDP actually
    save optimizer memory instead of replicating 2x param bytes per chip.
    Scalars (step counts, schedules) are replicated.
    """
    from .mesh import infer_param_shardings_fsdp

    if fsdp:
        param_sh = infer_param_shardings_fsdp(
            state.params, mesh, min_size=fsdp_min_size
        )
    else:
        param_sh = infer_param_shardings(state.params, mesh)
    params = jax.device_put(state.params, param_sh)

    param_struct = jax.tree.structure(state.params)

    def _is_param_like(subtree) -> bool:
        try:
            return jax.tree.structure(subtree) == param_struct
        except Exception:
            return False

    def _place(subtree):
        if _is_param_like(subtree):
            return jax.device_put(subtree, param_sh)
        return jax.device_put(subtree, replicated(mesh))

    opt_state = jax.tree.map(_place, state.opt_state, is_leaf=_is_param_like)
    return state.replace(params=params, opt_state=opt_state)


def make_sharded_train_step(model, mesh, loss_fn: Callable = cross_entropy_loss, **kw):
    """Train step whose inputs carry explicit shardings: batch on 'data',
    state as laid out by ``shard_train_state``."""
    step = make_train_step(model, loss_fn, **kw)

    def sharded_step(state, images, labels, rng):
        images = jax.device_put(images, batch_sharding(mesh))
        labels = jax.device_put(labels, batch_sharding(mesh))
        return step(state, images, labels, rng)

    return sharded_step
