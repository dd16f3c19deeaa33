"""Dino — self-distillation with no labels (reference dino.py:184-303).

JAX redesign of the reference's three kinds of hidden state (SURVEY §3.4):
  - teacher = deepcopy-on-first-forward + EMA (dino.py:251-263)   → explicit
    ``DinoState.teacher_params`` pytree updated by ``update_moving_average``
  - centers updated in-place via buffers (dino.py:236-239, 299-300) → fields
    of ``DinoState``; the forward *returns* the new ``last_teacher_centers``
  - lazily-built projector via forward hook + @singleton (dino.py:134-172)
    → the projector is a flax submodule created at init (flax's init trace
    plays the role of the reference's mock forward, dino.py:249)

Augmentations are the jax pipeline in ssl/augment.py with explicit keys.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from ..nn.blocks import gelu as _gelu
from flax import struct

from ..utils.helpers import default, exists
from .augment import byol_augment, random_resized_crop


def dino_loss_fn(
    teacher_logits,
    student_logits,
    teacher_temp,
    student_temp,
    centers,
    eps=1e-20,
):
    """reference dino.py:42-53."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_probs = jax.nn.softmax(student_logits / student_temp, axis=-1)
    teacher_probs = jax.nn.softmax((teacher_logits - centers) / teacher_temp, axis=-1)
    return -jnp.mean(
        jnp.sum(teacher_probs * jnp.log(student_probs + eps), axis=-1)
    )


class MLP(nn.Module):
    """Projector (reference dino.py:92-114): Linear/GELU chain → L2Norm →
    final Linear.

    ``l2norm_axis``: the reference's L2Norm always normalizes over dim=1
    (dino.py:88-90) — the feature axis for 2-D inputs, but the REGION axis
    for EsViT's 3-D region tensor (es_vit.py:214-218).  Default -1 covers
    the 2-D case; EsViT's region projector passes 1."""

    dim_out: int
    num_layers: int
    hidden_size: int = 256
    l2norm_axis: int = -1

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_size, name=f"fc{i}")(x)
            x = _gelu(x)
        norm = jnp.maximum(
            jnp.linalg.norm(x, axis=self.l2norm_axis, keepdims=True), 1e-6
        )
        x = x / norm
        return nn.Dense(self.dim_out, name="out")(x)


class NetWrapper(nn.Module):
    """reference dino.py:120-180 — captures a hidden layer of ``net`` and
    projects it.  ``layer``: module name (str) for capture_intermediates, or
    -1 for the net's final output."""

    net: Any
    output_dim: int
    projection_hidden_size: int
    projection_num_layers: int
    layer: Any = "transformer"

    @nn.compact
    def __call__(self, x, return_projection: bool = True):
        if self.layer == -1:
            hidden = self.net(x)
        else:
            hidden = self._capture(x)
        b = hidden.shape[0]
        hidden = hidden.reshape(b, -1)
        if not return_projection:
            return hidden
        proj = MLP(
            dim_out=self.output_dim,
            num_layers=self.projection_num_layers,
            hidden_size=self.projection_hidden_size,
            name="projector",
        )(hidden)
        return proj, hidden

    def _capture(self, x):
        """The forward-hook equivalent: intercept the named submodule's
        ``__call__`` output while running the wrapped net."""
        return capture_hidden(self.net, x, self.layer)


def capture_hidden(net, x, layer):
    """Run ``net(x)`` and return the output of the submodule NAMED ``layer``
    (flax's jit-safe forward-hook equivalent; shared by Dino, LeJEPA and
    EsViT).  The reference addresses modules by name or index
    (dino.py:87-95, default -2); flax has no module indexing, so anything
    but a matching NAME is a hard error — a silent fallback here would
    train the projector on classifier logits."""
    if not isinstance(layer, str):
        raise ValueError(
            f"hidden_layer must be a flax submodule NAME (e.g. "
            f"'transformer'), got {layer!r} — -1 (the net's final output) "
            f"is handled by the wrapper; other integer indices from the "
            f"torch reference have no flax equivalent"
        )
    captured = {}

    def interceptor(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        if (
            context.module.name == layer
            and context.method_name == "__call__"
            and "value" not in captured
        ):
            captured["value"] = out
        return out

    with nn.intercept_methods(interceptor):
        net(x)

    if "value" not in captured:
        # reference dino.py:141: 'hidden layer ... never emitted an output'
        raise ValueError(f"hidden layer {layer!r} never emitted an output")
    value = captured["value"]
    if isinstance(value, tuple):
        value = value[0]
    return value


@struct.dataclass
class DinoState:
    teacher_params: Any
    teacher_centers: jnp.ndarray
    last_teacher_centers: jnp.ndarray


class Dino(nn.Module):
    """reference dino.py:184 — same keyword constructor.  Functional usage:

        dino = Dino(net=vit, image_size=256)
        params = dino.init({'params': k, 'augment': k2}, imgs)
        state = dino.create_state(params)
        (loss, new_last), grads = jax.value_and_grad(
            lambda p: dino.apply(p, imgs, state=state,
                                 rngs={'augment': step_key}), has_aux=True)(params)
        state = state.replace(last_teacher_centers=new_last)
        ... optimizer step ...
        state = dino.update_moving_average(params, state)
    """

    net: Any
    image_size: int
    hidden_layer: Any = "transformer"
    projection_hidden_size: int = 256
    num_classes_K: int = 65336
    projection_layers: int = 4
    student_temp: float = 0.9
    teacher_temp: float = 0.04
    local_upper_crop_scale: float = 0.4
    global_lower_crop_scale: float = 0.5
    moving_average_decay: float = 0.9
    center_moving_average_decay: float = 0.9
    augment_fn: Optional[Callable] = None
    augment_fn2: Optional[Callable] = None

    def setup(self):
        self.student_encoder = NetWrapper(
            net=self.net,
            output_dim=self.num_classes_K,
            projection_hidden_size=self.projection_hidden_size,
            projection_num_layers=self.projection_layers,
            layer=self.hidden_layer,
        )

    def __call__(self, x, return_projection: bool = True):
        """Student encode (reference dino.py:276-277's embedding path; also
        the init path)."""
        return self.student_encoder(x, return_projection=return_projection)

    def make_views(self, x):
        """Augment + local/global crops (dino.py:279-282), explicit RNG via
        the 'augment' collection."""
        augment = self.make_rng("augment")
        k1, k2, k3, k4, k5, k6 = jax.random.split(augment, 6)

        aug1 = default(self.augment_fn, byol_augment)
        aug2 = default(self.augment_fn2, byol_augment)
        image_one, image_two = aug1(k1, x), aug2(k2, x)

        size = (self.image_size, self.image_size)
        local_one = random_resized_crop(
            k3, image_one, size, scale=(0.05, self.local_upper_crop_scale)
        )
        local_two = random_resized_crop(
            k4, image_two, size, scale=(0.05, self.local_upper_crop_scale)
        )
        global_one = random_resized_crop(
            k5, image_one, size, scale=(self.global_lower_crop_scale, 1.0)
        )
        global_two = random_resized_crop(
            k6, image_two, size, scale=(self.global_lower_crop_scale, 1.0)
        )
        return local_one, local_two, global_one, global_two

    # ----- state management (outside apply) -----

    def create_state(self, params) -> DinoState:
        """Teacher starts as a copy of the student (dino.py:251-255); same
        Dino-layout variables dict."""
        return DinoState(
            teacher_params=jax.tree.map(jnp.copy, params),
            teacher_centers=jnp.zeros((1, self.num_classes_K)),
            last_teacher_centers=jnp.zeros((1, self.num_classes_K)),
        )

    def update_moving_average(self, params, state: DinoState) -> DinoState:
        """EMA teacher + center update (dino.py:261-266)."""
        beta = self.moving_average_decay
        teacher = jax.tree.map(
            lambda old, new: old * beta + (1 - beta) * new,
            state.teacher_params,
            params,
        )
        cbeta = self.center_moving_average_decay
        centers = (
            state.teacher_centers * cbeta
            + (1 - cbeta) * state.last_teacher_centers
        )
        return state.replace(teacher_params=teacher, teacher_centers=centers)


def dino_forward(
    dino: Dino,
    params,
    state: DinoState,
    x,
    rng: Optional[jax.Array] = None,
    student_temp: Optional[float] = None,
    teacher_temp: Optional[float] = None,
    views=None,
):
    """One Dino training forward (reference dino.py:268-303), fully
    functional: returns (loss, new_last_teacher_centers).

    ``views``: optional (local_one, local_two, global_one, global_two)
    tuple overriding the augmentation pipeline (deterministic parity
    testing — the reference's augmentations are torchvision-side).

        (loss, new_last), grads = jax.value_and_grad(
            lambda p: dino_forward(dino, p, state, x, rng), has_aux=True
        )(params)
        state = state.replace(last_teacher_centers=new_last)
        ...optimizer step...
        state = dino.update_moving_average(params, state)
    """
    if views is None:
        if rng is None:
            raise ValueError("rng=None requires injected views (augmentation is the only RNG consumer)")
        views = dino.apply(
            params, x, method=Dino.make_views, rngs={"augment": rng}
        )
    local_one, local_two, global_one, global_two = views

    student_proj_one, _ = dino.apply(params, local_one)
    student_proj_two, _ = dino.apply(params, local_two)

    teacher_proj_one, _ = jax.lax.stop_gradient(
        dino.apply(state.teacher_params, global_one)
    )
    teacher_proj_two, _ = jax.lax.stop_gradient(
        dino.apply(state.teacher_params, global_two)
    )

    new_last_centers = jnp.concatenate(
        [teacher_proj_one, teacher_proj_two]
    ).mean(axis=0, keepdims=True)

    st = default(student_temp, dino.student_temp)
    tt = default(teacher_temp, dino.teacher_temp)
    loss = (
        dino_loss_fn(
            teacher_proj_one, student_proj_two, tt, st, state.teacher_centers
        )
        + dino_loss_fn(
            teacher_proj_two, student_proj_one, tt, st, state.teacher_centers
        )
    ) / 2
    return loss, new_last_centers
