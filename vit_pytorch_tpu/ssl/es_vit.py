"""EsViT — Dino plus region-level loss (reference es_vit.py:223-367).

Region pairs are matched by latent-similarity argmax and cross-entropied
per region (es_vit.py:61-80); separate view/region centers and projectors.
Same functional state design as ssl/dino.py (explicit teacher params +
centers).  The captured hidden layer may be CNN-shaped (b, h, w, c) or
token-shaped (b, n, d) — region latents are the flattened spatial/token
axis."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ..utils.helpers import default
from .augment import byol_augment, random_resized_crop
from .dino import MLP


def _log(t, eps=1e-20):
    return jnp.log(t + eps)


def view_loss_fn(teacher_logits, student_logits, teacher_temp, student_temp, centers, eps=1e-20):
    """reference es_vit.py:48-59."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_probs = jax.nn.softmax(student_logits / student_temp, axis=-1)
    teacher_probs = jax.nn.softmax((teacher_logits - centers) / teacher_temp, axis=-1)
    return -jnp.mean(jnp.sum(teacher_probs * _log(student_probs, eps), axis=-1))


def region_loss_fn(
    teacher_logits,
    student_logits,
    teacher_latent,
    student_latent,
    teacher_temp,
    student_temp,
    centers,
    eps=1e-20,
):
    """reference es_vit.py:61-80 — best-match region pairing by similarity."""
    teacher_logits = jax.lax.stop_gradient(teacher_logits)
    student_probs = jax.nn.softmax(student_logits / student_temp, axis=-1)
    teacher_probs = jax.nn.softmax((teacher_logits - centers) / teacher_temp, axis=-1)

    sim = jnp.einsum("bid,bjd->bij", student_latent, teacher_latent)
    sim_indices = jnp.argmax(sim, axis=-1)  # (b, n)
    matched = jnp.take_along_axis(
        teacher_probs, sim_indices[..., None], axis=1
    )
    return -jnp.mean(jnp.sum(matched * _log(student_probs, eps), axis=-1))


class EsViTNetWrapper(nn.Module):
    """reference es_vit.py:146-219 — view + region projectors over a hidden
    layer's spatial latents."""

    net: Any
    output_dim: int
    projection_hidden_size: int
    projection_num_layers: int
    layer: Any = "transformer"

    @nn.compact
    def __call__(self, x, return_projection: bool = True):
        # shared capture helper (raises on an unmatched layer name instead of
        # silently treating classifier logits as region latents)
        from .dino import capture_hidden

        if self.layer == -1:
            hidden = self.net(x)
            if isinstance(hidden, tuple):
                hidden = hidden[0]
        else:
            hidden = capture_hidden(self.net, x, self.layer)

        # region latents: flatten any spatial axes → (b, n, c)
        b = hidden.shape[0]
        region_latents = hidden.reshape(b, -1, hidden.shape[-1])
        global_latent = region_latents.mean(axis=1)

        if not return_projection:
            return global_latent, region_latents

        view_proj = MLP(
            dim_out=self.output_dim,
            num_layers=self.projection_num_layers,
            hidden_size=self.projection_hidden_size,
            name="view_projector",
        )(global_latent)
        region_proj = MLP(
            dim_out=self.output_dim,
            num_layers=self.projection_num_layers,
            hidden_size=self.projection_hidden_size,
            l2norm_axis=1,  # reference L2Norm uses dim=1 (region axis here)
            name="region_projector",
        )(region_latents)
        return view_proj, region_proj, region_latents


@struct.dataclass
class EsViTState:
    teacher_params: Any
    teacher_view_centers: jnp.ndarray
    last_teacher_view_centers: jnp.ndarray
    teacher_region_centers: jnp.ndarray
    last_teacher_region_centers: jnp.ndarray


class EsViTTrainer(nn.Module):
    """reference es_vit.py:223 — same keyword constructor; functional state
    (see ssl/dino.py for the usage pattern)."""

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
        self.student_encoder = EsViTNetWrapper(
            net=self.net,
            output_dim=self.num_classes_K,
            projection_hidden_size=self.projection_hidden_size,
            projection_num_layers=self.projection_layers,
            layer=self.hidden_layer,
        )

    def __call__(self, x, return_projection: bool = True):
        return self.student_encoder(x, return_projection=return_projection)

    def make_views(self, x):
        augment = self.make_rng("augment")
        k1, k2, k3, k4, k5, k6 = jax.random.split(augment, 6)
        aug1 = default(self.augment_fn, byol_augment)
        aug2 = default(self.augment_fn2, byol_augment)
        one, two = aug1(k1, x), aug2(k2, x)
        size = (self.image_size, self.image_size)
        return (
            random_resized_crop(k3, one, size, scale=(0.05, self.local_upper_crop_scale)),
            random_resized_crop(k4, two, size, scale=(0.05, self.local_upper_crop_scale)),
            random_resized_crop(k5, one, size, scale=(self.global_lower_crop_scale, 1.0)),
            random_resized_crop(k6, two, size, scale=(self.global_lower_crop_scale, 1.0)),
        )

    def create_state(self, params) -> EsViTState:
        zeros = jnp.zeros((1, self.num_classes_K))
        return EsViTState(
            teacher_params=jax.tree.map(jnp.copy, params),
            teacher_view_centers=zeros,
            last_teacher_view_centers=zeros,
            teacher_region_centers=zeros,
            last_teacher_region_centers=zeros,
        )

    def update_moving_average(self, params, state: EsViTState) -> EsViTState:
        beta = self.moving_average_decay
        teacher = jax.tree.map(
            lambda old, new: old * beta + (1 - beta) * new,
            state.teacher_params,
            params,
        )
        cbeta = self.center_moving_average_decay
        return state.replace(
            teacher_params=teacher,
            teacher_view_centers=state.teacher_view_centers * cbeta
            + (1 - cbeta) * state.last_teacher_view_centers,
            teacher_region_centers=state.teacher_region_centers * cbeta
            + (1 - cbeta) * state.last_teacher_region_centers,
        )


def esvit_forward(
    trainer: EsViTTrainer,
    params,
    state: EsViTState,
    x,
    rng: Optional[jax.Array] = None,
    student_temp: Optional[float] = None,
    teacher_temp: Optional[float] = None,
    views=None,
):
    """One EsViT forward (reference es_vit.py:313-367): returns
    (loss, (new_last_view_centers, new_last_region_centers)).

    ``views``: optional injected (local_one, local_two, global_one,
    global_two) for deterministic parity testing."""
    if views is None:
        if rng is None:
            raise ValueError("rng=None requires injected views (augmentation is the only RNG consumer)")
        views = trainer.apply(
            params, x, method=EsViTTrainer.make_views, rngs={"augment": rng}
        )
    local_one, local_two, global_one, global_two = views

    s_view_1, s_region_1, s_latent_1 = trainer.apply(params, local_one)
    s_view_2, s_region_2, s_latent_2 = trainer.apply(params, local_two)

    t_out_1 = jax.lax.stop_gradient(trainer.apply(state.teacher_params, global_one))
    t_out_2 = jax.lax.stop_gradient(trainer.apply(state.teacher_params, global_two))
    t_view_1, t_region_1, t_latent_1 = t_out_1
    t_view_2, t_region_2, t_latent_2 = t_out_2

    st = default(student_temp, trainer.student_temp)
    tt = default(teacher_temp, trainer.teacher_temp)

    new_view_centers = jnp.concatenate([t_view_1, t_view_2]).mean(
        axis=0, keepdims=True
    )
    new_region_centers = jnp.concatenate([t_region_1, t_region_2]).mean(
        axis=(0, 1)
    )[None]

    view_loss = (
        view_loss_fn(t_view_1, s_view_2, tt, st, state.teacher_view_centers)
        + view_loss_fn(t_view_2, s_view_1, tt, st, state.teacher_view_centers)
    ) / 2
    region_loss = (
        region_loss_fn(
            t_region_1, s_region_2, t_latent_1, s_latent_2, tt, st,
            state.teacher_region_centers,
        )
        + region_loss_fn(
            t_region_2, s_region_1, t_latent_2, s_latent_1, tt, st,
            state.teacher_region_centers,
        )
    ) / 2

    return (view_loss + region_loss) / 2, (new_view_centers, new_region_centers)
