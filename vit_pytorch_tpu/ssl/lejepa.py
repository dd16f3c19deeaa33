"""LeJEPA (reference lejepa.py:188-320): MSE(local proj, stopgrad global
proj) + SIGReg sketched-isotropic-gaussian regularizer.

The SIGReg empirical characteristic function (lejepa.py:42-77) is computed
with explicit cos/sin instead of complex exponentials — identical math,
real-valued all the way (complex64 is slow on TPU, SURVEY §7.2).  No teacher
EMA here; global projections run under stop_gradient with the same params."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import default
from .augment import byol_augment, random_resized_crop
from .dino import NetWrapper


def sigreg_loss(
    rng: jax.Array,
    x: jnp.ndarray,
    num_slices: int = 1024,
    domain: Tuple[float, float] = (-5.0, 5.0),
    num_knots: int = 17,
    projs: jnp.ndarray = None,
):
    """reference lejepa.py:42-77 (real-valued CF computation).

    ``projs``: optional pre-normalized (num_slices, dim) slice directions
    overriding the random draw (deterministic parity testing)."""
    dim = x.shape[-1]
    if projs is None:
        projs = jax.random.normal(rng, (num_slices, dim))
        projs = projs / jnp.maximum(
            jnp.linalg.norm(projs, axis=-1, keepdims=True), 1e-6
        )

    t = jnp.linspace(domain[0], domain[1], num_knots)
    exp_f = jnp.exp(-0.5 * jnp.square(t))

    x_t = jnp.einsum("...d,md->...m", x, projs).reshape(-1, num_slices)
    x_t = x_t[..., None] * t  # (n, m, k)

    ecf_re = jnp.cos(x_t).mean(axis=0)
    ecf_im = jnp.sin(x_t).mean(axis=0)

    err = (jnp.square(ecf_re - exp_f) + jnp.square(ecf_im)) * exp_f
    return jnp.trapezoid(err, t, axis=-1).mean()


class LeJEPA(nn.Module):
    """reference lejepa.py:188 — same keyword constructor.  Functional use:

        learner = LeJEPA(net, image_size=256, hidden_layer='transformer')
        params = learner.init({'params': k}, imgs)
        loss = lejepa_forward(learner, params, imgs, rng)
    """

    net: Any
    image_size: int
    hidden_layer: Any = "transformer"
    projection_hidden_size: int = 256
    num_classes_K: int = 65336
    projection_layers: int = 4
    local_upper_crop_scale: float = 0.4
    global_lower_crop_scale: float = 0.5
    target_loss_weight: float = 1.0
    sigreg_loss_weight: float = 1.0
    sigreg_num_slices: int = 1024
    sigreg_domain: Tuple[float, float] = (-5.0, 5.0)
    sigreg_num_knots: int = 17
    augment_fn: Optional[Callable] = None
    augment_fn2: Optional[Callable] = None

    def setup(self):
        self.encoder = NetWrapper(
            net=self.net,
            output_dim=self.num_classes_K,
            projection_hidden_size=self.projection_hidden_size,
            projection_num_layers=self.projection_layers,
            layer=self.hidden_layer,
        )

    def __call__(self, x, return_projection: bool = True):
        return self.encoder(x, return_projection=return_projection)

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


def lejepa_forward(
    learner: LeJEPA, params, x, rng: Optional[jax.Array] = None,
    views=None, sigreg_projs=None,
):
    """One LeJEPA forward (reference lejepa.py:250-282).

    ``views``/``sigreg_projs``: optional injected views and slice
    directions (deterministic parity testing; the reference's augmentations
    are torchvision-side and its slices are torch RNG)."""
    if rng is not None:
        aug_rng, sig_rng = jax.random.split(rng)
    else:
        aug_rng = sig_rng = None
        if views is None or sigreg_projs is None:
            raise ValueError(
                "rng=None requires BOTH views and sigreg_projs to be "
                "injected (augmentation and SIGReg slice directions are "
                "the only RNG consumers)"
            )
    if views is None:
        views = learner.apply(
            params, x, method=LeJEPA.make_views, rngs={"augment": aug_rng}
        )
    local_one, local_two, global_one, global_two = views

    locals_cat = jnp.concatenate([local_one, local_two])
    proj_locals, _ = learner.apply(params, locals_cat)
    proj_local_one, proj_local_two = jnp.split(proj_locals, 2, axis=0)

    globals_cat = jnp.concatenate([global_one, global_two])
    proj_globals, _ = jax.lax.stop_gradient(learner.apply(params, globals_cat))
    proj_global_one, proj_global_two = jnp.split(proj_globals, 2, axis=0)

    mse_loss = jnp.mean(jnp.square(proj_local_one - proj_global_two)) + jnp.mean(
        jnp.square(proj_local_two - proj_global_one)
    )

    sreg = sigreg_loss(
        sig_rng,
        proj_locals,
        num_slices=learner.sigreg_num_slices,
        domain=learner.sigreg_domain,
        num_knots=learner.sigreg_num_knots,
        projs=sigreg_projs,
    )

    return (
        mse_loss * learner.target_loss_weight
        + sreg * learner.sigreg_loss_weight
    )
