"""jit-safe image augmentations with explicit RNG keys.

Replaces the reference SSL trainers' torchvision pipelines (dino.py:207-229,
es_vit.py, lejepa.py) — on-device, batched, static shapes.  Like torchvision
on batched tensors, random parameters are drawn once per call (whole batch
shares them), and RandomApply gates whole transforms (dino.py:57-66).

Images are (b, c, h, w) float in [0, 1] unless noted.  Hue jitter uses the
YIQ-rotation approximation (exact HSV round-trips are branch-heavy for TPU;
the approximation is standard in tf.image-style pipelines)."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """torchvision RandomResizedCrop on a batched (b, c, h, w) tensor.
    Implemented with ``jax.image.scale_and_translate`` so fractional crop
    boxes stay jit-static."""
    b, c, h, w = img.shape
    oh, ow = out_size
    k1, k2, k3, k4 = jax.random.split(key, 4)

    area = h * w
    target_area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)

    cw = jnp.sqrt(target_area * aspect)
    ch = jnp.sqrt(target_area / aspect)
    cw = jnp.clip(cw, 1.0, w)
    ch = jnp.clip(ch, 1.0, h)

    x0 = jax.random.uniform(k3, ()) * (w - cw)
    y0 = jax.random.uniform(k4, ()) * (h - ch)

    # map crop box → output canvas: out = img * scale + translate
    scale_y = oh / ch
    scale_x = ow / cw
    translate = jnp.stack([-y0 * scale_y, -x0 * scale_x])
    out = jax.image.scale_and_translate(
        img,
        (b, c, oh, ow),
        (2, 3),
        jnp.stack([scale_y, scale_x]),
        translate,
        method="bilinear",
    )
    return out


def adjust_brightness(img, factor):
    return img * factor


# host numpy, NOT jnp: a module-level jnp.array eagerly materializes on the
# default device at import time — on the axon tunnel that is a TPU dispatch
# before any caller can pin a device (broke dryrun_multichip hermeticity)
_GRAY = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def adjust_contrast(img, factor):
    # torchvision blends toward the per-image GRAYSCALE mean shared across
    # channels (transforms/functional.py adjust_contrast), not a per-channel
    # mean — per-channel would preserve tints torchvision shifts
    gray_mean = jnp.einsum("bchw,c->b", img, _GRAY) / (
        img.shape[-2] * img.shape[-1]
    )
    mean = gray_mean.reshape(-1, 1, 1, 1)
    return (img - mean) * factor + mean


def to_grayscale(img):
    gray = jnp.einsum("bchw,c->bhw", img, _GRAY)
    return jnp.broadcast_to(gray[:, None], img.shape)


def adjust_saturation(img, factor):
    gray = to_grayscale(img)
    return gray + (img - gray) * factor


def adjust_hue(img, delta):
    """YIQ rotation by delta (in turns of 2π·delta)."""
    theta = delta * 2 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    rgb2yiq = jnp.array(
        [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]]
    )
    yiq2rgb = jnp.array(
        [[1.0, 0.956, 0.621], [1.0, -0.272, -0.647], [1.0, -1.106, 1.703]]
    )
    rot = jnp.array([[1.0, 0, 0], [0, cos, -sin], [0, sin, cos]])
    m = yiq2rgb @ rot @ rgb2yiq
    return jnp.einsum("ij,bjhw->bihw", m, img)


def color_jitter(key, img, brightness=0.8, contrast=0.8, saturation=0.8, hue=0.2):
    """torchvision ColorJitter: uniform factor sampling AND a random
    permutation of the four ops per call (they don't commute — a fixed
    order would sample a narrower augmentation distribution)."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    fb = jax.random.uniform(kb, (), minval=max(0, 1 - brightness), maxval=1 + brightness)
    fc = jax.random.uniform(kc, (), minval=max(0, 1 - contrast), maxval=1 + contrast)
    fs = jax.random.uniform(ks, (), minval=max(0, 1 - saturation), maxval=1 + saturation)
    fh = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    ops = (
        lambda im: adjust_brightness(im, fb),
        lambda im: adjust_contrast(im, fc),
        lambda im: adjust_saturation(im, fs),
        lambda im: adjust_hue(im, fh),
    )
    perm = jax.random.permutation(kp, 4)

    def body(i, im):
        return jax.lax.switch(perm[i], ops, im)

    return jax.lax.fori_loop(0, 4, body, img)


def random_hflip(key, img, p=0.5):
    flip = jax.random.bernoulli(key, p)
    return jnp.where(flip, img[..., ::-1], img)


def gaussian_blur(key, img, kernel_size=3, sigma_range=(1.0, 2.0)):
    sigma = jax.random.uniform(key, (), minval=sigma_range[0], maxval=sigma_range[1])
    r = kernel_size // 2
    coords = jnp.arange(-r, r + 1, dtype=jnp.float32)
    kern1d = jnp.exp(-0.5 * (coords / sigma) ** 2)
    kern1d = kern1d / kern1d.sum()
    b, c, h, w = img.shape
    x = img.reshape(b * c, 1, h, w)
    # torchvision GaussianBlur pads with REFLECT — zero ('SAME') padding
    # would systematically darken the image border
    x = jnp.pad(x, ((0, 0), (0, 0), (r, r), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x, kern1d.reshape(1, 1, kernel_size, 1), (1, 1), "VALID"
    )
    x = jax.lax.conv_general_dilated(
        x, kern1d.reshape(1, 1, 1, kernel_size), (1, 1), "VALID"
    )
    return x.reshape(b, c, h, w)


def normalize(img, mean, std):
    mean = jnp.asarray(mean).reshape(1, -1, 1, 1)
    std = jnp.asarray(std).reshape(1, -1, 1, 1)
    return (img - mean) / std


def random_apply(key, fn, img, p):
    """dino.py:57-66 — whole-batch gate."""
    apply_key, fn_key = jax.random.split(key)
    return jnp.where(jax.random.bernoulli(apply_key, p), fn(fn_key, img), img)


def byol_augment(
    key: jax.Array,
    img: jnp.ndarray,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
) -> jnp.ndarray:
    """The DEFAULT_AUG pipeline of dino.py:207-221."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    img = random_apply(k1, lambda k, im: color_jitter(k, im), img, 0.3)
    img = random_apply(k2, lambda k, im: to_grayscale(im), img, 0.2)
    img = random_hflip(k3, img)
    img = random_apply(k4, lambda k, im: gaussian_blur(k, im), img, 0.2)
    return normalize(img, mean, std)
