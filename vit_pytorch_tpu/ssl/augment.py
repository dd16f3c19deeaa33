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


def resized_crop(
    img: jnp.ndarray,
    i: int,
    j: int,
    h: int,
    w: int,
    out_size: Tuple[int, int],
) -> jnp.ndarray:
    """torchvision ``F.resized_crop`` with a STATIC integer box: crop
    ``img[..., i:i+h, j:j+w]`` then bilinear-resize with antialiasing
    (torchvision resize default for tensors, v0.19).  Golden-tested vs
    ``F.interpolate(..., mode='bilinear', antialias=True)``."""
    crop = img[..., i : i + h, j : j + w]
    return jax.image.resize(
        crop, img.shape[:-2] + tuple(out_size), method="bilinear", antialias=True
    )


def random_resized_crop(
    key: jax.Array,
    img: jnp.ndarray,
    out_size: Tuple[int, int],
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """torchvision RandomResizedCrop on a batched (b, c, h, w) tensor.
    Implemented with ``jax.image.scale_and_translate`` so traced crop
    boxes stay jit-static (torchvision samples integer boxes on the host;
    the box here is rounded to integers to match that distribution, and
    the resample is half-pixel-centered like ``resize``).  Interior pixels
    match :func:`resized_crop` exactly; rows within a kernel radius of the
    crop edge may differ (the static-shape path samples the full image,
    torchvision's crop clips the kernel at the box boundary)."""
    b, c, h, w = img.shape
    oh, ow = out_size
    k1, k2, k3, k4 = jax.random.split(key, 4)

    area = h * w
    target_area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k2, (), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    aspect = jnp.exp(log_ratio)

    # torchvision samples integer box sizes/offsets (transforms.py get_params)
    cw = jnp.clip(jnp.round(jnp.sqrt(target_area * aspect)), 1.0, w)
    ch = jnp.clip(jnp.round(jnp.sqrt(target_area / aspect)), 1.0, h)
    x0 = jnp.floor(jax.random.uniform(k3, ()) * (w - cw + 1))
    y0 = jnp.floor(jax.random.uniform(k4, ()) * (h - ch + 1))

    # map crop box → output canvas: scale_and_translate's convention is
    # sample_f = (o + 0.5)/s - t/s - 0.5, so t = -y0*s makes output pixel o
    # sample full-image position y0 + (o + 0.5)/s - 0.5 — exactly
    # torchvision's half-pixel-centered resize of the crop box
    scale_y = oh / ch
    scale_x = ow / cw
    translate = jnp.stack([-y0 * scale_y, -x0 * scale_x])
    out = jax.image.scale_and_translate(
        img,
        (b, c, oh, ow),
        (2, 3),
        jnp.stack([scale_y, scale_x]),
        translate,
        method="linear",
        antialias=True,
    )
    return out


# host numpy, NOT jnp: a module-level jnp.array eagerly materializes on the
# default device at import time — on the axon tunnel that is a TPU dispatch
# before any caller can pin a device (broke dryrun_multichip hermeticity).
# 0.2989 (not 0.299) — the exact torchvision rgb_to_grayscale constant
# (golden-tested in test_augment_golden.py).
_GRAY = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def _blend(img1, img2, ratio):
    """torchvision _functional_tensor._blend: lerp THEN clamp to [0, 1].
    The clamp is part of every ColorJitter op on float tensors — without it
    brightness/contrast/saturation leak out-of-gamut values downstream."""
    return jnp.clip(ratio * img1 + (1.0 - ratio) * img2, 0.0, 1.0)


def adjust_brightness(img, factor):
    return _blend(img, jnp.zeros_like(img), factor)


def adjust_contrast(img, factor):
    # torchvision blends toward the per-image GRAYSCALE mean shared across
    # channels (transforms/functional.py adjust_contrast), not a per-channel
    # mean — per-channel would preserve tints torchvision shifts
    gray_mean = jnp.einsum("bchw,c->b", img, _GRAY) / (
        img.shape[-2] * img.shape[-1]
    )
    mean = gray_mean.reshape(-1, 1, 1, 1)
    return _blend(img, mean, factor)


def to_grayscale(img):
    gray = jnp.einsum("bchw,c->bhw", img, _GRAY)
    return jnp.broadcast_to(gray[:, None], img.shape)


def adjust_saturation(img, factor):
    return _blend(img, to_grayscale(img), factor)


def _rgb_to_hsv(img):
    """torchvision _functional_tensor._rgb2hsv, branchless."""
    r, g, b = img[:, 0], img[:, 1], img[:, 2]
    maxc = jnp.max(img, axis=1)
    minc = jnp.min(img, axis=1)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = jnp.mod(hr + hg + hb, 6.0) / 6.0
    return h, s, maxc


def _hsv_to_rgb(h, s, v):
    """torchvision _functional_tensor._hsv2rgb, branchless."""
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    i = i.astype(jnp.int32) % 6
    p = jnp.clip(v * (1.0 - s), 0.0, 1.0)
    q = jnp.clip(v * (1.0 - s * f), 0.0, 1.0)
    t = jnp.clip(v * (1.0 - s * (1.0 - f)), 0.0, 1.0)
    mask = i[:, None] == jnp.arange(6).reshape(-1, 1, 1)  # (b, 6, h, w)
    a1 = jnp.stack([v, q, p, p, t, v], axis=1)
    a2 = jnp.stack([t, v, v, q, p, p], axis=1)
    a3 = jnp.stack([p, p, t, v, v, q], axis=1)
    a4 = jnp.stack([a1, a2, a3], axis=1)  # (b, 3, 6, h, w)
    return jnp.einsum("bkhw,bckhw->bchw", mask.astype(v.dtype), a4)


def adjust_hue(img, delta):
    """Exact torchvision adjust_hue: RGB→HSV, shift hue by ``delta`` (in
    turns, range [-0.5, 0.5]), HSV→RGB.  Was previously a YIQ-rotation
    approximation; the exact form is golden-tested vs torchvision."""
    h, s, v = _rgb_to_hsv(img)
    h = jnp.mod(h + delta, 1.0)
    return _hsv_to_rgb(h, s, v)


def solarize(img, threshold):
    """torchvision solarize for float tensors (bound 1.0)."""
    return jnp.where(img >= threshold, 1.0 - img, img)


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
