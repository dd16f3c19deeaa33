"""Generate golden arrays for ssl/augment.py vs torchvision semantics.

torchvision is NOT installed in this image (and there is no network), so the
ground truth here is a line-faithful pure-torch re-implementation of
``torchvision.transforms._functional_tensor`` (v0.19) — a fully independent
code path from the JAX implementation under test.  The arrays are committed
to ``tests/goldens/augment_goldens.npz``; the golden test then runs without
torch OR torchvision and catches any numeric drift mechanically (the same
pattern as test_spectrogram_golden.py for torchaudio).

Algorithms mirrored (reference transform stack: dino.py:207-229):
  rgb_to_grayscale  — 0.2989 r + 0.587 g + 0.114 b (ITU-R 601-2, the exact
                      torchvision constant — NOT 0.299)
  _blend            — ratio*a + (1-ratio)*b, clamped to [0, 1] for floats
  adjust_brightness — blend(img, 0)
  adjust_contrast   — blend(img, mean(grayscale(img)) over CHW)
  adjust_saturation — blend(img, grayscale(img))
  adjust_hue        — RGB→HSV, h = (h+f) mod 1, HSV→RGB
  solarize          — where(img >= thr, 1 - img, img)
  gaussian_blur     — outer-product kernel, reflect pad, grouped conv2d
  normalize         — (img - mean) / std
  resized_crop      — integer-box crop + F.interpolate(bilinear,
                      antialias=True) (RandomResizedCrop's resize path)
"""

import os
import sys

import numpy as np
import torch

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "augment_goldens.npz",
)


def rgb_to_grayscale(img):
    r, g, b = img.unbind(dim=-3)
    gray = (0.2989 * r + 0.587 * g + 0.114 * b).to(img.dtype)
    return gray.unsqueeze(dim=-3)


def _blend(img1, img2, ratio):
    return (ratio * img1 + (1.0 - ratio) * img2).clamp(0, 1.0).to(img1.dtype)


def adjust_brightness(img, factor):
    return _blend(img, torch.zeros_like(img), factor)


def adjust_contrast(img, factor):
    mean = torch.mean(rgb_to_grayscale(img).to(torch.float32), dim=(-3, -2, -1), keepdim=True)
    return _blend(img, mean, factor)


def adjust_saturation(img, factor):
    return _blend(img, rgb_to_grayscale(img), factor)


def _rgb2hsv(img):
    r, g, b = img.unbind(dim=-3)
    maxc = torch.max(img, dim=-3).values
    minc = torch.min(img, dim=-3).values
    eqc = maxc == minc
    cr = maxc - minc
    ones = torch.ones_like(maxc)
    s = cr / torch.where(eqc, ones, maxc)
    cr_divisor = torch.where(eqc, ones, cr)
    rc = (maxc - r) / cr_divisor
    gc = (maxc - g) / cr_divisor
    bc = (maxc - b) / cr_divisor
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = hr + hg + hb
    h = torch.fmod((h / 6.0 + 1.0), 1.0)
    return torch.stack((h, s, maxc), dim=-3)


def _hsv2rgb(img):
    h, s, v = img.unbind(dim=-3)
    i = torch.floor(h * 6.0)
    f = (h * 6.0) - i
    i = i.to(dtype=torch.int32)
    p = torch.clamp((v * (1.0 - s)), 0.0, 1.0)
    q = torch.clamp((v * (1.0 - s * f)), 0.0, 1.0)
    t = torch.clamp((v * (1.0 - s * (1.0 - f))), 0.0, 1.0)
    i = i % 6
    mask = i.unsqueeze(dim=-3) == torch.arange(6, device=i.device).view(-1, 1, 1)
    a1 = torch.stack((v, q, p, p, t, v), dim=-3)
    a2 = torch.stack((t, v, v, q, p, p), dim=-3)
    a3 = torch.stack((p, p, t, v, v, q), dim=-3)
    a4 = torch.stack((a1, a2, a3), dim=-4)
    return torch.einsum("...ijk, ...xijk -> ...xjk", mask.to(dtype=img.dtype), a4)


def adjust_hue(img, hue_factor):
    img_hsv = _rgb2hsv(img)
    h, s, v = img_hsv.unbind(dim=-3)
    h = (h + hue_factor) % 1.0
    return _hsv2rgb(torch.stack((h, s, v), dim=-3))


def solarize(img, threshold):
    return torch.where(img >= threshold, 1.0 - img, img)


def gaussian_blur(img, kernel_size, sigma):
    ky, kx = kernel_size
    sy, sx = sigma

    def k1d(ks, sg):
        half = (ks - 1) * 0.5
        x = torch.linspace(-half, half, steps=ks)
        pdf = torch.exp(-0.5 * (x / sg).pow(2))
        return pdf / pdf.sum()

    kernel2d = torch.mm(k1d(ky, sy)[:, None], k1d(kx, sx)[None, :])
    kernel = kernel2d.expand(img.shape[-3], 1, ky, kx).to(img.dtype)
    pad = [kx // 2, kx // 2, ky // 2, ky // 2]
    x = torch.nn.functional.pad(img, pad, mode="reflect")
    return torch.nn.functional.conv2d(x, kernel, groups=img.shape[-3])


def normalize(img, mean, std):
    mean = torch.as_tensor(mean, dtype=img.dtype).view(-1, 1, 1)
    std = torch.as_tensor(std, dtype=img.dtype).view(-1, 1, 1)
    return (img - mean) / std


def resized_crop(img, i, j, h, w, size):
    crop = img[..., i:i + h, j:j + w]
    return torch.nn.functional.interpolate(
        crop, size=size, mode="bilinear", align_corners=False, antialias=True
    )


def main():
    rng = np.random.default_rng(0)
    img_np = rng.random((2, 3, 32, 32), dtype=np.float32)
    # push some pixels outside what clamps would preserve under scaling
    img_np = np.clip(img_np * 1.1 - 0.02, 0.0, 1.0).astype(np.float32)
    img = torch.from_numpy(img_np)

    out = {"input": img_np}
    for f in (0.5, 1.3):
        out[f"brightness_{f}"] = adjust_brightness(img, f).numpy()
    for f in (0.5, 1.4):
        out[f"contrast_{f}"] = adjust_contrast(img, f).numpy()
    for f in (0.3, 1.6):
        out[f"saturation_{f}"] = adjust_saturation(img, f).numpy()
    for f in (-0.2, 0.1, 0.25):
        out[f"hue_{f}"] = adjust_hue(img, f).numpy()
    out["grayscale"] = rgb_to_grayscale(img).expand_as(img).numpy()
    for thr in (0.3, 0.7):
        out[f"solarize_{thr}"] = solarize(img, thr).numpy()
    out["blur_k3_s1.0"] = gaussian_blur(img, (3, 3), (1.0, 1.0)).numpy()
    out["blur_k3_s1.7"] = gaussian_blur(img, (3, 3), (1.7, 1.7)).numpy()
    out["blur_k5_s1.2"] = gaussian_blur(img, (5, 5), (1.2, 1.2)).numpy()
    out["normalize"] = normalize(
        img, [0.485, 0.456, 0.406], [0.229, 0.224, 0.225]
    ).numpy()
    # (i, j, h, w, out) — downscale, upscale, and mixed boxes
    for box in ((4, 6, 20, 24, 32), (0, 0, 32, 32, 16), (8, 2, 10, 10, 24)):
        i, j, h, w, o = box
        out[f"resized_crop_{i}_{j}_{h}_{w}_{o}"] = resized_crop(
            img, i, j, h, w, (o, o)
        ).numpy()

    # composite: contrast(0.6) ∘ saturation(1.3) ∘ brightness(1.2) — clamp
    # interactions between ops are what single-op tests can miss
    comp = adjust_contrast(adjust_saturation(adjust_brightness(img, 1.2), 1.3), 0.6)
    out["composite_b1.2_s1.3_c0.6"] = comp.numpy()

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {len(out)} arrays to {OUT}")


if __name__ == "__main__":
    main()
