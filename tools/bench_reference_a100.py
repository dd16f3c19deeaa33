"""Reproducible A100 baseline: the reference ViT-B/16 under torch.compile.

`bench.py`'s ``vs_baseline`` divides the v5e images/sec by an A100
torch.compile ViT-B/16 bf16 inference number.  This box has no GPU (torch
is the CPU wheel), so the denominator is pinned from public artifacts (see
`A100_BASELINE.md`); THIS script is the reproduction path — run it on any
CUDA machine with an A100 to re-measure the exact quantity the baseline
stands for, and update ``A100_TORCH_COMPILE_IMGS_PER_SEC`` in bench.py if
the result disagrees.

Methodology mirrors bench.py as closely as torch allows:
  * same model config: the reference `vit_pytorch.vit.ViT` at ViT-B/16
    @224 (dim 768, depth 12, heads 12, mlp 3072) — reference vit.py:85;
  * bf16 weights + inputs, batch 128 (bench.py's measured v5e serving
    sweet spot), `torch.compile(mode="max-autotune")`, inference mode;
  * steady-state: 30 chained forwards per timing rep (CUDA graphs make
    per-dispatch overhead negligible, but keep the shape identical to the
    TPU loop), best of 3 reps after warmup.

Usage (on a CUDA box):
    pip install vit-pytorch torch  # CUDA wheel
    python tools/bench_reference_a100.py [--batch 128] [--iters 30]
"""

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30, help="forwards per rep")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import torch

    if not torch.cuda.is_available():
        raise SystemExit(
            "needs a CUDA device (this repo's TPU box has none — see "
            "A100_BASELINE.md for how the pinned number was derived)"
        )
    from vit_pytorch import ViT  # the reference package

    device = torch.device("cuda")
    print(f"device: {torch.cuda.get_device_name(device)}")

    model = ViT(
        image_size=224, patch_size=16, num_classes=1000,
        dim=768, depth=12, heads=12, mlp_dim=3072,
        dropout=0.0, emb_dropout=0.0,
    ).to(device=device, dtype=torch.bfloat16).eval()
    model = torch.compile(model, mode="max-autotune")

    img = torch.randn(args.batch, 3, 224, 224, device=device, dtype=torch.bfloat16)

    with torch.inference_mode():
        for _ in range(3):  # compile + warm
            out = model(img)
        torch.cuda.synchronize()

        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = model(img * (1.0 + i * 1e-6))  # defeat any caching
            torch.cuda.synchronize()
            best = min(best, time.perf_counter() - t0)

    imgs_per_sec = args.batch * args.iters / best
    ms = best / args.iters * 1e3
    # same FLOP accounting as bench.py: 35.2 GFLOP/img = 2 x 17.6 GMAC
    mfu = imgs_per_sec * 35.2e9 / 312e12 * 100  # A100 bf16 dense peak
    print(f"{imgs_per_sec:.0f} img/s, {ms:.2f} ms/step (bs={args.batch}), "
          f"~{mfu:.1f}% of A100 bf16 peak")
    print("update A100_TORCH_COMPILE_IMGS_PER_SEC in bench.py with this value")


if __name__ == "__main__":
    main()
