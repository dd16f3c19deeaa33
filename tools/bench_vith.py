"""ViT-H/14 width probe: does the attention-block kernel's round-5 win at
ViT-L (dim=1024, +22.8%) extend to dim=1280?

ViT-H/14 @224 (dim=1280, depth=32, heads=16, mlp=5120, n=257) estimates
19.9 MB by `_vmem_bytes` — over the old 16 MB gate set by the ViT-L
measurement, under the kernel's 64 MB scoped-vmem budget.  Measured on
v5e (2026-08-19): kernel 461 img/s (78.3% roofline) vs pure XLA
330 img/s (56.1%) — +39.7%; the production gate was raised to 21 MB
with this measurement (ops/fused_block.py).

Run on the TPU:
  python tools/bench_vith.py kernel   # raised 32 MB ceiling (pre-raise A arm)
  python tools/bench_vith.py xla      # pure XLA
  python tools/bench_vith.py default  # whatever the production gate admits
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 64
INNER_ITERS = 20
VIT_H14_224_FWD_GFLOPS = 334.8  # 2 x 167.4 GMAC (ViT-H/14 published count)
V5E_PEAK_TFLOPS = 197.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ops import fused_block
    from vit_pytorch_tpu.utils.helpers import jit_init

    if mode == "kernel":
        fused_block._VMEM_LIMIT = int(32 * 1024 * 1024)
    elif mode == "xla":
        os.environ["VIT_TPU_DISABLE_FUSED"] = "1"

    model = ViT(image_size=224, patch_size=14, num_classes=1000, dim=1280,
                depth=32, heads=16, dim_head=80, mlp_dim=5120)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        jit_init(model, rng, img[:1].astype(jnp.float32)),
    )
    print(f"mode={mode}  attn-block eligible="
          f"{fused_block.fused_block_supported((BATCH, 257, 1280), jnp.bfloat16, 16, 80, 1280)}")

    @jax.jit
    def loop(params, img):
        def body(i, acc):
            out = model.apply(params, img * (1.0 + i.astype(jnp.bfloat16) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, INNER_ITERS, body, jnp.float32(0.0))

    float(loop(params, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, img))
        best = min(best, time.perf_counter() - t0)
    s = best / INNER_ITERS
    ips = BATCH / s
    mxu = ips * VIT_H14_224_FWD_GFLOPS * 1e9 / (V5E_PEAK_TFLOPS * 1e12) * 100
    print(f"ViT-H/14 @224 bf16 bs={BATCH}: {ips:.0f} img/s, "
          f"{s * 1e3:.2f} ms/step, ~{mxu:.1f}% roofline")


if __name__ == "__main__":
    main()
