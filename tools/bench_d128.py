"""North-star reconciliation probe (VERDICT r4 #3): is the d=64 per-head
attention dot the flagship's MXU limiter, or the kernel tier itself?

ViT-B/16 @224 with heads=6, dim_head=128 has the SAME inner dim (768),
the SAME projection/FF GEMMs, and the SAME total FLOPs (35.2 GFLOP/img)
as the heads=12, dim_head=64 flagship — the only difference is that the
per-head attention dots run at the MXU's full 128-lane depth instead of
half of it.  If the d=128 variant's roofline % is materially higher on
the identical code path (same whole-layer Pallas kernel, same dispatch),
the flagship's gap to 95% is the model shape, not the framework.

Run on the TPU: python tools/bench_d128.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 128
ITERS = 30
VIT_B16_224_FWD_GFLOPS = 35.2  # same count both ways: inner dim identical
PEAK = 197e12


def bench(heads, dim_head):
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.utils.helpers import jit_init

    model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=768,
                depth=12, heads=heads, dim_head=dim_head, mlp_dim=3072)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        jit_init(model, rng, img[:1].astype(jnp.float32)),
    )

    @jax.jit
    def loop(params, x):
        def body(i, acc):
            out = model.apply(params, x * (1 + i.astype(x.dtype) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(params, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, img))
        best = min(best, time.perf_counter() - t0)
    s = best / ITERS
    ips = BATCH / s
    mfu = ips * VIT_B16_224_FWD_GFLOPS * 1e9 / PEAK * 100
    print(f"h={heads:2d} d={dim_head:3d}: {ips:.0f} img/s, {s * 1e3:.2f} ms/step, "
          f"{mfu:.1f}% of roofline")


def main():
    # same inner dim (768) and total FLOPs in every arm; only the per-head
    # attention-dot depth / softmax-VPU share changes
    specs = [(12, 64), (6, 128)]
    if "--trend" in sys.argv:
        specs = [(24, 32)] + specs + [(3, 256)]
    for heads, dim_head in specs:
        bench(heads, dim_head)


if __name__ == "__main__":
    main()
