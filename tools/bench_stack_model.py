"""In-model sweep of the whole-layer stack group size (VIT_TPU_STACK_LAYERS)
on the ViT-B/16 @224 bf16 inference path.  BATCH sets the batch size
(default 128 — the flagship throughput config; small values probe the
serving regime where fewer grid steps per call make launch overhead and
inter-layer boundaries a bigger fraction of step time).

Usage:  VIT_TPU_STACK_LAYERS=4 python tools/bench_stack_model.py
        VIT_TPU_DISABLE_STACK=1 python tools/bench_stack_model.py   # per-layer
        BATCH=8 VIT_TPU_STACK_LAYERS=6 python tools/bench_stack_model.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_pytorch_tpu import ViT


def main():
    batch = int(os.environ.get("BATCH", "128"))
    iters = max(30, 3840 // batch)  # keep total work roughly constant
    model = ViT(image_size=224, patch_size=16, num_classes=1000,
                dim=768, depth=12, heads=12, mlp_dim=3072)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
    params = model.init(rng, img[:1].astype(jnp.float32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def loop(params, img):
        def body(i, acc):
            out = model.apply(params, img * (1.0 + i.astype(jnp.bfloat16) * 1e-6))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(loop(params, img))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(params, img))
        best = min(best, time.perf_counter() - t0)
    tag = os.environ.get("VIT_TPU_STACK_LAYERS") or (
        "off" if os.environ.get("VIT_TPU_DISABLE_STACK") else "auto"
    )
    print(f"bs={batch} stack={tag}: {batch * iters / best:.0f} img/s, "
          f"{best / iters * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
