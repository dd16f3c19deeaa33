"""A/B the fused-kernel qk-norm path on a qk-norm model (round 3+).

simple_vit_with_qk_norm (reference simple_vit_with_qk_norm.py) previously
fell back to XLA attention because the fused kernel refused qk_norm; with
in-kernel RMSNorm it takes the attention-block kernel.  Measure both:

    python tools/bench_qknorm_model.py                      # kernel path
    VIT_TPU_DISABLE_FUSED=1 python tools/bench_qknorm_model.py   # XLA path

Same methodology as bench.py (chained forwards inside one jit, best of 3).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_pytorch_tpu.models.simple_vit_with_qk_norm import SimpleViT


def main():
    batch = int(os.environ.get("BATCH", "128"))
    iters = 30
    model = SimpleViT(image_size=224, patch_size=16, num_classes=1000,
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
    tag = "xla" if os.environ.get("VIT_TPU_DISABLE_FUSED") else "fused"
    print(f"simple_vit_qk_norm bs={batch} path={tag}: "
          f"{batch * iters / best:.0f} img/s, {best / iters * 1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
