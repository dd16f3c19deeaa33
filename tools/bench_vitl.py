"""Round-3 probe: does the whole-layer fused kernel pay off at ViT-L width?

The forward gate (`whole_layer_supported`) is calibrated to configs proven
on hardware.  ViT-L/16 @224 (dim=1024, heads=16, mlp=4096, n=197)
estimates ~35 MB by `_vmem_bytes_whole` — over the ViT-B-calibrated
20.75 MB ceiling but comfortably under the kernel's 64 MB scoped-vmem
budget and the 128 MB physical VMEM.  This probe raises the ceiling
in-process and measures the fused path vs the two-step fallback at model
level.

Run on the TPU:
  python tools/bench_vitl.py fused      # raised ceiling, whole-layer path
  python tools/bench_vitl.py fallback   # attn kernel + XLA FF (today's default)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 64
INNER_ITERS = 30
VIT_L16_224_FWD_GFLOPS = 122.4  # 2 x 61.2 GMAC: 303.3 M params x 197 tokens + attn
V5E_PEAK_TFLOPS = 197.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ops import fused_block

    if mode == "fused":
        # trial ceiling: admit the ~35 MB ViT-L estimate (kernel budget 64 MB)
        fused_block._WHOLE_LAYER_EST_LIMIT = int(56 * 1024 * 1024)

    model = ViT(
        image_size=224,
        patch_size=16,
        num_classes=1000,
        dim=1024,
        depth=24,
        heads=16,
        mlp_dim=4096,
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    params = model.init(rng, img[:1].astype(jnp.float32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    eligible = fused_block.whole_layer_supported(
        (BATCH, 197, 1024), jnp.bfloat16, 16, 64, 1024, 4096
    )
    print(f"mode={mode}  whole_layer eligible={eligible}")

    @jax.jit
    def forward_loop(params, img):
        def body(i, acc):
            perturbed = img * (1.0 + i.astype(jnp.bfloat16) * 1e-6)
            out = model.apply(params, perturbed)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, INNER_ITERS, body, jnp.float32(0.0))

    float(forward_loop(params, img))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(forward_loop(params, img))
        best = min(best, time.perf_counter() - t0)

    imgs_per_sec = BATCH * INNER_ITERS / best
    mxu = imgs_per_sec * VIT_L16_224_FWD_GFLOPS / (V5E_PEAK_TFLOPS * 1e3)
    print(
        f"ViT-L/16 @224 bf16 bs={BATCH}: {imgs_per_sec:.0f} img/s, "
        f"{best / INNER_ITERS * 1e3:.2f} ms/step, ~{mxu * 100:.1f}% roofline"
    )


if __name__ == "__main__":
    main()
