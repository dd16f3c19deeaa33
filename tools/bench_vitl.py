"""ViT-L/16 kernel-tier arms (round-3 probe, re-attributed in round 5).

Round 5's device trace showed the round-3 "fallback" arm was actually
PURE XLA — the attention-block kernel's own 12 MB gate rejected dim=1024
alongside the whole-layer gate.  Measuring the real attn-kernel + XLA-FF
arm won +22.8% (1,302 vs 1,060 img/s), so the production gate now admits
ViT-L (16 MB, ops/fused_block.py).  Mode table in main().

Run on the TPU:
  python tools/bench_vitl.py [default|xla|attn|fused]
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
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ops import fused_block

    # Modes (round-5 history in PERF_NOTES "ViT-L"):
    #   default    — production path.  Since round 5 the 16 MB attention-
    #                block gate admits dim=1024, so this is attn kernel +
    #                XLA FF (measured 1,295 img/s, 80.5% roofline).
    #   xla        — force pure XLA (the pre-round-5 production behavior,
    #                1,058-1,060 img/s; what round 3 mislabeled "two-step
    #                fallback": the old 12 MB gate silently rejected ViT-L).
    #   attn       — raised 24 MB ceiling (admits the ips=2 in-kernel
    #                layout; measured 1,302 — within noise of default).
    #   fused      — whole-layer kernel at a trial 56 MB ceiling
    #                (measured 1,056: the in-kernel FF loses what the
    #                attention fusion gains at this width).
    if mode == "fused":
        fused_block._WHOLE_LAYER_EST_LIMIT = int(56 * 1024 * 1024)
    elif mode == "attn":
        fused_block._VMEM_LIMIT = int(24 * 1024 * 1024)
    elif mode == "xla":
        os.environ["VIT_TPU_DISABLE_FUSED"] = "1"

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
