"""ViT-g/14 and ViT-G/14 width probes: does the attention-block kernel's
round-5 ladder (ViT-L +22.8%, ViT-H +39.7%) extend past the 21 MB gate?

Configs are the published "Scaling Vision Transformers" (Zhai et al. 2022)
shapes @224, n=257:
  g/14: dim=1408, depth=40, heads=16, dim_head=88, mlp=6144  — est 24.4 MB
  G/14: dim=1664, depth=48, heads=16, dim_head=104, mlp=8192 — est 32.1 MB
Both are over the 21 MB production gate (set by the ViT-H measurement) and
under the kernel's 64 MB scoped-vmem budget, so `kernel` mode raises a
trial ceiling; the production gate is only moved on a measured win at the
exact production layout (same protocol as bench_vith.py).

Run on the TPU:
  python tools/bench_vitg.py g kernel   # 40 MB trial ceiling
  python tools/bench_vitg.py g xla      # pure XLA
  python tools/bench_vitg.py G kernel
  python tools/bench_vitg.py G xla
  python tools/bench_vitg.py g default  # whatever the production gate admits
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 64
V5E_PEAK_TFLOPS = 197.0

# forward GFLOP/img = 2 x GMAC (qkv + dots + out + mlp per layer, + patchify),
# matching the published ~533 G (g/14) / ~965 G (G/14) counts.
CONFIGS = {
    "g": dict(dim=1408, depth=40, heads=16, dim_head=88, mlp_dim=6144,
              gflops=534.2, inner_iters=10),
    "G": dict(dim=1664, depth=48, heads=16, dim_head=104, mlp_dim=8192,
              gflops=967.6, inner_iters=10),
}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "g"
    mode = sys.argv[2] if len(sys.argv) > 2 else "kernel"
    cfg = CONFIGS[which]

    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ops import fused_block
    from vit_pytorch_tpu.utils.helpers import jit_init

    if mode == "kernel":
        fused_block._VMEM_LIMIT = int(40 * 1024 * 1024)
    elif mode == "xla":
        os.environ["VIT_TPU_DISABLE_FUSED"] = "1"

    model = ViT(image_size=224, patch_size=14, num_classes=1000,
                dim=cfg["dim"], depth=cfg["depth"], heads=cfg["heads"],
                dim_head=cfg["dim_head"], mlp_dim=cfg["mlp_dim"])
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        jit_init(model, rng, img[:1].astype(jnp.float32)),
    )
    inner = cfg["heads"] * cfg["dim_head"]
    print(f"ViT-{which}/14 mode={mode}  attn-block eligible="
          f"{fused_block.fused_block_supported((BATCH, 257, cfg['dim']), jnp.bfloat16, cfg['heads'], cfg['dim_head'], cfg['dim'])}"
          f"  est={fused_block._vmem_bytes(257, cfg['dim'], inner, 2) / 1e6:.1f} MB")

    iters = cfg["inner_iters"]

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
    s = best / iters
    ips = BATCH / s
    mxu = ips * cfg["gflops"] * 1e9 / (V5E_PEAK_TFLOPS * 1e12) * 100
    print(f"ViT-{which}/14 @224 bf16 bs={BATCH}: {ips:.0f} img/s, "
          f"{s * 1e3:.2f} ms/step, ~{mxu:.1f}% roofline")


if __name__ == "__main__":
    main()