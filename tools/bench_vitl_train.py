"""ViT-L/16 TRAIN-step A/B: attention-block kernel (fwd + Pallas backward)
vs pure XLA, at the width the round-5 gate raise newly admits.

The 16->21 MB `_VMEM_LIMIT` raises (ops/fused_block.py) were validated on
INFERENCE only (+22.8% ViT-L, +39.7% ViT-H — docs/PERF_NOTES.md round 5).
Training takes the same dispatch (`fused_block_eligible` in nn/blocks.py):
fused attention-block forward + Pallas `_bwd_kernel` backward with the FF
on XLA's vjp — the configuration that won 1.5x at ViT-B bs=1024.  This
measures whether that carries to dim=1024, where the round-5 trace showed
XLA's attention block pays the same serial HBM round-trips on the forward.

Run on the TPU:
  python tools/bench_vitl_train.py default   # production gate (kernel at 21 MB)
  python tools/bench_vitl_train.py xla       # VIT_TPU_DISABLE_FUSED=1

ViT-L/16 @224: dim=1024, depth=24, heads=16, dim_head=64, mlp=4096, n=197.
bs=256 (bs=1024 exceeds HBM at this width even with remat).  Train GFLOPs
~= 3x fwd (61.6 G/img fwd -> 184.8 G/img step, remat recompute not
credited) for the roofline column.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
CHAIN = 3
FWD_GFLOPS = 61.6
V5E_PEAK_TFLOPS = 197.0


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "default"
    if mode == "xla":
        os.environ["VIT_TPU_DISABLE_FUSED"] = "1"

    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.utils.helpers import jit_init

    model = ViT(image_size=224, patch_size=16, num_classes=1000,
                dim=1024, depth=24, heads=16, mlp_dim=4096, remat=True)
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        jit_init(model, rng, img[:1].astype(jnp.float32))["params"],
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    def step(params, opt_state, img, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, img)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chained(params, opt_state, img, labels):
        def body(i, carry):
            p, s, acc = carry
            im = img * (1.0 + i.astype(img.dtype) * 1e-6)
            p, s, loss = step(p, s, im, labels)
            return p, s, acc + loss

        p, s, acc = jax.lax.fori_loop(
            0, CHAIN, body, (params, opt_state, jnp.float32(0.0))
        )
        return p, s, acc

    params, opt_state, acc = chained(params, opt_state, img, labels)
    float(acc)  # compile + warm (host fetch syncs through the tunnel)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, acc = chained(params, opt_state, img, labels)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / CHAIN)

    ips = BATCH / best
    mxu = ips * 3 * FWD_GFLOPS * 1e9 / (V5E_PEAK_TFLOPS * 1e12) * 100
    print(f"ViT-L/16 train bs={BATCH} mode={mode}: {best * 1e3:.1f} ms/step, "
          f"{ips:.0f} img/s, ~{mxu:.1f}% of bf16 roofline (3x-fwd FLOPs)")


if __name__ == "__main__":
    main()
