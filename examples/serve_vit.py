"""Serving example: AOT bucket-batched ViT-B/16 inference on one TPU chip.

Demonstrates the production serving path (vit_pytorch_tpu/serving.py):
every batch-size bucket is compiled ahead of traffic, params live in bf16,
requests pad up to the smallest fitting bucket and chunk down by the
largest.  Prints per-bucket end-to-end latency percentiles.

NOTE on measurement: on this box the TPU sits behind the axon tunnel, which
adds 5-40 ms per dispatch — the reported end-to-end numbers are therefore
an upper bound; on a directly-attached chip the device step time dominates
(see bench.py for the chained-loop device-throughput methodology).

Run: python examples/serve_vit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_pytorch_tpu import ViT
from vit_pytorch_tpu.serving import Predictor

BUCKETS = (1, 8, 32, 128)


def main():
    model = ViT(
        image_size=224,
        patch_size=16,
        num_classes=1000,
        dim=768,
        depth=12,
        heads=12,
        mlp_dim=3072,
    )
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.ones((1, 3, 224, 224)))

    t0 = time.perf_counter()
    p = Predictor(model, variables, example_shape=(3, 224, 224), batch_sizes=BUCKETS)
    print(
        f"AOT-compiled buckets {p.compiled_buckets} in "
        f"{time.perf_counter() - t0:.1f}s (ahead of traffic — no request "
        f"ever pays a compile)"
    )
    flops = p.cost_analysis(BUCKETS[-1]).get("flops", 0)
    print(f"largest bucket: {flops / 1e9:.1f} GFLOP/executable\n")

    print(f"{'k':>4} {'bucket':>6} {'p50 ms':>8} {'p95 ms':>8}")
    for k in (1, 5, 8, 32, 100, 128):
        x = jax.random.normal(jax.random.PRNGKey(k), (k, 3, 224, 224), jnp.bfloat16)
        # warm + force completion (block_until_ready doesn't sync the tunnel)
        float(jnp.sum(p(x).astype(jnp.float32)))
        times = []
        for _ in range(10):
            t0 = time.perf_counter()
            float(jnp.sum(p(x).astype(jnp.float32)))
            times.append((time.perf_counter() - t0) * 1e3)
        b = p._bucket_for(k)
        print(
            f"{k:>4} {b:>6} {np.percentile(times, 50):>8.1f} "
            f"{np.percentile(times, 95):>8.1f}"
        )

    # oversize request: chunked by the largest bucket
    x = jax.random.normal(jax.random.PRNGKey(7), (300, 3, 224, 224), jnp.bfloat16)
    t0 = time.perf_counter()
    out = p(x)
    float(jnp.sum(out.astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(
        f"\nk=300 (chunks of 128+128+44→128): {dt * 1e3:.0f} ms end-to-end, "
        f"{300 / dt:.0f} img/s, out {out.shape}"
    )


if __name__ == "__main__":
    main()
