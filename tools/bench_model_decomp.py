"""Decompose the flagship ViT-B/16 @224 bs=128 forward into embed /
transformer / head, to find where the non-GEMM milliseconds live.

bench.py methodology: chained fori_loop inside one jit, scalar fetch to
sync through the tunnel.

Run on the TPU:  python tools/bench_model_decomp.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vit_pytorch_tpu import ViT

B = 128
ITERS = 30


def timeit(name, fn, *args):
    @jax.jit
    def loop(*a):
        def body(i, acc):
            pert = a[0] * (1 + i.astype(a[0].dtype) * 1e-6)
            return acc + jnp.sum(fn(pert, *a[1:]).astype(jnp.float32))

        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:44s} {ms:8.3f} ms")
    return ms


def main():
    model = ViT(
        image_size=224, patch_size=16, num_classes=1000,
        dim=768, depth=12, heads=12, mlp_dim=3072,
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (B, 3, 224, 224), jnp.bfloat16)
    params = model.init(rng, img[:1].astype(jnp.float32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    print(f"devices: {jax.devices()}")
    full = timeit("full forward", lambda im: model.apply(params, im), img)

    # embed only (patchify + linear embed + cls + posemb)
    embed = timeit(
        "embed (patchify+linear+cls+posemb)",
        lambda im: model.apply(params, im, method=lambda m, i: m.embed(i)),
        img,
    )

    # transformer only, on pre-embedded tokens
    tokens = model.apply(params, img, method=lambda m, i: m.embed(i))
    transformer = timeit(
        "transformer (12 layers + final LN)",
        lambda t: model.apply(
            params, t, method=lambda m, tok: m.transformer(tok)
        ),
        tokens,
    )

    # head only (pool + dense)
    feats = model.apply(params, tokens, method=lambda m, t: m.transformer(t))
    head = timeit(
        "head (pool + mlp_head)",
        lambda f: model.apply(
            params,
            f,
            method=lambda m, x: m.mlp_head(x[:, 0] if m.pool == "cls" else x.mean(1)),
        ),
        feats,
    )

    print(f"\nsum of parts: {embed + transformer + head:.3f} ms vs full {full:.3f} ms")
    print(f"non-transformer share of full: {full - transformer:.3f} ms")
    print(f"per-layer (transformer/12): {transformer / 12:.4f} ms")


if __name__ == "__main__":
    main()
