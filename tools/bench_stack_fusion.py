"""Round-3 exploration: N transformer LAYERS per Pallas call.

The whole-layer kernel (attn block + FF in one call) won ~5% by deleting
the y / GELU-hidden HBM round-trips inside a layer.  The next boundary up
is BETWEEN layers: each layer call reads x from HBM and writes y back —
77.5 MB per boundary at ViT-B bs=128 (~0.095 ms at ~819 GB/s).  A stack
kernel holding L layers' weights resident (L x ~14.2 MB bf16, under the
128 MB physical VMEM once the scoped budget is raised) processes each
(ips, n, dim) block through all L layers before touching HBM again,
eliminating L-1 of every L boundaries.

Run on the TPU:  python tools/bench_stack_fusion.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_pytorch_tpu.ops.fused_block import _softmax_from_dots

_CP = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

B, H, N, D = 128, 12, 197, 64
DIM = H * D
MLP = 4 * DIM
SCALE = D ** -0.5
EPS = 1e-5
IPS = 2
INNER_ITERS = 48  # divisible by 2/3/4/6 layer groupings


def timeit(name, fn, *args):
    loop = jax.jit(
        lambda *a: jax.lax.fori_loop(
            0, INNER_ITERS,
            lambda i, acc: acc + jnp.sum(
                fn(a[0] * (1 + i * jnp.asarray(1e-6, a[0].dtype)), *a[1:]).astype(jnp.float32)
            ),
            jnp.float32(0.0),
        )
    )
    try:
        float(loop(*args))
    except Exception as e:
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / INNER_ITERS * 1e3
    print(f"{name:46s} {per_call:8.3f} ms/call")
    return per_call


def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + EPS)
    return out * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _layer_rows(x, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2, n):
    """One transformer layer over (ips*n, dim) stacked rows — the same
    schedule as the production _layer_kernel."""
    ln1 = _ln(x, ln1s[0], ln1b[0]).astype(x.dtype)
    qkv = jnp.dot(ln1, wqkv, preferred_element_type=jnp.float32).astype(x.dtype)
    outs = []
    for j in range(IPS):
        rows = slice(j * n, (j + 1) * n)
        sub = []
        for h in range(H):
            q = qkv[rows, h * D:(h + 1) * D]
            k = qkv[rows, DIM + h * D: DIM + (h + 1) * D]
            v = qkv[rows, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
            p = _softmax_from_dots(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ),
                SCALE,
            )
            sub.append(jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype))
        outs.append(jnp.concatenate(sub, axis=-1))
    merged = jnp.concatenate(outs, axis=0)
    att = jnp.dot(merged, wout, preferred_element_type=jnp.float32)
    y = (att + x.astype(jnp.float32)).astype(x.dtype)

    h2 = _ln(y, ln2s[0], ln2b[0]).astype(x.dtype)
    h2 = jnp.dot(h2, w1, preferred_element_type=jnp.float32)
    h2 = jax.nn.gelu((h2 + b1[0].astype(jnp.float32)).astype(x.dtype), approximate=True)
    out = jnp.dot(h2, w2, preferred_element_type=jnp.float32)
    out = out + b2[0].astype(jnp.float32) + y.astype(jnp.float32)
    return out.astype(x.dtype)


def make_stack(n_layers):
    """One Pallas call running n_layers transformer layers back to back."""

    def kernel(*refs):
        x_ref = refs[0]
        o_ref = refs[-1]
        n = x_ref.shape[1]
        x = x_ref[...].reshape(IPS * n, DIM)
        for li in range(n_layers):
            w = refs[1 + li * 10: 1 + (li + 1) * 10]
            x = _layer_rows(
                x, w[0][...], w[1][...], w[2], w[3], w[4], w[5],
                w[6][...], w[7], w[8][...], w[9], n,
            )
        o_ref[...] = x.reshape(o_ref.shape)

    def fn(x, *weights):
        batch_spec = pl.BlockSpec((IPS, N, DIM), lambda i: (i, 0, 0))
        const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
        per_layer_specs = [
            const((DIM, 3 * DIM)), const((DIM, DIM)),
            const((1, DIM)), const((1, DIM)), const((1, DIM)), const((1, DIM)),
            const((DIM, MLP)), const((1, MLP)), const((MLP, DIM)), const((1, DIM)),
        ]
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B // IPS,),
            in_specs=[batch_spec] + per_layer_specs * n_layers,
            out_specs=batch_spec,
            compiler_params=_CP,
        )(x, *weights)

    return fn


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, N, DIM), dt)

    def layer_weights(k):
        ks = jax.random.split(k, 4)
        row = lambda t: t.reshape(1, -1)
        return (
            jax.random.normal(ks[0], (DIM, 3 * DIM), dt) * 0.02,
            jax.random.normal(ks[1], (DIM, DIM), dt) * 0.02,
            row(jnp.ones((DIM,), dt)), row(jnp.zeros((DIM,), dt)),
            row(jnp.ones((DIM,), dt)), row(jnp.zeros((DIM,), dt)),
            jax.random.normal(ks[2], (DIM, MLP), dt) * 0.02,
            row(jnp.zeros((MLP,), dt)),
            jax.random.normal(ks[3], (MLP, DIM), dt) * 0.02,
            row(jnp.zeros((DIM,), dt)),
        )

    print(f"devices: {jax.devices()}")
    max_l = 6
    all_w = [layer_weights(k) for k in jax.random.split(jax.random.PRNGKey(1), max_l)]

    # baseline: single-layer kernel, applied per layer (the production shape)
    one = make_stack(1)
    base = timeit("stack L=1 (per-layer calls, baseline)", one, x, *all_w[0])

    ref = one(x, *all_w[0])
    ref = one(ref, *all_w[1])  # two layers through the L=1 path

    for L in (2, 3, 4, 6):
        flat = [w for lw in all_w[:L] for w in lw]
        fn = make_stack(L)
        t = timeit(f"stack L={L} (one call, weights resident)", fn, x, *flat)
        if t is not None and base is not None:
            print(f"{'':46s} -> {t / L:.3f} ms/layer vs {base:.3f} baseline "
                  f"({(1 - t / (L * base)) * 100:+.1f}%)")
            if L == 2:
                out = fn(x, *flat)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
                print(f"{'':46s} max|Δ| vs two L=1 calls: {err:.5f}")


if __name__ == "__main__":
    main()
