"""Prototype: fully-fused ViT attention block as ONE Pallas TPU kernel.

LN -> qkv GEMM -> per-head attention (softmax in VMEM, logits never touch
HBM) -> out GEMM -> residual add.  Grid over the batch; weights stay
resident in VMEM across grid steps.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, N, D = 128, 12, 197, 64
DIM = H * D
LAYERS = 12
INNER = 10


def _attn_block_kernel(x_ref, wqkv_ref, wout_ref, bout_ref, lns_ref, lnb_ref, o_ref, *, heads, dim_head, scale):
    x = x_ref[0]  # (N, DIM) bf16
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)  # (N, 3*DIM)

    inner = heads * dim_head
    outs = []
    for h in range(heads):
        q = qkv[:, h * dim_head:(h + 1) * dim_head]
        k = qkv[:, inner + h * dim_head: inner + (h + 1) * dim_head]
        v = qkv[:, 2 * inner + h * dim_head: 2 * inner + (h + 1) * dim_head]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (N, N) fp32
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32)
        outs.append(o.astype(x.dtype))
    merged = jnp.concatenate(outs, axis=-1)  # (N, DIM)

    out = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
    out = out + bout_ref[0].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + out).astype(x.dtype)


def fused_attention_block(x, w_qkv, w_out, b_out, ln_scale, ln_bias, *, heads, dim_head, scale=None):
    b, n, dim = x.shape
    if scale is None:
        scale = dim_head ** -0.5
    kern = functools.partial(_attn_block_kernel, heads=heads, dim_head=dim_head, scale=scale)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((dim, 3 * dim), lambda i: (0, 0)),
            pl.BlockSpec((dim, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
    )(x, w_qkv, w_out, b_out, ln_scale, ln_bias)


def reference_block(x, w_qkv, w_out, b_out, ln_scale, ln_bias, *, heads, dim_head, scale=None):
    b, n, dim = x.shape
    if scale is None:
        scale = dim_head ** -0.5
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * ln_scale[0].astype(jnp.float32) + ln_bias[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)
    qkv = ln @ w_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)
    dots = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32) * scale
    attn = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32).astype(x.dtype)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, dim)
    return x + (o @ w_out + b_out[0].astype(x.dtype))


def _ff_block_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, o_ref):
    x = x_ref[0]  # (N, DIM)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)
    h = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = jax.nn.gelu(h.astype(x.dtype), approximate=True)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)
    o_ref[0] = (x.astype(jnp.float32) + out).astype(x.dtype)


def fused_ff_block(x, w1, b1, w2, b2, ln_scale, ln_bias):
    b, n, dim = x.shape
    hid = w1.shape[1]
    return pl.pallas_call(
        _ff_block_kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
            pl.BlockSpec((dim, hid), lambda i: (0, 0)),
            pl.BlockSpec((1, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
    )(x, w1, b1, w2, b2, ln_scale, ln_bias)


def _ff_rows_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref, o_ref):
    x = x_ref[...]  # (rows, DIM)
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)
    h = jnp.dot(ln, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = jax.nn.gelu(h.astype(x.dtype), approximate=True)
    out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    out = out + b2_ref[0].astype(jnp.float32)
    o_ref[...] = (x.astype(jnp.float32) + out).astype(x.dtype)


def fused_ff_block_rows(x, w1, b1, w2, b2, ln_scale, ln_bias, *, rows=512):
    b, n, dim = x.shape
    hid = w1.shape[1]
    total = b * n
    # pad rows to a multiple of the tile
    pad = (-total) % rows
    xf = x.reshape(total, dim)
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    grid = (xf.shape[0] // rows,)
    out = pl.pallas_call(
        _ff_rows_kernel,
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, dim), lambda i: (i, 0)),
            pl.BlockSpec((dim, hid), lambda i: (0, 0)),
            pl.BlockSpec((1, hid), lambda i: (0, 0)),
            pl.BlockSpec((hid, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
            pl.BlockSpec((1, dim), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, dim), lambda i: (i, 0)),
    )(xf, w1, b1, w2, b2, ln_scale, ln_bias)
    if pad:
        out = out[:total]
    return out.reshape(b, n, dim)


def reference_ff(x, w1, b1, w2, b2, ln_scale, ln_bias):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = ((xf - mu) * jax.lax.rsqrt(var + 1e-5)) * ln_scale[0].astype(jnp.float32) + ln_bias[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)
    h = jax.nn.gelu(ln @ w1 + b1[0], approximate=True)
    return x + (h @ w2 + b2[0])


def timeit(name, fn, *args):
    loop = jax.jit(
        lambda *a: jax.lax.fori_loop(
            0, INNER,
            lambda i, acc: acc + jnp.sum(fn(a[0] * (1 + i * jnp.asarray(1e-6, a[0].dtype)), *a[1:]).astype(jnp.float32)),
            jnp.float32(0.0),
        )
    )
    float(loop(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / INNER * 1e3
    print(f"{name:44s} {per_call:8.3f} ms/call   ({per_call/LAYERS:.3f} ms/layer-equiv)")
    return per_call


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, N, DIM), dt)
    w_qkv = (jax.random.normal(jax.random.fold_in(key, 1), (DIM, 3 * DIM), dt) * 0.02)
    w_out = (jax.random.normal(jax.random.fold_in(key, 2), (DIM, DIM), dt) * 0.02)
    b_out = jnp.zeros((1, DIM), dt)
    lns = jnp.ones((1, DIM), dt)
    lnb = jnp.zeros((1, DIM), dt)

    kw = dict(heads=H, dim_head=D)

    # numeric check
    got = jax.jit(functools.partial(fused_attention_block, **kw))(x, w_qkv, w_out, b_out, lns, lnb)
    want = jax.jit(functools.partial(reference_block, **kw))(x, w_qkv, w_out, b_out, lns, lnb)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    rel = err / jnp.max(jnp.abs(want.astype(jnp.float32)))
    print(f"max abs err fused vs XLA: {float(err):.3e} (rel {float(rel):.3e})")

    def stack(fn):
        def run(x, *rest):
            for _ in range(LAYERS):
                x = fn(x, *rest)
            return x
        return run

    timeit("XLA reference block", stack(functools.partial(reference_block, **kw)), x, w_qkv, w_out, b_out, lns, lnb)
    timeit("fused Pallas block", stack(functools.partial(fused_attention_block, **kw)), x, w_qkv, w_out, b_out, lns, lnb)

    # FF block
    MLP = 3072
    w1 = jax.random.normal(jax.random.fold_in(key, 5), (DIM, MLP), dt) * 0.02
    b1 = jnp.zeros((1, MLP), dt)
    w2 = jax.random.normal(jax.random.fold_in(key, 6), (MLP, DIM), dt) * 0.02
    b2 = jnp.zeros((1, DIM), dt)

    got = jax.jit(fused_ff_block)(x, w1, b1, w2, b2, lns, lnb)
    want = jax.jit(reference_ff)(x, w1, b1, w2, b2, lns, lnb)
    err = jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
    print(f"FF max abs err fused vs XLA: {float(err):.3e}")

    timeit("XLA reference FF", stack(reference_ff), x, w1, b1, w2, b2, lns, lnb)
    timeit("fused Pallas FF", stack(fused_ff_block), x, w1, b1, w2, b2, lns, lnb)

    for rows in (256, 512):
        timeit(
            f"fused Pallas FF row-tiled ({rows})",
            stack(functools.partial(fused_ff_block_rows, rows=rows)),
            x, w1, b1, w2, b2, lns, lnb,
        )


if __name__ == "__main__":
    main()
