"""Round-3 exploration: ONE Pallas kernel for the whole transformer layer
(attn block + FF), vs the round-2 pair (fused attn kernel + XLA FF).

Also probes: actual VMEM ceiling (can ViT-B's full layer weights ~14.2 MB
bf16 stay resident?), FF hidden-dim tiling via an inner grid axis with the
post-attention residual carried in VMEM scratch, and a batched-heads
attention schedule (one 3-D dot_general instead of a Python loop over
heads).

Run on the TPU:  python tools/bench_layer_fused.py
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

# XLA's default scoped-VMEM budget is 16 MB (xla_tpu_scoped_vmem_limit_kib),
# NOT the physical v5e VMEM (128 MB).  Raise it per-kernel so high-ips
# variants can be measured.
_CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

B, H, N, D = 128, 12, 197, 64
DIM = H * D          # 768
MLP = 4 * DIM        # 3072
LAYERS = 12
INNER_ITERS = 100
SCALE = D ** -0.5
EPS = 1e-5


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
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:140]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / INNER_ITERS * 1e3
    print(f"{name:52s} {per_call:8.3f} ms/call ({per_call:.3f} ms/layer)")
    return per_call


def _ln(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + EPS)
    return out * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def _attn_rows(qkv, dtype, batched_heads=False):
    """(n, 3*inner) -> (n, inner) attention output."""
    n = qkv.shape[0]
    if batched_heads:
        q = qkv[:, :DIM].reshape(n, H, D).transpose(1, 0, 2)
        k = qkv[:, DIM:2 * DIM].reshape(n, H, D).transpose(1, 0, 2)
        v = qkv[:, 2 * DIM:].reshape(n, H, D).transpose(1, 0, 2)
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * SCALE
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return o.astype(dtype).transpose(1, 0, 2).reshape(n, DIM)
    outs = []
    for h in range(H):
        q = qkv[:, h * D:(h + 1) * D]
        k = qkv[:, DIM + h * D: DIM + (h + 1) * D]
        v = qkv[:, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * SCALE
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        outs.append(jnp.dot(p.astype(dtype), v, preferred_element_type=jnp.float32).astype(dtype))
    return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------- baseline

def baseline_pair(x, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
    """Round-2 production path: fused attn-block kernel + XLA FF."""
    from vit_pytorch_tpu.ops.fused_block import fused_attention_block

    y = fused_attention_block(
        x, x, wqkv, wout, ln1s, ln1b, heads=H, dim_head=D,
        b_qkv=None, b_out=None, scale=SCALE, eps=EPS,
    )
    h = _ln(y, ln2s, ln2b).astype(x.dtype)
    h = h @ w1 + b1
    h = jax.nn.gelu(h, approximate=True)
    return (h @ w2 + b2 + y.astype(jnp.float32)).astype(x.dtype)


# ------------------------------------------------- whole layer, resident

def make_whole_resident(ips, batched_heads=False):
    def kernel(x_ref, wqkv_ref, wout_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        n = x_ref.shape[1]
        x = x_ref[...].reshape(ips * n, DIM)
        ln1 = _ln(x, ln1s_ref[0], ln1b_ref[0]).astype(x.dtype)
        qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
        if ips == 1:
            merged = _attn_rows(qkv, x.dtype, batched_heads)
        else:
            merged = jnp.concatenate(
                [_attn_rows(qkv[j * n:(j + 1) * n], x.dtype, batched_heads) for j in range(ips)],
                axis=0,
            )
        att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
        y = (att + x.astype(jnp.float32)).astype(x.dtype)

        h = _ln(y, ln2s_ref[0], ln2b_ref[0]).astype(x.dtype)
        h = jnp.dot(h, w1_ref[...], preferred_element_type=jnp.float32)
        h = (h + b1_ref[0].astype(jnp.float32)).astype(x.dtype)
        h = jax.nn.gelu(h, approximate=True)
        out = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
        out = out + b2_ref[0].astype(jnp.float32) + y.astype(jnp.float32)
        o_ref[...] = out.astype(x.dtype).reshape(o_ref.shape)

    def fn(x, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        row = lambda t: t.reshape(1, -1)
        batch_spec = pl.BlockSpec((ips, N, DIM), lambda i: (i, 0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B // ips,),
            in_specs=[
                batch_spec,
                pl.BlockSpec((DIM, 3 * DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, MLP), lambda i: (0, 0)),
                pl.BlockSpec((1, MLP), lambda i: (0, 0)),
                pl.BlockSpec((MLP, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
            ],
            out_specs=batch_spec,
            compiler_params=_CP,
        )(x, wqkv, wout, row(ln1s), row(ln1b), row(ln2s), row(ln2b),
          w1, row(b1), w2, row(b2))

    return fn


# ------------------------------------------- whole layer, FF hidden-tiled

def make_whole_tiled(ips, ht, batched_heads=False):
    """grid = (batch, MLP // ht); attention runs at t==0, y and ln2(y) are
    carried in VMEM scratch across the inner hidden-tile steps, the FF
    accumulates into the (revisited) output block."""
    n_t = MLP // ht

    def kernel(x_ref, wqkv_ref, wout_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               y_scr, h_scr, acc_scr):
        t = pl.program_id(1)
        n = x_ref.shape[1]
        rows = ips * n

        @pl.when(t == 0)
        def _attn_phase():
            x = x_ref[...].reshape(rows, DIM)
            ln1 = _ln(x, ln1s_ref[0], ln1b_ref[0]).astype(x.dtype)
            qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
            if ips == 1:
                merged = _attn_rows(qkv, x.dtype, batched_heads)
            else:
                merged = jnp.concatenate(
                    [_attn_rows(qkv[j * n:(j + 1) * n], x.dtype, batched_heads) for j in range(ips)],
                    axis=0,
                )
            att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
            y = (att + x.astype(jnp.float32)).astype(x.dtype)
            y_scr[...] = y
            h_scr[...] = _ln(y, ln2s_ref[0], ln2b_ref[0]).astype(x.dtype)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        hidden = jnp.dot(h_scr[...], w1_ref[...], preferred_element_type=jnp.float32)
        hidden = (hidden + b1_ref[0].astype(jnp.float32)).astype(y_scr.dtype)
        hidden = jax.nn.gelu(hidden, approximate=True)
        acc_scr[...] += jnp.dot(hidden, w2_ref[...], preferred_element_type=jnp.float32)

        @pl.when(t == n_t - 1)
        def _finish():
            out = acc_scr[...] + b2_ref[0].astype(jnp.float32) + y_scr[...].astype(jnp.float32)
            o_ref[...] = out.astype(y_scr.dtype).reshape(o_ref.shape)

    def fn(x, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        row = lambda t: t.reshape(1, -1)
        batch_spec = pl.BlockSpec((ips, N, DIM), lambda i, t: (i, 0, 0))
        const = lambda shape: pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B // ips, n_t),
            in_specs=[
                batch_spec,
                const((DIM, 3 * DIM)),
                const((DIM, DIM)),
                const((1, DIM)), const((1, DIM)), const((1, DIM)), const((1, DIM)),
                pl.BlockSpec((DIM, ht), lambda i, t: (0, t)),
                pl.BlockSpec((1, ht), lambda i, t: (0, t)),
                pl.BlockSpec((ht, DIM), lambda i, t: (t, 0)),
                const((1, DIM)),
            ],
            out_specs=batch_spec,
            compiler_params=_CP,
            scratch_shapes=[
                pltpu.VMEM((ips * N, DIM), x.dtype),
                pltpu.VMEM((ips * N, DIM), x.dtype),
                pltpu.VMEM((ips * N, DIM), jnp.float32),
            ],
        )(x, wqkv, wout, row(ln1s), row(ln1b), row(ln2s), row(ln2b),
          w1, row(b1), w2, row(b2))

    return fn


# ---------------------------- whole layer, n padded to 200, key-masked

def make_whole_padded(ips, n_pad=200, n_real=N):
    """x comes in already padded to ``n_pad`` rows/keys per image.  Padding
    keys are masked out of the softmax with an additive -inf bias; padded
    rows compute garbage that the caller slices away after the LAST layer
    (padding once for the whole stack, not per layer).  n_pad % 8 == 0 makes
    the (ips, n, dim) -> (ips*n, dim) collapse a layout no-op for ANY ips,
    which lifts the projection/FF GEMMs from 394-row M-tiles (77% of the
    MXU's 128-row tiling) toward 96% at ips=8."""

    def kernel(x_ref, wqkv_ref, wout_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        rows = ips * n_pad
        x = x_ref[...].reshape(rows, DIM)
        ln1 = _ln(x, ln1s_ref[0], ln1b_ref[0]).astype(x.dtype)
        qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        key_bias = jnp.where(col < n_real, 0.0, -jnp.inf).astype(jnp.float32)
        outs = []
        for j in range(ips):
            sl = slice(j * n_pad, (j + 1) * n_pad)
            sub = []
            for h in range(H):
                q = qkv[sl, h * D:(h + 1) * D]
                k = qkv[sl, DIM + h * D: DIM + (h + 1) * D]
                v = qkv[sl, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * SCALE + key_bias
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                sub.append(jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype))
            outs.append(jnp.concatenate(sub, axis=-1))
        merged = outs[0] if ips == 1 else jnp.concatenate(outs, axis=0)
        att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
        y = (att + x.astype(jnp.float32)).astype(x.dtype)

        h2 = _ln(y, ln2s_ref[0], ln2b_ref[0]).astype(x.dtype)
        h2 = jnp.dot(h2, w1_ref[...], preferred_element_type=jnp.float32)
        h2 = jax.nn.gelu((h2 + b1_ref[0].astype(jnp.float32)).astype(x.dtype), approximate=True)
        out = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32)
        out = out + b2_ref[0].astype(jnp.float32) + y.astype(jnp.float32)
        o_ref[...] = out.astype(x.dtype).reshape(o_ref.shape)

    def fn(xp, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        row = lambda t: t.reshape(1, -1)
        batch_spec = pl.BlockSpec((ips, n_pad, DIM), lambda i: (i, 0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            grid=(B // ips,),
            in_specs=[
                batch_spec,
                pl.BlockSpec((DIM, 3 * DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, MLP), lambda i: (0, 0)),
                pl.BlockSpec((1, MLP), lambda i: (0, 0)),
                pl.BlockSpec((MLP, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
            ],
            out_specs=batch_spec,
            compiler_params=_CP,
        )(xp, wqkv, wout, row(ln1s), row(ln1b), row(ln2s), row(ln2b),
          w1, row(b1), w2, row(b2))

    return fn


def make_whole_padded_tiled(ips, ht, n_pad=200, n_real=N):
    """Padded whole-layer with FF weights streamed in hidden tiles
    (grid axis 1) — lets ips grow past what resident FF weights allow."""
    n_t = MLP // ht

    def kernel(x_ref, wqkv_ref, wout_ref, ln1s_ref, ln1b_ref, ln2s_ref,
               ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
               y_scr, h_scr, acc_scr):
        t = pl.program_id(1)
        rows = ips * n_pad

        @pl.when(t == 0)
        def _attn_phase():
            x = x_ref[...].reshape(rows, DIM)
            ln1 = _ln(x, ln1s_ref[0], ln1b_ref[0]).astype(x.dtype)
            qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
            key_bias = jnp.where(col < n_real, 0.0, -jnp.inf).astype(jnp.float32)
            outs = []
            for j in range(ips):
                sl = slice(j * n_pad, (j + 1) * n_pad)
                sub = []
                for h in range(H):
                    q = qkv[sl, h * D:(h + 1) * D]
                    k = qkv[sl, DIM + h * D: DIM + (h + 1) * D]
                    v = qkv[sl, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
                    logits = jax.lax.dot_general(
                        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                    ) * SCALE + key_bias
                    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                    p = jnp.exp(logits)
                    p = p / jnp.sum(p, axis=-1, keepdims=True)
                    sub.append(jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype))
                outs.append(jnp.concatenate(sub, axis=-1))
            merged = outs[0] if ips == 1 else jnp.concatenate(outs, axis=0)
            att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
            y = (att + x.astype(jnp.float32)).astype(x.dtype)
            y_scr[...] = y
            h_scr[...] = _ln(y, ln2s_ref[0], ln2b_ref[0]).astype(x.dtype)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        hidden = jnp.dot(h_scr[...], w1_ref[...], preferred_element_type=jnp.float32)
        hidden = jax.nn.gelu((hidden + b1_ref[0].astype(jnp.float32)).astype(h_scr.dtype), approximate=True)
        acc_scr[...] += jnp.dot(hidden, w2_ref[...], preferred_element_type=jnp.float32)

        @pl.when(t == n_t - 1)
        def _finish():
            out = acc_scr[...] + b2_ref[0].astype(jnp.float32) + y_scr[...].astype(jnp.float32)
            o_ref[...] = out.astype(y_scr.dtype).reshape(o_ref.shape)

    def fn(xp, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        row = lambda t: t.reshape(1, -1)
        batch_spec = pl.BlockSpec((ips, n_pad, DIM), lambda i, t: (i, 0, 0))
        const = lambda shape: pl.BlockSpec(shape, lambda i, t: tuple(0 for _ in shape))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            grid=(B // ips, n_t),
            in_specs=[
                batch_spec,
                const((DIM, 3 * DIM)),
                const((DIM, DIM)),
                const((1, DIM)), const((1, DIM)), const((1, DIM)), const((1, DIM)),
                pl.BlockSpec((DIM, ht), lambda i, t: (0, t)),
                pl.BlockSpec((1, ht), lambda i, t: (0, t)),
                pl.BlockSpec((ht, DIM), lambda i, t: (t, 0)),
                const((1, DIM)),
            ],
            out_specs=batch_spec,
            compiler_params=_CP,
            scratch_shapes=[
                pltpu.VMEM((ips * n_pad, DIM), jnp.bfloat16),
                pltpu.VMEM((ips * n_pad, DIM), jnp.bfloat16),
                pltpu.VMEM((ips * n_pad, DIM), jnp.float32),
            ],
        )(xp, wqkv, wout, row(ln1s), row(ln1b), row(ln2s), row(ln2b),
          w1, row(b1), w2, row(b2))

    return fn


def make_attn_padded(ips, n_pad=200, n_real=N):
    """Attention block only (padded, key-masked) — pair with XLA FF to
    isolate the M-efficiency gain on the projections."""

    def kernel(x_ref, wqkv_ref, wout_ref, ln1s_ref, ln1b_ref, o_ref):
        rows = ips * n_pad
        x = x_ref[...].reshape(rows, DIM)
        ln1 = _ln(x, ln1s_ref[0], ln1b_ref[0]).astype(x.dtype)
        qkv = jnp.dot(ln1, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        key_bias = jnp.where(col < n_real, 0.0, -jnp.inf).astype(jnp.float32)
        outs = []
        for j in range(ips):
            sl = slice(j * n_pad, (j + 1) * n_pad)
            sub = []
            for h in range(H):
                q = qkv[sl, h * D:(h + 1) * D]
                k = qkv[sl, DIM + h * D: DIM + (h + 1) * D]
                v = qkv[sl, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
                logits = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) * SCALE + key_bias
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                sub.append(jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype))
            outs.append(jnp.concatenate(sub, axis=-1))
        merged = outs[0] if ips == 1 else jnp.concatenate(outs, axis=0)
        att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
        o_ref[...] = (att + x.astype(jnp.float32)).astype(x.dtype).reshape(o_ref.shape)

    def attn(xp, wqkv, wout, ln1s, ln1b):
        row = lambda t: t.reshape(1, -1)
        batch_spec = pl.BlockSpec((ips, n_pad, DIM), lambda i: (i, 0, 0))
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            grid=(B // ips,),
            in_specs=[
                batch_spec,
                pl.BlockSpec((DIM, 3 * DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
            ],
            out_specs=batch_spec,
            compiler_params=_CP,
        )(xp, wqkv, wout, row(ln1s), row(ln1b))

    def fn(xp, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2):
        y = attn(xp, wqkv, wout, ln1s, ln1b)
        h = _ln(y, ln2s, ln2b).astype(xp.dtype)
        h = h @ w1 + b1
        h = jax.nn.gelu(h, approximate=True)
        return (h @ w2 + b2 + y.astype(jnp.float32)).astype(xp.dtype)

    return fn


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    dt = jnp.bfloat16
    x = jax.random.normal(ks[0], (B, N, DIM), dt)
    wqkv = jax.random.normal(ks[1], (DIM, 3 * DIM), dt) * 0.02
    wout = jax.random.normal(ks[2], (DIM, DIM), dt) * 0.02
    ln1s = jnp.ones((DIM,), dt); ln1b = jnp.zeros((DIM,), dt)
    ln2s = jnp.ones((DIM,), dt); ln2b = jnp.zeros((DIM,), dt)
    w1 = jax.random.normal(ks[3], (DIM, MLP), dt) * 0.02
    b1 = jnp.zeros((MLP,), dt)
    w2 = jax.random.normal(ks[4], (MLP, DIM), dt) * 0.02
    b2 = jnp.zeros((DIM,), dt)
    args = (x, wqkv, wout, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2)

    print(f"devices: {jax.devices()}")
    base = timeit("baseline: fused-attn kernel + XLA FF", baseline_pair, *args)

    # correctness anchor for the variants
    ref = baseline_pair(*args)

    for name, fn in [
        ("whole resident ips=2", make_whole_resident(2)),
    ]:
        t = timeit(name, fn, *args)
        if t is not None:
            out = fn(*args)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"{'':52s} max|Δ|={err:.4f} (rel {rel:.4f}) vs baseline")

    # ---- padded variants: x padded once to n=200 for the whole stack ----
    NP = 200
    xp = jnp.pad(x, ((0, 0), (0, NP - N), (0, 0)))
    pargs = (xp,) + args[1:]
    for name, fn in [
        ("padded resident ips=4", make_whole_padded(4, NP)),
        ("padded resident ips=8", make_whole_padded(8, NP)),
        ("padded resident ips=16", make_whole_padded(16, NP)),
        ("padded tiled ht=768 ips=8", make_whole_padded_tiled(8, 768, NP)),
        ("padded attn-only ips=8 + XLA FF", make_attn_padded(8, NP)),
    ]:
        t = timeit(name, fn, *pargs)
        if t is not None:
            out = fn(*pargs)[:, :N]
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
            rel = err / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f"{'':52s} max|Δ|={err:.4f} (rel {rel:.4f}) vs baseline")


if __name__ == "__main__":
    main()
