"""Per-layer attention micro-benchmark on the real TPU chip.

Measures the ViT-B/16 @224 attention block (b=128, h=12, n=197, d=64) in
every formulation the round-1 PERF_NOTES left untried, to decide where the
round-2 kernel effort goes.  Methodology matches bench.py: iterations chained
inside one jitted fori_loop (input perturbed so nothing hoists), scalar fetch
to synchronize through the axon tunnel.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, H, N, D = 128, 12, 197, 64
DIM = H * D  # 768
LAYERS = 12
INNER = 10


def timeit(name, fn, *args):
    loop = jax.jit(
        lambda *a: jax.lax.fori_loop(
            0,
            INNER,
            lambda i, acc: acc
            + jnp.sum(
                fn(*[x * (1 + i * jnp.asarray(1e-6, x.dtype)) for x in a]).astype(
                    jnp.float32
                )
            ),
            jnp.float32(0.0),
        )
    )
    float(loop(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    per_call = best / INNER * 1e3
    print(f"{name:44s} {per_call:8.3f} ms/call   ({per_call/LAYERS:.3f} ms/layer-equiv)")
    return per_call


def stack_layers(layer_fn, n_layers=LAYERS):
    """Chain n_layers applications so per-layer overheads are amortized the
    same way they are inside the real model."""

    def run(x, *rest):
        for _ in range(n_layers):
            x = layer_fn(x, *rest)
        return x

    return run


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    q = jax.random.normal(key, (B, H, N, D), dt)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), dt)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), dt)

    scale = D**-0.5

    # ---- A. current XLA attention (bf16 logit store, fp32 softmax math) ----
    from vit_pytorch_tpu.ops.attention import xla_attention

    def attn_only(q, k, v):
        return xla_attention(q, k, v)

    timeit("A xla_attention (current)", stack_layers(lambda x, k, v: attn_only(x, k, v)), q, k, v)

    # ---- B. jax.nn.dot_product_attention ----
    def jnn(q, k, v):
        # expects (b, n, h, d)
        qt, kt, vt = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
        o = jax.nn.dot_product_attention(qt, kt, vt)
        return jnp.swapaxes(o, 1, 2)

    timeit("B jax.nn.dot_product_attention", stack_layers(lambda x, k, v: jnn(x, k, v)), q, k, v)

    # ---- C. pad kv 197->256, additive -inf bias on pads ----
    def padded_kv(q, k, v):
        pad = 256 - N
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        neg = jnp.asarray(-1e9, jnp.float32)
        bias = jnp.where(jnp.arange(256) < N, 0.0, neg)  # (256,)
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, kp, preferred_element_type=jnp.bfloat16)
        dots = dots * jnp.asarray(scale, jnp.bfloat16) + bias.astype(jnp.bfloat16)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dt)
        return jnp.einsum("bhnm,bhmd->bhnd", attn, vp, preferred_element_type=dt)

    timeit("C pad kv->256 + bias", stack_layers(lambda x, k, v: padded_kv(x, k, v)), q, k, v)

    # ---- D. pad q AND kv to 256 (slice back after) ----
    def padded_all(q, k, v):
        pad = 256 - N
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        neg = jnp.asarray(-1e9, jnp.float32)
        bias = jnp.where(jnp.arange(256) < N, 0.0, neg)
        dots = jnp.einsum("bhnd,bhmd->bhnm", qp, kp, preferred_element_type=jnp.bfloat16)
        dots = dots * jnp.asarray(scale, jnp.bfloat16) + bias.astype(jnp.bfloat16)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dt)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, vp, preferred_element_type=dt)
        return o[:, :, :N, :]

    timeit("D pad q+kv->256 + bias", stack_layers(lambda x, k, v: padded_all(x, k, v)), q, k, v)

    # ---- E. splash attention stock kernel ----
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.FullMask((N, N))
        mmask = sm.MultiHeadMask([mask] * H)
        kernel = sk.make_splash_mha(
            mask=mmask, head_shards=1, q_seq_shards=1
        )
        vm = jax.vmap(kernel)

        def splash(q, k, v):
            return vm(q * scale, k, v)

        timeit("E splash attention (stock)", stack_layers(lambda x, k, v: splash(x, k, v)), q, k, v)
    except Exception as e:
        print("E splash attention failed:", repr(e))

    # ---- F. repo flash kernel ----
    try:
        from vit_pytorch_tpu.ops.flash_attention import flash_attention

        def repo_flash(q, k, v):
            return flash_attention(q, k, v, scale=scale)

        timeit("F repo flash kernel", stack_layers(lambda x, k, v: repo_flash(x, k, v)), q, k, v)
    except Exception as e:
        print("F repo flash failed:", repr(e))

    # ---- G. full XLA attention BLOCK: LN + qkv + attn + out + residual ----
    x = jax.random.normal(key, (B, N, DIM), dt)
    w_qkv = jax.random.normal(jax.random.fold_in(key, 3), (DIM, 3 * DIM), dt) * 0.02
    w_out = jax.random.normal(jax.random.fold_in(key, 4), (DIM, DIM), dt) * 0.02
    ln_scale = jnp.ones((DIM,), dt)
    ln_bias = jnp.zeros((DIM,), dt)

    def block(x, w_qkv, w_out, ln_scale, ln_bias):
        h = x.astype(jnp.float32)
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        h = ((h - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * ln_scale + ln_bias
        qkv = h @ w_qkv
        qq, kk, vv = jnp.split(qkv, 3, axis=-1)
        reshape = lambda t: t.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        o = xla_attention(reshape(qq), reshape(kk), reshape(vv))
        o = o.transpose(0, 2, 1, 3).reshape(B, N, DIM)
        return x + o @ w_out

    timeit(
        "G XLA full block (LN+qkv+attn+out+res)",
        stack_layers(block),
        x,
        w_qkv,
        w_out,
        ln_scale,
        ln_bias,
    )

    # ---- H. full block, BNHD-native: no head transposes at all ----
    def block_bnhd(x, w_qkv, w_out, ln_scale, ln_bias):
        hx = x.astype(jnp.float32)
        mu = hx.mean(-1, keepdims=True)
        var = hx.var(-1, keepdims=True)
        hx = ((hx - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * ln_scale + ln_bias
        qkv = hx @ w_qkv
        qq, kk, vv = jnp.split(qkv, 3, axis=-1)
        qq = qq.reshape(B, N, H, D) * jnp.asarray(scale, dt)
        kk = kk.reshape(B, N, H, D)
        vv = vv.reshape(B, N, H, D)
        dots = jnp.einsum("bnhd,bmhd->bhnm", qq, kk, preferred_element_type=dt)
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dt)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, vv, preferred_element_type=dt)
        return x + o.reshape(B, N, DIM) @ w_out

    timeit(
        "H XLA full block BNHD-native (no transpose)",
        stack_layers(block_bnhd),
        x,
        w_qkv,
        w_out,
        ln_scale,
        ln_bias,
    )

    # ---- I. BNHD-native + kv padded to 256 ----
    def block_bnhd_pad(x, w_qkv, w_out, ln_scale, ln_bias):
        hx = x.astype(jnp.float32)
        mu = hx.mean(-1, keepdims=True)
        var = hx.var(-1, keepdims=True)
        hx = ((hx - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * ln_scale + ln_bias
        qkv = hx @ w_qkv
        qq, kk, vv = jnp.split(qkv, 3, axis=-1)
        qq = qq.reshape(B, N, H, D) * jnp.asarray(scale, dt)
        kk = kk.reshape(B, N, H, D)
        vv = vv.reshape(B, N, H, D)
        pad = 256 - N
        kk = jnp.pad(kk, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vv = jnp.pad(vv, ((0, 0), (0, pad), (0, 0), (0, 0)))
        bias = jnp.where(jnp.arange(256) < N, 0.0, -1e9).astype(dt)
        dots = jnp.einsum("bnhd,bmhd->bhnm", qq, kk, preferred_element_type=dt) + bias
        attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1).astype(dt)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, vv, preferred_element_type=dt)
        return x + o.reshape(B, N, DIM) @ w_out

    timeit(
        "I XLA full block BNHD + kv pad 256",
        stack_layers(block_bnhd_pad),
        x,
        w_qkv,
        w_out,
        ln_scale,
        ln_bias,
    )


if __name__ == "__main__" and len(sys.argv) == 1:
    main()


def decompose():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, N, DIM), dt)
    w_qkv = jax.random.normal(jax.random.fold_in(key, 3), (DIM, 3 * DIM), dt) * 0.02
    w_out = jax.random.normal(jax.random.fold_in(key, 4), (DIM, DIM), dt) * 0.02
    ln_scale = jnp.ones((DIM,), dt)
    ln_bias = jnp.zeros((DIM,), dt)
    scale = D ** -0.5

    def ln(x):
        hx = x.astype(jnp.float32)
        mu = hx.mean(-1, keepdims=True)
        var = hx.var(-1, keepdims=True)
        return ((hx - mu) * jax.lax.rsqrt(var + 1e-5)).astype(dt) * ln_scale + ln_bias

    # block minus attention: LN + qkv GEMM + take q slice as "output" + out GEMM
    def block_noattn(x, w_qkv, w_out, ln_scale, ln_bias):
        hx = ln(x)
        qkv = hx @ w_qkv
        qq = qkv[..., :DIM]
        return x + qq @ w_out

    timeit("J block minus attention (LN+qkv+out)", stack_layers(lambda x, *r: block_noattn(x, *r)), x, w_qkv, w_out, ln_scale, ln_bias)

    # LN alone
    timeit("K LayerNorm alone", stack_layers(lambda x: ln(x)), x)

    # GEMMs alone (no LN)
    def gemms(x, w_qkv, w_out):
        qkv = x @ w_qkv
        return x + qkv[..., :DIM] @ w_out

    timeit("L qkv+out GEMMs alone", stack_layers(lambda x, *r: gemms(x, *r)), x, w_qkv, w_out)

    # softmax alone on (B,H,N,N) bf16
    dots = jax.random.normal(key, (B, H, N, N), dt)
    def sm(d):
        return jax.nn.softmax(d.astype(jnp.float32), axis=-1).astype(dt)
    timeit("M softmax alone (B,H,197,197)", stack_layers(sm), dots)

    # attention einsums without softmax
    q = jax.random.normal(key, (B, H, N, D), dt)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, N, D), dt)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, N, D), dt)
    def eins(q, k, v):
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=dt)
        return jnp.einsum("bhnm,bhmd->bhnd", dots, v, preferred_element_type=dt)
    timeit("N attention einsums only (no softmax)", stack_layers(lambda q, k, v: eins(q, k, v) + q), q, k, v)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "decompose":
    decompose()
