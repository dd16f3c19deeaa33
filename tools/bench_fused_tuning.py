"""Tuning experiments: (a) images-per-grid-step in the fused block kernel,
(b) remat policies for the ViT-B bs=1024 train step."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, H, N, D = 128, 12, 197, 64
DIM = H * D
LAYERS = 12
INNER = 10


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


def make_fused(imgs_per_step):
    def kernel(x_ref, wqkv_ref, wout_ref, lns_ref, lnb_ref, o_ref):
        for j in range(imgs_per_step):
            x = x_ref[j]
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
            ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
            ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
            ln = ln.astype(x.dtype)
            qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
            outs = []
            for h in range(H):
                q = qkv[:, h * D:(h + 1) * D]
                k = qkv[:, DIM + h * D: DIM + (h + 1) * D]
                v = qkv[:, 2 * DIM + h * D: 2 * DIM + (h + 1) * D]
                logits = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * (D ** -0.5)
                logits = logits - jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                outs.append(jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32).astype(x.dtype))
            merged = jnp.concatenate(outs, axis=-1)
            out = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32)
            o_ref[j] = (x.astype(jnp.float32) + out).astype(x.dtype)

    def fn(x, w_qkv, w_out, lns, lnb):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            grid=(B // imgs_per_step,),
            in_specs=[
                pl.BlockSpec((imgs_per_step, N, DIM), lambda i: (i, 0, 0)),
                pl.BlockSpec((DIM, 3 * DIM), lambda i: (0, 0)),
                pl.BlockSpec((DIM, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
                pl.BlockSpec((1, DIM), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((imgs_per_step, N, DIM), lambda i: (i, 0, 0)),
        )(x, w_qkv, w_out, lns, lnb)

    return fn


def tune_kernel():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    x = jax.random.normal(key, (B, N, DIM), dt)
    w_qkv = jax.random.normal(jax.random.fold_in(key, 1), (DIM, 3 * DIM), dt) * 0.02
    w_out = jax.random.normal(jax.random.fold_in(key, 2), (DIM, DIM), dt) * 0.02
    lns = jnp.ones((1, DIM), dt)
    lnb = jnp.zeros((1, DIM), dt)

    def stack(fn):
        def run(x, *rest):
            for _ in range(LAYERS):
                x = fn(x, *rest)
            return x
        return run

    for ips in (1, 2, 4):
        try:
            timeit(f"fused block {ips} img/step", stack(make_fused(ips)), x, w_qkv, w_out, lns, lnb)
        except Exception as e:
            print(f"fused block {ips} img/step failed: {type(e).__name__}")


def tune_train():
    import optax
    from vit_pytorch_tpu import ViT

    batch = 1024
    for name, remat, policy in [
        ("remat full (current)", True, None),
        ("remat dots_saveable", True, "dots"),
        ("no remat", False, None),
    ]:
        model = ViT(image_size=224, patch_size=16, num_classes=1000, dim=768,
                    depth=12, heads=12, mlp_dim=3072, remat=remat)
        if policy == "dots":
            import vit_pytorch_tpu.nn.blocks as blocks_mod
            # monkeypatch remat policy for the experiment
            import flax.linen as nn
            orig_remat = nn.remat
            nn_remat = functools.partial(
                nn.remat, policy=jax.checkpoint_policies.dots_saveable
            )
            blocks_mod.nn.remat = nn_remat
        try:
            rng = jax.random.PRNGKey(0)
            img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
            labels = jnp.zeros((batch,), jnp.int32)
            params = model.init(rng, img[:1].astype(jnp.float32))["params"]
            params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            tx = optax.adam(3e-4)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state, img, labels):
                def loss_fn(p):
                    logits = model.apply({"params": p}, img)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits.astype(jnp.float32), labels).mean()
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            p2, o2, loss = step(params, opt_state, img, labels)
            float(loss)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                p2, o2, loss = step(p2, o2, img, labels)
                float(loss)
                best = min(best, time.perf_counter() - t0)
            print(f"train {name:28s} {best * 1e3:8.1f} ms/step ({batch / best:.0f} img/s)")
        except Exception as e:
            print(f"train {name:28s} FAILED: {type(e).__name__}: {str(e)[:120]}")
        finally:
            if policy == "dots":
                blocks_mod.nn.remat = orig_remat


if __name__ == "__main__":
    if "train" in sys.argv:
        tune_train()
    else:
        tune_kernel()
