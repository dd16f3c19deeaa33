"""Round-3: decompose the ViT-B bs=1024 train step (1,022-1,028 ms in r2,
~53% MFU; ideal ~680 ms) to find where the non-ideal 350 ms lives.

Measures, all jitted, tunnel-amortized over ITERS chained steps:
  fwd-only                       (inference fwd at train batch)
  value_and_grad                 (fwd + bwd, no optimizer)
  full step (grad + adam)        (the bench.py metric)
  variants: remat on/off, whole-layer kernel on/off
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu import ViT

BATCH = 1024
ITERS = 5


def timed(name, fn, *args):
    try:
        out = fn(*args)
        jax.tree.map(lambda t: t.block_until_ready(), out)
        # tunnel: force completion via host fetch
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:120]}")
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    ms = best / ITERS * 1e3
    print(f"{name:44s} {ms:8.1f} ms/step")
    return ms


def build(remat):
    model = ViT(
        image_size=224, patch_size=16, num_classes=1000, dim=768, depth=12,
        heads=12, mlp_dim=3072, remat=remat,
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (BATCH, 3, 224, 224), jnp.bfloat16)
    labels = jnp.zeros((BATCH,), jnp.int32)
    params = model.init(rng, img[:1].astype(jnp.float32))["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return model, img, labels, params


def loss_fn(model, p, img, labels):
    logits = model.apply({"params": p}, img)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def run(tag, remat):
    model, img, labels, params = build(remat)

    @jax.jit
    def fwd_loop(p, img, labels):
        def body(i, acc):
            im = img * (1 + i * jnp.asarray(1e-6, img.dtype))
            return acc + loss_fn(model, p, im, labels)
        return jax.lax.fori_loop(0, ITERS, body, jnp.float32(0.0))

    timed(f"{tag}: fwd-only x{ITERS}", fwd_loop, params, img, labels)

    @jax.jit
    def grad_loop(p, img, labels):
        def body(i, carry):
            acc, p = carry
            im = img * (1 + i * jnp.asarray(1e-6, img.dtype))
            loss, g = jax.value_and_grad(lambda q: loss_fn(model, q, im, labels))(p)
            # consume grads so nothing is DCE'd; keep params unchanged
            acc = acc + loss + 0.0 * sum(jnp.sum(t.astype(jnp.float32)) for t in jax.tree.leaves(g))
            return acc, p
        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), p))
        return acc

    timed(f"{tag}: fwd+bwd x{ITERS}", grad_loop, params, img, labels)

    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step_loop(p, opt_state, img, labels):
        def body(i, carry):
            p, s, acc = carry
            im = img * (1 + i * jnp.asarray(1e-6, img.dtype))
            loss, g = jax.value_and_grad(lambda q: loss_fn(model, q, im, labels))(p)
            upd, s = tx.update(g, s, p)
            p = optax.apply_updates(p, upd)
            return p, s, acc + loss
        p, s, acc = jax.lax.fori_loop(0, ITERS, body, (p, opt_state, jnp.float32(0.0)))
        return acc

    timed(f"{tag}: full step x{ITERS}", step_loop, params, opt_state, img, labels)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}  batch={BATCH}")
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "kernel-bwd"):
        # the measured-out single-kernel layer backward (opt-in)
        os.environ["VIT_TPU_ENABLE_WHOLE_LAYER_BWD"] = "1"
        run("remat, kernel-bwd", True)
        del os.environ["VIT_TPU_ENABLE_WHOLE_LAYER_BWD"]
    if which in ("all", "decomposed-bwd"):
        run("remat, decomposed-bwd", True)
    if which in ("all", "no-remat"):
        run("no-remat, decomposed-bwd", False)
    if which in ("all", "no-whole-layer"):
        os.environ["VIT_TPU_DISABLE_WHOLE_LAYER"] = "1"
        run("remat, no-whole-layer", True)
        del os.environ["VIT_TPU_DISABLE_WHOLE_LAYER"]
