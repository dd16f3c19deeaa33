"""Inference/pretraining throughput for the five BASELINE.json parity
configs on one TPU chip — perf breadth beyond the flagship ViT-B bench.

Configs (BASELINE.md "Parity configs"):
  1. vit_readme   — ViT README example (dim 1024, depth 6, heads 16, patch 32, 256²)
  2. simple_vit   — SimpleViT, same README dims
  3. navit_packed — NaViT-B packed variable-resolution inference (flash kernel
                    with segment-id tile skipping; token dropout off at eval)
  4. max_vit      — MaxViT README config (MBConv + block/grid attention)
  5. vivit        — ViViT factorized encoder, README video config
  6. mae_pretrain — MAE pretraining step (masking + encoder + decoder + MSE
                    + grads + adamw) over the README ViT encoder

Usage:  python tools/bench_zoo.py [config ...]     # default: all
        SMOKE=1 python tools/bench_zoo.py          # tiny shapes, CPU-runnable
Prints one line per config: name, img/s (videos/s for vivit), ms/step.
Methodology matches bench.py: bf16 params+inputs, chained steps inside one
jit (the axon tunnel charges ~30 ms per dispatch), best of 3.
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


# SMOKE=1: shrink batch/iters so the whole sweep runs on CPU in minutes —
# a code-path correctness check (used by tests), not a measurement
SMOKE = bool(int(os.environ.get("SMOKE", "0")))


def _size(batch, iters):
    return (max(2, batch // 128), 2) if SMOKE else (batch, iters)


def _bf16(tree):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), tree)


def _init(model, rngs, *args, **kwargs):
    # jitted init: eager flax init at large batch RESOURCE_EXHAUSTs the
    # remote chip (see utils/helpers.py jit_init docstring)
    from vit_pytorch_tpu.utils.helpers import jit_init

    return jit_init(model, rngs, *args, **kwargs)


_PEAK_TFLOPS = 197.0  # v5e bf16 MXU peak — same constant as bench.py roofline


def _measure(fn, *args, repeats=3):
    """fn(*args) -> scalar; returns best wall seconds over `repeats`."""
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _model_flops(step_fn, *args):
    """True FLOPs of ONE step, from XLA cost analysis of an XLA-only
    lowering.  Two traps this avoids (both hit in round 4's first sweep):
    (a) Pallas custom calls are OPAQUE to cost analysis — a kernel-tier
    model reports ~0 flops — so the probe lowers with the whole kernel
    tier disabled (the math, hence the FLOP count, is backend-
    independent); (b) fori_loop bodies are counted once, not trip-count
    times, so the probe is a single un-looped step.  Compile-only: the
    probe never executes, so its XLA-path memory footprint doesn't matter.
    """
    saved = {}
    for knob in ("VIT_TPU_DISABLE_FUSED", "VIT_TPU_DISABLE_FLASH"):
        saved[knob] = os.environ.get(knob)
        os.environ[knob] = "1"
    try:
        return jax.jit(step_fn).lower(*args).compile().cost_analysis()["flops"]
    except Exception:
        return None
    finally:
        for knob, old in saved.items():
            if old is None:
                os.environ.pop(knob, None)
            else:
                os.environ[knob] = old


def _mfu(step_fn, args, seconds):
    """', N GFLOP/step, M% MXU' suffix (or '' when cost analysis is
    unavailable, e.g. CPU smoke runs)."""
    flops = _model_flops(step_fn, *args)
    if not flops:
        return ""
    pct = flops / seconds / (_PEAK_TFLOPS * 1e12) * 100.0
    return f", {flops / 1e9:.1f} GFLOP/step, {pct:.1f}% MXU"


def _chained_forward(model, params, x, iters, **apply_kw):
    """Returns (seconds/step, mfu_suffix)."""

    @jax.jit
    def loop(params, x):
        def body(i, acc):
            out = model.apply(params, x * (1.0 + i.astype(x.dtype) * 1e-6), **apply_kw)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    s = _measure(loop, params, x) / iters
    step = lambda params, x: model.apply(params, x, **apply_kw)
    return s, _mfu(step, (params, x), s)


def bench_vit_readme():
    from vit_pytorch_tpu import ViT

    batch, iters = _size(256, 30)
    model = ViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                depth=6, heads=16, mlp_dim=2048, dropout=0.1, emb_dropout=0.1)
    img = jax.random.normal(jax.random.PRNGKey(0), (batch, 3, 256, 256), jnp.bfloat16)
    params = _bf16(_init(model, jax.random.PRNGKey(0), img[:1].astype(jnp.float32)))
    s, mfu = _chained_forward(model, params, img, iters)
    print(f"vit_readme    bs={batch}: {batch / s:.0f} img/s, {s * 1e3:.2f} ms/step{mfu}")


def bench_simple_vit():
    from vit_pytorch_tpu import SimpleViT

    batch, iters = _size(256, 30)
    model = SimpleViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                      depth=6, heads=16, mlp_dim=2048)
    img = jax.random.normal(jax.random.PRNGKey(0), (batch, 3, 256, 256), jnp.bfloat16)
    params = _bf16(_init(model, jax.random.PRNGKey(0), img[:1].astype(jnp.float32)))
    s, mfu = _chained_forward(model, params, img, iters)
    print(f"simple_vit    bs={batch}: {batch / s:.0f} img/s, {s * 1e3:.2f} ms/step{mfu}")


def bench_navit_packed():
    from vit_pytorch_tpu.models.na_vit import NaViT
    from vit_pytorch_tpu.ops.packing import pack_images

    patch, max_seq, iters = 16, 2048, (2 if SMOKE else 10)
    n_images, pad_groups = (12, 2) if SMOKE else (120, 16)
    model = NaViT(image_size=256, patch_size=patch, num_classes=1000,
                  dim=768, depth=12, heads=12, mlp_dim=3072,
                  token_dropout_prob=0.25)
    rng = np.random.default_rng(0)
    resolutions = [(256, 256), (224, 224), (160, 256), (256, 160),
                   (128, 128), (96, 192)]
    images = []
    for _ in range(n_images):
        h, w = resolutions[rng.integers(len(resolutions))]
        images.append(rng.normal(size=(3, h, w)).astype(np.float32))
    packed = pack_images(images, patch_size=patch, max_seq_len=max_seq,
                         token_dropout_prob=None, train=False, rng=rng,
                         pad_groups_to=pad_groups, max_images=16)
    packed = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        packed,
    )
    # init on a single pack: param shapes are batch-independent, and the
    # full-batch eager init was the measured OOM (PERF_NOTES round 4)
    packed1 = jax.tree.map(
        lambda x: x[:1] if hasattr(x, "ndim") and getattr(x, "ndim", 0) else x,
        packed,
    )
    params = _bf16(_init(model, jax.random.PRNGKey(0), packed1, train=False))
    n_img = len(images)

    @jax.jit
    def loop(params, packed):
        def body(i, acc):
            # perturb the patches per iteration: with an invariant body XLA
            # hoists the whole apply out of the loop (measured — the first
            # round-5 sweep reported a 10x-inflated 9.7k img/s this way)
            p = dataclasses.replace(
                packed,
                patches=packed.patches
                * (1.0 + i.astype(packed.patches.dtype) * 1e-6),
            )
            out = model.apply(params, p, train=False)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    s = _measure(loop, params, packed) / iters
    # analytic model FLOPs (same convention as tools/bench_navit_train.py):
    # the XLA probe counts DENSE attention over the zero-padded 2048-token
    # packs (measured 8.3 TFLOP -> a nonsense 341% "MXU"), while the flash
    # kernel tile-skips padding; count projections over real tokens and
    # block-diagonal dots at true per-segment lengths instead
    ids = np.asarray(packed.image_ids)
    n_tok = int((ids >= 0).sum())
    seg_lengths = [
        int((ids[g] == i).sum())
        for g in range(ids.shape[0])
        for i in range(packed.max_images)
        if (ids[g] == i).any()
    ]
    dim, mlp_dim, depth = 768, 3072, 12
    proj = 2 * n_tok * dim * dim * 4
    ff = 2 * n_tok * dim * mlp_dim * 2
    dots = sum(2 * l * l * dim * 2 for l in seg_lengths)
    flops = depth * (proj + ff + dots)
    mfu = f", {flops / 1e9:.1f} GFLOP/step, {flops / s / (_PEAK_TFLOPS * 1e12) * 100:.1f}% MXU (analytic)"
    print(f"navit_packed  {n_img} var-res imgs/step: {n_img / s:.0f} img/s, "
          f"{s * 1e3:.2f} ms/step{mfu}")


def bench_max_vit():
    from vit_pytorch_tpu.models.max_vit import MaxViT

    batch, iters = _size(128, 20)
    model = MaxViT(num_classes=1000, dim_conv_stem=64, dim=96, dim_head=32,
                   depth=(2, 2, 5, 2), window_size=7, dropout=0.1)
    img = jax.random.normal(jax.random.PRNGKey(0), (batch, 3, 224, 224), jnp.bfloat16)
    params = _bf16(_init(model, jax.random.PRNGKey(0), img[:1].astype(jnp.float32)))
    s, mfu = _chained_forward(model, params, img, iters)
    print(f"max_vit       bs={batch}: {batch / s:.0f} img/s, {s * 1e3:.2f} ms/step{mfu}")


def bench_vivit():
    from vit_pytorch_tpu.models.vivit import ViViT

    batch, iters = _size(16, 20)
    model = ViViT(image_size=128, image_patch_size=16, frames=16,
                  frame_patch_size=2, num_classes=1000, dim=1024,
                  spatial_depth=6, temporal_depth=6, heads=8, mlp_dim=2048)
    video = jax.random.normal(
        jax.random.PRNGKey(0), (batch, 3, 16, 128, 128), jnp.bfloat16
    )
    params = _bf16(_init(model, jax.random.PRNGKey(0), video[:1].astype(jnp.float32)))
    s, mfu = _chained_forward(model, params, video, iters)
    print(f"vivit         bs={batch}: {batch / s:.1f} videos/s, {s * 1e3:.2f} ms/step{mfu}")


def bench_mae_pretrain():
    import optax

    from vit_pytorch_tpu import ViT
    from vit_pytorch_tpu.ssl.mae import MAE

    batch, iters = _size(256, 10)
    encoder = ViT(image_size=256, patch_size=32, num_classes=1000, dim=1024,
                  depth=6, heads=8, mlp_dim=2048)
    model = MAE(encoder=encoder, masking_ratio=0.75, decoder_dim=512,
                decoder_depth=6)
    img = jax.random.normal(jax.random.PRNGKey(0), (batch, 3, 256, 256), jnp.bfloat16)
    params = _init(
        model,
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
        img[:1].astype(jnp.float32),
    )
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def loop(params, opt_state, img, rng):
        def body(i, carry):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                return model.apply(p, img, train=True,
                                   rngs={"mask": sub, "dropout": sub})

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rng

        params, opt_state, rng = jax.lax.fori_loop(
            0, iters, body, (params, opt_state, rng)
        )
        # reduce over the updated params so nothing in the loop is DCE'd
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            params,
            jnp.float32(0.0),
        )

    s = _measure(loop, params, opt_state, img, jax.random.PRNGKey(2)) / iters

    def step(params, opt_state, img, rng):
        def loss_fn(p):
            return model.apply(p, img, train=True,
                               rngs={"mask": rng, "dropout": rng})

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    mfu = _mfu(step, (params, opt_state, img, jax.random.PRNGKey(2)), s)
    print(f"mae_pretrain  bs={batch}: {batch / s:.0f} img/s/trainstep, "
          f"{s * 1e3:.2f} ms/step{mfu}")


ALL = {
    "vit_readme": bench_vit_readme,
    "simple_vit": bench_simple_vit,
    "navit_packed": bench_navit_packed,
    "max_vit": bench_max_vit,
    "vivit": bench_vivit,
    "mae_pretrain": bench_mae_pretrain,
}


def main():
    names = sys.argv[1:] or list(ALL)
    for name in names:
        if name not in ALL:
            print(f"unknown config {name!r}; choose from {sorted(ALL)}", file=sys.stderr)
            sys.exit(2)

    # each config runs in its own subprocess: one process accumulating every
    # config's params/jit executables exhausts the 16 GB chip (measured —
    # navit/max_vit/vivit/mae all RESOURCE_EXHAUSTED after the first two)
    if len(names) > 1 and not os.environ.get("VIT_TPU_ZOO_CHILD"):
        import subprocess

        env = dict(os.environ, VIT_TPU_ZOO_CHILD="1")
        for name in names:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), name],
                env=env, timeout=1800,
            )
            if r.returncode != 0:
                print(f"{name}  FAILED: subprocess rc={r.returncode}")
        return

    for name in names:
        try:
            ALL[name]()
        except Exception as e:  # keep the sweep going; record the failure
            print(f"{name}  FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
