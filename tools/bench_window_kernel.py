"""A/B the per-head-bias short-attention kernel vs the XLA composite on the
windowed-attention models (VERDICT r4 #2).

RESULT (v5e, 2026-08-19): the short kernel LOSES 2.7-6x at every 49-token
window shape and ties only at LeViT's n=196 — the auto-route knob was
removed and windowed shapes keep XLA (docs/PERF_NOTES.md round 5).  This
harness remains so the decision can be re-measured on new hardware: the
kernel arm (WINDOW_ARM=1 in the child env) patches the dispatcher to pass
use_flash=True for per-head-bias calls BEFORE the models from-import it.

Two levels:

1. micro — `dot_product_attention` on the exact (b·windows, h, n, d) shapes
   + (h, n, n) rel-pos bias each model feeds the dispatcher.
2. end-to-end — MaxViT / LeViT / CrossFormer / RegionViT full forwards at
   their README configs.

Each arm runs in a subprocess (same pattern as tools/bench_zoo.py).

Usage: python tools/bench_window_kernel.py            # both arms, all
       SMOKE=1 ... (tiny shapes, CPU; a code-path check, not a measurement)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
INNER = 2 if SMOKE else 20
ARM = os.environ.get("WINDOW_ARM", "0")


def _maybe_force_kernel_arm():
    """WINDOW_ARM=1: route per-head-bias shapes to the short kernel by
    wrapping the dispatcher (must run before model modules from-import it)."""
    if ARM != "1":
        return
    from vit_pytorch_tpu.ops import attention as attn_mod

    orig = attn_mod.dot_product_attention

    def forced(q, k, v, *args, **kw):
        bias = kw.get("bias")
        if (
            bias is not None
            and getattr(bias, "ndim", 0) == 3
            and kw.get("use_flash") is None
            and not kw.get("return_attn")
            and kw.get("dropout_rate", 0.0) == 0.0
        ):
            kw["use_flash"] = True
        return orig(q, k, v, *args, **kw)

    attn_mod.dot_product_attention = forced

# (name, b_eff, heads, n, d) — b_eff = batch × windows as each model
# flattens before attention.  Model/README-config derivations in comments.
MICRO_SHAPES = [
    # MaxViT README (dim 96, head 32, window 7): stage1 56² feature, 64
    # windows/img, bs 128 → 8192 slices of (h=3, 49, 32); stage3 (dim 384)
    # 14² → 4 windows, h=12
    ("maxvit_s1_w7", 8192, 3, 49, 32),
    ("maxvit_s3_w7", 512, 12, 49, 32),
    # LeViT-256 stage1: 14² = 196 tokens, 4 heads of 32, bs 128 (levit
    # feeds full feature maps, not windows)
    ("levit_s1", 128, 4, 196, 32),
    # CrossFormer small: group 7 → 49-token windows, stage1 56² → 64
    # windows, h=2 (dim 64, head 32), bs 128
    ("crossformer_s1", 8192, 2, 49, 32),
    # RegionViT local attention: 49 local + 1 regional = 50 tokens,
    # stage1 14² regions... bs 128 × 49 regions, h=2 (dim 64, head 32)
    ("regionvit_local", 6272, 2, 50, 32),
]


def _measure(loop, *args, repeats=3):
    float(loop(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def micro(name, b, h, n, d):
    from vit_pytorch_tpu.ops.attention import dot_product_attention

    if SMOKE:
        b = min(b, 8)
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    dt = jnp.bfloat16
    q = jax.random.normal(ks[0], (b, h, n, d), dt)
    k = jax.random.normal(ks[1], (b, h, n, d), dt)
    v = jax.random.normal(ks[2], (b, h, n, d), dt)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32)

    @jax.jit
    def loop(q, k, v, bias):
        def body(i, acc):
            out = dot_product_attention(
                q * (1 + i * jnp.asarray(1e-6, dt)), k, v, bias=bias
            )
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    s = _measure(loop, q, k, v, bias) / INNER
    print(f"micro {name:16s} kernel={ARM}: {s * 1e3:.3f} ms/call "
          f"(b={b} h={h} n={n} d={d})")


def _bf16(tree):
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), tree)


def _fwd_model(name, model, x):
    from vit_pytorch_tpu.utils.helpers import jit_init

    params = _bf16(jit_init(model, jax.random.PRNGKey(0), x[:1].astype(jnp.float32)))

    @jax.jit
    def loop(params, x):
        def body(i, acc):
            out = model.apply(params, x * (1 + i * jnp.asarray(1e-6, x.dtype)))
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, INNER, body, jnp.float32(0.0))

    s = _measure(loop, params, x) / INNER
    b = x.shape[0]
    print(f"e2e   {name:16s} kernel={ARM}: {b / s:.0f} img/s, "
          f"{s * 1e3:.2f} ms/step (bs={b})")


def e2e(name):
    b = 2 if SMOKE else 128
    img224 = jax.random.normal(jax.random.PRNGKey(0), (b, 3, 224, 224), jnp.bfloat16)
    if name == "max_vit":
        from vit_pytorch_tpu.models.max_vit import MaxViT

        model = MaxViT(num_classes=1000, dim_conv_stem=64, dim=96, dim_head=32,
                       depth=(2, 2, 5, 2), window_size=7)
        _fwd_model(name, model, img224)
    elif name == "levit":
        from vit_pytorch_tpu.models.levit import LeViT

        model = LeViT(image_size=224, num_classes=1000, stages=3, dim=(256, 384, 512),
                      depth=4, heads=(4, 6, 8), mlp_mult=2)
        _fwd_model(name, model, img224)
    elif name == "crossformer":
        from vit_pytorch_tpu.models.crossformer import CrossFormer

        model = CrossFormer(num_classes=1000, dim=(64, 128, 256, 512),
                            depth=(2, 2, 8, 2), global_window_size=(8, 4, 2, 1),
                            local_window_size=7)
        _fwd_model(name, model, img224)
    elif name == "regionvit":
        from vit_pytorch_tpu.models.regionvit import RegionViT

        model = RegionViT(dim=(64, 128, 256, 512), depth=(2, 2, 8, 2),
                          window_size=7, num_classes=1000, local_patch_size=4)
        _fwd_model(name, model, img224)


E2E = ["max_vit", "levit", "crossformer", "regionvit"]


def main():
    if len(sys.argv) > 1:
        # child: one arm of one target
        _maybe_force_kernel_arm()
        kind, target = sys.argv[1], sys.argv[2]
        if kind == "micro":
            spec = next(s for s in MICRO_SHAPES if s[0] == target)
            micro(*spec)
        else:
            e2e(target)
        return

    env0 = dict(os.environ, WINDOW_ARM="0")
    env1 = dict(os.environ, WINDOW_ARM="1")
    for spec in MICRO_SHAPES:
        for env in (env0, env1):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "micro", spec[0]],
                env=env, timeout=2400,
            )
            if r.returncode != 0:
                print(f"micro {spec[0]} FAILED rc={r.returncode}")
    for name in E2E:
        for env in (env0, env1):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "e2e", name],
                env=env, timeout=2400,
            )
            if r.returncode != 0:
                print(f"e2e {name} FAILED rc={r.returncode}")


if __name__ == "__main__":
    main()
