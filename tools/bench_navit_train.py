"""Packed-NaViT training throughput + MFU on one TPU chip (VERDICT r3 #10).

The round-3 number (229 var-res img/s, 524 ms/step) had no roofline
denominator.  This bench reports, for NaViT-B with qk-RMSNorm + token
dropout (BASELINE.json config 3; reference na_vit.py:255-402):

  - ms/step, images/s, tokens/s
  - hardware FLOP utilization: executed HLO flops (XLA cost analysis — remat
    recompute charged, padding not) / wall / 197 TF/s
  - model MFU: analytic 6·N·D transformer flops (fwd 2ND + bwd 4ND; the
    standard denominator that does NOT credit recompute) / wall / 197 TF/s

Usage: python tools/bench_navit_train.py [n_images] [max_seq]
Env:   VIT_TPU_FLASH_BLOCK_Q/K — flash tile sweep (default 512).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vit_pytorch_tpu.models.na_vit import NaViT
from vit_pytorch_tpu.ops.packing import pack_images
from vit_pytorch_tpu.utils.helpers import jit_init

PEAK = 197e12  # v5e bf16 — same constant as bench.py
RESOLUTIONS = [(256, 256), (224, 224), (160, 256), (256, 160), (128, 128), (96, 192)]


def model_flops_train(n_tokens_per_pack, dim, depth, mlp_dim, seg_lengths):
    """Analytic transformer train flops (6·N·D convention: bwd = 2× fwd,
    recompute NOT credited).  Attention dots use the true per-segment
    lengths (block-diagonal — the packed layout does quadratic work only
    within each image)."""
    n = int(np.sum(n_tokens_per_pack))
    proj = 2 * n * dim * dim * 4          # qkv + out
    ff = 2 * n * dim * mlp_dim * 2
    dots = sum(2 * int(l) * int(l) * dim * 2 for l in seg_lengths)
    return 3 * depth * (proj + ff + dots)  # fwd + 2× for bwd


def main(n_images=120, max_seq=2048, iters=5):
    patch, dim, depth, heads, mlp = 16, 768, 12, 12, 3072
    model = NaViT(image_size=256, patch_size=patch, num_classes=1000,
                  dim=dim, depth=depth, heads=heads, mlp_dim=mlp,
                  token_dropout_prob=0.25)
    rng = np.random.default_rng(0)
    images, labels = [], []
    for _ in range(n_images):
        h, w = RESOLUTIONS[rng.integers(len(RESOLUTIONS))]
        images.append(rng.normal(size=(3, h, w)).astype(np.float32))
        labels.append(int(rng.integers(1000)))

    packed = pack_images(images, patch_size=patch, max_seq_len=max_seq,
                         token_dropout_prob=0.25, train=True, rng=rng,
                         pad_groups_to=16, max_images=16)
    packed = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
        packed,
    )
    b = packed.patches.shape[0]
    lab = np.full((b, packed.max_images), -1, np.int32)
    idx = 0
    num_images = np.asarray(packed.num_images)
    for g in range(b):
        for s in range(packed.max_images):
            if num_images[g] > s and idx < len(labels):
                lab[g, s] = labels[idx]
                idx += 1
    lab = jnp.asarray(lab)

    packed1 = jax.tree.map(
        lambda x: x[:1] if hasattr(x, "ndim") and getattr(x, "ndim", 0) else x,
        packed,
    )
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16),
        jit_init(model, {"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, packed1, train=False),
    )
    tx = optax.adamw(3e-4)
    opt_state = tx.init(params)

    @jax.jit
    def steps(params, opt_state, packed, lab, rng):
        def body(i, carry):
            params, opt_state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                logits = model.apply(p, packed, train=True, rngs={"dropout": sub})
                valid = lab >= 0
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.maximum(lab, 0)
                )
                return jnp.sum(ls * valid) / jnp.maximum(jnp.sum(valid), 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, rng

        params, opt_state, rng = jax.lax.fori_loop(
            0, iters, body, (params, opt_state, rng)
        )
        return jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float32))),
            params, jnp.float32(0.0),
        )

    args = (params, opt_state, packed, lab, jax.random.PRNGKey(2))
    float(steps(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(steps(*args))
        best = min(best, time.perf_counter() - t0)
    s = best / iters

    # real token counts from the packing metadata (image_ids >= 0)
    ids = np.asarray(packed.image_ids)
    tok_per_pack = (ids >= 0).sum(axis=1)
    seg_lengths = [
        (ids[g] == i).sum()
        for g in range(b)
        for i in range(packed.max_images)
        if (ids[g] == i).any()
    ]
    n_tok = int(tok_per_pack.sum())
    mflops = model_flops_train(tok_per_pack, dim, depth, mlp, seg_lengths)

    hw = ""
    try:
        flops = jax.jit(steps).lower(*args).compile().cost_analysis()["flops"]
        hw = f", hw {flops / iters / s / PEAK * 100:.1f}%"
    except Exception:
        pass
    bq = os.environ.get("VIT_TPU_FLASH_BLOCK_Q", "adaptive")
    bk = os.environ.get("VIT_TPU_FLASH_BLOCK_K", "adaptive")
    print(
        f"navit_train  {n_images} imgs / {b} packs×{max_seq} (block {bq}x{bk}): "
        f"{n_images / s:.0f} img/s, {n_tok / s / 1e3:.1f}k tok/s, "
        f"{s * 1e3:.1f} ms/step, model-MFU {mflops / s / PEAK * 100:.1f}%{hw}"
    )


if __name__ == "__main__":
    a = [int(x) for x in sys.argv[1:3]]
    main(*a)
