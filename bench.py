"""Benchmark: ViT-B/16 @224 bf16 inference images/sec on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: N forward passes are chained inside ONE jitted fori_loop (input
perturbed per iteration so nothing hoists), because per-dispatch latency
through the remote-TPU tunnel is 5-40 ms and would otherwise dominate.  This
measures steady-state device throughput, which is what a serving pipeline
sees.

FLOP accounting: ViT-B/16 @224 forward ≈ 35.2 GFLOP/img (2 × 17.6 GMAC —
86.6 M params × 197 tokens plus attention).  v5e peak 197 bf16 TFLOP/s →
roofline ≈ 5.6k img/s at 100% MXU.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the bar
is torch.compile ViT-B/16 bf16 inference on an A100.  The denominator is
pinned from named public artifacts — timm's A100 AMP benchmark CSVs for
vit_base_patch16_224 (≈2.5-3k img/s eager) × the PyTorch-2.0 blog's measured
1.38× inductor speedup on A100 ⇒ ≈3.5-4.1k; we pin the TOP of that range
(4,000 img/s = 45% A100 MFU), the value most favorable to the A100.  Full
derivation: docs/A100_BASELINE.md.  Reproducible on any A100 box via
tools/bench_reference_a100.py (this box has no GPU).
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

A100_TORCH_COMPILE_IMGS_PER_SEC = 4000.0  # docs/A100_BASELINE.md
VIT_B16_224_FWD_GFLOPS = 35.2
V5E_PEAK_TFLOPS = 197.0


def measure_train_step(batch=1024, steps=3):
    """ViT-B bs=1024 train-step time (the BASELINE.md training metric).

    Config per docs/PERF_NOTES.md: remat (required — without it the step
    needs 22.4 GB > 15.75 GB HBM), bf16 params, optax adam.
    """
    import optax

    from vit_pytorch_tpu import ViT

    model = ViT(
        image_size=224,
        patch_size=16,
        num_classes=1000,
        dim=768,
        depth=12,
        heads=12,
        mlp_dim=3072,
        remat=True,
    )
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
    labels = jnp.zeros((batch,), jnp.int32)
    params = model.init(rng, img[:1].astype(jnp.float32))["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, img, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, img)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    params, opt_state, loss = step(params, opt_state, img, labels)
    float(loss)  # compile + warm (host fetch syncs through the tunnel)
    best = float("inf")
    for _ in range(steps):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, img, labels)
        float(loss)
        best = min(best, time.perf_counter() - t0)

    # per-dispatch timing pays one ~30 ms tunnel round-trip per step; chain
    # CHAIN steps inside one jit (same methodology as the inference loop) to
    # measure steady-state device time — what a real training loop sees
    CHAIN = 3

    @jax.jit
    def chained(params, opt_state, img, labels):
        def body(i, carry):
            p, s, acc = carry
            im = img * (1.0 + i.astype(img.dtype) * 1e-6)
            p, s, loss = _step_body(p, s, im, labels)
            return p, s, acc + loss

        p, s, acc = jax.lax.fori_loop(
            0, CHAIN, body, (params, opt_state, jnp.float32(0.0))
        )
        return acc

    def _step_body(params, opt_state, img, labels):
        def loss_fn(p):
            logits = model.apply({"params": p}, img)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.astype(jnp.float32), labels
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    float(chained(params, opt_state, img, labels))
    for _ in range(steps):
        t0 = time.perf_counter()
        float(chained(params, opt_state, img, labels))
        best = min(best, (time.perf_counter() - t0) / CHAIN)
    return best * 1e3  # ms


def _tpu_reachable(timeout_s: float = 300.0):
    """Probe TPU availability in a subprocess; returns (ok, reason).

    The axon plugin blocks forever inside first backend init when the TPU
    tunnel is down (C-level hang — not interruptible in-process), so probe
    from a child process: a dead tunnel becomes a clean diagnostic + exit
    instead of an indefinite hang of the whole bench.  Healthy init is
    seconds; 300 s is margin for a degraded-but-alive tunnel.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s,
            capture_output=True,
        )
    except subprocess.TimeoutExpired:
        return False, (
            f"backend init did not complete within {timeout_s:.0f}s "
            "(axon tunnel outage?)"
        )
    if r.returncode != 0:
        tail = (r.stderr or b"").decode(errors="replace")[-500:]
        return False, f"probe exited rc={r.returncode}; stderr tail:\n{tail}"
    return True, ""


def main():
    from vit_pytorch_tpu import ViT

    ok, why = _tpu_reachable()
    if not ok:
        print(f"# TPU unreachable — no measurement taken: {why}", file=sys.stderr)
        sys.exit(3)

    # bs=128 is the measured serving sweet spot on v5e: throughput is flat
    # from 128→512 (2712/2597/2637 img/s) but latency is 4× lower at 128
    batch = 128
    # 30 chained forwards: at 10 the one ~30 ms tunnel dispatch still
    # inflated the per-step time by ~3 ms (measured 32.2 vs 30.2 ms true
    # steady-state)
    inner_iters = 30
    model = ViT(
        image_size=224,
        patch_size=16,
        num_classes=1000,
        dim=768,
        depth=12,
        heads=12,
        mlp_dim=3072,
    )

    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (batch, 3, 224, 224), jnp.bfloat16)
    params = model.init(rng, img[:1].astype(jnp.float32))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    @jax.jit
    def forward_loop(params, img):
        def body(i, acc):
            perturbed = img * (1.0 + i.astype(jnp.bfloat16) * 1e-6)
            out = model.apply(params, perturbed)
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, inner_iters, body, jnp.float32(0.0))

    # NOTE: on the tunneled TPU platform block_until_ready does not actually
    # synchronize — fetching the scalar to host does.
    float(forward_loop(params, img))  # compile + warm

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(forward_loop(params, img))
        best = min(best, time.perf_counter() - t0)

    imgs_per_sec = batch * inner_iters / best
    mxu_util = imgs_per_sec * VIT_B16_224_FWD_GFLOPS / (V5E_PEAK_TFLOPS * 1e3)

    print(
        f"# {imgs_per_sec:.0f} img/s, {best / inner_iters * 1e3:.2f} ms/step "
        f"(bs={batch}), ~{mxu_util * 100:.1f}% of v5e bf16 roofline",
        file=sys.stderr,
    )

    train_ms = None
    try:
        train_ms = measure_train_step()
        print(
            f"# train: ViT-B bs=1024 {train_ms:.0f} ms/step "
            f"({1024 / train_ms * 1e3:.0f} img/s)",
            file=sys.stderr,
        )
    except Exception as e:  # train metric is auxiliary; never fail the bench
        print(f"# train-step measurement failed: {e!r}", file=sys.stderr)

    record = {
        "metric": "vit_b16_224_bf16_inference",
        "value": round(imgs_per_sec, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(imgs_per_sec / A100_TORCH_COMPILE_IMGS_PER_SEC, 3),
    }
    if train_ms is not None:
        record["train_step_ms_vitb_bs1024"] = round(train_ms, 1)
        record["train_imgs_per_sec_vitb_bs1024"] = round(1024 / train_ms * 1e3, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
