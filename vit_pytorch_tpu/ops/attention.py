"""Unified scaled-dot-product attention for TPU.

Two backends behind one functional API:

* ``xla``   — materialized-softmax attention. XLA fuses this well for the short
  sequences typical of ViTs (n = 65..1024) and it is the only path that can
  *return* the attention matrix (needed by Recorder, talking-heads,
  re-attention, adaptive token sampling — see reference recorder.py:10-59,
  cait.py:75-99, deepvit.py:34-63, ats_vit.py:127-175).
* ``flash`` — Pallas TPU kernel (ops/flash_attention.py): online-softmax tiles
  sized to the MXU, fp32 accumulation, optional additive bias and segment-id
  block-diagonal masking (the NaViT packing path, reference na_vit.py:335-337).

The dispatcher picks ``flash`` automatically when it helps (long sequences /
segment ids) and the caller did not request attention probabilities.

Reference behaviours covered (file:line cite into /root/reference):
  - scale override (NaViT uses scale=1. with qk RMSNorm, na_vit.py:161-166)
  - additive bias of shape (h, n, n) or (b, h, n, n) (max_vit.py:150-189)
  - boolean mask, True = attend (vit_detpool.py:174-187, na_vit.py:329-342)
  - key-padding mask folded by callers into ``mask``
  - attention dropout (vit.py:60)
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _large_negative(dtype) -> jnp.ndarray:
    return jnp.asarray(jnp.finfo(dtype).min, dtype)


def on_tpu() -> bool:
    """True when computation actually lands on a TPU.  Respects
    ``jax_default_device`` overrides (tests pin it to host CPU because the
    axon tunnel plugin ignores JAX_PLATFORMS)."""
    dev = jax.config.jax_default_device
    if dev is not None:
        if isinstance(dev, str):  # jax accepts platform strings here too
            return dev.split(":")[0].lower() == "tpu"
        return getattr(dev, "platform", None) == "tpu"
    return jax.default_backend() == "tpu"


def build_segment_mask(
    q_segment_ids, kv_segment_ids, n, m, *, causal=False, mask=None
):
    """Fold NaViT segment ids (token i attends j iff seg[i] == seg[j], both
    nonnegative) and/or a causal triangle into a dense (b, 1, n, m) mask.
    Shared by the XLA dispatch path and the flash bias-fallback backward so
    the two can never drift."""
    if q_segment_ids is not None and kv_segment_ids is not None:
        seg_mask = (
            (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
            & (q_segment_ids[:, :, None] >= 0)
            & (kv_segment_ids[:, None, :] >= 0)
        )[:, None, :, :]
        mask = seg_mask if mask is None else (mask & seg_mask)
    if causal:
        cmask = jnp.tril(jnp.ones((n, m), dtype=bool))
        mask = cmask if mask is None else (mask & cmask)
    return mask


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_attn: bool = False,
):
    """Materialized attention.  q: (b, h, n, d); k, v: (b, h, m, d).

    ``mask`` broadcasts against (b, h, n, m); True = may attend.

    Dtype policy (same rationale as the bf16-adaptive GELU in nn/blocks.py):
    fp32 inputs keep the logit matrix in fp32 — exact torch parity.  bf16/f16
    inputs store the logit matrix in the input dtype; since logits after the
    fp32-accumulated MXU matmul are already rounded to ~8 mantissa bits of
    dynamic range ~O(10), the bf16 store loses <0.5% relative on each logit —
    but it halves the dominant HBM stream of the layer (the (n, m) matrix),
    measured +6% end-to-end ViT-B throughput on v5e.  The softmax itself is
    always *computed* in fp32 (upcast fused into the read by XLA).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    store_dtype = q.dtype if q.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32
    dots = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=store_dtype)
    dots = dots * jnp.asarray(scale, store_dtype)

    if bias is not None:
        dots = dots + bias.astype(dots.dtype)

    if mask is not None:
        dots = jnp.where(mask, dots, _large_negative(dots.dtype))

    attn = jax.nn.softmax(dots.astype(jnp.float32), axis=-1)

    if mask is not None:
        # rows where nothing may be attended (fully padded query) → zeros,
        # matching the reference's behaviour of garbage-then-masked-out rows
        # being dropped downstream; zeroing keeps them finite.
        any_valid = jnp.any(mask, axis=-1, keepdims=True)
        attn = jnp.where(any_valid, attn, 0.0)

    attn = attn.astype(v.dtype)
    attn_out = attn

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    if return_attn:
        return out, attn_out
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    gamma_q: Optional[jnp.ndarray] = None,
    gamma_k: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    return_attn: bool = False,
    use_flash: Optional[bool] = None,
):
    """Dispatching attention entry point used by every block in the framework.

    Segment ids (int32, (b, n)) build the NaViT block-diagonal mask: token i may
    attend token j iff seg[i] == seg[j] and both nonnegative (negative = pad).
    On the flash path they are consumed tile-wise without materializing the
    (b, 1, n, m) boolean mask.

    ``gamma_q``/``gamma_k``: per-head qk-RMSNorm gammas (na_vit.py:93-103;
    callers pass them INSTEAD of pre-normalizing q/k).  On the flash path the
    norm runs inside the kernels; every other path applies it here — the two
    share one ``rms_norm`` definition so they cannot drift.
    """
    n, m = q.shape[-2], k.shape[-2]

    if (gamma_q is None) != (gamma_k is None):
        raise ValueError("qk-norm gammas must be given for both q and k")

    def _norm_eagerly(q, k):
        from .flash_attention import rms_norm

        return rms_norm(q, gamma_q), rms_norm(k, gamma_k)

    # In-kernel qk-norm is OPT-IN (VIT_TPU_FUSE_QKNORM=1, trace-time like the
    # other VIT_TPU_ knobs): the A/B on packed NaViT-B training (16×2048
    # tokens, v5e, 2026-08-19) measured the standalone XLA pass FASTER —
    # 345 ms/step eager vs 372 ms fused — because the kernels renormalize
    # per (q,kv) tile in all three grids (fwd, dq, dkv) while XLA pays for
    # the norm once and fuses it into the qkv projection's epilogue.  Kept
    # as a knob for long-sequence shapes where attention dominates and the
    # one-pass HBM saving could flip the sign.  docs/PERF_NOTES.md round 5.
    if gamma_q is not None and not os.environ.get("VIT_TPU_FUSE_QKNORM"):
        q, k = _norm_eagerly(q, k)
        gamma_q = gamma_k = None

    # per-head additive bias of shape (h, n, m) — a rel-pos table shared by
    # the whole batch (windowed attention).  The short kernel consumes it
    # directly; batch-varying (b, h, n, m) biases stay on the XLA path.
    per_head_bias = bias is not None and bias.ndim == 3 and bias.shape == (
        q.shape[1], n, m
    )

    # train-time dropout runs INSIDE the flash kernels (TPU PRNG, tile-wise
    # masks the backward regenerates) — but only without bias (its backward
    # is an XLA rematerialization that can't replay the masks) and on TPU
    # (no interpreter lowering for the PRNG)
    kernel_dropout_ok = (
        dropout_rate > 0.0
        and dropout_rng is not None
        and bias is None
        and on_tpu()
    )
    # a traced-array scale (LSA's learned temperature,
    # vit_for_small_dataset.py:35-57) can't be baked into a kernel's static
    # config — it stays on the XLA path, where it folds into the same fusion
    # as a constant would
    static_scale = scale is None or isinstance(scale, (int, float))
    kernel_ok = (
        not return_attn
        and (dropout_rate == 0.0 or kernel_dropout_ok)
        and mask is None
        and static_scale
        and q.shape[-1] <= 256
    )

    # global kill switch (read at TRACE time, like the other VIT_TPU_ knobs):
    # forces the XLA composite even where the caller requested flash — used
    # by FLOP-probe lowerings (Pallas custom calls are opaque to XLA cost
    # analysis) and as an escape hatch on kernel regressions
    if os.environ.get("VIT_TPU_DISABLE_FLASH"):
        use_flash = False

    if use_flash is None:
        # XLA's fused attention wins below ~1k tokens (the (n, m) matrix stays
        # inside a fusion); the Pallas kernels win for long / packed sequences
        # where the materialized matrix would be HBM-bound (measured on v5e:
        # n=197 XLA ≈ 1 ms/layer fused vs 2.2 ms pallas; n=2048 segs flash ≫).
        # Per-head-bias WINDOWED shapes (MaxViT/LeViT/CrossFormer/RegionViT
        # rel-pos tables) auto-route to XLA, and that is FINAL by
        # measurement, not default: the round-5 A/B
        # (tools/bench_window_kernel.py, v5e 2026-08-19) ran the short
        # kernel on every windowed model's exact shapes and it lost 2.7-6x
        # at 49-token windows (e.g. MaxViT e2e 1382 -> 667 img/s,
        # CrossFormer 2252 -> 368) and tied only at LeViT's n=196 — tiny
        # window matrices stay inside XLA fusions while a pallas_call pays
        # grid setup per (group, window) step.  Explicit use_flash=True
        # still honors the caller.  docs/PERF_NOTES.md round 5.
        use_flash = (
            kernel_ok
            and on_tpu()
            and (m >= 1024 or q_segment_ids is not None)
        )

    if use_flash and kernel_ok:
        if (
            (bias is None or per_head_bias)
            and q_segment_ids is None
            and not causal
            and dropout_rate == 0.0
            and m <= 1024
        ):
            # short-sequence fast path: whole kv row in VMEM, one-shot softmax
            from .short_attention import short_attention as _short

            if gamma_q is not None:
                q, k = _norm_eagerly(q, k)
            return _short(q, k, v, scale=scale, bias=bias)

        from .flash_attention import flash_attention as _flash

        if per_head_bias:
            # flash expects a 4-D bias; (1, h, n, m) is consumed row-indexed
            # without HBM broadcast (flash_attention.py bias index map), so
            # a per-head table that missed the short-path gate (m > 1024,
            # causal, segments) still routes instead of raising
            bias = bias[None]
        seed = None
        if dropout_rate > 0.0:
            seed = jax.random.randint(
                dropout_rng, (), 0, 2**31 - 1, dtype=jnp.int32
            )
        if gamma_q is not None and bias is not None:
            # the bias backward is an XLA remat fed raw q/k — no fusion
            q, k = _norm_eagerly(q, k)
            gq = gk = None
        else:
            gq, gk = gamma_q, gamma_k
        return _flash(
            q,
            k,
            v,
            scale=scale,
            bias=bias,
            gamma_q=gq,
            gamma_k=gk,
            q_segment_ids=q_segment_ids,
            kv_segment_ids=kv_segment_ids,
            causal=causal,
            dropout_rate=dropout_rate,
            dropout_seed=seed,
        )

    if gamma_q is not None:
        q, k = _norm_eagerly(q, k)

    # fold segments / causal into the dense mask for the XLA path
    if q_segment_ids is not None or kv_segment_ids is not None:
        assert q_segment_ids is not None and kv_segment_ids is not None
    mask = build_segment_mask(
        q_segment_ids, kv_segment_ids, n, m, causal=causal, mask=mask
    )

    return xla_attention(
        q,
        k,
        v,
        scale=scale,
        bias=bias,
        mask=mask,
        dropout_rate=dropout_rate,
        dropout_rng=dropout_rng,
        return_attn=return_attn,
    )
