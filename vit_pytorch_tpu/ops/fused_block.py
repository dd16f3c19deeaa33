"""Fused pre-norm attention block: ONE Pallas TPU kernel for
LN → qkv GEMM → per-head softmax attention → out GEMM (+bias) → residual.

Motivation (measured on v5e, tools/bench_attn_variants.py): for ViT-sized
sequences the XLA attention block is NOT one fusion — LayerNorm (0.47 ms),
softmax (0.61 ms), the attention einsums (0.49 ms) and the qkv/out GEMMs
(0.54 ms) each round-trip HBM, summing to ~2.4 ms/layer at b=128/n=197/
d=768.  Keeping every intermediate (LN output, qkv, logits, probs, merged
heads) in VMEM cuts the block to ~1.25 ms/layer — the logits matrix never
touches HBM at all.

Grid is over the batch; the qkv/out weights stay resident in VMEM across
grid steps.  Softmax and LayerNorm statistics are computed in fp32; GEMMs
accumulate fp32 on the MXU (bf16 operands).

Backward: ``jax.custom_vjp`` with a second Pallas kernel (``_bwd_kernel``)
that recomputes the forward in VMEM (flash-style — the logits matrix never
touches HBM in either direction) and emits dx plus the per-step tensors the
wrapper contracts into dW_qkv/dW_out with two large XLA GEMMs over the
whole batch.  Only the layer input ``x`` is saved between passes, so the
attention block needs no rematerialization at big batch sizes.

No reference counterpart: the reference reaches flash attention only through
``F.scaled_dot_product_attention`` (simple_flash_attn_vit.py:56-64) and
never fuses across the projection GEMMs.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Attention-block kernel admission ceiling, estimated in _vmem_bytes below.
# The historical "16 MB VMEM wall" was XLA's scoped-vmem BUDGET, not the
# 128 MB physical VMEM (PERF_NOTES round 4); the kernel sets a 64 MB budget,
# so this limit is a measured-perf gate, not a hardware one.  Every raise is
# backed by an end-to-end model-level measurement on v5e (PERF_NOTES round 5):
#   dim=1024 / ViT-L  (estimate 12.5 MB): +22.8% over pure XLA (1,295 vs
#     1,060 img/s @224 bs=64) — raised 12 -> 16 MB
#   dim=1280 / ViT-H  (estimate 19.9 MB): +39.7% over pure XLA (461 vs
#     330 img/s, 78.3% vs 56.1% roofline, tools/bench_vith.py) — raised
#     16 -> 21 MB
#   dim=1408 / ViT-g  (estimate 24.4 MB at dim_head=88): +42.9% over pure
#     XLA (290 vs 203 img/s @224 bs=64, 78.6% vs 54.9% roofline,
#     tools/bench_vitg.py) — raised 21 -> 25 MB
# ViT-G (dim=1664, estimate 32.1 MB) stays on XLA until measured.
_VMEM_LIMIT = 25 * 1024 * 1024

_LOG2E = 1.4426950408889634  # log2(e)


def _fwd_compiler_params(vmem_limit_bytes: int = None):
    """CompilerParams for the CARRY-FREE forward kernels (each grid step
    writes a distinct output block, no cross-step state).  Opt-in A/B knob:
    ``VIT_TPU_DIM_SEMANTICS=parallel`` marks the 1-D batch grid parallel so
    Mosaic may schedule/pipeline steps more aggressively.  Never applied to
    the whole-layer backward, whose dW accumulators carry across grid steps
    and require sequential ("arbitrary") semantics.  Returns None when
    there is nothing to set (keeps the default-params fast path)."""
    import os

    kw = {}
    if vmem_limit_bytes is not None:
        kw["vmem_limit_bytes"] = vmem_limit_bytes
    ds = os.environ.get("VIT_TPU_DIM_SEMANTICS")
    if ds:
        if ds not in ("parallel", "arbitrary"):
            raise ValueError(
                "VIT_TPU_DIM_SEMANTICS must be 'parallel' or 'arbitrary', "
                f"got {ds!r}"
            )
        kw["dimension_semantics"] = (ds,)
    return pltpu.CompilerParams(**kw) if kw else None


def _softmax_from_dots(dots_f32, scale):
    """softmax(dots * scale) along the last axis, written for the VPU:
    scale and log2(e) fold into ONE f32 multiply and the exponent runs as
    exp2 (the hardware primitive exp() lowers to anyway, minus the extra
    per-element multiply), and the (n, n) broadcast divide becomes an
    (n, 1) reciprocal + multiply.  Mathematically identical to
    exp(l - max) / sum — exp2(x·log2e) == exp(x) and the max-subtract is
    equivalent in the base-2 domain."""
    logits = dots_f32 * (scale * _LOG2E)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits)
    return p * (1.0 / jnp.sum(p, axis=-1, keepdims=True))


def _vmem_bytes(
    n: int, dim: int, inner: int, itemsize: int, imgs_per_step: int = 1
) -> int:
    # (+ 2*inner for optional qk-norm gammas — noise next to the GEMM weights)
    weights = dim * 3 * inner * itemsize + inner * dim * itemsize + 2 * inner * itemsize
    rows = imgs_per_step * n
    acts = (
        2 * rows * dim * itemsize  # x + out
        + rows * 3 * inner * itemsize  # qkv
        + rows * dim * 4  # fp32 LN temp
        + 2 * n * n * 4  # live fp32 logits — per-image, does NOT scale with ips
        + rows * inner * itemsize  # merged heads
    )
    # weights resident once (their BlockSpec index is constant so pallas does
    # not double-buffer them) + the per-step IO blocks (x, res, out) double-
    # buffered across grid steps
    io_dbuf = 3 * rows * dim * itemsize
    return weights + acts + io_dbuf


def _vmem_bytes_bwd(n: int, dim: int, inner: int, itemsize: int) -> int:
    """Backward-kernel working set (always ips=1).  Deliberately generous —
    Mosaic reuses buffers, so this over-counts; the limit below is
    calibrated so that the hardware-proven ViT-B config (n=197, estimate
    15.6 MB) passes.  At ViT-B width the estimate crosses 16 MB around
    n≈217, so larger sequences take the XLA-composite backward fallback
    in _fused_bwd (the fused FORWARD keeps dispatching for serving)."""
    weights = dim * 3 * inner * itemsize + inner * dim * itemsize
    f32_tmps = (
        4 * n * dim * 4  # xf/xhat/h/dh-class temporaries
        + 2 * n * 3 * inner * 4  # qkv_f32 + dqkv (f32 before cast)
        + n * inner * 4  # dm
        + 4 * n * n * 4  # live logits/p/dp/ds for the head in flight
    )
    out_dbuf = 2 * (n * dim * itemsize * 2 + n * 3 * inner * itemsize + n * inner * itemsize)
    return weights + f32_tmps + out_dbuf


# physical core VMEM; paired with the deliberately-generous bwd estimator
_VMEM_LIMIT_BWD = 16 * 1024 * 1024


def _kernel_dot_precision(dtype):
    """Precision for MXU dots INSIDE the Pallas kernels.

    bf16 operands must contract at DEFAULT precision: the global
    ``jax_default_matmul_precision="highest"`` (set by the CPU parity test
    harness, tests/conftest.py) otherwise reaches into the kernel and asks
    Mosaic for an fp32-contraction of bf16 vectors — rejected with
    "Bad lhs type".  fp32 operands (CPU interpreter-mode equivalence tests)
    keep the ambient setting so those tests stay exact."""
    return None if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def _dropout_threshold(rate: float) -> np.uint32:
    """uint32 threshold t with P(bits < t) == rate for uniform bits."""
    return np.uint32(min(int(rate * 2**32), 2**32 - 1))


def _pad_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _keep_bits(n: int, m: int, rate: float):
    """Tile-aligned random keep mask, sliced to (n, m).  Mosaic rejects
    PRNG bit tensors at unaligned shapes feeding the MXU ("Invalid vector
    register cast" at n=197) — generating at the (8, 128) tile grain and
    slicing keeps the layout canonical AND makes the bit stream a function
    of the padded shape only (identical between forward, backward, and the
    replay kernel)."""
    np_, mp_ = _pad_up(n, 8), _pad_up(m, 128)
    bits = pltpu.bitcast(pltpu.prng_random_bits((np_, mp_)), jnp.uint32)
    return (bits >= _dropout_threshold(rate))[:n, :m]


def _attn_keep(seed, img, head, n: int, m: int, rate: float):
    """Per-(image, head) attention-matrix keep mask.  Seeding is
    (seed, img·1024 + head) — the TPU PRNG accepts at most two seed
    values — so the backward kernel, which always runs one image per grid
    step, regenerates the identical mask regardless of the forward's
    images-per-step packing.  Shared by the mask-replay kernel used in the
    TPU equivalence test."""
    pltpu.prng_seed(seed, img * 1024 + head)
    return _keep_bits(n, m, rate)


def _out_keep(seed, img, n: int, dim: int, rate: float, heads: int):
    """Per-image keep mask for the post-projection dropout (reference
    vit.py:47-49 Dropout after to_out).  Head index ``heads`` (one past the
    last attention head) keeps the stream disjoint from attention masks."""
    pltpu.prng_seed(seed, img * 1024 + heads)
    return _keep_bits(n, dim, rate)


def dropout_masks(seed, b: int, n: int, dim: int, heads: int, rate: float):
    """Replay the fused kernel's dropout keep-masks on the TPU PRNG
    (equivalence testing: compose these with the XLA reference and compare
    against the kernel with the same seed).  Returns
    ``(attn_keep (b, heads, n, n), out_keep (b, n, dim))`` as int32 0/1.

    Each mask re-seeds the PRNG with its own (seed, img, head) tuple —
    exactly like ``_attn_keep`` / ``_out_keep`` inside the kernels — so
    generation order is irrelevant."""

    def kernel(seed_ref, akeep_ref, okeep_ref):
        i = pl.program_id(0)
        for h in range(heads):
            akeep_ref[0, h] = _attn_keep(seed_ref[0, 0], i, h, n, n, rate).astype(
                jnp.int32
            )
        okeep_ref[0] = _out_keep(seed_ref[0, 0], i, n, dim, rate, heads).astype(
            jnp.int32
        )

    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, heads, n, n), jnp.int32),
            jax.ShapeDtypeStruct((b, n, dim), jnp.int32),
        ),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec((1, heads, n, n), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        ),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))


def fused_dropout_supported(x_shape, heads: int, dim_head: int) -> bool:
    """Kernel-tier dropout needs the Pallas backward (the XLA-composite
    fallback cannot replay the in-kernel PRNG masks), so train-time
    dropout>0 is fused only when the backward's working set fits VMEM."""
    return _bwd_fits_vmem(x_shape, heads, dim_head)


def fused_block_supported(
    x_shape, dtype, heads: int, dim_head: int, dim: int
) -> bool:
    """Static eligibility: 3-D input, bf16 (the serving dtype — fp32 stays on
    the parity-exact XLA path), and the working set fits VMEM.

    Set ``VIT_TPU_DISABLE_FUSED=1`` to force the XLA composite everywhere
    (debugging / A-B numerics checks)."""
    import os

    if os.environ.get("VIT_TPU_DISABLE_FUSED"):
        return False
    if len(x_shape) != 3:
        return False
    if dtype != jnp.bfloat16:
        return False
    b, n, d = x_shape
    if d != dim:
        return False
    inner = heads * dim_head
    if _vmem_bytes(n, dim, inner, 2) > _VMEM_LIMIT:
        return False
    # NOTE: the backward kernel's working set is ~2x the forward's; when it
    # would not fit VMEM, _fused_bwd falls back to the XLA composite's vjp
    # (see _bwd_fits_vmem) — the fused forward stays available for serving.
    return True


def _kernel(
    *refs,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    with_bout: bool,
    with_res: bool,
    with_qknorm: bool = False,
    imgs_per_step: int = 1,
    dropout_rate: float = 0.0,
):
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    if with_qknorm:
        # per-head RMSNorm gammas ride as (1, inner) rows (last inputs,
        # before the output ref); sliced per head like the qkv columns below
        *refs, gq_ref, gk_ref, _o = refs
        refs = (*refs, _o)
    else:
        gq_ref = gk_ref = None
    if with_res:
        (x_ref, res_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref,
         lnb_ref, o_ref) = refs
    else:
        # no residual operand: callers that add their own residual outside
        # (Attention used directly, not via Transformer) don't pay an HBM
        # stream of zeros
        (x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, lns_ref, lnb_ref,
         o_ref) = refs
        res_ref = None
    # ``imgs_per_step`` images share one grid step: the LN/qkv/out GEMMs run
    # over the stacked rows (amortizing the 197→sublane padding and weight
    # reuse), only the per-head softmax attention stays per-image.  Measured
    # (tools/bench_fused_tuning.py): 2/step 1.228 ms/layer vs 1/step 1.262.
    n = x_ref.shape[1]
    x = x_ref[...].reshape(imgs_per_step * n, x_ref.shape[2])
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * lns_ref[0].astype(jnp.float32) + lnb_ref[0].astype(jnp.float32)
    ln = ln.astype(x.dtype)

    qkv = jnp.dot(ln, wqkv_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype))
    if with_bqkv:
        qkv = qkv + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv.astype(x.dtype)  # (imgs*n, 3*inner)

    inner = heads * dim_head
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    img_outs = []
    for j in range(imgs_per_step):
        img = pl.program_id(0) * imgs_per_step + j
        rows = slice(j * n, (j + 1) * n)
        outs = []
        for h in range(heads):
            q = qkv[rows, h * dim_head : (h + 1) * dim_head]
            k = qkv[rows, inner + h * dim_head : inner + (h + 1) * dim_head]
            v = qkv[rows, 2 * inner + h * dim_head : 2 * inner + (h + 1) * dim_head]
            if with_qknorm:
                # per-head RMSNorm with learned gamma × sqrt(dh)
                # (reference na_vit.py:93-103); f32 statistics like the LN
                root = float(dim_head) ** 0.5
                gq = gq_ref[0, h * dim_head : (h + 1) * dim_head]
                gk = gk_ref[0, h * dim_head : (h + 1) * dim_head]
                qf = q.astype(jnp.float32)
                kf = k.astype(jnp.float32)
                qf = qf * jax.lax.rsqrt(
                    jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12
                )
                kf = kf * jax.lax.rsqrt(
                    jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12
                )
                q = (qf * (gq.astype(jnp.float32) * root)[None, :]).astype(x.dtype)
                k = (kf * (gk.astype(jnp.float32) * root)[None, :]).astype(x.dtype)
            p = _softmax_from_dots(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
                ),
                scale,
            )
            if dropout_rate > 0.0:
                keep = _attn_keep(seed_ref[0, 0], img, h, n, n, dropout_rate)
                p = jnp.where(keep, p, 0.0) * inv_keep
            o = jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype))
            outs.append(o.astype(x.dtype))
        img_outs.append(jnp.concatenate(outs, axis=-1))  # (n, inner)
    merged = (
        img_outs[0]
        if imgs_per_step == 1
        else jnp.concatenate(img_outs, axis=0)
    )  # (imgs*n, inner)

    out = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype))
    if with_bout:
        out = out + bout_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0:
        # reference vit.py:47-49 — a second Dropout after the out projection.
        # Float multipliers, NOT booleans: Mosaic rejects a concatenate of
        # sliced i1 masks feeding the vector unit ("Invalid vector register
        # cast"); float masks concatenate fine.
        ks = []
        for j in range(imgs_per_step):
            img = pl.program_id(0) * imgs_per_step + j
            keep = _out_keep(seed_ref[0, 0], img, n, out.shape[-1], dropout_rate, heads)
            ks.append(keep.astype(jnp.float32) * inv_keep)
        omask = ks[0] if imgs_per_step == 1 else jnp.concatenate(ks, axis=0)
        out = out * omask
    if with_res:
        out = out + res_ref[...].reshape(imgs_per_step * n, -1).astype(jnp.float32)
    o_ref[...] = out.astype(x.dtype).reshape(o_ref.shape)


def _xla_reference(
    x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
    gamma_q=None, gamma_k=None, *, heads, dim_head, scale, eps
):
    """Composite the kernel replaces — used for the backward pass, the
    non-TPU (interpret-free) path, and kernel equivalence tests.

    ``gamma_q``/``gamma_k``: optional (heads, dim_head) per-head RMSNorm
    gammas (qk-norm, reference na_vit.py:93-103); when given, ``scale``
    should be 1.0 (the sqrt(dh) factor lives in the norm)."""
    b, n, dim = x.shape
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32)
    ln = ln.astype(x.dtype)
    qkv = ln @ w_qkv
    if b_qkv is not None:
        qkv = qkv + b_qkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)
    q, k, v = rs(q), rs(k), rs(v)
    if gamma_q is not None:
        root = float(dim_head) ** 0.5

        def rms(t, gamma):
            tf = t.astype(jnp.float32)
            tf = tf * jax.lax.rsqrt(
                jnp.sum(tf * tf, axis=-1, keepdims=True) + 1e-12
            )
            g = gamma.reshape(1, heads, 1, dim_head).astype(jnp.float32)
            return (tf * (g * root)).astype(t.dtype)

        q, k = rms(q, gamma_q), rms(k, gamma_k)
    dots = (
        jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    attn = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32)
    o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, heads * dim_head)
    out = o @ w_out
    if b_out is not None:
        out = out + b_out
    return out if residual is None else residual + out


def _pallas_forward(
    x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
    gamma_q=None, gamma_k=None, seed=None,
    *, heads, dim_head, scale, eps, dropout_rate=0.0, interpret=False
):
    b, n, dim = x.shape
    inner = heads * dim_head
    with_bqkv = b_qkv is not None
    with_bout = b_out is not None
    with_qknorm = gamma_q is not None
    # pallas needs concrete operands; feed zeros where bias is absent (the
    # kernel skips the add so the zeros are never read)
    bqkv_arr = (b_qkv if with_bqkv else jnp.zeros((3 * inner,), x.dtype)).reshape(1, -1)
    bout_arr = (b_out if with_bout else jnp.zeros((dim,), x.dtype)).reshape(1, -1)

    # two images per grid step when the batch divides (measured 2.7% faster;
    # VMEM headroom re-checked with the doubled activation set).  The in-
    # kernel (2, n, dim) -> (2n, dim) collapse is only a layout no-op when
    # the sublane padding composes: ceil(2n/8) == 2*ceil(n/8), i.e.
    # n % 8 in {0, 5, 6, 7} (otherwise Mosaic rejects the shape cast).
    # Lanes must tile too: dim % 128 == 0.
    ips = (
        2
        if (
            b % 2 == 0
            and (n % 8 == 0 or n % 8 >= 5)
            and dim % 128 == 0
            and _vmem_bytes(n, dim, inner, 2, imgs_per_step=2) <= _VMEM_LIMIT
        )
        else 1
    )
    with_res = residual is not None
    kern = functools.partial(
        _kernel,
        heads=heads,
        dim_head=dim_head,
        scale=scale,
        eps=eps,
        with_bqkv=with_bqkv,
        with_bout=with_bout,
        with_res=with_res,
        with_qknorm=with_qknorm,
        imgs_per_step=ips,
        dropout_rate=dropout_rate,
    )
    in_specs = []
    operands = []
    if dropout_rate > 0.0:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
        )
        operands.append(jnp.asarray(seed, jnp.int32).reshape(1, 1))
    batch_spec = pl.BlockSpec((ips, n, dim), lambda i: (i, 0, 0))
    in_specs.append(batch_spec)
    operands.append(x)
    if with_res:
        in_specs.append(batch_spec)
        operands.append(residual)
    in_specs += [
        pl.BlockSpec((dim, 3 * inner), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * inner), lambda i: (0, 0)),
        pl.BlockSpec((inner, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
    ]
    operands += [
        w_qkv,
        bqkv_arr,
        w_out,
        bout_arr,
        ln_scale.reshape(1, -1),
        ln_bias.reshape(1, -1),
    ]
    if with_qknorm:
        in_specs += [
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
            pl.BlockSpec((1, inner), lambda i: (0, 0)),
        ]
        operands += [gamma_q.reshape(1, inner), gamma_k.reshape(1, inner)]
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        grid=(b // ips,),
        in_specs=in_specs,
        out_specs=batch_spec,
        # raise the scoped-VMEM budget past XLA's 16 MB default
        # (xla_tpu_scoped_vmem_limit_kib): dim>=1408 (ViT-g) measures
        # 17.97 MB actual scoped usage and OOMs under the default, while
        # the gate itself is _VMEM_LIMIT — the budget is an upper bound,
        # not an allocation, so admitted smaller shapes are unaffected
        # (same approach as the whole-layer kernel's 64 MB budget below).
        compiler_params=None
        if interpret
        else _fwd_compiler_params(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*operands)


def _bwd_kernel(
    *refs,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    dropout_rate: float = 0.0,
    with_qknorm: bool = False,
):
    """Backward of the fused block, per batch element.

    Recomputes the forward in VMEM (LN, qkv, per-head softmax — the logits
    never touch HBM in either direction), emits dx plus the per-step
    tensors (h, dqkv, m) that the wrapper contracts into dW_qkv / dW_out
    with two large XLA GEMMs over the whole batch (M=dim, K=b·n — far more
    MXU-efficient than accumulating rank-n updates per step, and the f32
    dW accumulators would not fit VMEM next to the weights).

    With dropout, the identical masks are regenerated from (seed, img, head)
    seeding — one image per grid step, so img == program_id(0) — and an
    extra output ``gm`` (the out-projection gradient AFTER the output
    dropout mask) is emitted for the dW_out/db_out contractions.

    With qk-norm, the per-head RMSNorms are recomputed exactly like the
    forward kernel's (l2-normalize + gamma·sqrt(dh)) and dgamma_q/dgamma_k
    accumulate in f32 VMEM like the LN grads — so qk-norm composes with
    in-kernel dropout (the masks replay regardless), closing the
    qk_norm+dropout+train fallback (VERDICT r3 #5)."""
    if dropout_rate > 0.0:
        seed_ref, *refs = refs
    else:
        seed_ref = None
    if with_qknorm:
        (x_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, lns_ref, lnb_ref,
         gq_ref, gk_ref, *refs) = refs
    else:
        (x_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, lns_ref, lnb_ref,
         *refs) = refs
        gq_ref = gk_ref = None
    (dx_ref, h_ref, dqkv_ref, m_ref, dgamma_ref, dbeta_ref, *refs) = refs
    if with_qknorm:
        dgq_ref, dgk_ref, *refs = refs
    else:
        dgq_ref = dgk_ref = None
    gm_ref = refs[0] if dropout_rate > 0.0 else None
    i = pl.program_id(0)
    inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
    x = x_ref[0]
    g = g_ref[0].astype(jnp.float32)
    if dropout_rate > 0.0:
        # d(out)/d(proj) rides through the output-dropout mask first
        okeep = _out_keep(
            seed_ref[0, 0], i, x.shape[0], g.shape[-1], dropout_rate, heads
        )
        g = jnp.where(okeep, g, 0.0) * inv_keep
        gm_ref[0] = g.astype(x.dtype)

    # --- recompute forward (same dtype path as _kernel) ---
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(jnp.square(xc), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = xc * r
    gamma = lns_ref[0].astype(jnp.float32)
    h = xhat * gamma + lnb_ref[0].astype(jnp.float32)
    h = h.astype(x.dtype)
    h_ref[0] = h

    qkv_f32 = jnp.dot(h, wqkv_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype))
    if with_bqkv:
        qkv_f32 = qkv_f32 + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv_f32.astype(x.dtype)

    inner = heads * dim_head
    # dm = g @ Wout^T
    dm = jax.lax.dot_general(
        g.astype(x.dtype),
        wout_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype),
    )

    dqs, dks, dvs, outs = [], [], [], []
    dgqs, dgks = [], []
    for hh in range(heads):
        q = qkv[:, hh * dim_head : (hh + 1) * dim_head]
        k = qkv[:, inner + hh * dim_head : inner + (hh + 1) * dim_head]
        v = qkv[:, 2 * inner + hh * dim_head : 2 * inner + (hh + 1) * dim_head]
        if with_qknorm:
            # recompute the forward kernel's per-head RMSNorm exactly
            # (_kernel with_qknorm branch): l2-normalize, gamma·sqrt(dh)
            root = float(dim_head) ** 0.5
            gq = gq_ref[0, hh * dim_head : (hh + 1) * dim_head].astype(jnp.float32) * root
            gk = gk_ref[0, hh * dim_head : (hh + 1) * dim_head].astype(jnp.float32) * root
            qf = q.astype(jnp.float32)
            kf = k.astype(jnp.float32)
            rq = jax.lax.rsqrt(jnp.sum(qf * qf, axis=-1, keepdims=True) + 1e-12)
            rk = jax.lax.rsqrt(jnp.sum(kf * kf, axis=-1, keepdims=True) + 1e-12)
            qhat = qf * rq
            khat = kf * rk
            q = (qhat * gq[None, :]).astype(x.dtype)
            k = (khat * gk[None, :]).astype(x.dtype)
        p = _softmax_from_dots(
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
            ),
            scale,
        )
        if dropout_rate > 0.0:
            keep = _attn_keep(seed_ref[0, 0], i, hh, p.shape[0], p.shape[1], dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv_keep
        else:
            keep = None
            pd = p
        pb = pd.astype(x.dtype)

        outs.append(jnp.dot(pb, v, preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)).astype(x.dtype))

        dm_h = dm[:, hh * dim_head : (hh + 1) * dim_head].astype(x.dtype)
        # dv = pd^T @ dm_h
        dv = jax.lax.dot_general(
            pb, dm_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
        )
        # dpd = dm_h @ v^T; gradient wrt the PRE-dropout p rides the mask
        dp = jax.lax.dot_general(
            dm_h, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
        )
        if dropout_rate > 0.0:
            dp = jnp.where(keep, dp, 0.0) * inv_keep
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(x.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)) * scale
        # dk = ds^T @ q
        dk = (
            jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
            )
            * scale
        )
        if with_qknorm:
            # dq/dk above are cotangents of the NORMED q/k; backprop the
            # gamma scale and the l2-normalize (d[v/|v|] = r·(dv̂ − v̂⟨dv̂,v̂⟩))
            dgqs.append(jnp.sum(dq * qhat, axis=0, keepdims=True))
            dgks.append(jnp.sum(dk * khat, axis=0, keepdims=True))
            dqh = dq * gq[None, :]
            dkh = dk * gk[None, :]
            dq = rq * (dqh - qhat * jnp.sum(dqh * qhat, axis=-1, keepdims=True))
            dk = rk * (dkh - khat * jnp.sum(dkh * khat, axis=-1, keepdims=True))
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    if with_qknorm:
        root = float(dim_head) ** 0.5

        @pl.when(i == 0)
        def _init_qk():
            dgq_ref[...] = jnp.zeros_like(dgq_ref)
            dgk_ref[...] = jnp.zeros_like(dgk_ref)

        # dgamma includes the sqrt(dh) factor (gamma entered as gamma·root)
        dgq_ref[...] += jnp.concatenate(dgqs, axis=-1) * root
        dgk_ref[...] += jnp.concatenate(dgks, axis=-1) * root

    m_ref[0] = jnp.concatenate(outs, axis=-1)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (n, 3*inner) f32
    dqkv_ref[0] = dqkv.astype(x.dtype)

    # dh = dqkv @ Wqkv^T
    dh = jax.lax.dot_general(
        dqkv.astype(x.dtype),
        wqkv_ref[...],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype),
    )

    # LN grads (accumulated across the sequential grid)
    @pl.when(i == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    dgamma_ref[...] += jnp.sum(dh * xhat, axis=0, keepdims=True)
    dbeta_ref[...] += jnp.sum(dh, axis=0, keepdims=True)

    dxhat = dh * gamma
    dx = r * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = dx.astype(x.dtype)


def _pallas_backward(
    x, g, w_qkv, b_qkv, w_out, ln_scale, ln_bias, seed=None,
    gamma_q=None, gamma_k=None,
    *, heads, dim_head, scale, eps, dropout_rate=0.0, interpret=False
):
    b, n, dim = x.shape
    inner = heads * dim_head
    with_bqkv = b_qkv is not None
    with_dropout = dropout_rate > 0.0
    with_qknorm = gamma_q is not None
    bqkv_arr = (b_qkv if with_bqkv else jnp.zeros((3 * inner,), x.dtype)).reshape(1, -1)

    kern = functools.partial(
        _bwd_kernel,
        heads=heads,
        dim_head=dim_head,
        scale=scale,
        eps=eps,
        with_bqkv=with_bqkv,
        dropout_rate=dropout_rate,
        with_qknorm=with_qknorm,
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, n, dim), x.dtype),       # dx (LN path)
        jax.ShapeDtypeStruct((b, n, dim), x.dtype),       # h
        jax.ShapeDtypeStruct((b, n, 3 * inner), x.dtype), # dqkv
        jax.ShapeDtypeStruct((b, n, inner), x.dtype),     # m
        jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dgamma
        jax.ShapeDtypeStruct((1, dim), jnp.float32),      # dbeta
    ]
    out_specs = [
        pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, 3 * inner), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, inner), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
    ]
    in_specs = [
        pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)),
        pl.BlockSpec((dim, 3 * inner), lambda i: (0, 0)),
        pl.BlockSpec((1, 3 * inner), lambda i: (0, 0)),
        pl.BlockSpec((inner, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
        pl.BlockSpec((1, dim), lambda i: (0, 0)),
    ]
    operands = [x, g, w_qkv, bqkv_arr, w_out, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1)]
    if with_qknorm:
        # gammas ride as (1, inner) rows (same layout as the forward kernel)
        in_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0)))
        in_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0)))
        operands.append(gamma_q.reshape(1, inner))
        operands.append(gamma_k.reshape(1, inner))
        # dgamma_q / dgamma_k accumulators
        out_shape.append(jax.ShapeDtypeStruct((1, inner), jnp.float32))
        out_shape.append(jax.ShapeDtypeStruct((1, inner), jnp.float32))
        out_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0)))
        out_specs.append(pl.BlockSpec((1, inner), lambda i: (0, 0)))
    if with_dropout:
        in_specs.insert(0, pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM))
        operands.insert(0, jnp.asarray(seed, jnp.int32).reshape(1, 1))
        # gm: out-projection gradient after the output-dropout mask
        out_shape.append(jax.ShapeDtypeStruct((b, n, dim), x.dtype))
        out_specs.append(pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0)))

    results = list(pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        grid=(b,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=interpret,
    )(*operands))
    gm = results.pop() if with_dropout else None
    if with_qknorm:
        dgk = results.pop()
        dgq = results.pop()
    else:
        dgq = dgk = None
    dx, h, dqkv, m, dgamma, dbeta = results

    # weight grads as two large XLA GEMMs over the flattened batch
    hf = h.reshape(b * n, dim)
    dqkvf = dqkv.reshape(b * n, 3 * inner)
    dW_qkv = jax.lax.dot_general(
        hf, dqkvf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # out = m @ W_out  =>  dW_out = m^T @ g  (g AFTER the output-dropout
    # mask when dropout is on)
    mf = m.reshape(b * n, inner)
    g_for_w = gm if with_dropout else g
    gf = g_for_w.reshape(b * n, dim).astype(mf.dtype)
    dW_out = jax.lax.dot_general(
        mf, gf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db_qkv = jnp.sum(dqkvf.astype(jnp.float32), axis=0) if with_bqkv else None
    return dx, dW_qkv, db_qkv, dW_out, dgamma[0], dbeta[0], gm, dgq, dgk


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14, 15, 16))
def _fused(x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias, gamma_q, gamma_k, seed, heads, dim_head, scale, eps, interpret, dropout_rate):
    return _pallas_forward(
        x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
        gamma_q, gamma_k, seed,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        dropout_rate=dropout_rate, interpret=interpret,
    )


def _fused_fwd(x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias, gamma_q, gamma_k, seed, heads, dim_head, scale, eps, interpret, dropout_rate):
    out = _pallas_forward(
        x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
        gamma_q, gamma_k, seed,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        dropout_rate=dropout_rate, interpret=interpret,
    )
    return out, (x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
                 gamma_q, gamma_k, seed)


def _bwd_fits_vmem(x_shape, heads: int, dim_head: int) -> bool:
    b, n, dim = x_shape
    return _vmem_bytes_bwd(n, dim, heads * dim_head, 2) <= _VMEM_LIMIT_BWD


def _fused_bwd(heads, dim_head, scale, eps, interpret, dropout_rate, residuals, g):
    (x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
     gamma_q, gamma_k, seed) = residuals
    seed_ct = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)

    if dropout_rate == 0.0 and not _bwd_fits_vmem(x.shape, heads, dim_head):
        # Differentiate the XLA composite instead of running the Pallas
        # backward: its working set (~2x the forward's) would not fit VMEM
        # at this shape.  Still recompute-from-x (only x was saved), so
        # memory behavior matches; just slower than the in-VMEM kernel.
        # (With dropout the composite cannot replay the in-kernel PRNG
        # masks; eligibility gates dropout>0 on fused_dropout_supported,
        # so this path is rate-0 only.  qk-norm runs in the Pallas backward
        # since round 4 — RMSNorm recompute + in-VMEM dgamma accumulators.)
        all_args = (x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale,
                    ln_bias, gamma_q, gamma_k)
        present = [a is not None for a in all_args]
        live = [a for a in all_args if a is not None]

        def composite(*live_args):
            it = iter(live_args)
            full = [next(it) if p else None for p in present]
            return _xla_reference(
                *full, heads=heads, dim_head=dim_head, scale=scale, eps=eps
            )

        _, vjp = jax.vjp(composite, *live)
        grads = iter(vjp(g))
        return tuple(next(grads) if p else None for p in present) + (seed_ct,)

    dx, dW_qkv, db_qkv, dW_out, dgamma, dbeta, gm, dgq, dgk = _pallas_backward(
        x,
        g,
        w_qkv,
        b_qkv,
        w_out,
        ln_scale,
        ln_bias,
        seed,
        gamma_q,
        gamma_k,
        heads=heads,
        dim_head=dim_head,
        scale=scale,
        eps=eps,
        dropout_rate=dropout_rate,
        interpret=interpret,
    )
    d_residual = g if residual is not None else None
    g_for_bias = gm if dropout_rate > 0.0 else g
    db_out = (
        jnp.sum(g_for_bias.astype(jnp.float32), axis=(0, 1)).astype(b_out.dtype)
        if b_out is not None
        else None
    )
    return (
        dx,
        d_residual,
        dW_qkv.astype(w_qkv.dtype),
        db_qkv.astype(b_qkv.dtype) if b_qkv is not None else None,
        dW_out.astype(w_out.dtype),
        db_out,
        dgamma.astype(ln_scale.dtype),
        dbeta.astype(ln_bias.dtype),
        dgq.reshape(gamma_q.shape).astype(gamma_q.dtype) if gamma_q is not None else None,
        dgk.reshape(gamma_k.shape).astype(gamma_k.dtype) if gamma_k is not None else None,
        seed_ct,
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Whole transformer LAYER (attn block + FF) in one kernel — inference path.
#
# Measured (tools/bench_layer_fused.py, v5e, ViT-B shapes b=128/n=197/d=768):
# the attn-kernel + XLA-FF pair runs 2.85 ms/layer; one kernel holding the
# full layer (all weights resident, 2 imgs/grid-step) runs 2.71-2.76 — the
# y and GELU-hidden HBM round-trips between the halves disappear.  The
# "16 MB VMEM wall" Mosaic reports is XLA's default SCOPED-VMEM BUDGET
# (xla_tpu_scoped_vmem_limit_kib), not the 128 MB physical VMEM; the
# kernel raises it per-call via CompilerParams (value itself measured
# perf-neutral, 20/32/64 MB identical).  >2 images/step and FF-weight-tile
# streaming variants measured SLOWER (see docs/PERF_NOTES.md round 3).
# ---------------------------------------------------------------------------

# naive working-set estimate ceiling, calibrated to configs PROVEN on
# hardware (Mosaic reuses buffers, so the naive sum overestimates the real
# footprint); configs estimating above it fall back to the two-step path
_WHOLE_LAYER_EST_LIMIT = int(20.75 * 1024 * 1024)


def _vmem_bytes_whole(n, dim, inner, mlp, itemsize, ips):
    rows = ips * n
    weights = (3 * inner * dim + inner * dim + 2 * dim * mlp) * itemsize
    transients = (
        rows * (3 * inner + mlp + 3 * dim) * itemsize
        + rows * dim * 4
        + 2 * n * n * 4
    )
    return weights + transients


def _whole_layer_ips(b: int, n: int, dim: int) -> int:
    """Images per grid step — the ONE definition consumed by both the
    eligibility gate (whose VMEM estimate scales with it) and the kernel
    launch, so they can never disagree about the working-set size.
    2 when the stacked rows compose into sublane tiles (+2.7% measured);
    >2 measured slower (PERF_NOTES round 3)."""
    return 2 if (b % 2 == 0 and (n % 8 == 0 or n % 8 >= 5) and dim % 128 == 0) else 1


def whole_layer_supported(
    x_shape, dtype, heads: int, dim_head: int, dim: int, mlp_dim: int
) -> bool:
    """Static eligibility for the single-kernel whole-layer path."""
    import os

    if os.environ.get("VIT_TPU_DISABLE_FUSED") or os.environ.get(
        "VIT_TPU_DISABLE_WHOLE_LAYER"
    ):
        return False
    if len(x_shape) != 3 or dtype != jnp.bfloat16:
        return False
    b, n, d = x_shape
    if d != dim:
        return False
    inner = heads * dim_head
    ips = _whole_layer_ips(b, n, dim)
    if b % ips:
        return False
    return _vmem_bytes_whole(n, dim, inner, mlp_dim, 2, ips) <= _WHOLE_LAYER_EST_LIMIT


def _layer_rows(
    x, wqkv_ref, bqkv_ref, wout_ref, bout_ref, ln1s_ref, ln1b_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    *,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    with_bout: bool,
    imgs_per_step: int,
    n: int,
):
    """One transformer layer over (imgs_per_step * n, dim) stacked rows —
    the in-VMEM body shared by the single-layer kernel and the multi-layer
    stack kernel (identical numerics, so the two dispatch paths are
    bit-equal).  Returns (out, y); y is the post-attention residual the
    grad-path single-layer kernel emits."""
    inner = heads * dim_head

    def ln(v, s_ref, b_ref):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(vf - mu), axis=-1, keepdims=True)
        o = (vf - mu) * jax.lax.rsqrt(var + eps)
        return (
            o * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        ).astype(v.dtype)

    # qkv bias is added in f32 BEFORE the cast — the dot output is already
    # f32, so this costs nothing and keeps the forward bit-identical to the
    # backward kernels' recompute (_bwd_kernel / _layer_bwd_kernel, which
    # both add in f32); the FF half below adds ITS biases in x.dtype
    # (the XLA Dense add-chain the FF vjp composite mirrors)
    qkv_f32 = jnp.dot(ln(x, ln1s_ref, ln1b_ref), wqkv_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype))
    if with_bqkv:
        qkv_f32 = qkv_f32 + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv_f32.astype(x.dtype)

    img_outs = []
    for j in range(imgs_per_step):
        rows = slice(j * n, (j + 1) * n)
        outs = []
        for h in range(heads):
            q = qkv[rows, h * dim_head : (h + 1) * dim_head]
            k = qkv[rows, inner + h * dim_head : inner + (h + 1) * dim_head]
            v = qkv[rows, 2 * inner + h * dim_head : 2 * inner + (h + 1) * dim_head]
            p = _softmax_from_dots(
                jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)
                ),
                scale,
            )
            outs.append(
                jnp.dot(p.astype(x.dtype), v, preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)).astype(x.dtype)
            )
        img_outs.append(jnp.concatenate(outs, axis=-1))
    merged = img_outs[0] if imgs_per_step == 1 else jnp.concatenate(img_outs, axis=0)

    att = jnp.dot(merged, wout_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)).astype(x.dtype)
    if with_bout:
        att = att + bout_ref[0]
    y = att + x

    # FF half: LN2 → fc1 (+b1) → tanh-GELU (the bf16 policy) → fc2 (+b2) → +y
    h2 = jnp.dot(ln(y, ln2s_ref, ln2b_ref), w1_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)).astype(x.dtype)
    h2 = jax.nn.gelu(h2 + b1_ref[0], approximate=True)
    out = jnp.dot(h2, w2_ref[...], preferred_element_type=jnp.float32, precision=_kernel_dot_precision(x.dtype)).astype(x.dtype)
    out = out + b2_ref[0] + y
    return out, y


def _layer_kernel(
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, ln1s_ref, ln1b_ref,
    ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    *maybe_y_ref,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    with_bout: bool,
    imgs_per_step: int,
    emit_y: bool = False,
):
    n = x_ref.shape[1]
    x = x_ref[...].reshape(imgs_per_step * n, x_ref.shape[2])
    out, y = _layer_rows(
        x, wqkv_ref, bqkv_ref, wout_ref, bout_ref, ln1s_ref, ln1b_ref,
        ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        with_bqkv=with_bqkv, with_bout=with_bout,
        imgs_per_step=imgs_per_step, n=n,
    )
    if emit_y:
        # training variant: the custom_vjp saves y so the backward needs no
        # attention-forward recompute (one extra HBM write, grad path only)
        maybe_y_ref[0][...] = y.reshape(maybe_y_ref[0].shape)
    o_ref[...] = out.reshape(o_ref.shape)


def _layer_pallas_forward(
    x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
    *, heads, dim_head, scale, eps, interpret=False, emit_y=False
):
    b, n, dim = x.shape
    inner = heads * dim_head
    mlp = w1.shape[1]
    with_bqkv = b_qkv is not None
    with_bout = b_out is not None
    bqkv_arr = (b_qkv if with_bqkv else jnp.zeros((3 * inner,), x.dtype)).reshape(1, -1)
    bout_arr = (b_out if with_bout else jnp.zeros((dim,), x.dtype)).reshape(1, -1)
    ips = _whole_layer_ips(b, n, dim)

    kern = functools.partial(
        _layer_kernel,
        heads=heads,
        dim_head=dim_head,
        scale=scale,
        eps=eps,
        with_bqkv=with_bqkv,
        with_bout=with_bout,
        imgs_per_step=ips,
        emit_y=emit_y,
    )
    row = lambda t: t.reshape(1, -1)
    batch_spec = pl.BlockSpec((ips, n, dim), lambda i: (i, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    # raise this kernel's scoped-VMEM budget: XLA's DEFAULT budget is 16 MB
    # (xla_tpu_scoped_vmem_limit_kib) — NOT the physical v5e VMEM (128 MB).
    # The full-model compile charges this call ~19.5 MB (the standalone
    # compile fit under 16; XLA model-context accounting differs), which is
    # comfortably real-VMEM-safe.
    params = (
        None
        if interpret
        else _fwd_compiler_params(vmem_limit_bytes=64 * 1024 * 1024)
    )
    out_shape = jax.ShapeDtypeStruct((b, n, dim), x.dtype)
    result = pl.pallas_call(
        kern,
        out_shape=(out_shape, out_shape) if emit_y else out_shape,
        grid=(b // ips,),
        in_specs=[
            batch_spec,
            const((dim, 3 * inner)),
            const((1, 3 * inner)),
            const((inner, dim)),
            const((1, dim)),
            const((1, dim)),
            const((1, dim)),
            const((1, dim)),
            const((1, dim)),
            const((dim, mlp)),
            const((1, mlp)),
            const((mlp, dim)),
            const((1, dim)),
        ],
        out_specs=(batch_spec, batch_spec) if emit_y else batch_spec,
        compiler_params=params,
        interpret=interpret,
    )(x, w_qkv, bqkv_arr, w_out, bout_arr, row(ln1s), row(ln1b), row(ln2s),
      row(ln2b), w1, row(b1), w2, row(b2))
    return result


def _gelu_tanh_grad(h):
    """d/dh of the tanh-approx GELU (matches jax.nn.gelu(approximate=True)
    under autodiff; f32 math)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    t = jnp.tanh(c * (h + a * h * h * h))
    return 0.5 * (1.0 + t) + 0.5 * h * (1.0 - t * t) * c * (1.0 + 3.0 * a * h * h)


def _layer_bwd_kernel(
    *refs,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    with_bout: bool,
):
    """Backward of the whole transformer layer, per batch element, with ALL
    weight gradients accumulated in f32 VMEM accumulators across the
    sequential batch grid.

    The round-2 attention backward emitted per-step (h, dqkv, m) tensors and
    contracted them into dW with XLA GEMMs — three (b·n, ·) HBM streams
    written then re-read (~3 GB/layer at bs=1024), plus the FF vjp's
    recomputed GELU-hidden round-trips.  Accumulating rank-n dW updates per
    step does the same contraction FLOPs (just K-split) and turns the
    layer backward into: read x/y/g, write dx — nothing else touches HBM.
    Feasible since the 16 MB "VMEM wall" turned out to be XLA's scoped-vmem
    BUDGET, not physical VMEM (PERF_NOTES round 3): the f32 accumulators +
    resident weights total ~58 MB of the 128 MB core VMEM.

    Measured OUTCOME (v5e, ViT-B bs=1024): the K-split contractions and
    accumulator read-modify-write cost MORE than the eliminated HBM
    streams — 1,058 vs 959 ms/step fwd+bwd — so this kernel is opt-in,
    not default (see layer_bwd_supported).

    Layout: out = y + b2 + fc2(gelu(fc1(LN2(y)))), y = x + attn_block(x).
    g is d(out); the FF half runs first (cotangent dy), then the attention
    half (identical math to _bwd_kernel)."""
    # b_out's VALUE is not needed (db_out = sum(dy)); it is not an operand
    (x_ref, y_ref, g_ref, wqkv_ref, bqkv_ref, wout_ref, ln1s_ref, ln1b_ref,
     ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
     dx_ref, dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref,
     dln1s_ref, dln1b_ref, dln2s_ref, dln2b_ref,
     dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
    i = pl.program_id(0)
    prec = _kernel_dot_precision(x_ref.dtype)
    io_dtype = x_ref.dtype

    @pl.when(i == 0)
    def _init():
        for ref in (dwqkv_ref, dbqkv_ref, dwout_ref, dbout_ref, dln1s_ref,
                    dln1b_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref,
                    dw2_ref, db2_ref):
            ref[...] = jnp.zeros_like(ref)

    x = x_ref[0]
    y = y_ref[0]
    g = g_ref[0].astype(jnp.float32)

    def ln_fwd(v, s_ref, b_ref):
        vf = v.astype(jnp.float32)
        mu = jnp.mean(vf, axis=-1, keepdims=True)
        vc = vf - mu
        var = jnp.mean(jnp.square(vc), axis=-1, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        xhat = vc * r
        out = xhat * s_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        return out.astype(v.dtype), xhat, r

    def ln_bwd(dout, xhat, r, s_ref):
        gamma = s_ref[0].astype(jnp.float32)
        dxhat = dout * gamma
        return r * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )

    # --- FF half: recompute from y, backprop g to dy ---
    y2, xhat2, r2 = ln_fwd(y, ln2s_ref, ln2b_ref)
    h1_f32 = jnp.dot(y2, w1_ref[...], preferred_element_type=jnp.float32, precision=prec)
    # primal adds the bias AFTER the bf16 cast (h2 + b1 in io dtype)
    h1 = (h1_f32.astype(io_dtype) + b1_ref[0]).astype(jnp.float32)
    act = jax.nn.gelu(h1, approximate=True).astype(io_dtype)

    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    gb = g.astype(io_dtype)
    # dact = g @ W2^T
    dact = jax.lax.dot_general(
        gb, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dh1 = dact * _gelu_tanh_grad(h1)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dh1b = dh1.astype(io_dtype)
    # dW2 += act^T @ g ; dW1 += y2^T @ dh1
    dw2_ref[...] += jax.lax.dot_general(
        act, gb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dw1_ref[...] += jax.lax.dot_general(
        y2, dh1b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dy through LN2
    dyln = jax.lax.dot_general(
        dh1b, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dln2s_ref[...] += jnp.sum(dyln * xhat2, axis=0, keepdims=True)
    dln2b_ref[...] += jnp.sum(dyln, axis=0, keepdims=True)
    # out = fc2(...) + b2 + y: the residual path adds g directly
    dy = ln_bwd(dyln, xhat2, r2, ln2s_ref) + g

    # --- attention half: recompute from x, backprop dy (same math as
    # _bwd_kernel, dW accumulated in-kernel) ---
    h, xhat1, r1 = ln_fwd(x, ln1s_ref, ln1b_ref)
    qkv_f32 = jnp.dot(h, wqkv_ref[...], preferred_element_type=jnp.float32, precision=prec)
    if with_bqkv:
        qkv_f32 = qkv_f32 + bqkv_ref[0].astype(jnp.float32)
    qkv = qkv_f32.astype(io_dtype)

    inner = heads * dim_head
    dyb = dy.astype(io_dtype)
    if with_bout:
        dbout_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    # dm = dy @ Wout^T
    dm = jax.lax.dot_general(
        dyb, wout_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    dqs, dks, dvs, outs = [], [], [], []
    for hh in range(heads):
        q = qkv[:, hh * dim_head : (hh + 1) * dim_head]
        k = qkv[:, inner + hh * dim_head : inner + (hh + 1) * dim_head]
        v = qkv[:, 2 * inner + hh * dim_head : 2 * inner + (hh + 1) * dim_head]
        p = _softmax_from_dots(
            jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ),
            scale,
        )
        pb = p.astype(io_dtype)
        outs.append(jnp.dot(pb, v, preferred_element_type=jnp.float32, precision=prec).astype(io_dtype))

        dm_h = dm[:, hh * dim_head : (hh + 1) * dim_head].astype(io_dtype)
        dv = jax.lax.dot_general(
            pb, dm_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            dm_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        ds = ds.astype(io_dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=prec) * scale
        dk = (
            jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            * scale
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)

    m = jnp.concatenate(outs, axis=-1)
    # dWout += m^T @ dy
    dwout_ref[...] += jax.lax.dot_general(
        m, dyb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (n, 3*inner) f32
    if with_bqkv:
        dbqkv_ref[...] += jnp.sum(dqkv, axis=0, keepdims=True)
    dqkvb = dqkv.astype(io_dtype)
    # dWqkv += h^T @ dqkv
    dwqkv_ref[...] += jax.lax.dot_general(
        h, dqkvb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # dh = dqkv @ Wqkv^T
    dh = jax.lax.dot_general(
        dqkvb, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dln1s_ref[...] += jnp.sum(dh * xhat1, axis=0, keepdims=True)
    dln1b_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    # y = x + attn(x): total dx = LN1-path dx + residual-path dy
    dx = ln_bwd(dh, xhat1, r1, ln1s_ref) + dy
    dx_ref[0] = dx.astype(io_dtype)


def _vmem_bytes_layer_bwd(n, dim, inner, mlp, itemsize):
    weights = (3 * inner * dim + inner * dim + 2 * dim * mlp) * itemsize
    accums = (3 * inner * dim + inner * dim + 2 * dim * mlp + 3 * inner + 6 * dim + mlp) * 4
    f32_tmps = (
        n * (3 * inner) * 4 * 2  # qkv_f32 + dqkv
        + n * mlp * 4 * 3  # h1 / dact / dh1
        + n * dim * 4 * 4  # xhat1/xhat2/dy/dh
        + 4 * n * n * 4  # live logits/p/dp/ds
    )
    io_dbuf = 2 * 4 * n * dim * itemsize  # x, y, g in + dx out
    return weights + accums + f32_tmps + io_dbuf


# naive estimate for the hardware-calibrated ViT-B config ~66 MB; physical
# VMEM is 128 MB (PERF_NOTES round 3) — leave generous headroom
_LAYER_BWD_EST_LIMIT = int(100 * 1024 * 1024)


def layer_bwd_supported(x_shape, dtype, heads, dim_head, dim, mlp_dim) -> bool:
    """Gate for the single-kernel whole-layer backward.

    OPT-IN (``VIT_TPU_ENABLE_WHOLE_LAYER_BWD=1``), not default: measured on
    v5e (ViT-B bs=1024, tools/bench_train_decomp.py) the kernel loses to the
    decomposed path — fwd+bwd 1,058 vs 959 ms/step.  The in-VMEM dW
    accumulation does the same contraction FLOPs as XLA's big (b·n, ·)
    GEMMs but chunked at K=n=197 per image, plus ~28 MB of f32 accumulator
    read-modify-write traffic per grid step; that costs more than the
    (h, dqkv, m) HBM streams it eliminates.  Kept as a measured variant —
    the balance may flip at larger n (packed/long-context shapes) where the
    per-chunk K grows and the activation streams dominate.
    """
    import os

    if not os.environ.get("VIT_TPU_ENABLE_WHOLE_LAYER_BWD"):
        return False
    b, n, d = x_shape
    itemsize = jnp.dtype(dtype).itemsize
    return (
        _vmem_bytes_layer_bwd(n, dim, heads * dim_head, mlp_dim, itemsize)
        <= _LAYER_BWD_EST_LIMIT
    )


def _layer_pallas_backward(
    x, y, g, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2,
    b2, *, heads, dim_head, scale, eps, interpret=False
):
    b, n, dim = x.shape
    inner = heads * dim_head
    mlp = w1.shape[1]
    with_bqkv = b_qkv is not None
    with_bout = b_out is not None
    bqkv_arr = (b_qkv if with_bqkv else jnp.zeros((3 * inner,), x.dtype)).reshape(1, -1)
    # b_out itself is NOT an operand: db_out = sum(dy) needs no value

    kern = functools.partial(
        _layer_bwd_kernel,
        heads=heads,
        dim_head=dim_head,
        scale=scale,
        eps=eps,
        with_bqkv=with_bqkv,
        with_bout=with_bout,
    )
    row = lambda t: t.reshape(1, -1)
    batch_spec = pl.BlockSpec((1, n, dim), lambda i: (i, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((b, n, dim), x.dtype),   # dx
        jax.ShapeDtypeStruct((dim, 3 * inner), f32),  # dWqkv
        jax.ShapeDtypeStruct((1, 3 * inner), f32),    # dbqkv
        jax.ShapeDtypeStruct((inner, dim), f32),      # dWout
        jax.ShapeDtypeStruct((1, dim), f32),          # dbout
        jax.ShapeDtypeStruct((1, dim), f32),          # dln1s
        jax.ShapeDtypeStruct((1, dim), f32),          # dln1b
        jax.ShapeDtypeStruct((1, dim), f32),          # dln2s
        jax.ShapeDtypeStruct((1, dim), f32),          # dln2b
        jax.ShapeDtypeStruct((dim, mlp), f32),        # dW1
        jax.ShapeDtypeStruct((1, mlp), f32),          # db1
        jax.ShapeDtypeStruct((mlp, dim), f32),        # dW2
        jax.ShapeDtypeStruct((1, dim), f32),          # db2
    )
    out_specs = (
        batch_spec,
        const((dim, 3 * inner)),
        const((1, 3 * inner)),
        const((inner, dim)),
        const((1, dim)),
        const((1, dim)),
        const((1, dim)),
        const((1, dim)),
        const((1, dim)),
        const((dim, mlp)),
        const((1, mlp)),
        const((mlp, dim)),
        const((1, dim)),
    )
    in_specs = [
        batch_spec,
        batch_spec,
        batch_spec,
        const((dim, 3 * inner)),
        const((1, 3 * inner)),
        const((inner, dim)),
        const((1, dim)),
        const((1, dim)),
        const((1, dim)),
        const((1, dim)),
        const((dim, mlp)),
        const((1, mlp)),
        const((mlp, dim)),
        const((1, dim)),
    ]
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    )
    (dx, dwqkv, dbqkv, dwout, dbout, dln1s, dln1b, dln2s, dln2b, dw1, db1,
     dw2, db2) = pl.pallas_call(
        kern,
        out_shape=out_shape,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=params,
        interpret=interpret,
    )(x, y, g, w_qkv, bqkv_arr, w_out, row(ln1s), row(ln1b),
      row(ln2s), row(ln2b), w1, row(b1), w2, row(b2))
    return (
        dx,
        dwqkv.astype(w_qkv.dtype),
        dbqkv[0].astype(b_qkv.dtype) if with_bqkv else None,
        dwout.astype(w_out.dtype),
        dbout[0].astype(b_out.dtype) if with_bout else None,
        dln1s[0].astype(ln1s.dtype),
        dln1b[0].astype(ln1b.dtype),
        dln2s[0].astype(ln2s.dtype),
        dln2b[0].astype(ln2b.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b2.dtype),
    )


def _ff_bwd_kernel(*refs, eps: float, hybrid: bool = False):
    """FF-block backward over a ROW TILE of the flattened (b·n, dim) batch:
    recompute LN2→fc1→GELU in VMEM, accumulate dW1/dW2/db/dLN in f32 VMEM
    across the sequential row grid, write the dy tile.

    This is the FF half of ``_layer_bwd_kernel`` with one structural change
    that flips its measured outcome: the FF is row-independent, so the tile
    is 512-1024 rows instead of one image's n=197 — each dW update is a
    rank-512+ GEMM at full MXU depth rather than the rank-197 K-split that
    made the whole-layer variant lose.  Eliminates XLA's FF-vjp HBM streams
    (write+2×read of the (b·n, mlp) GELU hidden and of dh ≈ 5 GB/layer at
    ViT-B bs=1024); the attention half keeps its measured-winner path.

    NOTE dy here is the cotangent of the FULL layer output z = y + FF(y)
    routed to y, i.e. it INCLUDES the residual-path g (matches what
    jax.vjp(_ff_reference) returned in the decomposed backward).

    ``hybrid``: instead of accumulating dW1/dW2 in VMEM, EMIT the operand
    tensors (y2 = LN2(y) post-scale, act = GELU output, dh1) so the wrapper
    contracts them with two large XLA GEMMs (which XLA then fuses straight
    into the adam update, measured ~79% MXU) — the kernel keeps only what
    XLA does badly: the LN backward and the vector-grad reductions, which
    profile as ~117 separate ~1 ms bandwidth-bound fusions per train step
    (tools/profile_flagship.py --train).
    """
    if hybrid:
        (y_ref, g_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
         dy_ref, y2_ref, act_ref, dh1_ref,
         dln2s_ref, dln2b_ref, db1_ref, db2_ref) = refs
        dw1_ref = dw2_ref = None
    else:
        (y_ref, g_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
         dy_ref, dln2s_ref, dln2b_ref, dw1_ref, db1_ref, dw2_ref, db2_ref) = refs
        y2_ref = act_ref = dh1_ref = None
    i = pl.program_id(0)
    prec = _kernel_dot_precision(y_ref.dtype)
    io_dtype = y_ref.dtype

    @pl.when(i == 0)
    def _init():
        accs = (dln2s_ref, dln2b_ref, db1_ref, db2_ref)
        if not hybrid:
            accs += (dw1_ref, dw2_ref)
        for ref in accs:
            ref[...] = jnp.zeros_like(ref)

    y = y_ref[...]
    g = g_ref[...].astype(jnp.float32)

    # LN2 forward (recompute)
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    yc = yf - mu
    var = jnp.mean(jnp.square(yc), axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    xhat = yc * r
    y2 = (
        xhat * ln2s_ref[0].astype(jnp.float32) + ln2b_ref[0].astype(jnp.float32)
    ).astype(io_dtype)

    h1_f32 = jnp.dot(y2, w1_ref[...], preferred_element_type=jnp.float32,
                     precision=prec)
    # primal adds the bias AFTER the bf16 cast (matches _layer_kernel)
    h1 = (h1_f32.astype(io_dtype) + b1_ref[0]).astype(jnp.float32)
    act = jax.nn.gelu(h1, approximate=True).astype(io_dtype)

    db2_ref[...] += jnp.sum(g, axis=0, keepdims=True)
    gb = g.astype(io_dtype)
    dact = jax.lax.dot_general(
        gb, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dh1 = dact * _gelu_tanh_grad(h1)
    db1_ref[...] += jnp.sum(dh1, axis=0, keepdims=True)
    dh1b = dh1.astype(io_dtype)
    if hybrid:
        y2_ref[...] = y2
        act_ref[...] = act
        dh1_ref[...] = dh1b
    else:
        dw2_ref[...] += jax.lax.dot_general(
            act, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dw1_ref[...] += jax.lax.dot_general(
            y2, dh1b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    dyln = jax.lax.dot_general(
        dh1b, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dln2s_ref[...] += jnp.sum(dyln * xhat, axis=0, keepdims=True)
    dln2b_ref[...] += jnp.sum(dyln, axis=0, keepdims=True)

    gamma = ln2s_ref[0].astype(jnp.float32)
    dxhat = dyln * gamma
    dy_ln = r * (
        dxhat
        - jnp.mean(dxhat, axis=-1, keepdims=True)
        - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    )
    # z = y + FF(LN2(y)) + b2: residual path adds g
    dy_ref[...] = (dy_ln + g).astype(io_dtype)


def _ff_bwd_rows(m: int) -> int:
    """Largest row tile in {1024, 512, 256, 128, 64} dividing the flattened
    batch (0 when none does — caller falls back to the XLA vjp)."""
    for rows in (1024, 512, 256, 128, 64):
        if m % rows == 0:
            return rows
    return 0


def _vmem_bytes_ff_bwd(rows: int, dim: int, mlp: int, itemsize: int) -> int:
    weights = (2 * dim * mlp + 2 * dim + mlp) * itemsize
    accums = (2 * dim * mlp + 3 * dim + mlp) * 4
    f32_tmps = rows * mlp * 4 * 3 + rows * dim * 4 * 4  # h1/dact/dh1 + LN/dy
    io_dbuf = 2 * 3 * rows * dim * itemsize  # y, g in + dy out, double-buffered
    return weights + accums + f32_tmps + io_dbuf


_FF_BWD_EST_LIMIT = int(100 * 1024 * 1024)


def ff_bwd_mode(x_shape, dtype, dim: int, mlp_dim: int) -> str:
    """Mode for the row-tiled Pallas FF backward: '' (off — the default),
    'full' (dW accumulated in VMEM) or 'hybrid' (kernel does LN-bwd +
    vector-grad reductions, emits y2/act/dh1 for XLA's dW GEMMs).

    OPT-IN via ``VIT_TPU_FF_BWD=full|hybrid`` (legacy
    ``VIT_TPU_ENABLE_FF_BWD=1`` → full), not default — both variants were
    measured on v5e ViT-B bs=1024 (tools/bench_train_decomp.py,
    same-session A/Bs) and LOST to XLA's FF vjp:

    - full:   fwd+bwd 975.6 vs 960.4 ms (+15) — the in-VMEM dW chain costs
      more than the eliminated GELU-hidden/dh HBM streams.
    - hybrid: fwd+bwd 972.8 vs 960.4 ms (+12), full step 997.2 vs 979.4 —
      the emitted y2/act/dh1 streams (~2.8 GB/layer of writes, of which
      act/dh1 XLA also materializes but overlapped differently) cost as
      much as the ~117 × ~1 ms bandwidth-bound LN-bwd/reduction fusions
      they replace (profiled at ~119 ms/step,
      tools/profile_flagship.py --train).

    Decision record: XLA's FF backward stands as the measured winner; the
    backward runs at ~94% of its memory-bounded envelope and both kernel
    formulations of the remaining 6% pay more than they save."""
    import os

    mode = os.environ.get("VIT_TPU_FF_BWD", "")
    if not mode and os.environ.get("VIT_TPU_ENABLE_FF_BWD"):
        mode = "full"
    if mode not in ("full", "hybrid"):
        return ""
    b, n, d = x_shape
    rows = _ff_bwd_rows(b * n)
    if rows == 0:
        return ""
    itemsize = jnp.dtype(dtype).itemsize
    if _vmem_bytes_ff_bwd(rows, dim, mlp_dim, itemsize) > _FF_BWD_EST_LIMIT:
        return ""
    return mode


def ff_bwd_supported(x_shape, dtype, dim: int, mlp_dim: int) -> bool:
    return bool(ff_bwd_mode(x_shape, dtype, dim, mlp_dim))


def _ff_pallas_backward(y, g, ln2s, ln2b, w1, b1, w2, *, eps,
                        interpret=False, hybrid=False):
    """dy, dln2s, dln2b, dW1, db1, dW2, db2 for z = y + FF(LN2(y)) + b2.

    Row-tiled Pallas kernel; see ``_ff_bwd_kernel``.  ``db2`` is returned
    even though b2's value is never read (db2 = Σg).  ``hybrid``: the
    kernel emits y2/act/dh1 and the dW contractions run as two large XLA
    GEMMs here (which XLA fuses into the optimizer update)."""
    b, n, dim = y.shape
    mlp = w1.shape[1]
    m = b * n
    rows = _ff_bwd_rows(m)
    assert rows > 0, "caller must check ff_bwd_supported"
    y2d = y.reshape(m, dim)
    g2d = g.reshape(m, dim)

    row = lambda t: t.reshape(1, -1)
    tile_spec = pl.BlockSpec((rows, dim), lambda i: (i, 0))
    mlp_tile = pl.BlockSpec((rows, mlp), lambda i: (i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    f32 = jnp.float32
    vec_shapes = (
        jax.ShapeDtypeStruct((1, dim), f32),      # dln2s
        jax.ShapeDtypeStruct((1, dim), f32),      # dln2b
        jax.ShapeDtypeStruct((1, mlp), f32),      # db1
        jax.ShapeDtypeStruct((1, dim), f32),      # db2
    )
    vec_specs = (const((1, dim)), const((1, dim)), const((1, mlp)),
                 const((1, dim)))
    if hybrid:
        out_shape = (
            jax.ShapeDtypeStruct((m, dim), y.dtype),  # dy
            jax.ShapeDtypeStruct((m, dim), y.dtype),  # y2
            jax.ShapeDtypeStruct((m, mlp), y.dtype),  # act
            jax.ShapeDtypeStruct((m, mlp), y.dtype),  # dh1
        ) + vec_shapes
        out_specs = (tile_spec, tile_spec, mlp_tile, mlp_tile) + vec_specs
    else:
        out_shape = (
            jax.ShapeDtypeStruct((m, dim), y.dtype),  # dy
            vec_shapes[0], vec_shapes[1],
            jax.ShapeDtypeStruct((dim, mlp), f32),    # dW1
            vec_shapes[2],
            jax.ShapeDtypeStruct((mlp, dim), f32),    # dW2
            vec_shapes[3],
        )
        out_specs = (
            tile_spec, vec_specs[0], vec_specs[1], const((dim, mlp)),
            vec_specs[2], const((mlp, dim)), vec_specs[3],
        )
    in_specs = [
        tile_spec,
        tile_spec,
        const((1, dim)),
        const((1, dim)),
        const((dim, mlp)),
        const((1, mlp)),
        const((mlp, dim)),
    ]
    params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)
    )
    results = pl.pallas_call(
        functools.partial(_ff_bwd_kernel, eps=eps, hybrid=hybrid),
        out_shape=out_shape,
        grid=(m // rows,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=params,
        interpret=interpret,
    )(y2d, g2d, row(ln2s), row(ln2b), w1, row(b1), w2)
    if hybrid:
        dy2d, y2, act, dh1, dln2s, dln2b, db1, db2 = results
        # dW as large XLA GEMMs over the flattened batch (M=dim, K=b·n) —
        # XLA fuses these straight into the optimizer update
        dw1 = jax.lax.dot_general(
            y2, dh1, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )
        dw2 = jax.lax.dot_general(
            act, g2d.astype(act.dtype), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    else:
        dy2d, dln2s, dln2b, dw1, db1, dw2, db2 = results
    return (
        dy2d.reshape(b, n, dim),
        dln2s[0].astype(ln2s.dtype),
        dln2b[0].astype(ln2b.dtype),
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0],
    )


def _ff_reference(y, ln2s, ln2b, w1, b1, w2, b2, *, eps):
    """XLA composite of the kernel's FF half (same dtype path: dots with
    fp32 accumulation, add-chains in the IO dtype like nn.Dense)."""
    yf = y.astype(jnp.float32)
    mu = yf.mean(-1, keepdims=True)
    var = yf.var(-1, keepdims=True)
    h = (yf - mu) * jax.lax.rsqrt(var + eps)
    h = (h * ln2s.astype(jnp.float32) + ln2b.astype(jnp.float32)).astype(y.dtype)
    h = jnp.dot(h, w1, preferred_element_type=jnp.float32).astype(y.dtype)
    h = jax.nn.gelu(h + b1, approximate=True)
    out = jnp.dot(h, w2, preferred_element_type=jnp.float32).astype(y.dtype)
    return out + b2 + y


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17))
def _fused_layer(x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2, heads, dim_head, scale, eps, interpret):
    return _layer_pallas_forward(
        x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps, interpret=interpret,
    )


def _fused_layer_fwd(x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2, heads, dim_head, scale, eps, interpret):
    # this function only runs UNDER DIFFERENTIATION (the primal above runs
    # otherwise) — emit y so the backward skips the attention-forward
    # recompute entirely (one extra HBM write on the grad path only)
    out, y = _layer_pallas_forward(
        x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        interpret=interpret, emit_y=True,
    )
    return out, (x, y, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2)


def _fused_layer_bwd(heads, dim_head, scale, eps, interpret, residuals, g):
    """Whole-layer backward.  Default: the decomposed path — XLA FF vjp
    from y + Pallas attention backward (the measured winner, see
    layer_bwd_supported).  Opt-in variant (VIT_TPU_ENABLE_WHOLE_LAYER_BWD):
    ONE Pallas kernel (_layer_bwd_kernel) recomputing both halves from
    (x, y) with every dW accumulated in VMEM — nothing but x/y/g/dx
    touches HBM.  Both save only (x, y)."""
    x, y, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2 = residuals

    if layer_bwd_supported(
        x.shape, x.dtype, heads, dim_head, x.shape[-1], w1.shape[1]
    ):
        (dx, dW_qkv, db_qkv, dW_out, db_out, dgamma, dbeta, dln2s, dln2b,
         dW1, db1, dW2, db2) = _layer_pallas_backward(
            x, y, g, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b,
            w1, b1, w2, b2, heads=heads, dim_head=dim_head, scale=scale,
            eps=eps, interpret=interpret,
        )
        return (
            dx, dW_qkv, db_qkv, dW_out, db_out, dgamma, dbeta,
            dln2s, dln2b, dW1, db1, dW2, db2,
        )

    mode = ff_bwd_mode(x.shape, x.dtype, x.shape[-1], w1.shape[1])
    if mode:
        dy, dln2s, dln2b, dW1, db1, dW2, db2 = _ff_pallas_backward(
            y, g, ln2s, ln2b, w1, b1, w2, eps=eps, interpret=interpret,
            hybrid=(mode == "hybrid"),
        )
        db2 = db2.astype(b2.dtype)
    else:
        _, ff_vjp = jax.vjp(
            lambda y, ln2s, ln2b, w1, b1, w2, b2: _ff_reference(
                y, ln2s, ln2b, w1, b1, w2, b2, eps=eps
            ),
            y, ln2s, ln2b, w1, b1, w2, b2,
        )
        dy, dln2s, dln2b, dW1, db1, dW2, db2 = ff_vjp(g)

    if _bwd_fits_vmem(x.shape, heads, dim_head):
        dx_ln, dW_qkv, db_qkv, dW_out, dgamma, dbeta, _, _, _ = _pallas_backward(
            x, dy, w_qkv, b_qkv, w_out, ln1s, ln1b,
            heads=heads, dim_head=dim_head, scale=scale, eps=eps,
            interpret=interpret,
        )
        db_out = (
            jnp.sum(dy.astype(jnp.float32), axis=(0, 1)).astype(b_out.dtype)
            if b_out is not None
            else None
        )
        dgamma = dgamma.astype(ln1s.dtype)
        dbeta = dbeta.astype(ln1b.dtype)
        dW_qkv = dW_qkv.astype(w_qkv.dtype)
        dW_out = dW_out.astype(w_out.dtype)
        db_qkv = db_qkv.astype(b_qkv.dtype) if b_qkv is not None else None
    else:
        attn_args = (x, x, w_qkv, b_qkv, w_out, b_out, ln1s, ln1b)
        present = [a is not None for a in attn_args]
        live = [a for a in attn_args if a is not None]

        def comp(*live_args):
            it = iter(live_args)
            full = [next(it) if p else None for p in present]
            return _xla_reference(
                *full, heads=heads, dim_head=dim_head, scale=scale, eps=eps
            )

        _, attn_vjp = jax.vjp(comp, *live)
        grads = iter(attn_vjp(dy))
        full = [next(grads) if p else None for p in present]
        # dres (the residual operand's cotangent) is identically dy, which
        # the combined-dx line below already adds — don't double count
        dx_ln, _dres, dW_qkv, db_qkv, dW_out, db_out, dgamma, dbeta = full

    # y = x + attn(x): total dx = LN-path dx + residual-path dy
    dx = (dx_ln.astype(jnp.float32) + dy.astype(jnp.float32)).astype(x.dtype)
    return (
        dx, dW_qkv, db_qkv, dW_out, db_out, dgamma, dbeta,
        dln2s, dln2b, dW1, db1, dW2, db2,
    )


_fused_layer.defvjp(_fused_layer_fwd, _fused_layer_bwd)


def fused_transformer_layer(
    x,
    w_qkv,
    w_out,
    ln1_scale,
    ln1_bias,
    ln2_scale,
    ln2_bias,
    w1,
    b1,
    w2,
    b2,
    *,
    heads: int,
    dim_head: int,
    b_qkv=None,
    b_out=None,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """One Pallas kernel for x → x + Attn(LN(x)) → · + FF(LN(·)) — the full
    pre-norm transformer layer (reference vit.py:66-83 loop body).
    Differentiable via a decomposed custom_vjp (Pallas attention backward +
    XLA FF vjp); caller gates on :func:`whole_layer_supported`."""
    if scale is None:
        scale = dim_head**-0.5
    return _fused_layer(
        x, w_qkv, b_qkv, w_out, b_out, ln1_scale, ln1_bias, ln2_scale,
        ln2_bias, w1, b1, w2, b2, heads, dim_head, float(scale), eps, interpret,
    )


# ---------------------------------------------------------------------------
# Multi-LAYER stack kernel — several whole layers per Pallas call.
#
# The whole-layer kernel still pays one x read + one out write per layer
# (77.5 MB/boundary at ViT-B bs=128) plus a kernel launch.  Holding L
# layers' weights resident (L × ~13.5 MiB bf16 at ViT-B — the scoped-VMEM
# budget is raisable, physical VMEM is 128 MB) and running each (ips, n,
# dim) block through all L layers eliminates L-1 of every L boundaries.
# Measured (tools/bench_stack_fusion.py, v5e, ViT-B shapes): 3.354 ms/layer
# standalone L=1 → 3.080 (L=2) → 2.840 (L=3) → 2.733 (L=4) → 2.600 (L=6),
# outputs bit-identical to the sequential single-layer calls.
# ---------------------------------------------------------------------------

# weights-per-layer bytes beyond the first layer's working set; ceiling
# calibrated to the hardware-proven ViT-B L=6 config (~88 MiB estimate)
_STACK_EST_LIMIT = int(90 * 1024 * 1024)
# default layers-per-call.  1 = stacking OPT-IN (VIT_TPU_STACK_LAYERS):
# standalone the stack wins big (2.60 vs 3.35 ms/layer at L=6,
# tools/bench_stack_fusion.py) but IN-MODEL the flagship measured 4,150
# img/s at L=6 vs 4,237-4,264 per-layer — XLA already pipelines
# consecutive pallas calls, and the resident 85 MB of weights appears to
# crowd the x-block double-buffering.  See PERF_NOTES round 3.
_STACK_DEFAULT_GROUP = 1
_STACK_MAX_LAYERS = 6


def _layer_weight_bytes(dim: int, inner: int, mlp: int, itemsize: int) -> int:
    return (3 * inner * dim + inner * dim + 2 * dim * mlp) * itemsize


def whole_layer_stack_group(
    x_shape, dtype, heads: int, dim_head: int, dim: int, mlp_dim: int,
    depth: int,
) -> int:
    """Layers-per-Pallas-call group for the stacked whole-layer path
    (1 = per-layer calls).  ``VIT_TPU_STACK_LAYERS=g`` forces a group size
    (clamped to depth and to what the VMEM estimate says fits); the default
    is :data:`_STACK_DEFAULT_GROUP`.  Callers gate on
    :func:`whole_layer_supported` first; this only sizes the group."""
    import os

    if os.environ.get("VIT_TPU_DISABLE_STACK"):
        return 1
    if not whole_layer_supported(x_shape, dtype, heads, dim_head, dim, mlp_dim):
        return 1
    forced = os.environ.get("VIT_TPU_STACK_LAYERS")
    if forced:
        try:
            want = int(forced)
        except ValueError:
            raise ValueError(
                f"VIT_TPU_STACK_LAYERS must be an integer, got {forced!r}"
            ) from None
    else:
        want = _STACK_DEFAULT_GROUP
    if want <= 1:
        return 1
    b, n, d = x_shape
    inner = heads * dim_head
    ips = _whole_layer_ips(b, n, dim)
    base = _vmem_bytes_whole(n, dim, inner, mlp_dim, 2, ips)
    per_layer = _layer_weight_bytes(dim, inner, mlp_dim, 2)
    g = min(want, _STACK_MAX_LAYERS, depth)
    while g > 1 and base + (g - 1) * per_layer > _STACK_EST_LIMIT:
        g -= 1
    return g


def _stack_kernel(
    *refs,
    heads: int,
    dim_head: int,
    scale: float,
    eps: float,
    with_bqkv: bool,
    with_bout: bool,
    imgs_per_step: int,
    n_layers: int,
):
    x_ref = refs[0]
    o_ref = refs[-1]
    n = x_ref.shape[1]
    x = x_ref[...].reshape(imgs_per_step * n, x_ref.shape[2])
    for li in range(n_layers):
        w = refs[1 + li * 12 : 1 + (li + 1) * 12]
        x, _ = _layer_rows(
            x, *w,
            heads=heads, dim_head=dim_head, scale=scale, eps=eps,
            with_bqkv=with_bqkv, with_bout=with_bout,
            imgs_per_step=imgs_per_step, n=n,
        )
    o_ref[...] = x.reshape(o_ref.shape)


def _stack_pallas_forward(x, layers, *, heads, dim_head, scale, eps, interpret=False):
    b, n, dim = x.shape
    inner = heads * dim_head
    mlp = layers[0][8].shape[1]  # w1
    with_bqkv = layers[0][1] is not None
    with_bout = layers[0][3] is not None
    ips = _whole_layer_ips(b, n, dim)

    row = lambda t: t.reshape(1, -1)
    operands = [x]
    for (w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2) in layers:
        operands += [
            w_qkv,
            row(b_qkv if with_bqkv else jnp.zeros((3 * inner,), x.dtype)),
            w_out,
            row(b_out if with_bout else jnp.zeros((dim,), x.dtype)),
            row(ln1s), row(ln1b), row(ln2s), row(ln2b),
            w1, row(b1), w2, row(b2),
        ]

    kern = functools.partial(
        _stack_kernel,
        heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        with_bqkv=with_bqkv, with_bout=with_bout,
        imgs_per_step=ips, n_layers=len(layers),
    )
    batch_spec = pl.BlockSpec((ips, n, dim), lambda i: (i, 0, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    per_layer_specs = [
        const((dim, 3 * inner)), const((1, 3 * inner)),
        const((inner, dim)), const((1, dim)),
        const((1, dim)), const((1, dim)), const((1, dim)), const((1, dim)),
        const((dim, mlp)), const((1, mlp)), const((mlp, dim)), const((1, dim)),
    ]
    params = (
        None
        if interpret
        else _fwd_compiler_params(vmem_limit_bytes=110 * 1024 * 1024)
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, n, dim), x.dtype),
        grid=(b // ips,),
        in_specs=[batch_spec] + per_layer_specs * len(layers),
        out_specs=batch_spec,
        compiler_params=params,
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_stack(x, layers, heads, dim_head, scale, eps, interpret):
    return _stack_pallas_forward(
        x, layers, heads=heads, dim_head=dim_head, scale=scale, eps=eps,
        interpret=interpret,
    )


def _fused_stack_fwd(x, layers, heads, dim_head, scale, eps, interpret):
    # This runs only UNDER DIFFERENTIATION (the stacked primal above runs
    # otherwise).  Run the per-layer grad-path kernels (emit y) and save
    # each layer's (x, y) — exactly the per-layer training path, so taking
    # gradients through a stacked Transformer costs the same as through the
    # per-layer dispatch (no remat-style recompute, no train-time perf
    # cliff for callers that differentiate an eval-mode apply).
    xs, ys = [], []
    cur = x
    for lw in layers:
        xs.append(cur)
        cur, y = _layer_pallas_forward(
            cur, *lw, heads=heads, dim_head=dim_head, scale=scale, eps=eps,
            interpret=interpret, emit_y=True,
        )
        ys.append(y)
    return cur, (tuple(xs), tuple(ys), layers)


def _fused_stack_bwd(heads, dim_head, scale, eps, interpret, residuals, g):
    # per-layer decomposed backwards, newest layer first — identical to the
    # gradient of the per-layer chain (shared _layer_rows body; shared
    # _fused_layer_bwd)
    xs, ys, layers = residuals
    dlayers = []
    for i in reversed(range(len(layers))):
        res = (xs[i], ys[i]) + tuple(layers[i])
        grads = _fused_layer_bwd(heads, dim_head, scale, eps, interpret, res, g)
        g = grads[0]
        dlayers.append(tuple(grads[1:]))
    return g, tuple(reversed(dlayers))


_fused_stack.defvjp(_fused_stack_fwd, _fused_stack_bwd)


def fused_transformer_stack(
    x,
    layers,
    *,
    heads: int,
    dim_head: int,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: bool = False,
):
    """``len(layers)`` consecutive pre-norm transformer layers in ONE Pallas
    call (reference vit.py:66-83 loop, several iterations per kernel).

    ``layers`` is a sequence of per-layer weight tuples
    ``(w_qkv, b_qkv, w_out, b_out, ln1s, ln1b, ln2s, ln2b, w1, b1, w2, b2)``
    (the differentiable operand order of :func:`fused_transformer_layer`;
    the optional biases must be uniformly present or absent across layers).
    All layers' weights stay resident in VMEM and each (ips, n, dim) batch
    block runs through every layer before returning to HBM — eliminating
    the inter-layer x/out round-trips and per-call launch overhead.
    Callers size the group with :func:`whole_layer_stack_group`."""
    if scale is None:
        scale = dim_head**-0.5
    layers = tuple(tuple(lw) for lw in layers)
    if len(layers) == 1:
        return _fused_layer(
            x, *layers[0], heads, dim_head, float(scale), eps, interpret
        )
    with_bqkv = layers[0][1] is not None
    with_bout = layers[0][3] is not None
    for lw in layers[1:]:
        if (lw[1] is not None) != with_bqkv or (lw[3] is not None) != with_bout:
            raise ValueError(
                "fused_transformer_stack: optional biases must be uniformly "
                "present or absent across the stacked layers"
            )
    return _fused_stack(
        x, layers, heads, dim_head, float(scale), eps, interpret
    )


def fused_attention_block(
    x,
    residual,
    w_qkv,
    w_out,
    ln_scale,
    ln_bias,
    *,
    heads: int,
    dim_head: int,
    b_qkv=None,
    b_out=None,
    gamma_q=None,
    gamma_k=None,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
):
    """residual + OutProj(Attention(LN(x) @ Wqkv)) as one kernel.

    ``gamma_q``/``gamma_k``: optional per-head qk-RMSNorm gammas, any shape
    reshapeable to (heads, dim_head) — e.g. the module's (heads, 1, dim_head)
    params (reference na_vit.py:93-103).  With qk-norm the default ``scale``
    is 1.0 (the sqrt(dh) factor lives inside the norm); both the forward
    and the Pallas backward recompute the RMSNorms in-kernel (round 4), so
    qk-norm composes with kernel-tier dropout.

    ``use_pallas=None`` auto-selects: Pallas on TPU when supported, XLA
    composite otherwise (CPU tests, unsupported shapes/dtypes).
    ``interpret=True`` runs the Pallas kernel in interpreter mode (CPU
    kernel-equivalence tests; not available with dropout — the TPU PRNG has
    no interpreter lowering).

    ``dropout_rate`` > 0 applies train-time dropout INSIDE the kernel via
    the TPU PRNG at both reference sites (post-softmax matrix, vit.py:60,
    and after the out projection, vit.py:47-49), deterministically seeded
    by ``dropout_seed`` so the Pallas backward regenerates identical masks
    (SURVEY §7.1a "dropout via threaded RNG").
    """
    if (gamma_q is None) != (gamma_k is None):
        raise ValueError("gamma_q and gamma_k must be given together")
    if gamma_q is not None:
        gamma_q = gamma_q.reshape(heads, dim_head)
        gamma_k = gamma_k.reshape(heads, dim_head)
    if scale is None:
        scale = 1.0 if gamma_q is not None else dim_head**-0.5
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    if use_pallas is None:
        from .attention import on_tpu

        use_pallas = on_tpu() and fused_block_supported(
            x.shape, x.dtype, heads, dim_head, x.shape[-1]
        )
    if not use_pallas and not interpret:
        if dropout_rate > 0.0:
            raise ValueError(
                "kernel-tier dropout has no XLA-composite equivalent (the "
                "masks live in the TPU PRNG) — gate on fused_block_supported "
                "+ fused_dropout_supported before requesting it"
            )
        return _xla_reference(
            x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
            gamma_q, gamma_k,
            heads=heads, dim_head=dim_head, scale=float(scale), eps=eps,
        )
    if dropout_rate > 0.0:
        if interpret:
            raise ValueError(
                "fused dropout needs the TPU PRNG, which has no interpreter "
                "lowering — run dropout tests on the chip (see the "
                "dropout_masks helper for mask replay)"
            )
        if not fused_dropout_supported(x.shape, heads, dim_head):
            # without this, the backward would bypass the VMEM-fallback
            # guard (it cannot replay the PRNG masks through the XLA
            # composite) and die with an opaque Mosaic scoped-VMEM error
            raise ValueError(
                "fused dropout at this shape would exceed the Pallas "
                "backward's VMEM budget and the XLA fallback cannot replay "
                "the in-kernel PRNG masks — gate on fused_dropout_supported"
            )
    seed = (
        jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        if dropout_rate > 0.0
        else jnp.zeros((1, 1), jnp.int32)
    )
    return _fused(
        x, residual, w_qkv, b_qkv, w_out, b_out, ln_scale, ln_bias,
        gamma_q, gamma_k, seed,
        heads, dim_head, float(scale), eps, interpret, float(dropout_rate),
    )
