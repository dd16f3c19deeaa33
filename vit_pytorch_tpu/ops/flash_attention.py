"""Pallas TPU flash attention with segment-id (packed-sequence) masking.

Forward: online-softmax tiles sized for the MXU — grid (batch·heads,
q_tiles, kv_tiles) with the kv axis innermost/sequential carrying running
max / sum / fp32 accumulator in VMEM scratch.  Optionally emits the
log-sum-exp needed by the backward.

Backward: full Pallas kernels (the (n, m) attention matrix NEVER touches
HBM in either direction — this is what makes ViT-B training at batch 1024
fit on one v5e chip, where the XLA backward's materialized matrix OOMs):

* ``delta = rowsum(dO ∘ O)`` — one cheap XLA reduction.
* dq kernel: grid (bh, q_tiles, kv_tiles); per tile recomputes
  ``p = exp(q·kᵀ·scale − lse)``, forms ``ds = p ∘ (dO·vᵀ − delta)`` and
  accumulates ``dq += scale · ds · k``.
* dk/dv kernel: grid (bh, kv_tiles, q_tiles); accumulates
  ``dv += pᵀ·dO`` and ``dk += scale · dsᵀ·q``.

Both support segment ids (block-diagonal NaViT masking, reference
na_vit.py:335-337) and causal masking with tile-level skipping.  An additive
bias falls back to the rematerialized XLA backward (bias models use tiny
windows where XLA is already fine).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Block-size policy (v5e sweep at 16×2048-token NaViT-B training packs,
# docs/PERF_NOTES.md round 5): 256→503 ms, 512→345 ms, 1024→316 ms/step;
# non-dividing sizes (384/768) pad the sequence and OOM'd, ≥2048 failed to
# compile.  Default: 1024 when it divides the sequence, else 512.
# Env overrides exist for hardware sweeps only.


def _env_block(name: str):
    """Validated block-size env override: tile masking assumes positive
    multiples of 128, and a malformed value would otherwise crash deep
    inside a kernel trace, far from the setting.  Returns None when unset
    (adaptive per-shape default applies)."""
    raw = os.environ.get(name)
    if raw is None:
        return None
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"{name} must be an integer multiple of 128, got {raw!r}"
        ) from None
    if val <= 0 or val % 128 != 0:
        raise ValueError(f"{name} must be a positive multiple of 128, got {val}")
    return val


DEFAULT_BLOCK_Q = _env_block("VIT_TPU_FLASH_BLOCK_Q")
DEFAULT_BLOCK_K = _env_block("VIT_TPU_FLASH_BLOCK_K")


def default_blocks(n: int, m: int):
    """(block_q, block_k) for a (n, m) attention problem: the env override
    wins; otherwise 1024 where it divides the sequence (measured +9.3% at
    2048-token packs), else the 512 all-rounder.  One definition shared by
    flash_attention and flash_dropout_masks so mask replay stays aligned."""
    bq = DEFAULT_BLOCK_Q or (1024 if n % 1024 == 0 else 512)
    bk = DEFAULT_BLOCK_K or (1024 if m % 1024 == 0 else 512)
    return bq, bk

_NEG_INF = -1e30
_LANES = 128


def _cdiv(a, b):
    return -(-a // b)


def _tile_keep(seed, tile_id, shape, rate: float):
    """Per-tile dropout keep mask on the TPU PRNG.  Seeded by
    (seed, tile_id) where tile_id packs (batch·head, q_tile, kv_tile), so
    the forward and BOTH backward kernels — whose grids order the tile axes
    differently — regenerate identical masks, independent of grid
    iteration order ('parallel' dimension semantics included).  Tile shapes
    are always (block_q, block_k) = (8,128)-aligned, which Mosaic's PRNG
    lowering requires."""
    # the rate→uint32 threshold is the fwd/bwd mask-replay contract shared
    # with the fused-block kernel tier — ONE definition for both
    from .fused_block import _dropout_threshold

    pltpu.prng_seed(seed, tile_id)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= _dropout_threshold(rate)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _dot_precision(dtype):
    """Precision for the MXU dots inside these kernels — same rule (and
    rationale) as fused_block._kernel_dot_precision: bf16 operands must
    contract at DEFAULT precision or Mosaic rejects the kernel with "Bad
    lhs type" when the ambient jax_default_matmul_precision is "highest"
    (the CPU parity harness sets that globally); f32 operands keep the
    ambient setting so interpreter-mode equivalence tests stay exact."""
    from .fused_block import _kernel_dot_precision

    return _kernel_dot_precision(dtype)


# ---------------------------------------------------------------------------
# qk RMSNorm (reference na_vit.py:93-103) — fused into the kernels
# ---------------------------------------------------------------------------


def rms_norm(x, gamma):
    """The reference's per-head qk RMSNorm: l2-normalize the head dim, scale
    by learned gamma × sqrt(d).  ``x``: (..., d); ``gamma`` broadcasts (the
    param tree stores (heads, 1, d)).  ONE definition shared by the XLA
    dispatch path, the flash kernels' host-side VJP epilogue, and (same
    math, tile-local) the in-kernel normalization below."""
    d = x.shape[-1]
    normed = x * jax.lax.rsqrt(
        jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12
    )
    return normed * gamma * (d**0.5)


def _rms_tile(x, gamma_row):
    """In-kernel tile RMSNorm: x (rows, d) any dtype, gamma_row (1, d) f32.
    Statistics in f32, result cast back to x.dtype so the MXU matmul stays
    bf16 when the inputs are (matching the XLA path's rounding)."""
    x32 = x.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True) + 1e-12)
    d_root = float(x.shape[-1]) ** 0.5
    return (x32 * r * (gamma_row * d_root)).astype(x.dtype)


# ---------------------------------------------------------------------------
# shared tile masking
# ---------------------------------------------------------------------------


def _tile_mask(qi, kj, block_q, block_k, kv_len, causal, has_segs, qseg_ref, kseg_ref):
    """Returns the boolean tile mask (or None)."""
    mask = None
    col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    if kv_len % block_k != 0 or has_segs:
        mask = col < kv_len
    if has_segs:
        qseg = qseg_ref[0][:, :1]  # (block_q, 1) lane-broadcast layout
        kseg = kseg_ref[0][:1, :]  # (1, block_k) sublane-broadcast layout
        seg_ok = (qseg == kseg) & (qseg >= 0) & (kseg >= 0)
        mask = seg_ok if mask is None else (mask & seg_ok)
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        cm = col <= row
        mask = cm if mask is None else (mask & cm)
    return mask


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _seg_overlap(qseg_ref, kseg_ref):
    """Scalar tile-skip test: can ANY (q, k) pair in this tile share a
    segment?  Range-overlap on the blocks' segment ids (ignoring -1 padding)
    is conservative for arbitrary layouts and exact for packed sequences,
    whose ids are monotonic (ops/packing.py appends images in order) — this
    is the block-sparse skip of cross-segment tiles (SURVEY §5 long-context):
    at NaViT's max_seq_len=2048 most tiles are fully off-diagonal and their
    matmuls never issue."""
    qseg = qseg_ref[0][:, :1]
    kseg = kseg_ref[0][:1, :]
    big = jnp.int32(2**30)
    qmax = jnp.max(qseg)
    kmax = jnp.max(kseg)
    qmin = jnp.min(jnp.where(qseg >= 0, qseg, big))
    kmin = jnp.min(jnp.where(kseg >= 0, kseg, big))
    return (qmax >= 0) & (kmax >= 0) & (qmin <= kmax) & (kmin <= qmax)


def _run_guard(body, conds):
    """Run ``body`` under pl.when(all conds); plain call when unconditional."""
    if not conds:
        body()
        return
    cond = conds[0]
    for c in conds[1:]:
        cond = cond & c
    pl.when(cond)(body)


def _fwd_kernel(
    seed_ref, q_ref, k_ref, v_ref, gq_ref, gk_ref, bias_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale, causal, block_q, block_k, kv_len, has_bias, has_segs, save_lse,
    dropout_rate=0.0, nq_tiles=0, nk_tiles=0,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    conds = []
    if causal:
        conds.append((kj * block_k) <= (qi * block_q + block_q - 1))
    if has_segs:
        conds.append(_seg_overlap(qseg_ref, kseg_ref))

    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        if gq_ref is not None:
            # qk RMSNorm fused into the kernel (reference na_vit.py:93-103):
            # VPU work recomputed per tile — q/k never round-trip HBM
            # normalized (the round-4 XLA path spent an extra read+write of
            # each on the standalone norm)
            q = _rms_tile(q, gq_ref[0])
            k = _rms_tile(k, gk_ref[0])

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype)
        ) * scale
        if has_bias:
            s = s + bias_ref[0].astype(jnp.float32)

        mask = _tile_mask(
            qi, kj, block_q, block_k, kv_len, causal, has_segs, qseg_ref, kseg_ref
        )
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scratch[:]
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        alpha = jnp.exp(m_prev - m_new)
        # the softmax denominator accumulates the UNDROPPED p (dropout
        # applies to the normalized matrix, reference vit.py:60); only the
        # value accumulation sees the mask
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        if dropout_rate > 0.0:
            tid = (pl.program_id(0) * nq_tiles + qi) * nk_tiles + kj
            keep = _tile_keep(
                seed_ref[0, 0], tid, (block_q, block_k), dropout_rate
            )
            p = jnp.where(keep, p, 0.0)

        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    _run_guard(_body, conds)

    @pl.when(kj == nk - 1)
    def _finish():
        l = l_scratch[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        inv_keep = 1.0 / (1.0 - dropout_rate) if dropout_rate > 0.0 else 1.0
        o_ref[0] = (acc_scratch[:] * (inv_keep / safe_l)).astype(o_ref.dtype)
        if save_lse:
            lse = m_scratch[:] + jnp.log(safe_l)
            lse_ref[0] = jnp.broadcast_to(lse, (block_q, _LANES))


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(
    seed_ref, q_ref, k_ref, v_ref, gq_ref, gk_ref, do_ref, lse_ref, delta_ref,
    qseg_ref, kseg_ref,
    dq_ref,
    dq_scratch,
    *, scale, causal, block_q, block_k, kv_len, has_segs,
    dropout_rate=0.0, nq_tiles=0, nk_tiles=0,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        dq_scratch[:] = jnp.zeros_like(dq_scratch)

    conds = []
    if causal:
        conds.append((kj * block_k) <= (qi * block_q + block_q - 1))
    if has_segs:
        conds.append(_seg_overlap(qseg_ref, kseg_ref))

    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        if gq_ref is not None:
            # recompute the fused qk-norm; the emitted gradient is w.r.t.
            # the NORMALIZED q — the host-side epilogue (_bwd) closes the
            # RMSNorm VJP (raw dq + dgamma) in one cheap XLA pass
            q = _rms_tile(q, gq_ref[0])
            k = _rms_tile(k, gk_ref[0])
        do = do_ref[0]
        lse = lse_ref[0][:, :1]      # (block_q, 1)
        delta = delta_ref[0][:, :1]  # (block_q, 1)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype)
        ) * scale
        mask = _tile_mask(
            qi, kj, block_q, block_k, kv_len, causal, has_segs, qseg_ref, kseg_ref
        )
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype)
        )
        if dropout_rate > 0.0:
            # d softmax rides the dropout mask; the flash trick
            # delta = rowsum(dO∘O) REMAINS exact under dropout because
            # Σ_k dp_k·pd_k = dO·O (O already accumulates the masked pd)
            tid = (pl.program_id(0) * nq_tiles + qi) * nk_tiles + kj
            keep = _tile_keep(
                seed_ref[0, 0], tid, (block_q, block_k), dropout_rate
            )
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_rate))
        ds = p * (dp - delta)

        dq_scratch[:] = dq_scratch[:] + scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )

    _run_guard(_body, conds)

    @pl.when(kj == nk - 1)
    def _finish():
        dq_ref[0] = dq_scratch[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    seed_ref, q_ref, k_ref, v_ref, gq_ref, gk_ref, do_ref, lse_ref, delta_ref,
    qseg_ref, kseg_ref,
    dk_ref, dv_ref,
    dk_scratch, dv_scratch,
    *, scale, causal, block_q, block_k, kv_len, has_segs,
    dropout_rate=0.0, nq_tiles=0, nk_tiles=0,
):
    kj = pl.program_id(1)
    qi = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    conds = []
    if causal:
        # q rows in this tile can only contribute if some row >= first k col
        conds.append((qi * block_q + block_q - 1) >= (kj * block_k))
    if has_segs:
        conds.append(_seg_overlap(qseg_ref, kseg_ref))

    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        if gq_ref is not None:
            q = _rms_tile(q, gq_ref[0])
            k = _rms_tile(k, gk_ref[0])
        do = do_ref[0]
        lse = lse_ref[0][:, :1]
        delta = delta_ref[0][:, :1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype)
        ) * scale
        mask = _tile_mask(
            qi, kj, block_q, block_k, kv_len, causal, has_segs, qseg_ref, kseg_ref
        )
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        p = jnp.exp(s - lse)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        if dropout_rate > 0.0:
            tid = (pl.program_id(0) * nq_tiles + qi) * nk_tiles + kj
            keep = _tile_keep(
                seed_ref[0, 0], tid, (block_q, block_k), dropout_rate
            )
            inv = 1.0 / (1.0 - dropout_rate)
            pd = jnp.where(keep, p, 0.0) * inv
        else:
            keep = None
            pd = p

        # dv += pd^T @ do  (the VALUE path sees the dropped matrix)
        dv_scratch[:] = dv_scratch[:] + jax.lax.dot_general(
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )

        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype)
        )
        if keep is not None:
            dp = jnp.where(keep, dp, 0.0) * inv
        ds = p * (dp - delta)

        # dk += scale * ds^T @ q
        dk_scratch[:] = dk_scratch[:] + scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(q.dtype),
        )

    _run_guard(_body, conds)

    @pl.when(qi == nq - 1)
    def _finish():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# host-side plumbing
# ---------------------------------------------------------------------------


def _prep(q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k):
    b, h, n, d = q.shape
    m = k.shape[2]
    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))
    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))).reshape(b * h, n_pad, d)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m), (0, 0))).reshape(b * h, m_pad, d)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - m), (0, 0))).reshape(b * h, m_pad, d)

    seg_inputs, seg_specs_q, seg_specs_k = None, None, None
    if q_segment_ids is not None:
        qs = jnp.pad(q_segment_ids, ((0, 0), (0, n_pad - n)), constant_values=-1)
        ks = jnp.pad(kv_segment_ids, ((0, 0), (0, m_pad - m)), constant_values=-1)
        qs = jnp.broadcast_to(qs[:, :, None], (b, n_pad, _LANES))
        ks = jnp.broadcast_to(ks[:, None, :], (b, 8, m_pad))
        seg_inputs = (qs, ks)
    return qp, kp, vp, seg_inputs, block_q, block_k, n_pad, m_pad


def _seg_specs(h, block_q, block_k, q_axis, k_axis):
    """Block specs for the lane/sublane-broadcast segment-id layouts.
    ``q_axis``/``k_axis`` give which grid axis indexes the q/k tiles."""

    def q_map(g, i, j, h=h):
        idx = (i, j)[q_axis]
        return (jax.lax.div(g, jnp.int32(h)), idx, 0)

    def k_map(g, i, j, h=h):
        idx = (i, j)[k_axis]
        return (jax.lax.div(g, jnp.int32(h)), 0, idx)

    return (
        pl.BlockSpec((1, block_q, _LANES), q_map),
        pl.BlockSpec((1, 8, block_k), k_map),
    )


def _gamma_specs_inputs(gamma_q, gamma_k, h, d):
    """(h, 1, d) f32 gamma rows + block specs picking the grid step's head
    (grid axis 0 is batch·heads ⇒ head = g % h) — one (1, 1, d) row in VMEM
    per step, never broadcast over batch in HBM.  The middle singleton keeps
    the trailing two block dims equal to the array's (Mosaic's block-shape
    rule for non-(8,128)-multiples)."""
    rows = []
    for gamma in (gamma_q, gamma_k):
        rows.append(jnp.asarray(gamma, jnp.float32).reshape(h, 1, d))
    spec = pl.BlockSpec((1, 1, d), lambda g, i, j: (g % h, 0, 0))
    return [spec, spec], rows


def _flash_forward(
    q, k, v, bias, q_segment_ids, kv_segment_ids,
    scale, causal, block_q, block_k, interpret, save_lse=False,
    dropout_rate=0.0, dropout_seed=None, gamma_q=None, gamma_k=None,
):
    b, h, n, d = q.shape
    m = k.shape[2]
    qp, kp, vp, segs, block_q, block_k, n_pad, m_pad = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k
    )
    bh = b * h
    grid = (bh, n_pad // block_q, m_pad // block_k)
    has_bias = bias is not None
    has_segs = segs is not None
    has_qknorm = gamma_q is not None
    with_dropout = dropout_rate > 0.0

    in_specs = []
    inputs = []
    if with_dropout:
        in_specs.append(
            pl.BlockSpec((1, 1), lambda g, i, j: (0, 0), memory_space=pltpu.SMEM)
        )
        inputs.append(jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1))
    in_specs += [
        pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
    ]
    inputs += [qp, kp, vp]
    if has_qknorm:
        g_specs, g_rows = _gamma_specs_inputs(gamma_q, gamma_k, h, d)
        in_specs += g_specs
        inputs += g_rows

    if has_bias:
        # do NOT broadcast over (b, h) in HBM — a (1, h, n, m) rel-pos bias
        # would blow up b-fold.  Keep the unique rows and pick the right one
        # per grid step via the index map (grid g = batch*h + head).
        if bias.ndim != 4 or bias.shape[2:] != (n, m):
            raise ValueError(
                f"flash attention bias must have shape (b|1, h|1, {n}, {m}); "
                f"got {bias.shape}"
            )
        b_b, h_b = bias.shape[:2]
        if b_b not in (1, b) or h_b not in (1, h):
            raise ValueError(
                f"flash attention bias leading dims must broadcast against "
                f"(b={b}, h={h}); got {bias.shape[:2]}"
            )
        bias_rows = bias.reshape(b_b * h_b, n, m)
        bias_rows = jnp.pad(bias_rows, ((0, 0), (0, n_pad - n), (0, m_pad - m)))
        if b_b == 1 and h_b == 1:
            bias_idx = lambda g: 0
        elif b_b == 1:
            bias_idx = lambda g: g % h
        elif h_b == 1:
            bias_idx = lambda g: g // h
        else:
            bias_idx = lambda g: g
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda g, i, j: (bias_idx(g), i, j))
        )
        inputs.append(bias_rows)
    if has_segs:
        qspec, kspec = _seg_specs(h, block_q, block_k, q_axis=0, k_axis=1)
        in_specs += [qspec, kspec]
        inputs += list(segs)

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=m, has_bias=has_bias, has_segs=has_segs, save_lse=save_lse,
        dropout_rate=dropout_rate,
        nq_tiles=n_pad // block_q, nk_tiles=m_pad // block_k,
    )

    def dispatch(*refs):
        it = iter(refs[: len(in_specs)])
        seed_r = next(it) if with_dropout else None
        q_r, k_r, v_r = next(it), next(it), next(it)
        gq_r = next(it) if has_qknorm else None
        gk_r = next(it) if has_qknorm else None
        b_r = next(it) if has_bias else None
        qs_r = next(it) if has_segs else None
        ks_r = next(it) if has_segs else None
        outs = refs[len(in_specs):]
        if save_lse:
            o_r, lse_r = outs[0], outs[1]
            scratch = outs[2:]
        else:
            o_r, lse_r = outs[0], None
            scratch = outs[1:]
        kernel(
            seed_r, q_r, k_r, v_r, gq_r, gk_r, b_r, qs_r, ks_r,
            o_r, lse_r, *scratch,
        )

    out_shapes = [jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)]
    out_specs = [pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0))]
    if save_lse:
        out_shapes.append(jax.ShapeDtypeStruct((bh, n_pad, _LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block_q, _LANES), lambda g, i, j: (g, i, 0))
        )

    outs = pl.pallas_call(
        dispatch,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shapes if save_lse else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    if save_lse:
        out, lse = outs
        return (
            out.reshape(b, h, n_pad, d)[:, :, :n, :],
            lse,  # padded lane-broadcast form, kept for the backward
        )
    return outs.reshape(b, h, n_pad, d)[:, :, :n, :]


def _flash_backward(
    q, k, v, q_segment_ids, kv_segment_ids, out, lse_padded, g,
    scale, causal, block_q, block_k, interpret,
    dropout_rate=0.0, dropout_seed=None, gamma_q=None, gamma_k=None,
):
    """With ``gamma_q``/``gamma_k`` the kernels recompute the fused qk-norm
    and the returned dq/dk are w.r.t. the NORMALIZED q/k (the caller closes
    the RMSNorm VJP — see ``_bwd``)."""
    b, h, n, d = q.shape
    m = k.shape[2]
    qp, kp, vp, segs, block_q, block_k, n_pad, m_pad = _prep(
        q, k, v, q_segment_ids, kv_segment_ids, block_q, block_k
    )
    bh = b * h
    has_segs = segs is not None
    has_qknorm = gamma_q is not None
    with_dropout = dropout_rate > 0.0
    if has_qknorm:
        gamma_specs, gamma_rows = _gamma_specs_inputs(gamma_q, gamma_k, h, d)
    else:
        gamma_specs, gamma_rows = [], []

    gp = jnp.pad(g, ((0, 0), (0, 0), (0, n_pad - n), (0, 0))).reshape(bh, n_pad, d)

    # delta = rowsum(dO * O), lane-broadcast padded layout
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (b, h, n)
    delta = jnp.pad(delta, ((0, 0), (0, 0), (0, n_pad - n))).reshape(bh, n_pad)
    delta = jnp.broadcast_to(delta[:, :, None], (bh, n_pad, _LANES))

    # gammas ride between v and dO — same order as the kernel signatures
    common_inputs = [qp, kp, vp] + gamma_rows + [gp, lse_padded, delta]
    seed_arr = (
        jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1) if with_dropout else None
    )
    seed_spec = pl.BlockSpec((1, 1), lambda g_, i, j: (0, 0), memory_space=pltpu.SMEM)
    drop_kw = dict(
        dropout_rate=dropout_rate,
        nq_tiles=n_pad // block_q,
        nk_tiles=m_pad // block_k,
    )

    def base_specs(q_axis, k_axis):
        return [
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, (i, j)[q_axis], 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, (i, j)[k_axis], 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, i, j: (g_, (i, j)[k_axis], 0)),
        ] + gamma_specs + [
            pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, (i, j)[q_axis], 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda g_, i, j: (g_, (i, j)[q_axis], 0)),
            pl.BlockSpec((1, block_q, _LANES), lambda g_, i, j: (g_, (i, j)[q_axis], 0)),
        ]

    # ---- dq: grid (bh, q_tiles, kv_tiles) ----
    in_specs = ([seed_spec] if with_dropout else []) + base_specs(q_axis=0, k_axis=1)
    inputs = ([seed_arr] if with_dropout else []) + list(common_inputs)
    if has_segs:
        qspec, kspec = _seg_specs(h, block_q, block_k, q_axis=0, k_axis=1)
        in_specs += [qspec, kspec]
        inputs += list(segs)

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=m, has_segs=has_segs, **drop_kw,
    )

    def _unpack_common(it):
        q_r, k_r, v_r = next(it), next(it), next(it)
        gq_r = next(it) if has_qknorm else None
        gk_r = next(it) if has_qknorm else None
        return [q_r, k_r, v_r, gq_r, gk_r, next(it), next(it), next(it)]

    def dq_dispatch(*refs):
        it = iter(refs[: len(in_specs)])
        seed_r = next(it) if with_dropout else None
        args = _unpack_common(it)
        qs_r = next(it) if has_segs else None
        ks_r = next(it) if has_segs else None
        dq_r, scratch = refs[len(in_specs)], refs[len(in_specs) + 1]
        dq_kernel(seed_r, *args, qs_r, ks_r, dq_r, scratch)

    dq = pl.pallas_call(
        dq_dispatch,
        grid=(bh, n_pad // block_q, m_pad // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda g_, i, j: (g_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    # ---- dk/dv: grid (bh, kv_tiles, q_tiles) ----
    in_specs = ([seed_spec] if with_dropout else []) + base_specs(q_axis=1, k_axis=0)
    inputs = ([seed_arr] if with_dropout else []) + list(common_inputs)
    if has_segs:
        qspec, kspec = _seg_specs(h, block_q, block_k, q_axis=1, k_axis=0)
        in_specs += [qspec, kspec]
        inputs += list(segs)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=m, has_segs=has_segs, **drop_kw,
    )

    def dkv_dispatch(*refs):
        it = iter(refs[: len(in_specs)])
        seed_r = next(it) if with_dropout else None
        args = _unpack_common(it)
        qs_r = next(it) if has_segs else None
        ks_r = next(it) if has_segs else None
        dk_r, dv_r = refs[len(in_specs)], refs[len(in_specs) + 1]
        dk_s, dv_s = refs[len(in_specs) + 2], refs[len(in_specs) + 3]
        dkv_kernel(seed_r, *args, qs_r, ks_r, dk_r, dv_r, dk_s, dv_s)

    dk, dv = pl.pallas_call(
        dkv_dispatch,
        grid=(bh, m_pad // block_k, n_pad // block_q),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda g_, j, i: (g_, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, m_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, m_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)

    dq = dq.reshape(b, h, n_pad, d)[:, :, :n, :]
    dk = dk.reshape(b, h, m_pad, d)[:, :, :m, :]
    dv = dv.reshape(b, h, m_pad, d)[:, :, :m, :]
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------


def _reference_attention(q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal):
    from .attention import build_segment_mask, xla_attention

    mask = build_segment_mask(
        q_segment_ids, kv_segment_ids, q.shape[2], k.shape[2], causal=causal
    )
    return xla_attention(q, k, v, scale=scale, bias=bias, mask=mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def _flash_attention_core(
    q, k, v, bias, gamma_q, gamma_k, q_segment_ids, kv_segment_ids, seed,
    scale, causal, block_q, block_k, interpret, dropout_rate
):
    return _flash_forward(
        q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal, block_q, block_k, interpret,
        dropout_rate=dropout_rate, dropout_seed=seed,
        gamma_q=gamma_q, gamma_k=gamma_k,
    )


def _fwd(q, k, v, bias, gamma_q, gamma_k, q_segment_ids, kv_segment_ids, seed, scale, causal, block_q, block_k, interpret, dropout_rate):
    if bias is None:
        out, lse = _flash_forward(
            q, k, v, None, q_segment_ids, kv_segment_ids,
            scale, causal, block_q, block_k, interpret, save_lse=True,
            dropout_rate=dropout_rate, dropout_seed=seed,
            gamma_q=gamma_q, gamma_k=gamma_k,
        )
        return out, (q, k, v, bias, gamma_q, gamma_k, q_segment_ids, kv_segment_ids, seed, out, lse)
    out = _flash_forward(
        q, k, v, bias, q_segment_ids, kv_segment_ids,
        scale, causal, block_q, block_k, interpret,
        dropout_rate=dropout_rate, dropout_seed=seed,
        gamma_q=gamma_q, gamma_k=gamma_k,
    )
    return out, (q, k, v, bias, gamma_q, gamma_k, q_segment_ids, kv_segment_ids, seed, None, None)


def _bwd(scale, causal, block_q, block_k, interpret, dropout_rate, residuals, g):
    q, k, v, bias, gamma_q, gamma_k, qs, ks, seed, out, lse = residuals
    seed_ct = np.zeros(np.shape(seed), dtype=jax.dtypes.float0)

    if bias is None:
        dq, dk, dv = _flash_backward(
            q, k, v, qs, ks, out, lse, g, scale, causal, block_q, block_k, interpret,
            dropout_rate=dropout_rate, dropout_seed=seed,
            gamma_q=gamma_q, gamma_k=gamma_k,
        )
        dgq = dgk = None
        if gamma_q is not None:
            # the kernels emitted dq/dk w.r.t. the NORMALIZED q/k; close the
            # RMSNorm VJP here — one fused elementwise pass over q and k
            # plus the tiny (h, 1, d) dgamma reductions
            # f32 primals so the VJP's statistics match the kernels' f32
            # in-tile recompute (_rms_tile)
            _, q_vjp = jax.vjp(
                rms_norm, q.astype(jnp.float32), gamma_q.astype(jnp.float32)
            )
            dq, dgq = q_vjp(dq.astype(jnp.float32))
            _, k_vjp = jax.vjp(
                rms_norm, k.astype(jnp.float32), gamma_k.astype(jnp.float32)
            )
            dk, dgk = k_vjp(dk.astype(jnp.float32))
            dq = dq.astype(q.dtype)
            dk = dk.astype(k.dtype)
            dgq = dgq.astype(gamma_q.dtype)
            dgk = dgk.astype(gamma_k.dtype)
        return dq, dk, dv, None, dgq, dgk, None, None, seed_ct

    # bias present: rematerialized XLA backward (small-window models; the
    # dispatcher never routes bias+dropout here — the XLA composite cannot
    # replay the kernel PRNG masks)
    assert dropout_rate == 0.0, "flash dropout is unsupported with bias"
    assert gamma_q is None, "fused qk-norm is unsupported with bias"

    def f(q, k, v, bias):
        return _reference_attention(q, k, v, bias, qs, ks, scale, causal)

    # jax.vjp returns the cotangent in the primal's shape — broadcast dims
    # of a (1, h, n, m) bias are already summed by the vjp itself
    dq, dk, dv, dbias = jax.vjp(f, q, k, v, bias)[1](g)
    return dq, dk, dv, dbias, None, None, None, None, seed_ct


_flash_attention_core.defvjp(_fwd, _bwd)


def flash_dropout_masks(
    seed, b: int, h: int, n: int, m: int, rate: float,
    block_q: Optional[int] = None, block_k: Optional[int] = None,
):
    """Replay the flash kernels' per-tile dropout keep-masks (TPU only) —
    equivalence testing: compose with the XLA reference and compare against
    the kernel with the same seed.  Returns (b, h, n, m) int32 0/1."""
    if block_q is None or block_k is None:
        dq, dk = default_blocks(n, m)
        block_q = dq if block_q is None else block_q
        block_k = dk if block_k is None else block_k
    # mirror _prep's block shrinking exactly — tile ids must line up
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(m, 128))
    n_pad = _round_up(n, bq)
    m_pad = _round_up(m, bk)
    bh = b * h
    nq, nk = n_pad // bq, m_pad // bk

    def kernel(seed_ref, o_ref):
        g = pl.program_id(0)
        qi = pl.program_id(1)
        kj = pl.program_id(2)
        tid = (g * nq + qi) * nk + kj
        o_ref[0] = _tile_keep(seed_ref[0, 0], tid, (bq, bk), rate).astype(jnp.int32)

    keep = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[pl.BlockSpec((1, 1), lambda g, i, j: (0, 0), memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, bq, bk), lambda g, i, j: (g, i, j)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, m_pad), jnp.int32),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1))
    return keep.reshape(b, h, n_pad, m_pad)[:, :, :n, :m]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    gamma_q: Optional[jnp.ndarray] = None,
    gamma_k: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed=None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention.  q: (b, h, n, d), k/v: (b, h, m, d) → (b, h, n, d).

    ``gamma_q``/``gamma_k``: optional per-head qk-RMSNorm gammas (any shape
    reshaping to (h, d); the param tree stores (h, 1, d)).  When given, the
    reference's qk RMSNorm (na_vit.py:93-103) runs INSIDE all three kernels
    (f32 statistics, recomputed per tile) instead of as a separate XLA pass
    that round-trips normalized q/k through HBM.  Callers pass scale=1.0
    with qk-norm (na_vit.py:161-166).  Incompatible with ``bias`` (that
    backward is an XLA rematerialization fed raw q/k).

    ``dropout_rate`` > 0 applies train-time dropout to the (normalized)
    attention matrix INSIDE the kernels via the TPU PRNG seeded per
    (batch·head, q_tile, kv_tile) — the backward kernels regenerate
    identical masks (SURVEY §7.1a).  TPU only (no interpreter lowering for
    the PRNG) and incompatible with ``bias`` (its backward is an XLA
    rematerialization that cannot replay the masks)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if block_q is None or block_k is None:
        dq, dk = default_blocks(q.shape[-2], k.shape[-2])
        block_q = dq if block_q is None else block_q
        block_k = dk if block_k is None else block_k
    if interpret is None:
        from .attention import on_tpu

        interpret = not on_tpu()
    if (gamma_q is None) != (gamma_k is None):
        raise ValueError("qk-norm gammas must be given for both q and k")
    if gamma_q is not None and bias is not None:
        raise ValueError("fused qk-norm is unsupported with bias")
    if dropout_rate > 0.0:
        if dropout_seed is None:
            raise ValueError("dropout_rate > 0 requires dropout_seed")
        if bias is not None:
            raise ValueError("flash dropout is unsupported with bias")
        if interpret:
            raise ValueError(
                "flash dropout needs the TPU PRNG (no interpreter lowering)"
            )
    if bias is not None:
        while bias.ndim < 4:
            bias = bias[None]
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("segment ids must be given for both q and kv")
    seed = (
        jnp.asarray(dropout_seed, jnp.int32).reshape(1, 1)
        if dropout_rate > 0.0
        else jnp.zeros((1, 1), jnp.int32)
    )
    return _flash_attention_core(
        q, k, v, bias, gamma_q, gamma_k, q_segment_ids, kv_segment_ids, seed,
        float(scale), causal, block_q, block_k, interpret, float(dropout_rate),
    )
