"""Pallas TPU flash attention with segment-id (packed-sequence) masking.

Online-softmax tiled attention sized for the MXU:

* grid = (batch*heads, q_tiles, kv_tiles); the kv dimension is the innermost,
  sequential ("arbitrary") grid axis and carries running max / running sum /
  fp32 accumulator in VMEM scratch across iterations.
* q/k/v tiles are MXU-aligned (tile sizes multiples of 128 in the lane dim,
  q rows a multiple of the sublane tile for the dtype).
* all matmuls accumulate in fp32 (``preferred_element_type``), inputs may be
  bf16.
* optional additive bias (broadcastable over batch/head — the rel-pos-bias
  tables of MaxViT et al., reference max_vit.py:150-189).
* optional segment ids: int32 (b, n) / (b, m); token i attends j iff
  seg_q[i] == seg_kv[j] and both are >= 0.  This is the TPU-native form of
  NaViT's block-diagonal attn mask (reference na_vit.py:329-342) — tiles whose
  segment ranges cannot overlap are *skipped entirely* (block-sparse).
* causal flag with upper-triangular tile skipping.

Backward pass: custom VJP that recomputes attention with XLA ops (flash
forward + rematerialized backward).  For the sequence lengths in this model
zoo (n <= 4096) the backward is bandwidth-bound either way; rematerialization
keeps residual memory at O(n) like the reference's
``F.scaled_dot_product_attention`` path (na_vit.py:161).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512

_NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _round_up(x, m):
    return _cdiv(x, m) * m


def _flash_kernel(
    q_ref,
    k_ref,
    v_ref,
    bias_ref,
    qseg_ref,
    kseg_ref,
    o_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_len: int,
    has_bias: bool,
    has_segs: bool,
):
    qi = pl.program_id(1)
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    # tile-level skip: causal upper triangle & disjoint segment ranges
    run = True
    if causal:
        run = (kj * block_k) <= (qi * block_q + block_q - 1)

    def _body():
        q = q_ref[0]  # (block_q, d)
        k = k_ref[0]  # (block_k, d)
        v = v_ref[0]

        s = jax.lax.dot_general(
            q,
            k,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * scale

        if has_bias:
            s = s + bias_ref[0].astype(jnp.float32)

        mask = None
        col = kj * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        if kv_len % block_k != 0 or has_segs:
            mask = col < kv_len
        if has_segs:
            qseg = qseg_ref[0][:, :1]  # (block_q, 1) — lane-broadcast layout
            kseg = kseg_ref[0][:1, :]  # (1, block_k) — sublane-broadcast layout
            seg_ok = (qseg == kseg) & (qseg >= 0) & (kseg >= 0)
            mask = seg_ok if mask is None else (mask & seg_ok)
        if causal:
            row = qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cm = col <= row
            mask = cm if mask is None else (mask & cm)
        if mask is not None:
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scratch[:]  # (block_q, 1)
        l_prev = l_scratch[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)

        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    if isinstance(run, bool) and run:
        _body()
    elif not isinstance(run, bool):
        pl.when(run)(_body)

    @pl.when(kj == nk - 1)
    def _finish():
        l = l_scratch[:]
        # fully-masked rows (padding / empty segments) → zero output
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scratch[:] / safe_l).astype(o_ref.dtype)


def _flash_forward(
    q,
    k,
    v,
    bias,
    q_segment_ids,
    kv_segment_ids,
    scale,
    causal,
    block_q,
    block_k,
    interpret,
):
    b, h, n, d = q.shape
    m = k.shape[2]

    block_q = min(block_q, _round_up(n, 128))
    block_k = min(block_k, _round_up(m, 128))

    n_pad = _round_up(n, block_q)
    m_pad = _round_up(m, block_k)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    bh = b * h
    qp = qp.reshape(bh, n_pad, d)
    kp = kp.reshape(bh, m_pad, d)
    vp = vp.reshape(bh, m_pad, d)

    grid = (bh, n_pad // block_q, m_pad // block_k)

    has_bias = bias is not None
    has_segs = q_segment_ids is not None

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, block_k, d), lambda g, i, j: (g, j, 0)),
    ]

    inputs = [qp, kp, vp]

    if has_bias:
        # broadcast bias to (bh, n, m) lazily via index mapping
        bb, bhh = bias.shape[0], bias.shape[1]
        bias_full = jnp.broadcast_to(bias, (b, h, n, m)).reshape(bh, n, m)
        bias_full = jnp.pad(
            bias_full, ((0, 0), (0, n_pad - n), (0, m_pad - m))
        )
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k), lambda g, i, j: (g, i, j))
        )
        inputs.append(bias_full)
    else:
        in_specs.append(None)
        inputs.append(None)

    if has_segs:
        qs = jnp.pad(
            q_segment_ids, ((0, 0), (0, n_pad - n)), constant_values=-1
        )
        ks = jnp.pad(
            kv_segment_ids, ((0, 0), (0, m_pad - m)), constant_values=-1
        )
        # TPU tiling needs the last two block dims aligned to (8, 128):
        # broadcast q ids into lanes (b, n, 128) and kv ids into sublanes
        # (b, 8, m) — the kernel reads one lane / sublane back out.
        qs = jnp.broadcast_to(qs[:, :, None], (b, n_pad, 128))
        ks = jnp.broadcast_to(ks[:, None, :], (b, 8, m_pad))
        # segment ids are shared across heads: index batch as g // h
        # (lax.div — C-style division — keeps the index map a simple jaxpr)
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, 128),
                lambda g, i, j, h=h: (jax.lax.div(g, jnp.int32(h)), i, 0),
            )
        )
        in_specs.append(
            pl.BlockSpec(
                (1, 8, block_k),
                lambda g, i, j, h=h: (jax.lax.div(g, jnp.int32(h)), 0, j),
            )
        )
        inputs.append(qs)
        inputs.append(ks)
    else:
        in_specs.append(None)
        in_specs.append(None)
        inputs.append(None)
        inputs.append(None)

    kernel = functools.partial(
        _flash_kernel,
        scale=scale,
        causal=causal,
        block_q=block_q,
        block_k=block_k,
        kv_len=m,
        has_bias=has_bias,
        has_segs=has_segs,
    )

    # drop unused operand slots
    live_specs = [s for s in in_specs if s is not None]
    live_inputs = [x for x in inputs if x is not None]

    def kernel_dispatch(*refs):
        it = iter(refs[: len(live_specs)])
        q_r = next(it)
        k_r = next(it)
        v_r = next(it)
        b_r = next(it) if has_bias else None
        qs_r = next(it) if has_segs else None
        ks_r = next(it) if has_segs else None
        o_r, m_s, l_s, a_s = refs[len(live_specs):]
        kernel(q_r, k_r, v_r, b_r, qs_r, ks_r, o_r, m_s, l_s, a_s)

    out = pl.pallas_call(
        kernel_dispatch,
        grid=grid,
        in_specs=live_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*live_inputs)

    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def _reference_attention(q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal):
    from .attention import xla_attention

    mask = None
    if q_segment_ids is not None:
        mask = (
            (q_segment_ids[:, :, None] == kv_segment_ids[:, None, :])
            & (q_segment_ids[:, :, None] >= 0)
            & (kv_segment_ids[:, None, :] >= 0)
        )[:, None]
    if causal:
        cm = jnp.tril(jnp.ones((q.shape[2], k.shape[2]), dtype=bool))
        mask = cm if mask is None else mask & cm
    return xla_attention(q, k, v, scale=scale, bias=bias, mask=mask)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10)
)
def _flash_attention_core(
    q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal, block_q, block_k, interpret
):
    return _flash_forward(
        q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal, block_q, block_k, interpret
    )


def _fwd(q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal, block_q, block_k, interpret):
    out = _flash_forward(
        q, k, v, bias, q_segment_ids, kv_segment_ids, scale, causal, block_q, block_k, interpret
    )
    return out, (q, k, v, bias, q_segment_ids, kv_segment_ids)


def _bwd(scale, causal, block_q, block_k, interpret, residuals, g):
    q, k, v, bias, qs, ks = residuals

    def f(q, k, v, bias):
        return _reference_attention(q, k, v, bias, qs, ks, scale, causal)

    if bias is None:

        def f3(q, k, v):
            return _reference_attention(q, k, v, None, qs, ks, scale, causal)

        dq, dk, dv = jax.vjp(f3, q, k, v)[1](g)
        dbias = None
    else:
        dq, dk, dv, dbias_full = jax.vjp(f, q, k, v, bias)[1](g)
        # re-reduce over broadcast dims
        dbias = dbias_full
        reduce_axes = tuple(
            i for i, (s, fs) in enumerate(zip(bias.shape, dbias_full.shape)) if s == 1 and fs != 1
        )
        if reduce_axes:
            dbias = jnp.sum(dbias_full, axis=reduce_axes, keepdims=True)
    return dq, dk, dv, dbias, None, None


_flash_attention_core.defvjp(_fwd, _bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    q_segment_ids: Optional[jnp.ndarray] = None,
    kv_segment_ids: Optional[jnp.ndarray] = None,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Flash attention.  q: (b, h, n, d), k/v: (b, h, m, d) → (b, h, n, d)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if interpret is None:
        from .attention import on_tpu

        interpret = not on_tpu()
    if bias is not None:
        # normalize bias rank to (b|1, h|1, n, m)
        while bias.ndim < 4:
            bias = bias[None]
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError("segment ids must be given for both q and kv")
    return _flash_attention_core(
        q,
        k,
        v,
        bias,
        q_segment_ids,
        kv_segment_ids,
        float(scale),
        causal,
        block_q,
        block_k,
        interpret,
    )
