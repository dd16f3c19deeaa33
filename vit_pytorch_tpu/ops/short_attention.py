"""Single-pass Pallas attention for short sequences (the ViT hot path).

ViT sequence lengths are tiny (65-1024 tokens) — the whole attention row fits
in VMEM, so the online-softmax running state of flash attention is pure
overhead.  This kernel:

* processes G batch·head slices per program (amortizes grid/pipeline overhead:
  bs=256 ViT-B/16 has 3072 (b,h) pairs → 3072/G programs);
* computes s = q·kᵀ, softmax (fp32, in VMEM — the (n, n) matrix NEVER touches
  HBM, unlike the XLA path which is HBM-bound on it), and p·v in one shot;
* masks padded kv columns.

Backward = rematerialized XLA attention (same rationale as
flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# shared with the flash kernel — one definition for the sibling kernels
from .flash_attention import _NEG_INF, _round_up


def _short_kernel(*refs, scale, kv_len, group, n_pad, has_bias):
    if has_bias:
        q_ref, k_ref, v_ref, b_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        b_ref = None
    for g in range(group):
        q = q_ref[g]
        k = k_ref[g]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        if has_bias:
            # per-head additive bias (rel-pos tables): the block's g-th row
            # is the head of the g-th (b·h) slice — see index_map below
            s = s + b_ref[g]
        if kv_len != n_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        # divide AFTER the pv matmul: (n, d) elements instead of (n, n)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[g],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[g] = (o / l).astype(o_ref.dtype)


_VMEM_BUDGET = 12 * 1024 * 1024


def _vmem_bytes(group, n_pad, m_pad, d, itemsize, has_bias=False, dv=None):
    """q/k/v/o blocks double-buffered across grid steps + the fp32 logits
    matrix for the slice in flight.  ``dv``: value/output head dim when it
    differs from the query/key ``d`` (LeViT, reference levit.py:41)."""
    dv = d if dv is None else dv
    io = group * (n_pad * (d + dv) + m_pad * (d + dv)) * itemsize
    if has_bias:
        io += group * n_pad * m_pad * 4
    return 2 * io + 2 * n_pad * m_pad * 4


def _short_forward(q, k, v, bias, scale, group, interpret):
    b, h, n, d = q.shape
    m = k.shape[2]
    dv = v.shape[3]
    has_bias = bias is not None

    n_pad = _round_up(n, 128)
    m_pad = _round_up(m, 128)

    itemsize = jnp.dtype(q.dtype).itemsize
    # shrink the group until the working set fits VMEM (large n·d shapes);
    # if even one slice doesn't fit, this shape has no short path — the
    # dispatcher's caller falls back to XLA (see short_attention()).
    # Step by 1 (not halving): the divisibility picks below search downward
    # from this bound, so e.g. h=3, VMEM-fit 8 must yield group 3, which a
    # power-of-two shrink would skip.
    while group > 1 and _vmem_bytes(
        group, n_pad, m_pad, d, itemsize, has_bias, dv
    ) > _VMEM_BUDGET:
        group -= 1

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, n_pad - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, m_pad - m), (0, 0)))

    bh = b * h
    if has_bias:
        # a group of consecutive (b·h) slices must span consecutive heads of
        # one image so the bias block (group rows of the padded per-head
        # table) aligns with the q/k/v block rows → group must divide h —
        # any divisor of h also divides bh = b·h.  Largest divisor of h ≤
        # the VMEM-fit bound (e.g. b=2, h=3, bound 6 → group 3).
        group = max(g for g in range(1, min(group, h) + 1) if h % g == 0)
        bp = jnp.pad(
            bias.astype(jnp.float32),
            ((0, 0), (0, n_pad - n), (0, m_pad - m)),
        )
    else:
        # no alignment constraint beyond dividing the flattened (b·h) axis
        group = max(g for g in range(1, min(group, bh) + 1) if bh % g == 0)
    qp = qp.reshape(bh, n_pad, d)
    kp = kp.reshape(bh, m_pad, d)
    vp = vp.reshape(bh, m_pad, dv)

    in_specs = [
        pl.BlockSpec((group, n_pad, d), lambda g: (g, 0, 0)),
        pl.BlockSpec((group, m_pad, d), lambda g: (g, 0, 0)),
        pl.BlockSpec((group, m_pad, dv), lambda g: (g, 0, 0)),
    ]
    operands = [qp, kp, vp]
    if has_bias:
        hg = h // group  # bias block index for grid step g: head (g·group)%h
        in_specs.append(
            pl.BlockSpec((group, n_pad, m_pad), lambda g: (g % hg, 0, 0))
        )
        operands.append(bp)

    out = pl.pallas_call(
        functools.partial(
            _short_kernel, scale=scale, kv_len=m, group=group, n_pad=m_pad,
            has_bias=has_bias,
        ),
        grid=(bh // group,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((group, n_pad, dv), lambda g: (g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, dv), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*operands)

    return out.reshape(b, h, n_pad, dv)[:, :, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _short_attention_core(q, k, v, scale, group, interpret):
    return _short_forward(q, k, v, None, scale, group, interpret)


def _fwd(q, k, v, scale, group, interpret):
    return _short_forward(q, k, v, None, scale, group, interpret), (q, k, v)


def _bwd(scale, group, interpret, residuals, g):
    from .attention import xla_attention

    q, k, v = residuals
    dq, dk, dv = jax.vjp(
        lambda q, k, v: xla_attention(q, k, v, scale=scale), q, k, v
    )[1](g)
    return dq, dk, dv


_short_attention_core.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _short_attention_bias_core(q, k, v, bias, scale, group, interpret):
    return _short_forward(q, k, v, bias, scale, group, interpret)


def _fwd_bias(q, k, v, bias, scale, group, interpret):
    return (
        _short_forward(q, k, v, bias, scale, group, interpret),
        (q, k, v, bias),
    )


def _bwd_bias(scale, group, interpret, residuals, g):
    from .attention import xla_attention

    q, k, v, bias = residuals
    dq, dk, dv, dbias = jax.vjp(
        lambda q, k, v, bias: xla_attention(q, k, v, scale=scale, bias=bias),
        q, k, v, bias,
    )[1](g)
    return dq, dk, dv, dbias


_short_attention_bias_core.defvjp(_fwd_bias, _bwd_bias)


def short_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
    group: int = 8,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Short-sequence attention.  q: (b, h, n, d) → (b, h, n, d).

    ``bias``: optional per-head additive logits bias of shape (h, n, m) —
    the learned rel-pos tables of windowed attention (reference
    max_vit.py:150-189, levit.py:69-88), shared across the batch (every
    window sees the same table) so the kernel loads one (group, n, m) block
    per grid step instead of a materialized (b·h, n, m) tensor.

    Shapes whose single-slice working set exceeds VMEM fall back to the XLA
    composite (the short kernel has no tiling beyond the (b·h) group)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, n, d = q.shape
    m = k.shape[2]
    if bias is not None and bias.shape != (h, n, m):
        raise ValueError(
            f"short_attention bias must be (heads, n, m) = {(h, n, m)}, "
            f"got {bias.shape}"
        )
    if _vmem_bytes(1, _round_up(n, 128), _round_up(m, 128), d,
                   jnp.dtype(q.dtype).itemsize, bias is not None,
                   v.shape[3]) > _VMEM_BUDGET:
        from .attention import xla_attention

        return xla_attention(q, k, v, scale=scale, bias=bias)
    if interpret is None:
        from .attention import on_tpu

        interpret = not on_tpu()
    if bias is not None:
        return _short_attention_bias_core(
            q, k, v, bias, float(scale), group, interpret
        )
    return _short_attention_core(q, k, v, float(scale), group, interpret)
