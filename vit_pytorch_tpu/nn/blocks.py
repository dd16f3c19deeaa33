"""Shared transformer block library — the factored-out L2 of the reference.

The reference deliberately copy-pastes ``Attention`` / ``FeedForward`` /
``Transformer`` into nearly every model file with small deltas (SURVEY §2.6;
compare reference vit.py:30-64, simple_vit.py:37-62, na_vit.py:115-169).
Here the deltas become options on ONE set of Flax modules, so every variant
shares the same Pallas/XLA attention core.

Parity notes (matching torch defaults so converted weights reproduce logits):
  - LayerNorm eps 1e-5 (torch default), with weight+bias.
  - GELU is the exact (erf) form — torch ``nn.GELU()`` default (vit.py:21).
  - Linear layers: torch weight (out,in) ↔ flax kernel (in,out).

Attention recording (reference recorder.py:10-59 hooks the softmax): when the
caller makes the dedicated ``'attn_maps'`` collection mutable
(``model.apply(..., mutable=['attn_maps'])``) attention switches to the
materialized-softmax XLA path and ``sow``s the post-softmax matrix — the
jit-safe equivalent of a forward hook.  (Generic ``'intermediates'``
capture, e.g. the Extractor, does NOT force the slow path for every
layer — only the dedicated collection does.)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import dot_product_attention, on_tpu
from ..ops.fused_block import (
    fused_attention_block,
    fused_block_supported,
    fused_dropout_supported,
    fused_transformer_layer,
    fused_transformer_stack,
    whole_layer_stack_group,
    whole_layer_supported,
)
from ..utils.helpers import default, exists

# torch parity defaults
LN_EPS = 1e-5


def fused_block_eligible(
    *,
    x_shape,
    x_dtype,
    heads: int,
    dim_head: int,
    dim: int,
    flash,
    project_out: bool,
    pre_norm: bool = True,
    force_split_qkv: bool = False,
    qk_norm: bool = False,
    has_context: bool = False,
    has_rotary: bool = False,
    has_mask: bool = False,
    has_bias: bool = False,
    has_segments: bool = False,
    record: bool = False,
    dropout: float = 0.0,
    train: bool = False,
) -> bool:
    """Single source of truth for whether ``Attention`` will take the fused
    attention-block Pallas kernel.  Used both by ``Attention.__call__`` (to
    dispatch) and by ``Transformer`` (to decide whether remat around the
    attention call would be a no-op replay) — keeping one predicate so the
    two can never drift (ADVICE r2: a drift silently skips remat)."""
    return (
        not has_context
        and flash is not False  # explicit flash=False opts out of ALL kernels
        and not force_split_qkv
        and pre_norm
        # qk-norm runs inside BOTH kernels since round 4 (forward RMSNorm +
        # backward recompute with in-VMEM dgamma accumulators), so it
        # composes with in-kernel train-time dropout — no fallback
        and not has_rotary
        and not has_mask
        and not has_bias
        and not has_segments
        and not record
        # train-time dropout runs INSIDE the kernel (TPU PRNG, both
        # reference sites) when the Pallas backward fits VMEM — the
        # XLA-composite fallback can't replay the in-kernel masks
        and (
            dropout == 0.0
            or not train
            or fused_dropout_supported(x_shape, heads, dim_head)
        )
        and project_out
        and len(x_shape) == 3
        and fused_block_supported(x_shape, x_dtype, heads, dim_head, dim)
        and on_tpu()
    )


class _LNParams(nn.Module):
    """Parameter container producing the exact tree nn.LayerNorm would
    (scale/bias) — lets the fused-block kernel read LN params without
    running the module."""

    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = (
            self.param("bias", nn.initializers.zeros, (self.dim,))
            if self.use_bias
            else None
        )
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's tree (kernel/bias)."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _AttnBlockParams(nn.Module):
    """Parameter tree identical to ``Attention``'s fused subset
    (norm/to_qkv/to_out) — lets ``Transformer`` feed the whole-layer kernel
    while converted checkpoints keep loading into the same paths."""

    dim: int
    inner: int
    qkv_bias: bool
    out_bias: bool
    norm_bias: bool

    @nn.compact
    def __call__(self):
        ln_s, ln_b = _LNParams(self.dim, use_bias=self.norm_bias, name="norm")()
        w_qkv, b_qkv = _DenseParams(
            self.inner * 3, self.dim, use_bias=self.qkv_bias, name="to_qkv"
        )()
        w_out, b_out = _DenseParams(
            self.dim, self.inner, use_bias=self.out_bias, name="to_out"
        )()
        return ln_s, ln_b, w_qkv, b_qkv, w_out, b_out


class _RMSParams(nn.Module):
    """Parameter container matching ``RMSNorm``'s tree (gamma) — lets the
    fused-block kernel read qk-norm gammas without running the module, so
    converted checkpoints load unchanged on either path."""

    heads: int
    dim: int
    gamma_init: float = 1.0

    @nn.compact
    def __call__(self):
        return self.param(
            "gamma",
            nn.initializers.constant(self.gamma_init),
            (self.heads, 1, self.dim),
        )


class _FFBlockParams(nn.Module):
    """Parameter tree identical to ``FeedForward``'s (norm/fc1/fc2)."""

    dim: int
    hidden: int
    norm_bias: bool

    @nn.compact
    def __call__(self):
        ln_s, ln_b = _LNParams(self.dim, use_bias=self.norm_bias, name="norm")()
        w1, b1 = _DenseParams(self.hidden, self.dim, name="fc1")()
        w2, b2 = _DenseParams(self.dim, self.hidden, name="fc2")()
        return ln_s, ln_b, w1, b1, w2, b2


class LayerNorm(nn.Module):
    """LayerNorm with torch-default epsilon; optional bias (na_vit.py:82-90)."""

    use_bias: bool = True
    eps: float = LN_EPS

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, use_bias=self.use_bias, name="ln")(x)


class UnitOffsetLayerNorm(nn.Module):
    """Bias-less LayerNorm with the unit-offset gamma trick — params init at
    zero, effective scale = gamma + 1 (reference look_vit.py:37-45)."""

    eps: float = LN_EPS

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        normed = nn.LayerNorm(
            epsilon=self.eps, use_bias=False, use_scale=False, name="ln"
        )(x)
        return normed * (gamma.astype(x.dtype) + 1)


class RMSNorm(nn.Module):
    """Per-head RMSNorm with learned gamma (reference na_vit.py:93-103).

    gamma has shape (heads, 1, dim) and the norm multiplies by sqrt(dim).
    """

    heads: int
    dim: int
    gamma_init: float = 1.0  # simple_vit_with_qk_norm.py:32 uses 1/sqrt(dim)

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.gamma_init),
            (self.heads, 1, self.dim),
        )
        normed = x * jax.lax.rsqrt(
            jnp.sum(jnp.square(x), axis=-1, keepdims=True) + 1e-12
        )
        return normed * gamma * (self.dim**0.5)


def gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def gelu(x):
    """Dtype-adaptive GELU.  In bf16 the tanh approximation is within one ulp
    of the exact erf form (max |erf−tanh| ≈ 5e-4 < bf16 quantization error
    1.6e-2) but ~50% faster on the VPU (measured: erf GELU drops the fused
    MLP from 169 to 110 TF/s on v5e).  fp32 keeps exact erf — parity with
    torch ``nn.GELU()`` at fp32 tolerance is unaffected."""
    approximate = x.dtype in (jnp.bfloat16, jnp.float16)
    return jax.nn.gelu(x, approximate=approximate)


_ACTIVATIONS: dict[str, Callable] = {
    "gelu": gelu,
    "gelu_exact": gelu_exact,
    "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "hardswish": jax.nn.hard_swish,
}


class FeedForward(nn.Module):
    """LN → Linear → act → Dropout → Linear → Dropout (reference vit.py:15-28).

    ``glu=True`` gives the GEGLU variant (reference rvt.py:75-92).
    ``pre_norm=False`` drops the leading LN (simple_vit.py:37-48 has LN; some
    conv variants norm outside).
    """

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    activation: str = "gelu"
    glu: bool = False
    pre_norm: bool = True
    use_bias: bool = True
    norm_bias: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = _ACTIVATIONS[self.activation]
        if self.pre_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, use_bias=self.norm_bias, name="norm")(x)
        if self.glu:
            xg = nn.Dense(self.hidden_dim * 2, use_bias=self.use_bias, name="fc1")(x)
            x, gate = jnp.split(xg, 2, axis=-1)
            x = x * act(gate)
        else:
            x = nn.Dense(self.hidden_dim, use_bias=self.use_bias, name="fc1")(x)
            x = act(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, use_bias=self.use_bias, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class Attention(nn.Module):
    """Multi-head attention covering the reference's common motif set.

    Base form: reference vit.py:30-64 (pre-LN, fused qkv, no qkv bias,
    projection out with dropout).  Options:

    - ``qk_norm``: per-head RMSNorm on q and k with learned gamma, scale
      overridden to 1 (reference na_vit.py:115-169).
    - ``cross_attend``: context tensor for k/v (cross_vit.py:53-91), with
      ``kv_include_self`` handled by the caller concatenating.
    - ``bias`` argument: additive attention bias (rel-pos tables).
    - ``q_segment_ids``/``kv_segment_ids``: packed-sequence block-diagonal
      masking on the flash path (na_vit.py:335-337).
    - ``rotary``: callable applied to q and k after head split (rvt.py:131-147).
    - recording: see module docstring.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    qk_norm: bool = False
    qk_norm_gamma_init: float = 1.0
    pre_norm: bool = True
    norm_bias: bool = True
    norm_context: bool = False
    qkv_bias: bool = False
    out_bias: bool = True
    scale: Optional[float] = None
    project_out: Optional[bool] = None
    kv_include_self: bool = False  # kv over [x ∥ context] (cait.py:87, cross_vit.py:58)
    force_split_qkv: bool = False  # split to_q/to_kv even for self-attention
    flash: Optional[bool] = None
    # depth position for Recorder ordering: when set, the attention map is
    # sown as 'attn_{index:04d}' so the Recorder stacks layers by explicit
    # index instead of parsing module names (recorder.py shape contract)
    sow_index: Optional[int] = None

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        *,
        mask=None,
        bias=None,
        q_segment_ids=None,
        kv_segment_ids=None,
        rotary: Optional[Callable] = None,
        train: bool = False,
        return_attn: bool = False,
        residual=None,
    ):
        """``residual``: optional tensor added to the output.  When given by
        the transformer loop it rides into the fused-block kernel so the
        whole pre-norm attention layer (LN→qkv→attn→out→+residual) is one
        Pallas call on TPU; on the module path it is a plain add."""
        h, dh = self.heads, self.dim_head
        inner = h * dh
        project_out = default(self.project_out, not (h == 1 and dh == self.dim))

        record = self.is_mutable_collection("attn_maps") or return_attn

        fused_ok = fused_block_eligible(
            x_shape=x.shape,
            x_dtype=x.dtype,
            heads=h,
            dim_head=dh,
            dim=self.dim,
            flash=self.flash,
            project_out=project_out,
            pre_norm=self.pre_norm,
            force_split_qkv=self.force_split_qkv,
            qk_norm=self.qk_norm,
            has_context=exists(context),
            has_rotary=exists(rotary),
            has_mask=mask is not None,
            has_bias=bias is not None,
            has_segments=q_segment_ids is not None or kv_segment_ids is not None,
            record=record,
            dropout=self.dropout,
            train=train,
        )
        if fused_ok:
            ln_scale, ln_bias = _LNParams(
                self.dim, use_bias=self.norm_bias, name="norm"
            )()
            w_qkv, b_qkv = _DenseParams(
                inner * 3, self.dim, use_bias=self.qkv_bias, name="to_qkv"
            )()
            w_out, b_out = _DenseParams(
                self.dim, inner, use_bias=self.out_bias, name="to_out"
            )()
            # serving dtype is x.dtype (bf16-gated above); fp32 master
            # weights are cast down exactly as a bf16 deployment would
            cast = lambda w: None if w is None else w.astype(x.dtype)
            if ln_bias is None:
                ln_bias = jnp.zeros((self.dim,), x.dtype)
            gamma_q = gamma_k = None
            scale = self.scale
            if self.qk_norm:
                gamma_q = _RMSParams(
                    h, dh, self.qk_norm_gamma_init, name="q_norm"
                )()
                gamma_k = _RMSParams(
                    h, dh, self.qk_norm_gamma_init, name="k_norm"
                )()
                scale = default(scale, 1.0)
            rate = self.dropout if train else 0.0
            seed = None
            if rate > 0.0:
                # same rng collection the XLA path's nn.Dropout draws from;
                # folded to an int32 seed for the in-kernel TPU PRNG
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, 2**31 - 1, dtype=jnp.int32
                )
            # residual=None rides through as a no-op (no zeros streamed)
            return fused_attention_block(
                x,
                residual,
                cast(w_qkv),
                cast(w_out),
                cast(ln_scale),
                cast(ln_bias),
                heads=h,
                dim_head=dh,
                b_qkv=cast(b_qkv),
                b_out=cast(b_out),
                gamma_q=cast(gamma_q),
                gamma_k=cast(gamma_k),
                scale=scale,
                eps=LN_EPS,
                dropout_rate=rate,
                dropout_seed=seed,
            )

        if self.pre_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, use_bias=self.norm_bias, name="norm")(x)

        is_cross = exists(context)
        if is_cross and self.norm_context:
            context = nn.LayerNorm(
                epsilon=LN_EPS, use_bias=self.norm_bias, name="norm_context"
            )(context)
        if is_cross and self.kv_include_self:
            context = jnp.concatenate([x, context], axis=1)
        kv_input = context if is_cross else x

        if is_cross or self.force_split_qkv:
            q = nn.Dense(inner, use_bias=self.qkv_bias, name="to_q")(x)
            kv = nn.Dense(inner * 2, use_bias=self.qkv_bias, name="to_kv")(kv_input)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias, name="to_qkv")(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, dh).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        scale = self.scale
        gamma_q = gamma_k = None
        if self.qk_norm:
            # hand the gammas to the dispatcher (the flash kernels run the
            # RMSNorm in-tile; other paths apply the same rms_norm in XLA)
            # — except under rotary, which must see NORMALIZED q/k before
            # the dispatcher (reference rvt.py applies rotary post-norm)
            gamma_q = _RMSParams(
                h, dh, self.qk_norm_gamma_init, name="q_norm"
            )()
            gamma_k = _RMSParams(
                h, dh, self.qk_norm_gamma_init, name="k_norm"
            )()
            scale = default(scale, 1.0)
            if exists(rotary):
                from ..ops.flash_attention import rms_norm

                q = rms_norm(q, gamma_q)
                k = rms_norm(k, gamma_k)
                gamma_q = gamma_k = None

        if exists(rotary):
            q, k = rotary(q), rotary(k)

        dropout_rng = None
        if self.dropout > 0.0 and train:
            dropout_rng = self.make_rng("dropout")

        if record:
            out, attn = dot_product_attention(
                q,
                k,
                v,
                scale=scale,
                bias=bias,
                gamma_q=gamma_q,
                gamma_k=gamma_k,
                mask=mask,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=dropout_rng,
                return_attn=True,
                use_flash=False,
            )
            leaf = (
                "attn"
                if self.sow_index is None
                else f"attn_{self.sow_index:04d}"
            )
            self.sow("attn_maps", leaf, attn)
        else:
            out = dot_product_attention(
                q,
                k,
                v,
                scale=scale,
                bias=bias,
                gamma_q=gamma_q,
                gamma_k=gamma_k,
                mask=mask,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                dropout_rate=self.dropout if train else 0.0,
                dropout_rng=dropout_rng,
                use_flash=self.flash,
            )
            attn = None

        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)

        if project_out:
            out = nn.Dense(self.dim, use_bias=self.out_bias, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)

        if residual is not None:
            out = out + residual

        if return_attn:
            return out, attn
        return out


class Transformer(nn.Module):
    """Pre-norm residual transformer (reference vit.py:66-83).

    ``final_norm`` toggles the closing LayerNorm.  Layers are unrolled — ViT
    depths are small (≤ 27 in the whole zoo) and unrolling lets XLA fuse
    across layer boundaries.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    qk_norm: bool = False
    final_norm: bool = True
    norm_bias: bool = True
    attn_out_bias: bool = True
    qkv_bias: bool = False
    flash: Optional[bool] = None
    ff_activation: str = "gelu"
    ff_glu: bool = False
    # rematerialize each layer's activations in the backward pass — trades
    # ~30% extra FLOPs for O(depth) less activation memory (jax.checkpoint;
    # the TPU-native big-batch training lever, SURVEY §0)
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        x,
        *,
        mask=None,
        bias=None,
        q_segment_ids=None,
        kv_segment_ids=None,
        rotary: Optional[Callable] = None,
        train: bool = False,
        return_hiddens: bool = False,
    ):
        def attn_call(mdl, h):
            # statics (train, rotary) and shared arrays (mask/bias/segments)
            # ride in the closure; only h is checkpointed through.  residual
            # is folded into the attention call so the fused TPU kernel can
            # do LN→qkv→attn→out→+residual in one pass
            return mdl(
                h,
                mask=mask,
                bias=bias,
                q_segment_ids=q_segment_ids,
                kv_segment_ids=kv_segment_ids,
                rotary=rotary,
                train=train,
                residual=h,
            )

        def ff_call(mdl, h):
            return mdl(h, train=train)

        # predict whether Attention will take the fused-block kernel path:
        # its custom_vjp saves only the layer input, so wrapping it in remat
        # would just replay the kernel forward for nothing.  Shares the
        # exact eligibility predicate with Attention.__call__ (the layers
        # below are constructed with default pre_norm / force_split_qkv /
        # project_out, matching the arguments here).
        attn_will_fuse = fused_block_eligible(
            x_shape=x.shape,
            x_dtype=x.dtype,
            heads=self.heads,
            dim_head=self.dim_head,
            dim=self.dim,
            flash=self.flash,
            project_out=not (self.heads == 1 and self.dim_head == self.dim),
            qk_norm=self.qk_norm,
            has_rotary=exists(rotary),
            has_mask=mask is not None,
            has_bias=bias is not None,
            has_segments=q_segment_ids is not None or kv_segment_ids is not None,
            record=self.is_mutable_collection("attn_maps"),
            dropout=self.dropout,
            train=train,
        )

        # whole-LAYER kernel (attn block + FF in one Pallas call): inference
        # fast path — measured 2.71 vs 2.85 ms/layer for the two-step pair
        # on v5e ViT-B (the y and GELU-hidden HBM round-trips disappear;
        # docs/PERF_NOTES.md round 3).  Differentiable (decomposed
        # custom_vjp saving only x), but train-time dropout sites live in
        # the two-step path, so dropout>0+train falls back.
        whole_layer = (
            attn_will_fuse
            and (self.dropout == 0.0 or not train)
            # qk-norm is supported by the attention-block kernel but not by
            # the whole-layer/stack kernels — take the two-step path
            and not self.qk_norm
            and not self.ff_glu
            and self.ff_activation == "gelu"
            and whole_layer_supported(
                x.shape, x.dtype, self.heads, self.dim_head, self.dim, self.mlp_dim
            )
        )

        if self.remat:
            if not attn_will_fuse:
                attn_call = nn.remat(attn_call)
            ff_call = nn.remat(ff_call)

        # layers-per-Pallas-call for the whole-layer path: >1 stacks several
        # layers' weights resident in one kernel (inter-layer HBM round-trips
        # and launches disappear — measured 2.60 vs 3.35 ms/layer at L=6,
        # PERF_NOTES round 3).  Differentiation-safe: under grad the stack's
        # custom_vjp forward runs the per-layer grad-path kernels (each
        # saving its own x/y), so training costs exactly what the per-layer
        # dispatch costs.  return_hiddens needs per-layer outputs.
        stack_group = (
            1
            if (return_hiddens or not whole_layer)
            else whole_layer_stack_group(
                x.shape, x.dtype, self.heads, self.dim_head, self.dim,
                self.mlp_dim, self.depth,
            )
        )

        def _layer_tuple(i):
            ln1s, ln1b, w_qkv, b_qkv, w_out, b_out = _AttnBlockParams(
                dim=self.dim,
                inner=self.heads * self.dim_head,
                qkv_bias=self.qkv_bias,
                out_bias=self.attn_out_bias,
                norm_bias=self.norm_bias,
                name=f"layers_{i}_attn",
            )()
            ln2s, ln2b, w1, b1, w2, b2 = _FFBlockParams(
                dim=self.dim,
                hidden=self.mlp_dim,
                norm_bias=self.norm_bias,
                name=f"layers_{i}_ff",
            )()
            cast = lambda w: None if w is None else w.astype(x.dtype)
            zeros = jnp.zeros((self.dim,), x.dtype)
            return (
                cast(w_qkv),
                cast(b_qkv),
                cast(w_out),
                cast(b_out),
                cast(ln1s),
                cast(ln1b) if ln1b is not None else zeros,
                cast(ln2s),
                cast(ln2b) if ln2b is not None else zeros,
                cast(w1),
                cast(b1),
                cast(w2),
                cast(b2),
            )

        hiddens = []
        if whole_layer and stack_group > 1:
            tuples = [_layer_tuple(i) for i in range(self.depth)]
            i = 0
            while i < self.depth:
                g = min(stack_group, self.depth - i)
                x = fused_transformer_stack(
                    x,
                    tuples[i : i + g],
                    heads=self.heads,
                    dim_head=self.dim_head,
                    eps=LN_EPS,
                )
                i += g

        for i in range(self.depth if stack_group == 1 else 0):
            if whole_layer:
                lw = _layer_tuple(i)
                x = fused_transformer_layer(
                    x,
                    lw[0],
                    lw[2],
                    lw[4],
                    lw[5],
                    lw[6],
                    lw[7],
                    lw[8],
                    lw[9],
                    lw[10],
                    lw[11],
                    heads=self.heads,
                    dim_head=self.dim_head,
                    b_qkv=lw[1],
                    b_out=lw[3],
                    eps=LN_EPS,
                )
                if return_hiddens:
                    hiddens.append(x)
                continue
            attn = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                qk_norm=self.qk_norm,
                norm_bias=self.norm_bias,
                out_bias=self.attn_out_bias,
                qkv_bias=self.qkv_bias,
                flash=self.flash,
                sow_index=i,
                name=f"layers_{i}_attn",
            )
            x = attn_call(attn, x)
            ff = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                activation=self.ff_activation,
                glu=self.ff_glu,
                norm_bias=self.norm_bias,
                name=f"layers_{i}_ff",
            )
            x = ff_call(ff, x) + x
            if return_hiddens:
                hiddens.append(x)

        if self.final_norm:
            x = nn.LayerNorm(epsilon=LN_EPS, use_bias=self.norm_bias, name="norm")(x)

        if return_hiddens:
            return x, hiddens
        return x
