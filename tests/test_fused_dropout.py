"""Kernel-tier attention dropout (VERDICT r2 item 4).

The fused block applies train-time dropout INSIDE the Pallas kernel at both
reference sites (post-softmax matrix, vit.py:60; after the out projection,
vit.py:47-49) using the TPU PRNG seeded per (image, head).  The TPU PRNG
has no interpreter lowering, so numeric equivalence runs on the real chip:
``dropout_masks`` replays the kernel's masks, an XLA composite consumes
them, and forward + gradients must agree at bf16 tolerance.

CPU portion (always runs): eligibility gating — reference-default configs
(dropout 0.1, train) must keep the fused path on TPU shapes.
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vit_pytorch_tpu.nn.blocks import fused_block_eligible
from vit_pytorch_tpu.ops import fused_block as fb


def _tpu_device():
    if os.environ.get("VIT_TPU_SKIP_TPU_TESTS"):
        return None
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return None


def test_dropout_keeps_fused_eligibility(monkeypatch):
    """The README-default ViT trains with dropout 0.1 (reference vit.py
    test config) — it must NOT silently fall back to XLA attention."""
    import vit_pytorch_tpu.nn.blocks as blocks_mod

    monkeypatch.setattr(blocks_mod, "on_tpu", lambda: True)
    common = dict(
        x_shape=(8, 197, 768), x_dtype=jnp.bfloat16, heads=12, dim_head=64,
        dim=768, flash=None, project_out=True,
    )
    assert fused_block_eligible(**common, dropout=0.0, train=True)
    assert fused_block_eligible(**common, dropout=0.1, train=True) == (
        fb.fused_dropout_supported((8, 197, 768), 12, 64)
    )
    assert fb.fused_dropout_supported((8, 197, 768), 12, 64)
    # eval-time dropout is a no-op: always eligible
    assert fused_block_eligible(**common, dropout=0.1, train=False)


def test_dropout_requires_seed():
    x = jnp.zeros((2, 8, 64), jnp.bfloat16)
    w_qkv = jnp.zeros((64, 192), jnp.bfloat16)
    w_out = jnp.zeros((64, 64), jnp.bfloat16)
    ones = jnp.ones((64,), jnp.bfloat16)
    with pytest.raises(ValueError, match="dropout_seed"):
        fb.fused_attention_block(
            x, None, w_qkv, w_out, ones, ones, heads=1, dim_head=64,
            dropout_rate=0.1,
        )


@pytest.mark.tpu
@pytest.mark.skipif(_tpu_device() is None, reason="needs a real TPU chip")
class TestFusedDropoutTPU:
    B, H, N, D = 8, 4, 197, 64
    DIM = H * D
    RATE = 0.1
    SEED = 1234

    def _args(self):
        k = jax.random.split(jax.random.PRNGKey(0), 8)
        dt = jnp.bfloat16
        x = jax.random.normal(k[0], (self.B, self.N, self.DIM), dt)
        w_qkv = jax.random.normal(k[1], (self.DIM, 3 * self.DIM), dt) * 0.05
        w_out = jax.random.normal(k[2], (self.DIM, self.DIM), dt) * 0.05
        b_out = jax.random.normal(k[3], (self.DIM,), dt) * 0.01
        lns = jnp.ones((self.DIM,), dt)
        lnb = jnp.zeros((self.DIM,), dt)
        return x, w_qkv, w_out, b_out, lns, lnb

    def _ref_with_masks(self, x, residual, w_qkv, w_out, b_out, lns, lnb,
                        akeep, okeep):
        """XLA composite mirroring _kernel's exact dtype path with the
        replayed masks injected."""
        b, n, dim = x.shape
        inv = 1.0 / (1.0 - self.RATE)
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        ln = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        ln = (ln * lns.astype(jnp.float32) + lnb.astype(jnp.float32)).astype(x.dtype)
        qkv = ln @ w_qkv
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda t: t.reshape(b, n, self.H, self.D).transpose(0, 2, 1, 3)
        q, k, v = rs(q), rs(k), rs(v)
        dots = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) * (self.D ** -0.5)
        dots = dots - jnp.max(dots, axis=-1, keepdims=True)
        p = jnp.exp(dots)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        p = jnp.where(akeep.astype(bool), p, 0.0) * inv
        o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(x.dtype), v,
                       preferred_element_type=jnp.float32)
        o = o.astype(x.dtype).transpose(0, 2, 1, 3).reshape(b, n, self.H * self.D)
        out = jnp.dot(o, w_out, preferred_element_type=jnp.float32)
        out = out + b_out.astype(jnp.float32)
        out = jnp.where(okeep.astype(bool), out, 0.0) * inv
        if residual is not None:
            out = out + residual.astype(jnp.float32)
        return out.astype(x.dtype)

    def test_forward_matches_xla_with_replayed_masks(self):
        with jax.default_device(_tpu_device()):
            x, w_qkv, w_out, b_out, lns, lnb = self._args()
            out_k = fb.fused_attention_block(
                x, x, w_qkv, w_out, lns, lnb, heads=self.H, dim_head=self.D,
                b_out=b_out, dropout_rate=self.RATE, dropout_seed=self.SEED,
            )
            akeep, okeep = fb.dropout_masks(
                self.SEED, self.B, self.N, self.DIM, self.H, self.RATE
            )
            out_r = self._ref_with_masks(
                x, x, w_qkv, w_out, b_out, lns, lnb, akeep, okeep
            )
            diff = float(jnp.max(jnp.abs(out_k.astype(jnp.float32) - out_r.astype(jnp.float32))))
            scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32))))
            assert diff <= 0.05 * max(scale, 1.0), (diff, scale)

    def test_mask_statistics_and_determinism(self):
        with jax.default_device(_tpu_device()):
            akeep, okeep = fb.dropout_masks(7, 4, 128, 256, self.H, 0.25)
            frac = float(jnp.mean(akeep.astype(jnp.float32)))
            assert abs(frac - 0.75) < 0.01, frac
            frac_o = float(jnp.mean(okeep.astype(jnp.float32)))
            assert abs(frac_o - 0.75) < 0.01, frac_o
            a2, o2 = fb.dropout_masks(7, 4, 128, 256, self.H, 0.25)
            assert bool(jnp.all(akeep == a2)) and bool(jnp.all(okeep == o2))
            a3, _ = fb.dropout_masks(8, 4, 128, 256, self.H, 0.25)
            assert bool(jnp.any(akeep != a3))
            # per-(img, head) streams differ
            assert bool(jnp.any(akeep[0, 0] != akeep[0, 1]))
            assert bool(jnp.any(akeep[0, 0] != akeep[1, 0]))

    def test_grads_match_xla_with_replayed_masks(self):
        with jax.default_device(_tpu_device()):
            x, w_qkv, w_out, b_out, lns, lnb = self._args()
            akeep, okeep = fb.dropout_masks(
                self.SEED, self.B, self.N, self.DIM, self.H, self.RATE
            )

            def loss_k(x, w_qkv, w_out, b_out):
                out = fb.fused_attention_block(
                    x, x, w_qkv, w_out, lns, lnb, heads=self.H,
                    dim_head=self.D, b_out=b_out, dropout_rate=self.RATE,
                    dropout_seed=self.SEED,
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            def loss_r(x, w_qkv, w_out, b_out):
                out = self._ref_with_masks(
                    x, x, w_qkv, w_out, b_out, lns, lnb, akeep, okeep
                )
                return jnp.sum(out.astype(jnp.float32) ** 2)

            gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, w_qkv, w_out, b_out)
            gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, w_qkv, w_out, b_out)
            for a, b, name in zip(gk, gr, ("dx", "dWqkv", "dWout", "dbout")):
                a = a.astype(jnp.float32)
                b = b.astype(jnp.float32)
                denom = float(jnp.max(jnp.abs(b))) + 1e-6
                rel = float(jnp.max(jnp.abs(a - b))) / denom
                assert rel < 0.08, (name, rel)
