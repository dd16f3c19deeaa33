"""SimpleViT + hyper connections (reference
simple_vit_with_hyper_connections.py:166-233): N residual streams with
static+dynamic α (width) and β (depth) mixing per layer (lines 33-84);
register tokens."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import Attention, FeedForward, LN_EPS
from ..nn.patch import PatchEmbedding, patchify_2d
from ..nn.posemb import posemb_sincos_2d
from ..utils.helpers import pair


class HyperConnection(nn.Module):
    """reference simple_vit_with_hyper_connections.py:33-84 (Appendix J,
    Algorithm 2, dynamic only)."""

    dim: int
    num_residual_streams: int
    layer_index: int

    def setup(self):
        e = self.num_residual_streams
        self.norm = nn.LayerNorm(epsilon=LN_EPS, use_bias=False, name="norm")
        self.static_beta = self.param("static_beta", nn.initializers.ones, (e,))

        def alpha_init(key, shape, dtype=jnp.float32):
            init_alpha0 = jnp.zeros((e, 1)).at[self.layer_index % e, 0].set(1.0)
            return jnp.concatenate([init_alpha0, jnp.eye(e)], axis=1)

        self.static_alpha = self.param("static_alpha", alpha_init, (e, e + 1))
        self.dynamic_alpha_fn = self.param(
            "dynamic_alpha_fn", nn.initializers.zeros, (self.dim, e + 1)
        )
        self.dynamic_alpha_scale = self.param(
            "dynamic_alpha_scale", nn.initializers.constant(1e-2), ()
        )
        self.dynamic_beta_fn = self.param(
            "dynamic_beta_fn", nn.initializers.zeros, (self.dim,)
        )
        self.dynamic_beta_scale = self.param(
            "dynamic_beta_scale", nn.initializers.constant(1e-2), ()
        )

    def width_connection(self, residuals):
        # residuals: (b, n, e, d)
        normed = self.norm(residuals)
        wc = jnp.tanh(normed @ self.dynamic_alpha_fn.astype(normed.dtype))
        alpha = wc * self.dynamic_alpha_scale + self.static_alpha.astype(normed.dtype)
        dc = jnp.tanh(normed @ self.dynamic_beta_fn.astype(normed.dtype))
        beta = dc * self.dynamic_beta_scale + self.static_beta.astype(normed.dtype)

        mix = jnp.einsum("...ef,...ed->...fd", alpha, residuals)
        branch_input, residuals = mix[..., 0, :], mix[..., 1:, :]
        return branch_input, residuals, beta

    def depth_connection(self, branch_output, residuals, beta):
        return (
            jnp.einsum("bnd,bne->bned", branch_output, beta) + residuals
        )


class SimpleViT(nn.Module):
    """reference simple_vit_with_hyper_connections.py:166 — same constructor."""

    image_size: int | tuple
    patch_size: int | tuple
    num_classes: int
    dim: int
    depth: int
    heads: int
    mlp_dim: int
    num_residual_streams: int
    num_register_tokens: int = 4
    channels: int = 3
    dim_head: int = 64

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        image_height, image_width = pair(self.image_size)
        patch_height, patch_width = pair(self.patch_size)
        assert image_height % patch_height == 0 and image_width % patch_width == 0
        b = img.shape[0]
        e = self.num_residual_streams

        x = PatchEmbedding(dim=self.dim, name="patch_embedding")(
            patchify_2d(img, patch_height, patch_width)
        )
        x = x + posemb_sincos_2d(
            image_height // patch_height, image_width // patch_width, self.dim, dtype=x.dtype
        )
        n = x.shape[1]

        regs = self.param(
            "register_tokens",
            nn.initializers.normal(1.0),
            (self.num_register_tokens, self.dim),
        )
        r = jnp.broadcast_to(
            regs, (b, self.num_register_tokens, self.dim)
        ).astype(x.dtype)
        x = jnp.concatenate([x, r], axis=1)

        # expand to residual streams (line 147)
        x = jnp.broadcast_to(x[:, :, None, :], x.shape[:2] + (e, self.dim))

        for i in range(self.depth):
            attn_hc = HyperConnection(
                dim=self.dim, num_residual_streams=e, layer_index=i,
                name=f"layers_{i}_attn_hyper",
            )
            ff_hc = HyperConnection(
                dim=self.dim, num_residual_streams=e, layer_index=i,
                name=f"layers_{i}_ff_hyper",
            )

            branch, res, beta = attn_hc.width_connection(x)
            branch = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                out_bias=False,
                project_out=True,
                name=f"layers_{i}_attn",
            )(branch, train=train)
            x = attn_hc.depth_connection(branch, res, beta)

            branch, res, beta = ff_hc.width_connection(x)
            branch = FeedForward(
                dim=self.dim, hidden_dim=self.mlp_dim, name=f"layers_{i}_ff"
            )(branch, train=train)
            x = ff_hc.depth_connection(branch, res, beta)

        x = x.sum(axis=2)
        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)
        x = x[:, :n]  # strip registers
        return nn.Dense(self.num_classes, name="linear_head")(x.mean(axis=1))
