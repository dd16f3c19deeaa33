"""MobileViT — MobileNetV2 trunk interleaved with patch-group transformers
(reference mobile_vit.py:173-243).

The transformer attends across patch-position groups: tokens are laid out
(b, ph·pw, h·w, d) and attention runs within each of the ph·pw groups
(mobile_vit.py:163).  NHWC convs, BatchNorm via batch_stats, SiLU throughout."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from einops import rearrange


class ConvBN(nn.Module):
    """conv_1x1_bn / conv_nxn_bn (reference mobile_vit.py:9-21)."""

    dim_out: int
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = nn.Conv(
            self.dim_out,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn"
        )(x)
        return jax.nn.silu(x)


class MV2Block(nn.Module):
    """MobileNetV2 inverted residual (reference mobile_vit.py:95-139)."""

    inp: int
    oup: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.stride in (1, 2)
        hidden = int(self.inp * self.expansion)
        use_res = self.stride == 1 and self.inp == self.oup
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )

        out = x
        if self.expansion != 1:
            out = nn.Conv(hidden, (1, 1), use_bias=False, name="pw")(out)
            out = bn("pw_bn")(out)
            out = jax.nn.silu(out)
        out = nn.Conv(
            hidden,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            feature_group_count=hidden,
            use_bias=False,
            name="dw",
        )(out)
        out = bn("dw_bn")(out)
        out = jax.nn.silu(out)
        out = nn.Conv(self.oup, (1, 1), use_bias=False, name="pw_linear")(out)
        out = bn("pw_linear_bn")(out)

        if use_res:
            out = out + x
        return out


class GroupTransformer(nn.Module):
    """reference mobile_vit.py:74-93 operating on (b, p, n, d) — the group
    axis folds into batch for the shared attention math."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        b, p, n, d = x.shape
        x = x.reshape(b * p, n, d)

        from ..nn.blocks import Attention, FeedForward

        for i in range(self.depth):
            x = Attention(
                dim=self.dim,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                project_out=True,
                name=f"layers_{i}_attn",
            )(x, train=train) + x
            x = FeedForward(
                dim=self.dim,
                hidden_dim=self.mlp_dim,
                dropout=self.dropout,
                activation="silu",
                name=f"layers_{i}_ff",
            )(x, train=train) + x
        return x.reshape(b, p, n, d)


class MobileViTBlock(nn.Module):
    """reference mobile_vit.py:141-172."""

    dim: int
    depth: int
    channel: int
    kernel_size: int
    patch_size: Tuple[int, int]
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        ph, pw = self.patch_size
        y = x

        x = ConvBN(
            self.channel, self.kernel_size, padding=1, name="conv1"
        )(x, train=train)
        x = ConvBN(self.dim, 1, name="conv2")(x, train=train)

        # NHWC: (b, h·ph, w·pw, d) → (b, ph·pw, h·w, d)
        x = rearrange(
            x, "b (h ph) (w pw) d -> b (ph pw) (h w) d", ph=ph, pw=pw
        )
        x = GroupTransformer(
            dim=self.dim,
            depth=self.depth,
            heads=4,
            dim_head=8,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            name="transformer",
        )(x, train=train)
        gh = y.shape[1] // ph
        gw = y.shape[2] // pw
        x = rearrange(
            x, "b (ph pw) (h w) d -> b (h ph) (w pw) d", h=gh, w=gw, ph=ph, pw=pw
        )

        x = ConvBN(self.channel, 1, name="conv3")(x, train=train)
        x = jnp.concatenate([x, y], axis=-1)
        x = ConvBN(
            self.channel, self.kernel_size, padding=1, name="conv4"
        )(x, train=train)
        return x


class MobileViT(nn.Module):
    """reference mobile_vit.py:173 — same constructor (positional args
    allowed as keywords)."""

    image_size: Tuple[int, int]
    dims: Tuple[int, int, int]
    channels: Tuple[int, ...]
    num_classes: int
    expansion: int = 4
    kernel_size: int = 3
    patch_size: Tuple[int, int] = (2, 2)
    depths: Tuple[int, int, int] = (2, 4, 3)

    @nn.compact
    def __call__(self, img, *, train: bool = False):
        assert len(self.dims) == 3, "dims must be a tuple of 3"
        assert len(self.depths) == 3, "depths must be a tuple of 3"
        ih, iw = self.image_size
        ph, pw = self.patch_size
        assert ih % ph == 0 and iw % pw == 0

        ch = self.channels
        init_dim, last_dim = ch[0], ch[-1]

        x = jnp.transpose(img, (0, 2, 3, 1))
        x = ConvBN(init_dim, 3, stride=2, padding=1, name="conv1")(x, train=train)

        x = MV2Block(ch[0], ch[1], 1, self.expansion, name="stem_0")(x, train=train)
        x = MV2Block(ch[1], ch[2], 2, self.expansion, name="stem_1")(x, train=train)
        x = MV2Block(ch[2], ch[3], 1, self.expansion, name="stem_2")(x, train=train)
        x = MV2Block(ch[2], ch[3], 1, self.expansion, name="stem_3")(x, train=train)

        trunk_cfg = [
            (ch[3], ch[4], ch[5], self.dims[0], self.depths[0], int(self.dims[0] * 2)),
            (ch[5], ch[6], ch[7], self.dims[1], self.depths[1], int(self.dims[1] * 4)),
            (ch[7], ch[8], ch[9], self.dims[2], self.depths[2], int(self.dims[2] * 4)),
        ]
        for i, (c_in, c_mid, c_out, dim, depth, mlp_dim) in enumerate(trunk_cfg):
            x = MV2Block(c_in, c_mid, 2, self.expansion, name=f"trunk_{i}_mv2")(
                x, train=train
            )
            x = MobileViTBlock(
                dim=dim,
                depth=depth,
                channel=c_out,
                kernel_size=self.kernel_size,
                patch_size=self.patch_size,
                mlp_dim=mlp_dim,
                name=f"trunk_{i}_mvit",
            )(x, train=train)

        x = ConvBN(last_dim, 1, name="to_logits_conv")(x, train=train)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, use_bias=False, name="to_logits")(x)
