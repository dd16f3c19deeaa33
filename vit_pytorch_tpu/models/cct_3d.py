"""CCT-3D — compact convolutional transformer for video (reference
cct_3d.py:325-388): Conv3d tokenizer with separate frame kernel/stride/pool
settings, otherwise the CCT classifier.  Sequence length is computed
analytically; convs run NDHWC."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import default, pair
from .cct import TransformerClassifier, _conv_out

__all__ = ["CCT", "cct_2", "cct_4", "cct_6", "cct_7", "cct_8", "cct_14", "cct_16"]


class Tokenizer3D(nn.Module):
    """reference cct_3d.py:162-224 (NDHWC)."""

    frame_kernel_size: int
    kernel_size: int
    stride: int
    padding: int
    frame_stride: int = 1
    frame_padding: Optional[int] = None
    frame_pooling_kernel_size: int = 1
    frame_pooling_stride: int = 1
    frame_pooling_padding: Optional[int] = None
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    n_conv_layers: int = 1
    n_input_channels: int = 3
    n_output_channels: int = 64
    in_planes: int = 64
    use_relu: bool = True
    max_pool: bool = True
    conv_bias: bool = False

    def _fp(self):
        return default(self.frame_padding, self.frame_kernel_size // 2)

    def _fpp(self):
        return default(self.frame_pooling_padding, self.frame_pooling_kernel_size // 2)

    def sequence_length(self, frames: int, height: int, width: int) -> int:
        f, h, w = frames, height, width
        for _ in range(self.n_conv_layers):
            f = _conv_out(f, self.frame_kernel_size, self.frame_stride, self._fp())
            h = _conv_out(h, self.kernel_size, self.stride, self.padding)
            w = _conv_out(w, self.kernel_size, self.stride, self.padding)
            if self.max_pool:
                f = _conv_out(
                    f, self.frame_pooling_kernel_size, self.frame_pooling_stride, self._fpp()
                )
                h = _conv_out(
                    h, self.pooling_kernel_size, self.pooling_stride, self.pooling_padding
                )
                w = _conv_out(
                    w, self.pooling_kernel_size, self.pooling_stride, self.pooling_padding
                )
        return f * h * w

    @nn.compact
    def __call__(self, x):
        # (b, c, f, h, w) → NDHWC
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        chans = (
            [self.n_input_channels]
            + [self.in_planes] * (self.n_conv_layers - 1)
            + [self.n_output_channels]
        )
        for i, chan_out in enumerate(chans[1:]):
            x = nn.Conv(
                chan_out,
                (self.frame_kernel_size, self.kernel_size, self.kernel_size),
                strides=(self.frame_stride, self.stride, self.stride),
                padding=(
                    (self._fp(), self._fp()),
                    (self.padding, self.padding),
                    (self.padding, self.padding),
                ),
                use_bias=self.conv_bias,
                kernel_init=nn.initializers.kaiming_normal(),
                name=f"conv_{i}",
            )(x)
            if self.use_relu:
                x = jax.nn.relu(x)
            if self.max_pool:
                x = nn.max_pool(
                    x,
                    (
                        self.frame_pooling_kernel_size,
                        self.pooling_kernel_size,
                        self.pooling_kernel_size,
                    ),
                    strides=(
                        self.frame_pooling_stride,
                        self.pooling_stride,
                        self.pooling_stride,
                    ),
                    padding=(
                        (self._fpp(), self._fpp()),
                        (self.pooling_padding, self.pooling_padding),
                        (self.pooling_padding, self.pooling_padding),
                    ),
                )
        b = x.shape[0]
        return x.reshape(b, -1, x.shape[-1])


class CCT(nn.Module):
    """reference cct_3d.py:325 — same keyword constructor."""

    img_size: int | tuple = 224
    num_frames: int = 8
    embedding_dim: int = 768
    n_input_channels: int = 3
    n_conv_layers: int = 1
    frame_stride: int = 1
    frame_kernel_size: int = 3
    frame_padding: Optional[int] = None
    frame_pooling_kernel_size: int = 1
    frame_pooling_stride: int = 1
    frame_pooling_padding: Optional[int] = None
    kernel_size: int = 7
    stride: int = 2
    padding: int = 3
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    num_layers: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    num_classes: int = 1000
    positional_embedding: str = "sine"
    seq_pool: bool = True
    dropout_rate: float = 0.0
    attention_dropout: float = 0.1
    stochastic_depth_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        img_height, img_width = pair(self.img_size)
        tokenizer = Tokenizer3D(
            n_input_channels=self.n_input_channels,
            n_output_channels=self.embedding_dim,
            frame_stride=self.frame_stride,
            frame_kernel_size=self.frame_kernel_size,
            frame_padding=self.frame_padding,
            frame_pooling_stride=self.frame_pooling_stride,
            frame_pooling_kernel_size=self.frame_pooling_kernel_size,
            frame_pooling_padding=self.frame_pooling_padding,
            kernel_size=self.kernel_size,
            stride=self.stride,
            padding=self.padding,
            pooling_kernel_size=self.pooling_kernel_size,
            pooling_stride=self.pooling_stride,
            pooling_padding=self.pooling_padding,
            max_pool=True,
            use_relu=True,
            n_conv_layers=self.n_conv_layers,
            conv_bias=False,
            name="tokenizer",
        )
        seq_len = tokenizer.sequence_length(self.num_frames, img_height, img_width)
        x = tokenizer(x)
        return TransformerClassifier(
            sequence_length=seq_len,
            embedding_dim=self.embedding_dim,
            seq_pool=self.seq_pool,
            dropout_rate=self.dropout_rate,
            attention_dropout=self.attention_dropout,
            stochastic_depth_rate=self.stochastic_depth_rate,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            num_classes=self.num_classes,
            positional_embedding=self.positional_embedding,
            name="classifier",
        )(x, train=train)


def _cct(num_layers, num_heads, mlp_ratio, embedding_dim, kernel_size=3, stride=None, padding=None, **kwargs):
    stride = default(stride, max(1, (kernel_size // 2) - 1))
    padding = default(padding, max(1, (kernel_size // 2)))
    return CCT(
        num_layers=num_layers,
        num_heads=num_heads,
        mlp_ratio=mlp_ratio,
        embedding_dim=embedding_dim,
        kernel_size=kernel_size,
        stride=stride,
        padding=padding,
        **kwargs,
    )


def cct_2(**kw):
    return _cct(2, 2, 1, 128, **kw)


def cct_4(**kw):
    return _cct(4, 2, 1, 128, **kw)


def cct_6(**kw):
    return _cct(6, 4, 2, 256, **kw)


def cct_7(**kw):
    return _cct(7, 4, 2, 256, **kw)


def cct_8(**kw):
    return _cct(8, 4, 2, 256, **kw)


def cct_14(**kw):
    return _cct(14, 6, 3, 384, **kw)


def cct_16(**kw):
    return _cct(16, 6, 3, 384, **kw)
