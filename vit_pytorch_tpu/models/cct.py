"""CCT — compact convolutional transformer (reference cct.py:306-353).

Conv tokenizer (Conv→ReLU→MaxPool stack, cct.py:162-201), transformer with
per-layer stochastic depth (DropPath, cct.py:144-160), sine/learnable/none
positional embeddings and seq-pool head (learned attention over tokens,
cct.py:286-288).

TPU notes: the sequence length is computed *analytically* at trace time
(conv arithmetic) instead of the reference's zeros-forward probe
(cct.py:197-198, SURVEY §7.2); convs run NHWC."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..nn.blocks import LN_EPS
from ..nn.blocks import gelu as _gelu
from ..utils.helpers import default, exists, pair
from ..ops.attention import dot_product_attention

__all__ = ["CCT", "cct_2", "cct_4", "cct_6", "cct_7", "cct_8", "cct_14", "cct_16"]


def _conv_out(size, kernel, stride, padding):
    return (size + 2 * padding - kernel) // stride + 1


def sinusoidal_embedding(n_channels: int, dim: int) -> jnp.ndarray:
    """reference cct.py:75-80."""
    pe = np.array(
        [
            [p / (10000 ** (2 * (i // 2) / dim)) for i in range(dim)]
            for p in range(n_channels)
        ],
        dtype=np.float32,
    )
    pe[:, 0::2] = np.sin(pe[:, 0::2])
    pe[:, 1::2] = np.cos(pe[:, 1::2])
    return jnp.asarray(pe[None])


class DropPath(nn.Module):
    """Per-sample stochastic depth (reference cct.py:144-160)."""

    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if self.drop_prob <= 0.0 or not train:
            return x
        keep_prob = 1 - self.drop_prob
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.uniform(rng, shape) < keep_prob
        return jnp.where(keep, x / keep_prob, 0.0)


class Tokenizer(nn.Module):
    """reference cct.py:162-206 (NHWC; kaiming conv init)."""

    kernel_size: int
    stride: int
    padding: int
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

    def filters(self):
        return (
            [self.n_input_channels]
            + [self.in_planes] * (self.n_conv_layers - 1)
            + [self.n_output_channels]
        )

    def sequence_length(self, height: int, width: int) -> int:
        h, w = height, width
        for _ in range(self.n_conv_layers):
            h = _conv_out(h, self.kernel_size, self.stride, self.padding)
            w = _conv_out(w, self.kernel_size, self.stride, self.padding)
            if self.max_pool:
                h = _conv_out(
                    h, self.pooling_kernel_size, self.pooling_stride, self.pooling_padding
                )
                w = _conv_out(
                    w, self.pooling_kernel_size, self.pooling_stride, self.pooling_padding
                )
        return h * w

    @nn.compact
    def __call__(self, x):
        # NCHW in (reference convention) → NHWC
        x = jnp.transpose(x, (0, 2, 3, 1))
        chans = self.filters()
        for i, chan_out in enumerate(chans[1:]):
            x = nn.Conv(
                chan_out,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=self.padding,
                use_bias=self.conv_bias,
                kernel_init=nn.initializers.kaiming_normal(),
                name=f"conv_{i}",
            )(x)
            if self.use_relu:
                x = jax.nn.relu(x)
            if self.max_pool:
                x = nn.max_pool(
                    x,
                    (self.pooling_kernel_size, self.pooling_kernel_size),
                    strides=(self.pooling_stride, self.pooling_stride),
                    padding=(
                        (self.pooling_padding, self.pooling_padding),
                        (self.pooling_padding, self.pooling_padding),
                    ),
                )
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class CCTAttention(nn.Module):
    """reference cct.py:84-111 — head_dim = dim // heads, q pre-scaled."""

    dim: int
    num_heads: int = 8
    attention_dropout: float = 0.1
    projection_dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = self.num_heads
        head_dim = self.dim // h
        scale = head_dim**-0.5

        qkv = nn.Dense(self.dim * 3, use_bias=False, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        out = dot_product_attention(
            q,
            k,
            v,
            scale=scale,
            dropout_rate=self.attention_dropout if train else 0.0,
            dropout_rng=self.make_rng("dropout")
            if train and self.attention_dropout > 0
            else None,
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        return nn.Dropout(self.projection_dropout, deterministic=not train)(out)


class TransformerEncoderLayer(nn.Module):
    """reference cct.py:114-142 — note the FF residual re-uses the normed
    stream (``src = self.norm1(src)`` is a reassignment, line 139)."""

    d_model: int
    nhead: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    attention_dropout: float = 0.1
    drop_path_rate: float = 0.1

    @nn.compact
    def __call__(self, src, *, train: bool = False):
        drop_path = DropPath(self.drop_path_rate, name="drop_path")
        attn_out = CCTAttention(
            dim=self.d_model,
            num_heads=self.nhead,
            attention_dropout=self.attention_dropout,
            projection_dropout=self.dropout,
            name="self_attn",
        )(nn.LayerNorm(epsilon=LN_EPS, name="pre_norm")(src), train=train)
        src = src + drop_path(attn_out, train=train)

        src = nn.LayerNorm(epsilon=LN_EPS, name="norm1")(src)
        src2 = nn.Dense(self.dim_feedforward, name="linear1")(src)
        src2 = _gelu(src2)
        src2 = nn.Dropout(self.dropout, deterministic=not train)(src2)
        src2 = nn.Dense(self.d_model, name="linear2")(src2)
        src2 = nn.Dropout(self.dropout, deterministic=not train)(src2)
        return src + drop_path(src2, train=train)


class TransformerClassifier(nn.Module):
    """reference cct.py:209-292."""

    seq_pool: bool = True
    embedding_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    dropout_rate: float = 0.1
    attention_dropout: float = 0.1
    stochastic_depth_rate: float = 0.1
    positional_embedding: str = "sine"
    sequence_length: Optional[int] = None

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        assert self.positional_embedding in {"sine", "learnable", "none"}
        assert exists(self.sequence_length) or self.positional_embedding == "none"
        b = x.shape[0]
        dim_feedforward = int(self.embedding_dim * self.mlp_ratio)

        seq_len = self.sequence_length
        if not self.seq_pool:
            seq_len = seq_len + 1
            class_emb = self.param(
                "class_emb", nn.initializers.zeros, (1, 1, self.embedding_dim)
            )
            cls = jnp.broadcast_to(
                class_emb, (b, 1, self.embedding_dim)
            ).astype(x.dtype)
            x = jnp.concatenate([cls, x], axis=1)

        if self.positional_embedding == "learnable":
            pos = self.param(
                "positional_emb",
                nn.initializers.truncated_normal(0.2),
                (1, seq_len, self.embedding_dim),
            )
            x = x + pos.astype(x.dtype)
        elif self.positional_embedding == "sine":
            x = x + sinusoidal_embedding(seq_len, self.embedding_dim).astype(x.dtype)

        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)

        dpr = np.linspace(0, self.stochastic_depth_rate, self.num_layers)
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                d_model=self.embedding_dim,
                nhead=self.num_heads,
                dim_feedforward=dim_feedforward,
                dropout=self.dropout_rate,
                attention_dropout=self.attention_dropout,
                drop_path_rate=float(dpr[i]),
                name=f"blocks_{i}",
            )(x, train=train)

        x = nn.LayerNorm(epsilon=LN_EPS, name="norm")(x)

        if self.seq_pool:
            attn_weights = nn.Dense(1, name="attention_pool")(x)[..., 0]
            x = jnp.einsum(
                "bn,bnd->bd", jax.nn.softmax(attn_weights, axis=1), x
            )
        else:
            x = x[:, 0]

        return nn.Dense(self.num_classes, name="fc")(x)


class CCT(nn.Module):
    """reference cct.py:306 — same keyword constructor (extra transformer
    kwargs are fields here)."""

    img_size: int | tuple = 224
    embedding_dim: int = 768
    n_input_channels: int = 3
    n_conv_layers: int = 1
    kernel_size: int = 7
    stride: int = 2
    padding: int = 3
    pooling_kernel_size: int = 3
    pooling_stride: int = 2
    pooling_padding: int = 1
    dropout_rate: float = 0.0
    attention_dropout: float = 0.1
    stochastic_depth_rate: float = 0.1
    num_layers: int = 14
    num_heads: int = 6
    mlp_ratio: float = 3.0
    num_classes: int = 1000
    positional_embedding: str = "sine"
    seq_pool: bool = True

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        img_height, img_width = pair(self.img_size)
        tokenizer = Tokenizer(
            n_input_channels=self.n_input_channels,
            n_output_channels=self.embedding_dim,
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
        seq_len = tokenizer.sequence_length(img_height, img_width)
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
    return _cct(num_layers=2, num_heads=2, mlp_ratio=1, embedding_dim=128, **kw)


def cct_4(**kw):
    return _cct(num_layers=4, num_heads=2, mlp_ratio=1, embedding_dim=128, **kw)


def cct_6(**kw):
    return _cct(num_layers=6, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_7(**kw):
    return _cct(num_layers=7, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_8(**kw):
    return _cct(num_layers=8, num_heads=4, mlp_ratio=2, embedding_dim=256, **kw)


def cct_14(**kw):
    return _cct(num_layers=14, num_heads=6, mlp_ratio=3, embedding_dim=384, **kw)


def cct_16(**kw):
    return _cct(num_layers=16, num_heads=6, mlp_ratio=3, embedding_dim=384, **kw)
