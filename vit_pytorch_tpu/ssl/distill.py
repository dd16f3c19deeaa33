"""DeiT-style knowledge distillation (reference distill.py:22-159).

``DistillableViT`` is our ViT with an optional distillation token appended
per forward (distill.py:23-49); ``to_vit()`` is parameter-identity here —
the param tree is the same, so the distillable params load straight into a
plain ViT (the reference round-trips a state_dict, distill.py:59-62)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from ..nn.blocks import LN_EPS
from ..models.vit import ViT
from ..models.t2t import T2TViT
from ..models.efficient import ViT as EfficientViT
from ..utils.helpers import default, exists


def _clone_fields(module, cls):
    """Fields of ``module`` restricted to ``cls``'s constructor (for
    parameter-identity ``to_vit`` conversions, reference distill.py:59-62)."""
    return cls(**{
        k: getattr(module, k)
        for k in cls.__dataclass_fields__
        if k not in ("parent", "name")
    })


class DistillableViT(ViT):
    """reference distill.py:51-67 — ViT whose forward takes an optional
    ``distill_token`` ((1, dim)) appended after the sequence, excluded from
    pos emb and pooling."""

    @nn.nowrap
    def to_vit(self) -> ViT:
        """Parameter-compatible plain ViT (distill.py:59-62)."""
        return _clone_fields(self, ViT)

    def __call__(self, img, distill_token=None, *, train: bool = False):
        distilling = exists(distill_token)
        # reference distill.py:33-34,64-66: the emb dropout runs AFTER the
        # distill token is appended, so the token is dropped out too
        x = self.embed(img, train=train, dropout=False)

        if distilling:
            b = x.shape[0]
            tokens = jnp.broadcast_to(
                distill_token, (b, 1, self.dim)
            ).astype(x.dtype)
            x = jnp.concatenate([x, tokens], axis=1)

        x = self.emb_drop(x, deterministic=not train)
        x = self.transformer(x, train=train)

        if distilling:
            x, distill_out = x[:, :-1], x[:, -1]

        x = x.mean(axis=1) if self.pool == "mean" else x[:, 0]
        out = self.mlp_head(x)

        if distilling:
            return out, distill_out
        return out


class DistillableT2TViT(T2TViT):
    """reference distill.py:69-85 — T2TViT whose forward takes an optional
    ``distill_token`` appended after cls+pos emb, excluded from pooling.
    Parameter tree is identical to T2TViT, so ``to_vit`` is field-copy only
    (the reference round-trips a state_dict, distill.py:79-82)."""

    @nn.nowrap
    def to_vit(self) -> T2TViT:
        return _clone_fields(self, T2TViT)

    @nn.compact
    def __call__(self, img, distill_token=None, *, train: bool = False):
        distilling = exists(distill_token)
        # distill.py:33-34,84-85: emb dropout runs AFTER the token is appended
        x = self.embed(img, train=train, dropout=False)

        if distilling:
            b = x.shape[0]
            tokens = jnp.broadcast_to(distill_token, (b, 1, self.dim)).astype(x.dtype)
            x = jnp.concatenate([x, tokens], axis=1)

        x = nn.Dropout(self.emb_dropout, deterministic=not train)(x)
        x = self.trunk(x, train=train)

        if distilling:
            x, distill_out = x[:, :-1], x[:, -1]

        out = self.head(x)
        if distilling:
            return out, distill_out
        return out


class DistillableEfficientViT(EfficientViT):
    """reference distill.py:87-101 — external-transformer ViT with the
    distill token; its ``_attend`` has no dropout (distill.py:100-101)."""

    @nn.nowrap
    def to_vit(self) -> EfficientViT:
        return _clone_fields(self, EfficientViT)

    @nn.compact
    def __call__(self, img, distill_token=None, *, train: bool = False):
        distilling = exists(distill_token)
        x = self.embed(img)

        if distilling:
            b = x.shape[0]
            tokens = jnp.broadcast_to(distill_token, (b, 1, self.dim)).astype(x.dtype)
            x = jnp.concatenate([x, tokens], axis=1)

        x = self.transformer(x, train=train)

        if distilling:
            x, distill_out = x[:, :-1], x[:, -1]

        out = self.head(x)
        if distilling:
            return out, distill_out
        return out


class DistillWrapper(nn.Module):
    """reference distill.py:105 — same keyword constructor.  ``teacher`` is
    (module, variables) so frozen teachers of any framework layout work."""

    teacher: Any
    student: Any
    teacher_params: Any = None
    temperature: float = 1.0
    alpha: float = 0.5
    hard: bool = False
    mlp_layernorm: bool = False

    def setup(self):
        dim = self.student.dim
        self.distillation_token = self.param(
            "distillation_token", nn.initializers.normal(1.0), (1, dim)
        )
        if self.mlp_layernorm:
            self.distill_norm = nn.LayerNorm(epsilon=LN_EPS, name="distill_norm")
        self.distill_mlp = nn.Dense(self.student.num_classes, name="distill_mlp")

    def __call__(
        self,
        img,
        labels,
        temperature: Optional[float] = None,
        alpha: Optional[float] = None,
        *,
        teacher_logits=None,
        train: bool = False,
    ):
        alpha = default(alpha, self.alpha)
        T = default(temperature, self.temperature)

        assert teacher_logits is not None, (
            "compute teacher logits outside apply (frozen teacher params are "
            "not part of this module's variables) — see distill_forward"
        )
        teacher_logits = jax.lax.stop_gradient(teacher_logits)

        student_logits, distill_tokens = self.student(
            img, distill_token=self.distillation_token, train=train
        )
        if self.mlp_layernorm:
            distill_tokens = self.distill_norm(distill_tokens)
        distill_logits = self.distill_mlp(distill_tokens)

        loss = optax.softmax_cross_entropy_with_integer_labels(
            student_logits, labels
        ).mean()

        if not self.hard:
            log_p = jax.nn.log_softmax(distill_logits / T, axis=-1)
            q = jax.nn.softmax(teacher_logits / T, axis=-1)
            # F.kl_div(log_p, q, reduction='batchmean') = sum q(log q − log p)/B
            distill_loss = jnp.sum(
                q * (jnp.log(jnp.clip(q, 1e-20)) - log_p)
            ) / img.shape[0]
            distill_loss = distill_loss * T**2
        else:
            teacher_labels = jnp.argmax(teacher_logits, axis=-1)
            distill_loss = optax.softmax_cross_entropy_with_integer_labels(
                distill_logits, teacher_labels
            ).mean()

        return loss * (1 - alpha) + distill_loss * alpha


def distill_forward(
    wrapper: DistillWrapper,
    params,
    teacher_variables,
    img,
    labels,
    *,
    temperature: Optional[float] = None,
    alpha: Optional[float] = None,
    train: bool = False,
    rngs=None,
):
    """Full distillation step (reference distill.py:135-159): teacher runs
    frozen outside the wrapper's variable scope.  (The teacher field may have
    been adopted by a previous init — clone back to unbound.)"""
    teacher = wrapper.teacher.clone(parent=None)
    teacher_logits = teacher.apply(teacher_variables, img)
    return wrapper.apply(
        params,
        img,
        labels,
        temperature,
        alpha,
        teacher_logits=teacher_logits,
        train=train,
        rngs=rngs,
    )
