"""DistillableT2TViT / DistillableEfficientViT (reference distill.py:69-101):
converted-weight logit parity (with and without distill token) and to_vit
round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def _check(got, expected, atol=5e-5, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), expected, atol=atol, rtol=rtol)


T2T_KW = dict(image_size=32, num_classes=7, dim=32, depth=2, heads=2,
              mlp_dim=64, t2t_layers=((3, 2), (3, 2)))


def _fix_ref_cls_token(torch, ref):
    """The reference DistillMixin (distill.py:24-28) repeats cls_token with
    pattern 'n d -> b n d', which only fits vit.py's 2-dim cls_token; T2TViT
    and EfficientViT create (1, 1, d) tokens (t2t.py:52, efficient.py:26), so
    the reference forward crashes as shipped.  Squeezing to (1, d) restores
    the intended semantics without changing any value — we convert from the
    unpatched state_dict and compare against the fixed reference."""
    ref.cls_token = torch.nn.Parameter(ref.cls_token.data.squeeze(0))


@pytest.mark.parity
def test_distillable_t2t_parity(reference, torch):
    from vit_pytorch.distill import DistillableT2TViT as Ref
    from vit_pytorch_tpu.ssl.distill import DistillableT2TViT
    from vit_pytorch_tpu.utils.convert import convert_distillable_t2t

    ref = Ref(**T2T_KW).eval()
    x = torch.randn(2, 3, 32, 32)
    token = torch.randn(1, T2T_KW["dim"])
    params = convert_distillable_t2t(ref.state_dict())
    _fix_ref_cls_token(torch, ref)
    with torch.no_grad():
        expected = ref(x).numpy()
        exp_out, exp_distill = ref(x, distill_token=token)

    model = DistillableT2TViT(**T2T_KW)
    got = model.apply(params, jnp.asarray(x.numpy()))
    _check(got, expected)

    got_out, got_distill = model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(token.numpy())
    )
    _check(got_out, exp_out.numpy())
    _check(got_distill, exp_distill.numpy())


@pytest.mark.parity
def test_distillable_t2t_to_vit(reference, torch):
    """to_vit round-trip: the same params run identically through plain
    T2TViT (reference distill.py:79-82 state_dict round-trip)."""
    from vit_pytorch_tpu.ssl.distill import DistillableT2TViT
    from vit_pytorch_tpu.models.t2t import T2TViT

    model = DistillableT2TViT(**T2T_KW)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 32, 32)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    plain = model.to_vit()
    assert isinstance(plain, T2TViT) and not isinstance(plain, DistillableT2TViT)
    _check(plain.apply(params, x), np.asarray(model.apply(params, x)), atol=1e-6)


@pytest.mark.parity
def test_distillable_efficient_parity(reference, torch):
    """External-transformer distillable wrapper with identity transformers on
    both sides, isolating the distill plumbing (reference distill.py:87-101;
    note its _attend applies NO dropout, distill.py:100-101)."""
    import flax.linen as fnn
    from vit_pytorch.distill import DistillableEfficientViT as Ref
    from vit_pytorch_tpu.ssl.distill import DistillableEfficientViT
    from vit_pytorch_tpu.utils.convert import convert_distillable_efficient_vit

    class TorchIdentity(torch.nn.Module):
        def forward(self, x):
            return x

    class FlaxIdentity(fnn.Module):
        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return x

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32)
    ref = Ref(**kw, transformer=TorchIdentity()).eval()
    x = torch.randn(2, 3, 32, 32)
    token = torch.randn(1, kw["dim"])
    params = convert_distillable_efficient_vit(ref.state_dict())
    _fix_ref_cls_token(torch, ref)
    with torch.no_grad():
        expected = ref(x).numpy()
        exp_out, exp_distill = ref(x, distill_token=token)

    model = DistillableEfficientViT(**kw, transformer=FlaxIdentity())
    got = model.apply(params, jnp.asarray(x.numpy()))
    _check(got, expected)

    got_out, got_distill = model.apply(
        params, jnp.asarray(x.numpy()), jnp.asarray(token.numpy())
    )
    _check(got_out, exp_out.numpy())
    _check(got_distill, exp_distill.numpy())


def test_distill_wrapper_t2t_student():
    """DistillWrapper accepts the new student types (distill.py:117)."""
    import flax.linen as fnn
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.ssl.distill import (
        DistillableEfficientViT, DistillableT2TViT, DistillWrapper,
        distill_forward,
    )

    teacher = ViT(image_size=32, patch_size=8, num_classes=7, dim=32, depth=1,
                  heads=2, mlp_dim=64)
    img = jnp.zeros((2, 3, 32, 32))
    labels = jnp.zeros((2,), jnp.int32)
    tvars = teacher.init(jax.random.PRNGKey(0), img)

    w = DistillWrapper(teacher=teacher, student=DistillableT2TViT(**T2T_KW),
                       temperature=3.0, alpha=0.5)
    params = w.init(jax.random.PRNGKey(1), img, labels,
                    teacher_logits=jnp.zeros((2, 7)))
    loss = distill_forward(w, params, tvars, img, labels)
    assert np.isfinite(float(loss))

    class FlaxIdentity(fnn.Module):
        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return x

    w2 = DistillWrapper(
        teacher=teacher,
        student=DistillableEfficientViT(
            image_size=32, patch_size=8, num_classes=7, dim=32,
            transformer=FlaxIdentity(),
        ),
        hard=True,
    )
    p2 = w2.init(jax.random.PRNGKey(2), img, labels,
                 teacher_logits=jnp.zeros((2, 7)))
    loss2 = distill_forward(w2, p2, tvars, img, labels)
    assert np.isfinite(float(loss2))
