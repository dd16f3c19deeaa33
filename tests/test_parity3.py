"""Parity tests batch 3: vit_1d, vit_3d, deepvit, cait, parallel_vit."""

import numpy as np
import jax.numpy as jnp
import pytest


def _check(got, expected, atol=5e-5, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), expected, atol=atol, rtol=rtol)


@pytest.mark.parity
def test_vit_1d_parity(reference, torch):
    from vit_pytorch.vit_1d import ViT as RefViT
    from vit_pytorch_tpu.models.vit_1d import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit_1d

    kw = dict(seq_len=64, patch_size=8, num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(convert_vit_1d(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_vit_3d_parity(reference, torch):
    from vit_pytorch.vit_3d import ViT as RefViT
    from vit_pytorch_tpu.models.vit_3d import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit_3d

    kw = dict(image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
              num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(convert_vit_3d(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_deepvit_parity(reference, torch):
    from vit_pytorch.deepvit import DeepViT as RefDeepViT
    from vit_pytorch_tpu.models.deepvit import DeepViT
    from vit_pytorch_tpu.utils.convert import convert_deepvit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    ref = RefDeepViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = DeepViT(**kw).apply(convert_deepvit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_cait_parity(reference, torch):
    from vit_pytorch.cait import CaiT as RefCaiT
    from vit_pytorch_tpu.models.cait import CaiT
    from vit_pytorch_tpu.utils.convert import convert_cait

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2, cls_depth=1,
              heads=2, dim_head=16, mlp_dim=64)
    ref = RefCaiT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = CaiT(**kw).apply(convert_cait(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_parallel_vit_parity(reference, torch):
    from vit_pytorch.parallel_vit import ViT as RefViT
    from vit_pytorch_tpu.models.parallel_vit import ViT
    from vit_pytorch_tpu.utils.convert import convert_parallel_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2, heads=2,
              dim_head=16, mlp_dim=64, num_parallel_branches=2)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(convert_parallel_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)
