"""Parity tests batch 4: vit_for_small_dataset (SPT+LSA), PiT."""

import numpy as np
import jax.numpy as jnp
import pytest


def _check(got, expected, atol=5e-5, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), expected, atol=atol, rtol=rtol)


@pytest.mark.parity
def test_small_dataset_vit_parity(reference, torch):
    from vit_pytorch.vit_for_small_dataset import ViT as RefViT
    from vit_pytorch_tpu.models.vit_for_small_dataset import ViT
    from vit_pytorch_tpu.utils.convert import convert_small_dataset_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(convert_small_dataset_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_pit_parity(reference, torch):
    from vit_pytorch.pit import PiT as RefPiT
    from vit_pytorch_tpu.models.pit import PiT
    from vit_pytorch_tpu.utils.convert import convert_pit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32,
              depth=(1, 1, 1), heads=2, dim_head=16, mlp_dim=64)
    ref = RefPiT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = PiT(**kw).apply(convert_pit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_t2t_parity(reference, torch):
    from vit_pytorch.t2t import T2TViT as RefT2T
    from vit_pytorch_tpu.models.t2t import T2TViT
    from vit_pytorch_tpu.utils.convert import convert_t2t

    kw = dict(image_size=32, num_classes=7, dim=32, depth=2, heads=2,
              mlp_dim=64, t2t_layers=((3, 2), (3, 2)))
    ref = RefT2T(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = T2TViT(**kw).apply(convert_t2t(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_cross_vit_parity(reference, torch):
    from vit_pytorch.cross_vit import CrossViT as RefCrossViT
    from vit_pytorch_tpu.models.cross_vit import CrossViT
    from vit_pytorch_tpu.utils.convert import convert_cross_vit

    kw = dict(image_size=32, num_classes=7, sm_dim=32, lg_dim=48, depth=2,
              sm_patch_size=4, sm_enc_depth=1, sm_enc_heads=2, sm_enc_mlp_dim=64,
              sm_enc_dim_head=16, lg_patch_size=8, lg_enc_depth=1, lg_enc_heads=2,
              lg_enc_mlp_dim=64, lg_enc_dim_head=16, cross_attn_depth=1,
              cross_attn_heads=2, cross_attn_dim_head=16)
    ref = RefCrossViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = CrossViT(**kw).apply(convert_cross_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_cct_parity(reference, torch):
    from vit_pytorch.cct import CCT as RefCCT
    from vit_pytorch_tpu.models.cct import CCT
    from vit_pytorch_tpu.utils.convert import convert_cct

    kw = dict(img_size=32, embedding_dim=64, n_conv_layers=2, kernel_size=3,
              stride=2, padding=1, pooling_kernel_size=3, pooling_stride=2,
              pooling_padding=1, num_layers=2, num_heads=2, mlp_ratio=2.0,
              num_classes=7, positional_embedding="learnable")
    ref = RefCCT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = CCT(**kw).apply(convert_cct(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_levit_parity(reference, torch):
    from vit_pytorch.levit import LeViT as RefLeViT
    from vit_pytorch_tpu.models.levit import LeViT
    from vit_pytorch_tpu.utils.convert import convert_levit

    kw = dict(image_size=32, num_classes=7, stages=2, dim=(32, 64), depth=1,
              heads=(2, 2), mlp_mult=2, dropout=0.0)
    ref = RefLeViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    variables = convert_levit(ref.state_dict())
    got = LeViT(**kw).apply(variables, jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_xcit_parity(reference, torch):
    from vit_pytorch.xcit import XCiT as RefXCiT
    from vit_pytorch_tpu.models.xcit import XCiT
    from vit_pytorch_tpu.utils.convert import convert_xcit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              cls_depth=1, heads=2, mlp_dim=64, dim_head=16,
              local_patch_kernel_size=3, layer_dropout=0.0)
    ref = RefXCiT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = XCiT(**kw).apply(convert_xcit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_twins_svt_parity(reference, torch):
    from vit_pytorch.twins_svt import TwinsSVT as RefTwins
    from vit_pytorch_tpu.models.twins_svt import TwinsSVT
    from vit_pytorch_tpu.utils.convert import convert_twins_svt

    kw = dict(num_classes=7, s1_emb_dim=16, s1_patch_size=4, s1_local_patch_size=4,
              s1_global_k=4, s1_depth=1, s2_emb_dim=32, s2_patch_size=2,
              s2_local_patch_size=4, s2_global_k=4, s2_depth=1,
              s3_emb_dim=48, s3_patch_size=2, s3_local_patch_size=4, s3_global_k=4,
              s3_depth=1, s4_emb_dim=64, s4_patch_size=2, s4_local_patch_size=4,
              s4_global_k=4, s4_depth=1, peg_kernel_size=3, dropout=0.0)
    ref = RefTwins(**kw).eval()
    x = torch.randn(1, 3, 256, 256)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = TwinsSVT(**kw).apply(convert_twins_svt(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_mobile_vit_parity(reference, torch):
    from vit_pytorch.mobile_vit import MobileViT as RefMobileViT
    from vit_pytorch_tpu.models.mobile_vit import MobileViT
    from vit_pytorch_tpu.utils.convert import convert_mobile_vit

    kw = dict(image_size=(64, 64), dims=(16, 24, 32),
              channels=(4, 8, 12, 12, 16, 16, 24, 24, 32, 32, 40),
              num_classes=7, depths=(1, 1, 1))
    ref = RefMobileViT(**kw).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = MobileViT(**kw).apply(convert_mobile_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)
