"""Parity tests batch 5: simple-ViT family variants + patch merger."""

import numpy as np
import jax.numpy as jnp
import pytest


def _check(got, expected, atol=5e-5, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), expected, atol=atol, rtol=rtol)


@pytest.mark.parity
def test_simple_vit_1d_parity(reference, torch):
    from vit_pytorch.simple_vit_1d import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_vit_1d import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_vit_1d

    kw = dict(seq_len=64, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(convert_simple_vit_1d(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_simple_vit_3d_parity(reference, torch):
    from vit_pytorch.simple_vit_3d import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_vit_3d import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_vit_3d

    kw = dict(image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
              num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(convert_simple_vit_3d(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_simple_vit_register_tokens_parity(reference, torch):
    from vit_pytorch.simple_vit_with_register_tokens import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_vit_with_register_tokens import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_vit_with_register_tokens

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64, num_register_tokens=3)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(
        convert_simple_vit_with_register_tokens(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_vit_with_patch_merger_parity(reference, torch):
    from vit_pytorch.vit_with_patch_merger import ViT as Ref
    from vit_pytorch_tpu.models.vit_with_patch_merger import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit_with_patch_merger

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=4,
              heads=2, dim_head=16, mlp_dim=64, patch_merge_layer=1,
              patch_merge_num_tokens=4)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(
        convert_vit_with_patch_merger(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_look_vit_parity(reference, torch):
    from vit_pytorch.look_vit import LookViT as Ref
    from vit_pytorch_tpu.models.look_vit import LookViT
    from vit_pytorch_tpu.utils.convert import convert_look_vit

    kw = dict(dim=32, image_size=32, num_classes=7, depth=2, patch_size=8,
              heads=2, dim_head=16, mlp_factor=2, highres_patch_size=4,
              dropout=0.0)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = LookViT(**kw).apply(convert_look_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_jumbo_vit_parity(reference, torch):
    from vit_pytorch.jumbo_vit import JumboViT as Ref
    from vit_pytorch_tpu.models.jumbo_vit import JumboViT
    from vit_pytorch_tpu.utils.convert import convert_jumbo_vit

    kw = dict(num_classes=7, image_size=32, patch_size=8, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64, num_jumbo_cls=1,
              jumbo_ff_mult=2, jumbo_cls_k=2)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = JumboViT(**kw).apply(convert_jumbo_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_cvt_parity(reference, torch):
    from vit_pytorch.cvt import CvT as Ref
    from vit_pytorch_tpu.models.cvt import CvT
    from vit_pytorch_tpu.utils.convert import convert_cvt

    kw = dict(num_classes=7, s1_emb_dim=16, s1_emb_kernel=7, s1_emb_stride=4,
              s1_proj_kernel=3, s1_kv_proj_stride=2, s1_heads=1, s1_depth=1,
              s1_mlp_mult=2, s2_emb_dim=32, s2_emb_kernel=3, s2_emb_stride=2,
              s2_proj_kernel=3, s2_kv_proj_stride=2, s2_heads=2, s2_depth=1,
              s2_mlp_mult=2, s3_emb_dim=48, s3_emb_kernel=3, s3_emb_stride=2,
              s3_proj_kernel=3, s3_kv_proj_stride=2, s3_heads=2, s3_depth=1,
              s3_mlp_mult=2, dropout=0.0)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = CvT(**kw).apply(convert_cvt(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


def _simple_family(reference, torch, ref_mod, my_mod, conv_name, depth=2, **extra):
    import importlib
    Ref = getattr(importlib.import_module(f"vit_pytorch.{ref_mod}"), "SimpleViT")
    Mine = getattr(importlib.import_module(f"vit_pytorch_tpu.models.{my_mod}"), "SimpleViT")
    import vit_pytorch_tpu.utils.convert as C
    conv = getattr(C, conv_name)

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=depth,
              heads=2, dim_head=16, mlp_dim=64, **extra)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = Mine(**kw).apply(conv(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_simple_vit_qk_norm_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_qk_norm",
                   "simple_vit_with_qk_norm", "convert_simple_vit_with_qk_norm")


@pytest.mark.parity
def test_simple_vit_patch_dropout_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_patch_dropout",
                   "simple_vit_with_patch_dropout",
                   "convert_simple_vit_with_patch_dropout")


@pytest.mark.parity
def test_simple_vit_value_residual_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_value_residual",
                   "simple_vit_with_value_residual",
                   "convert_simple_vit_with_value_residual", depth=3)


@pytest.mark.parity
def test_simple_vit_specialized_cls_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_specialized_cls",
                   "simple_vit_with_specialized_cls",
                   "convert_simple_vit_with_specialized_cls")


@pytest.mark.parity
def test_simple_vit_fft_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_fft",
                   "simple_vit_with_fft", "convert_simple_vit_with_fft",
                   freq_patch_size=8)


@pytest.mark.parity
def test_simple_vit_hyper_connections_parity(reference, torch):
    _simple_family(reference, torch, "simple_vit_with_hyper_connections",
                   "simple_vit_with_hyper_connections",
                   "convert_simple_vit_with_hyper_connections",
                   num_residual_streams=2)


@pytest.mark.parity
def test_rvt_parity(reference, torch):
    from vit_pytorch.rvt import RvT as Ref
    from vit_pytorch_tpu.models.rvt import RvT
    from vit_pytorch_tpu.utils.convert import convert_rvt

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = RvT(**kw).apply(convert_rvt(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_nest_parity(reference, torch):
    from vit_pytorch.nest import NesT as Ref
    from vit_pytorch_tpu.models.nest import NesT
    from vit_pytorch_tpu.utils.convert import convert_nest

    kw = dict(image_size=64, patch_size=4, num_classes=7, dim=16, heads=2,
              num_hierarchies=3, block_repeats=(1, 1, 1), mlp_mult=2)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = NesT(**kw).apply(convert_nest(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_learnable_memory_vit_parity(reference, torch):
    from vit_pytorch.learnable_memory_vit import ViT as Ref
    from vit_pytorch_tpu.models.learnable_memory_vit import ViT
    from vit_pytorch_tpu.utils.convert import convert_learnable_memory_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw).apply(
        convert_learnable_memory_vit(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_sep_vit_parity(reference, torch):
    from vit_pytorch.sep_vit import SepViT as Ref
    from vit_pytorch_tpu.models.sep_vit import SepViT
    from vit_pytorch_tpu.utils.convert import convert_sep_vit

    # dim_head=32: the reference constructor accepts dim_head but never
    # forwards it (sep_vit.py:270-275 - DSSA always uses its default 32);
    # our model honors dim_head, so parity holds only at the default
    kw = dict(num_classes=7, dim=16, depth=(1, 1), heads=(1, 2), window_size=7,
              dim_head=32)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SepViT(**kw).apply(convert_sep_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_regionvit_parity(reference, torch):
    from vit_pytorch.regionvit import RegionViT as Ref
    from vit_pytorch_tpu.models.regionvit import RegionViT
    from vit_pytorch_tpu.utils.convert import convert_regionvit

    kw = dict(dim=(16, 32, 48, 64), depth=(1, 1, 1, 1), window_size=7,
              num_classes=7, tokenize_local_3_conv=False, use_peg=False)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = RegionViT(**kw).apply(convert_regionvit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_crossformer_parity(reference, torch):
    from vit_pytorch.crossformer import CrossFormer as Ref
    from vit_pytorch_tpu.models.crossformer import CrossFormer
    from vit_pytorch_tpu.utils.convert import convert_crossformer

    kw = dict(num_classes=7, dim=(32, 64, 96, 128), depth=(1, 1, 1, 1),
              global_window_size=(4, 2, 1, 1), local_window_size=7)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = CrossFormer(**kw).apply(convert_crossformer(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_max_vit_with_registers_parity(reference, torch):
    from vit_pytorch.max_vit_with_registers import MaxViT as Ref
    from vit_pytorch_tpu.models.max_vit_with_registers import MaxViT
    from vit_pytorch_tpu.utils.convert import convert_max_vit_with_registers

    kw = dict(num_classes=7, dim=16, depth=(1, 1), dim_head=8, window_size=4,
              num_register_tokens=2)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    variables = convert_max_vit_with_registers(ref.state_dict())
    got = MaxViT(**kw).apply(variables, jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_scalable_vit_parity(reference, torch):
    from vit_pytorch.scalable_vit import ScalableViT as Ref
    from vit_pytorch_tpu.models.scalable_vit import ScalableViT
    from vit_pytorch_tpu.utils.convert import convert_scalable_vit

    kw = dict(num_classes=7, dim=16, heads=(1, 2), depth=(1, 1),
              ssa_dim_key=(8, 8), reduction_factor=(2, 1),
              window_size=(8, None), dropout=0.0)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ScalableViT(**kw).apply(convert_scalable_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=2e-4)


@pytest.mark.parity
def test_ats_vit_parity(reference, torch):
    """Parity with the gumbel noise zeroed on the torch side (our model adds
    noise only when a 'sampling' rng is provided), making both deterministic."""
    import vit_pytorch.ats_vit as ref_mod
    from vit_pytorch_tpu.models.ats_vit import ViT
    from vit_pytorch_tpu.utils.convert import convert_ats_vit

    orig = ref_mod.sample_gumbel
    ref_mod.sample_gumbel = lambda shape, device, dtype, eps=1e-6: torch.zeros(
        shape, device=device, dtype=dtype
    )
    try:
        kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=3,
                  max_tokens_per_depth=(16, 8, 4), heads=2, dim_head=16, mlp_dim=64)
        ref = ref_mod.ViT(**kw).eval()
        x = torch.randn(2, 3, 32, 32)
        with torch.no_grad():
            expected = ref(x).numpy()
        got = ViT(**kw).apply(convert_ats_vit(ref.state_dict()), jnp.asarray(x.numpy()))
        _check(got, expected, atol=1e-4)
    finally:
        ref_mod.sample_gumbel = orig


@pytest.mark.parity
def test_normalized_vit_parity(reference, torch):
    from vit_pytorch.normalized_vit import nViT as Ref
    from vit_pytorch_tpu.models.normalized_vit import nViT
    from vit_pytorch_tpu.utils.convert import convert_normalized_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = nViT(**kw).apply(convert_normalized_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=1e-4)


@pytest.mark.parity
def test_distillable_vit_parity(reference, torch):
    from vit_pytorch.distill import DistillableViT as Ref
    from vit_pytorch_tpu.ssl.distill import DistillableViT
    from vit_pytorch_tpu.utils.convert import convert_distillable_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = DistillableViT(**kw).apply(
        convert_distillable_vit(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_vit_with_decorr_parity(reference, torch):
    from vit_pytorch.vit_with_decorr import ViT as Ref
    from vit_pytorch_tpu.models.vit_with_decorr import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit_with_decorr

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = ref(x)
    expected = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ViT(**kw).apply(convert_vit_with_decorr(ref.state_dict()), jnp.asarray(x.numpy()))
    if isinstance(got, tuple):
        got = got[0]
    _check(got, expected)


@pytest.mark.parity
def test_vit_detpool_parity(reference, torch):
    from vit_pytorch.vit_detpool import ViTDetPool as Ref
    from vit_pytorch_tpu.models.vit_detpool import ViTDetPool
    from vit_pytorch_tpu.utils.convert import convert_vit_detpool

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = ref(x)
    expected = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ViTDetPool(**kw).apply(convert_vit_detpool(ref.state_dict()), jnp.asarray(x.numpy()))
    if isinstance(got, tuple):
        got = got[0]
    _check(got, expected)


@pytest.mark.parity
def test_vit_nd_parity(reference, torch):
    from vit_pytorch.vit_nd import ViTND as Ref
    from vit_pytorch_tpu.models.vit_nd import ViTND
    from vit_pytorch_tpu.utils.convert import convert_vit_nd

    kw = dict(ndim=3, input_shape=(8, 16, 16), patch_size=(2, 4, 4),
              num_classes=7, dim=32, depth=2, heads=2, dim_head=16,
              mlp_dim=64, channels=2)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 2, 8, 16, 16)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViTND(**kw).apply(convert_vit_nd(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected)


@pytest.mark.parity
def test_vit_nd_rotary_parity(reference, torch):
    from vit_pytorch.vit_nd_rotary import ViTND as Ref
    from vit_pytorch_tpu.models.vit_nd_rotary import ViTND
    from vit_pytorch_tpu.utils.convert import convert_vit_nd_rotary

    kw = dict(ndim=2, input_shape=(16, 16), patch_size=(4, 4), num_classes=7,
              dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64, channels=3)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViTND(**kw).apply(convert_vit_nd_rotary(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=1e-4)


@pytest.mark.parity
def test_vit_nd_pope_parity(reference, torch):
    from vit_pytorch.vit_nd_pope import ViTND as Ref
    from vit_pytorch_tpu.models.vit_nd_pope import ViTND
    from vit_pytorch_tpu.utils.convert import convert_vit_nd_pope

    kw = dict(ndim=2, input_shape=(16, 16), patch_size=(4, 4), num_classes=7,
              dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64, channels=3)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViTND(**kw).apply(convert_vit_nd_pope(ref.state_dict()), jnp.asarray(x.numpy()))
    _check(got, expected, atol=1e-4)


@pytest.mark.parity
def test_simple_vit_attn_residual_parity(reference, torch):
    from vit_pytorch.simple_vit_attn_residual import SimpleViTAttnResidual as Ref
    from vit_pytorch_tpu.models.simple_vit_attn_residual import SimpleViTAttnResidual
    from vit_pytorch_tpu.utils.convert import convert_simple_vit_attn_residual

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViTAttnResidual(**kw).apply(
        convert_simple_vit_attn_residual(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_simple_vit_orthog_residual_parity(reference, torch):
    from vit_pytorch.simple_vit_orthog_residual_update import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_vit_orthog_residual_update import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_vit_orthog_residual

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(
        convert_simple_vit_orthog_residual(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_simple_flash_attn_vit_parity(reference, torch):
    """The variant's real architecture: no transformer final LN, head =
    LN→Linear after mean pool (reference simple_flash_attn_vit.py:159-166)."""
    from vit_pytorch.simple_flash_attn_vit import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_flash_attn_vit import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_flash_attn_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(
        convert_simple_flash_attn_vit(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)


@pytest.mark.parity
def test_simple_flash_attn_vit_3d_parity(reference, torch):
    """No transformer final LN; plain Linear head (reference
    simple_flash_attn_vit_3d.py:158)."""
    from vit_pytorch.simple_flash_attn_vit_3d import SimpleViT as Ref
    from vit_pytorch_tpu.models.simple_flash_attn_vit_3d import SimpleViT
    from vit_pytorch_tpu.utils.convert import convert_simple_flash_attn_vit_3d

    kw = dict(image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
              num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 4, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = SimpleViT(**kw).apply(
        convert_simple_flash_attn_vit_3d(ref.state_dict()), jnp.asarray(x.numpy())
    )
    _check(got, expected)
