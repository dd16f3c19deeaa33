"""Parity tests vs the PyTorch reference: MaxViT, ViViT (BASELINE.md
configs 4 and 5)."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parity
def test_max_vit_parity(reference, torch):
    from vit_pytorch.max_vit import MaxViT as RefMaxViT
    from vit_pytorch_tpu.models.max_vit import MaxViT
    from vit_pytorch_tpu.utils.convert import convert_max_vit

    ref = RefMaxViT(
        num_classes=13,
        dim=32,
        dim_head=16,
        depth=(1, 1),
        window_size=4,
        dim_conv_stem=24,
        dropout=0.0,
    ).eval()
    img = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(img).numpy()

    model = MaxViT(
        num_classes=13,
        dim=32,
        dim_head=16,
        depth=(1, 1),
        window_size=4,
        dim_conv_stem=24,
        dropout=0.0,
    )
    variables = convert_max_vit(ref.state_dict())
    got = model.apply(variables, jnp.asarray(img.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5, rtol=1e-3)


@pytest.mark.parity
def test_vivit_parity(reference, torch):
    from vit_pytorch.vivit import ViViT as RefViViT
    from vit_pytorch_tpu.models.vivit import ViViT
    from vit_pytorch_tpu.utils.convert import convert_vivit

    kw = dict(
        image_size=32,
        image_patch_size=8,
        frames=4,
        frame_patch_size=2,
        num_classes=7,
        dim=32,
        spatial_depth=2,
        temporal_depth=1,
        heads=2,
        dim_head=16,
        mlp_dim=64,
        variant="factorized_encoder",
    )
    ref = RefViViT(use_flash_attn=False, **kw).eval()
    video = torch.randn(2, 3, 4, 32, 32)
    with torch.no_grad():
        expected = ref(video).numpy()

    model = ViViT(**kw)
    variables = convert_vivit(ref.state_dict())
    got = model.apply(variables, jnp.asarray(video.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5, rtol=1e-3)
