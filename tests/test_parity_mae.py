"""MAE pretraining parity (BASELINE config 5): reconstruction loss matches
the torch reference given identical mask indices and converted weights."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parity
def test_mae_parity(reference, torch):
    from vit_pytorch import ViT as RefViT
    from vit_pytorch.mae import MAE as RefMAE
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.ssl.mae import MAE
    from vit_pytorch_tpu.utils.convert import convert_mae

    # pool='mean': the reference MAE's cls-pool branch indexes pos_embedding
    # with a stale 3-D-era pattern (mae.py:53) and crashes with today's 2-D
    # ViT pos embeddings -- only the mean-pool path is runnable upstream
    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=48, depth=2,
              heads=2, dim_head=16, mlp_dim=96, pool='mean')
    mae_kw = dict(decoder_dim=32, masking_ratio=0.75, decoder_depth=2,
                  decoder_heads=2, decoder_dim_head=16)

    ref_enc = RefViT(**kw)
    ref = RefMAE(encoder=ref_enc, **mae_kw).eval()

    x = torch.randn(2, 3, 32, 32)
    b, n = 2, (32 // 8) ** 2

    # the reference draws mask indices from torch's global RNG inside
    # forward (mae.py:60); seed, run, then re-derive the same indices
    torch.manual_seed(0)
    with torch.no_grad():
        expected = float(ref(x))
    torch.manual_seed(0)
    rand_indices = torch.rand(b, n).argsort(dim=-1).numpy()

    model = MAE(encoder=ViT(**kw), **mae_kw)
    params = convert_mae(ref.state_dict())
    got = float(
        model.apply(
            params,
            jnp.asarray(x.numpy()),
            rand_indices=jnp.asarray(rand_indices),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


@pytest.mark.parity
def test_mae_parity_equal_dims(reference, torch):
    """enc_to_dec is Identity when encoder dim == decoder dim (mae.py:36)."""
    from vit_pytorch import ViT as RefViT
    from vit_pytorch.mae import MAE as RefMAE
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.ssl.mae import MAE
    from vit_pytorch_tpu.utils.convert import convert_mae

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=48, depth=1,
              heads=2, dim_head=16, mlp_dim=96, pool='mean')
    mae_kw = dict(decoder_dim=48, masking_ratio=0.5, decoder_depth=1,
                  decoder_heads=2, decoder_dim_head=16)

    ref = RefMAE(encoder=RefViT(**kw), **mae_kw).eval()
    x = torch.randn(2, 3, 32, 32)
    b, n = 2, 16

    torch.manual_seed(1)
    with torch.no_grad():
        expected = float(ref(x))
    torch.manual_seed(1)
    rand_indices = torch.rand(b, n).argsort(dim=-1).numpy()

    model = MAE(encoder=ViT(**kw), **mae_kw)
    got = float(
        model.apply(
            convert_mae(ref.state_dict()),
            jnp.asarray(x.numpy()),
            rand_indices=jnp.asarray(rand_indices),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)
