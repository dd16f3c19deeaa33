"""Converted-weight parity for the last two modules that were smoke-only:
AcceptVideoWrapper (reference accept_video_wrapper.py:27-230) and the
nested-tensor NaViT-3D (reference na_vit_nested_tensor_3d.py:135-356)."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.mark.parity
def test_accept_video_wrapper_parity(reference, torch):
    """Time pos emb + embed projection + eval_with_no_grad over a wrapped
    ViT (logits output)."""
    from vit_pytorch.vit import ViT as RefViT
    from vit_pytorch.accept_video_wrapper import AcceptVideoWrapper as RefWrap
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.wrappers.accept_video_wrapper import AcceptVideoWrapper
    from vit_pytorch_tpu.utils.convert import convert_accept_video_wrapper

    kw = dict(image_size=32, patch_size=8, num_classes=10, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    wkw = dict(add_time_pos_emb=True, dim_emb=10, time_seq_len=12,
               proj_embed_to_dim=6)
    ref = RefWrap(RefViT(**kw), **wkw).eval()
    video = torch.randn(2, 3, 7, 32, 32)
    with torch.no_grad():
        expected = ref(video, eval_with_no_grad=True)

    model = AcceptVideoWrapper(image_net=ViT(**kw), **wkw)
    params = convert_accept_video_wrapper(ref.state_dict())
    got = model.apply(params, jnp.asarray(video.numpy()), True)
    assert got.shape == tuple(expected.shape) == (2, 7, 6)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=2e-5)


@pytest.mark.parity
def test_accept_video_wrapper_tokens_parity(reference, torch):
    """num_classes=0 wrapped net returns tokens (reference vit.py:116) —
    the pos emb must broadcast over the extra token axis (reference
    accept_video_wrapper.py:150-156, channel-last layout)."""
    from vit_pytorch.vit import ViT as RefViT
    from vit_pytorch.accept_video_wrapper import AcceptVideoWrapper as RefWrap
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.wrappers.accept_video_wrapper import AcceptVideoWrapper
    from vit_pytorch_tpu.utils.convert import convert_accept_video_wrapper

    kw = dict(image_size=32, patch_size=8, num_classes=0, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    wkw = dict(add_time_pos_emb=True, dim_emb=32, time_seq_len=9)
    ref = RefWrap(RefViT(**kw), **wkw).eval()
    video = torch.randn(2, 3, 5, 32, 32)
    with torch.no_grad():
        expected = ref(video)

    model = AcceptVideoWrapper(image_net=ViT(**kw), **wkw)
    params = convert_accept_video_wrapper(ref.state_dict())
    got = model.apply(params, jnp.asarray(video.numpy()))
    assert got.shape == tuple(expected.shape)  # (b, t, n_tokens, dim)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=2e-5)


@pytest.mark.parity
def test_na_vit_nested_tensor_3d_parity(reference, torch):
    """Packed-segment NT-3D matches the reference's jagged per-volume
    forward on converted weights: factorized f/h/w pos embs, LayerNorm
    qk-norm, per-volume registers, attention pooling."""
    from vit_pytorch.na_vit_nested_tensor_3d import NaViT as RefNaViT
    from vit_pytorch_tpu.models.na_vit_nested_tensor_3d import NaViT, pack_volumes
    from vit_pytorch_tpu.utils.convert import convert_na_vit_nested_tensor_3d

    kw = dict(image_size=32, max_frames=4, patch_size=8, frame_patch_size=2,
              num_classes=7, dim=32, depth=2, heads=2, dim_head=16,
              mlp_dim=64, num_registers=3, token_dropout_prob=0.25)
    ref = RefNaViT(**kw).eval()

    g = torch.Generator().manual_seed(0)
    volumes = [
        torch.randn(3, 2, 32, 32, generator=g),
        torch.randn(3, 4, 16, 16, generator=g),
        torch.randn(3, 2, 16, 32, generator=g),
        torch.randn(3, 4, 32, 16, generator=g),
        torch.randn(3, 2, 8, 8, generator=g),
    ]
    with torch.no_grad():
        expected = ref(volumes)

    model = NaViT(**kw)
    params = convert_na_vit_nested_tensor_3d(ref.state_dict())
    # max_seq_len=32 forces multiple packed rows (16+8+8 | 16+1), so the
    # segment-masked path (not one-volume-per-row) is what's being tested
    packed = pack_volumes(
        [v.numpy() for v in volumes], patch_size=8, frame_patch_size=2,
        max_seq_len=32, train=False,
    )
    logits = model.apply(params, packed)  # (rows, max_videos, classes)
    valid = np.asarray(packed.is_video)
    got = np.asarray(logits)[valid]  # row-major == original volume order
    assert got.shape == tuple(expected.shape) == (5, 7)
    np.testing.assert_allclose(got, expected.numpy(), atol=2e-5, rtol=1e-4)
