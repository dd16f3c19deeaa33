"""NaViT: packing correctness, packed-vs-single equivalence, reference parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_pytorch_tpu.models.na_vit import NaViT, forward_packed
from vit_pytorch_tpu.ops.packing import group_images_by_max_seq_len, pack_images
from vit_pytorch_tpu.utils.convert import convert_na_vit


def _model(**kw):
    defaults = dict(
        image_size=64,
        patch_size=16,
        num_classes=11,
        dim=64,
        depth=2,
        heads=4,
        dim_head=16,
        mlp_dim=128,
    )
    defaults.update(kw)
    return NaViT(**defaults)


def _images(rng, sizes):
    return [rng.standard_normal((3, h, w)).astype(np.float32) for h, w in sizes]


def test_grouping_matches_reference_behaviour():
    rng = np.random.default_rng(0)
    imgs = _images(rng, [(64, 64), (32, 64), (64, 32), (32, 32), (64, 64)])
    groups = group_images_by_max_seq_len(imgs, 16, max_seq_len=20)
    # seq lens: 16, 8, 8, 4, 16 → groups [16], [8+8+4], [16]
    assert [len(g) for g in groups] == [1, 3, 1]


def test_pack_images_shapes():
    rng = np.random.default_rng(0)
    imgs = _images(rng, [(64, 64), (32, 32), (32, 64)])
    packed = pack_images(imgs, 16, max_seq_len=32)
    assert packed.patches.shape == (1, 32, 3 * 16 * 16)
    assert packed.image_ids.shape == (1, 32)
    n_tokens = 16 + 4 + 8
    assert int((packed.image_ids[0] >= 0).sum()) == n_tokens
    assert int(packed.num_images[0]) == 3


def test_navit_forward_and_packed_equivalence():
    rng = np.random.default_rng(0)
    model = _model()
    imgs = _images(rng, [(64, 64), (32, 32), (32, 64)])

    packed = pack_images(imgs, 16, max_seq_len=64)
    params = model.init(jax.random.PRNGKey(0), packed)

    out_packed = forward_packed(model, params, imgs, group_max_seq_len=64)
    assert out_packed.shape == (3, 11)

    # one image per group → same logits (mask correctness under packing)
    out_single = forward_packed(
        model, params, [[im] for im in imgs], group_max_seq_len=64
    )
    np.testing.assert_allclose(out_packed, out_single, atol=1e-4, rtol=1e-4)


def test_navit_token_dropout_train():
    rng = np.random.default_rng(0)
    model = _model(token_dropout_prob=0.25)
    imgs = _images(rng, [(64, 64), (32, 32)])
    packed = pack_images(
        imgs, 16, max_seq_len=64, token_dropout_prob=0.25, train=True, rng=rng
    )
    params = model.init(jax.random.PRNGKey(0), packed)
    out = model.apply(
        params, packed, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert out.shape == (1, 2, 11)
    assert np.all(np.isfinite(out))


@pytest.mark.parity
def test_navit_parity(reference, torch):
    from vit_pytorch.na_vit import NaViT as RefNaViT

    ref = RefNaViT(
        image_size=64,
        patch_size=16,
        num_classes=11,
        dim=64,
        depth=2,
        heads=4,
        dim_head=16,
        mlp_dim=128,
    ).eval()

    rng = np.random.default_rng(0)
    sizes = [(64, 64), (32, 32), (32, 64), (64, 32), (16, 16)]
    imgs_np = _images(rng, sizes)
    imgs_t = [torch.tensor(im) for im in imgs_np]

    with torch.no_grad():
        expected = ref(imgs_t, group_images=True, group_max_seq_len=24).numpy()

    model = _model()
    params = convert_na_vit(ref.state_dict())
    got = forward_packed(model, params, imgs_np, group_max_seq_len=24)
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-4)


def test_navit_nested_tensor_packed_equivalence():
    from vit_pytorch_tpu.models.na_vit_nested_tensor import NaViT as NTNaViT, forward_images

    rng = np.random.default_rng(0)
    model = NTNaViT(image_size=64, patch_size=16, num_classes=11, dim=64,
                    depth=2, heads=4, dim_head=16, mlp_dim=128)
    imgs = _images(rng, [(64, 64), (32, 32), (32, 64)])
    packed = pack_images(imgs, 16, max_seq_len=64)
    params = model.init(jax.random.PRNGKey(0), packed)

    out = forward_images(model, params, imgs, max_seq_len=64)
    assert out.shape == (3, 11)
    out_single = forward_images(model, params, imgs, max_seq_len=16)
    np.testing.assert_allclose(out, out_single, atol=1e-4, rtol=1e-4)


@pytest.mark.parity
def test_navit_nested_tensor_parity(reference, torch):
    """Variable-resolution parity vs the jagged-tensor reference
    (na_vit_nested_tensor.py:134-301) at the same tolerance as
    test_navit_parity."""
    from vit_pytorch.na_vit_nested_tensor import NaViT as RefNT
    from vit_pytorch_tpu.models.na_vit_nested_tensor import NaViT as NTNaViT, forward_images
    from vit_pytorch_tpu.utils.convert import convert_na_vit_nested_tensor

    kw = dict(image_size=64, patch_size=16, num_classes=11, dim=64, depth=2,
              heads=4, dim_head=16, mlp_dim=128)
    ref = RefNT(**kw, token_dropout_prob=0.1).eval()

    rng = np.random.default_rng(0)
    sizes = [(64, 64), (32, 32), (32, 64), (64, 32), (16, 16)]
    imgs_np = _images(rng, sizes)
    imgs_t = [torch.tensor(im) for im in imgs_np]

    with torch.no_grad():
        expected = ref(imgs_t).numpy()

    model = NTNaViT(**kw, token_dropout_prob=0.1)
    params = convert_na_vit_nested_tensor(ref.state_dict())
    got = forward_images(model, params, imgs_np, max_seq_len=24)
    np.testing.assert_allclose(got, expected, atol=5e-5, rtol=1e-4)
