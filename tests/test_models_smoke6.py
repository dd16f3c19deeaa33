"""Smoke tests, batch 6: ViViT+MOSS (incl. streaming cache), WWT."""

import numpy as np
import jax
import jax.numpy as jnp


def test_vivit_with_moss():
    from vit_pytorch_tpu.models.vivit_with_moss import ViViT

    m = ViViT(image_size=32, image_patch_size=8, frames=4, frame_patch_size=2, num_classes=7,
              dim=32, spatial_depth=1, temporal_depth=1, heads=2, mlp_dim=64,
              moss_hidden_dim=16, moss_causal=True)
    vid = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 32, 32))
    p = m.init(jax.random.PRNGKey(0), vid)
    assert m.apply(p, vid).shape == (2, 7)


def test_moss_streaming_cache():
    from vit_pytorch_tpu.models.vivit_with_moss import MOSS

    moss = MOSS(dim=16, hidden_dim=8, orders=2, causal=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 6, 16))
    p = moss.init(jax.random.PRNGKey(1), x)
    out, caches = moss.apply(p, x, return_cache=True)
    assert out.shape == (2, 4, 6, 6, 16)

    # streaming: the cached continuation equals the full pass on the suffix
    x_next = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 6, 6, 16))
    out_next, _ = moss.apply(p, x_next, caches, return_cache=True)
    full = moss.apply(p, jnp.concatenate([x, x_next], axis=1))
    np.testing.assert_allclose(
        np.asarray(out_next[:, 0]), np.asarray(full[:, -1]), atol=1e-4, rtol=1e-4
    )


def test_wwt():
    from vit_pytorch_tpu.models.wwt import WWT, AutoencodingHead, WWTReturn

    head = AutoencodingHead(image_size=64, patch_size=16, pathways=((3, 2, 0), (0, 2, 3)))
    model = WWT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=1,
                num_slots=(8, 4, 2), interactions=((0, 1), (0, 2), (1, 2), (2, 3)),
                heads=2, dim_head=16, mlp_dim=64, return_tokens=True,
                l1norm_after_tokens_softmax=True, num_register_tokens=2,
                num_register_slots=(2, 2, 1), task_heads=(head,))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 64, 64))
    p = model.init(jax.random.PRNGKey(0), img)
    out, maps = model.apply(p, img)
    assert out.slot_logits.shape == (1, 10) and out.token_logits.shape == (1, 10)
    d320, d023 = maps
    assert d320.shape == (1, 4, 4, 32) and d023.shape == (1, 2, 32)

    emb = model.apply(p, img, True)
    assert len(emb.slots) == 3 and emb.tokens is not None
