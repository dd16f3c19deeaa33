"""Smoke tests, batch 3: nViT, LookViT, jumbo weight-tying, flash-vit ctor."""

import jax
import jax.numpy as jnp
import numpy as np


def _run(model, x, **kw):
    params = model.init(jax.random.PRNGKey(0), x, **kw)
    return model.apply(params, x, **kw), params


def test_normalized_vit():
    from vit_pytorch_tpu.models.normalized_vit import nViT, normalize_weights

    v = nViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    out, params = _run(v, jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)))
    assert out.shape == (2, 10)
    # post-step weight re-normalization keeps outputs identical (weights are
    # normalized in-forward anyway)
    p2 = {"params": normalize_weights(params["params"])}
    out2 = v.apply(p2, jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-4, rtol=1e-4)


def test_look_vit():
    from vit_pytorch_tpu.models.look_vit import LookViT

    v = LookViT(
        image_size=64,
        num_classes=10,
        dim=32,
        depth=2,
        heads=2,
        dim_head=16,
        patch_size=16,
        highres_patch_size=8,
        cross_attn_heads=2,
        cross_attn_dim_head=16,
        dropout=0.0,
    )
    out, _ = _run(v, jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)))
    assert out.shape == (2, 10)


def test_simple_flash_attn_vit_ctor():
    from vit_pytorch_tpu.models.simple_flash_attn_vit import SimpleViT

    v = SimpleViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64)
    out, _ = _run(v, jnp.zeros((1, 3, 64, 64)))
    assert out.shape == (1, 10)


def test_jumbo_weight_tying():
    from vit_pytorch_tpu.models.jumbo_vit import JumboViT
    from flax.traverse_util import flatten_dict

    v = JumboViT(image_size=32, patch_size=8, num_classes=5, dim=16, depth=3, heads=2, mlp_dim=32, jumbo_cls_k=2, jumbo_ff_mult=1)
    params = v.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))
    flat = flatten_dict(params["params"])
    jumbo_keys = [k for k in flat if "jumbo_ff" in "/".join(map(str, k))]
    # one shared jumbo_ff module regardless of depth
    assert len({k[0] for k in jumbo_keys}) == 1


def test_cct():
    from vit_pytorch_tpu.models.cct import cct_2

    m = cct_2(img_size=64, num_classes=10, positional_embedding="learnable")
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)


def test_levit():
    from vit_pytorch_tpu.models.levit import LeViT

    m = LeViT(image_size=64, num_classes=10, stages=3, dim=(32, 48, 64), depth=1, heads=(1, 2, 2), mlp_mult=2)
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    out, distill = m.apply(params, x), None
    assert out.shape == (2, 10)


def test_cvt():
    from vit_pytorch_tpu.models.cvt import CvT

    m = CvT(num_classes=10, s1_emb_dim=16, s2_emb_dim=24, s3_emb_dim=32, s1_depth=1, s2_depth=1, s3_depth=1)
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)


def test_max_vit_smoke():
    from vit_pytorch_tpu.models.max_vit import MaxViT

    m = MaxViT(num_classes=10, dim=32, dim_head=16, depth=(1, 1), window_size=4, dropout=0.1)
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)
    out_t, updates = m.apply(
        params, x, train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out_t.shape == (2, 10) and "batch_stats" in updates


def test_vivit_smoke():
    from vit_pytorch_tpu.models.vivit import ViViT

    for variant in ("factorized_encoder", "factorized_self_attention"):
        m = ViViT(
            image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
            num_classes=7, dim=32, spatial_depth=1, temporal_depth=1,
            heads=2, mlp_dim=64, variant=variant,
        )
        vid = jnp.zeros((2, 3, 4, 32, 32))
        params = m.init(jax.random.PRNGKey(0), vid)
        assert m.apply(params, vid).shape == (2, 7)

    # mean-pool variant + frame mask
    m = ViViT(
        image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
        num_classes=7, dim=32, spatial_depth=1, temporal_depth=1,
        heads=2, mlp_dim=64, pool="mean",
    )
    vid = jnp.zeros((2, 3, 4, 32, 32))
    params = m.init(jax.random.PRNGKey(0), vid)
    mask = jnp.array([[True, True, True, False], [True] * 4])
    assert m.apply(params, vid, mask=mask).shape == (2, 7)


def test_mobile_vit():
    from vit_pytorch_tpu.models.mobile_vit import MobileViT

    m = MobileViT(image_size=(64, 64), dims=(16, 20, 24), channels=(4, 8, 12, 12, 16, 16, 24, 24, 32, 32, 64), num_classes=10)
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)


def test_nest():
    from vit_pytorch_tpu.models.nest import NesT

    m = NesT(image_size=64, patch_size=4, num_classes=10, dim=16, heads=2, num_hierarchies=3, block_repeats=(1, 1, 1))
    x = jnp.zeros((2, 3, 64, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)


def test_twins_svt():
    from vit_pytorch_tpu.models.twins_svt import TwinsSVT

    m = TwinsSVT(num_classes=10, s1_emb_dim=16, s2_emb_dim=24, s3_emb_dim=32, s4_emb_dim=48,
                 s1_depth=1, s2_depth=1, s3_depth=1, s4_depth=1,
                 s1_local_patch_size=4, s1_global_k=4, s2_local_patch_size=4, s2_global_k=4,
                 s3_local_patch_size=2, s3_global_k=2, s4_local_patch_size=2, s4_global_k=2)
    x = jnp.zeros((2, 3, 128, 128))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 10)


def test_learnable_memory_adapter():
    from vit_pytorch_tpu.models.learnable_memory_vit import ViT as MemViT, Adapter

    vit = MemViT(image_size=32, patch_size=8, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    img = jnp.zeros((2, 3, 32, 32))
    vp = vit.clone(parent=None).init(jax.random.PRNGKey(0), img)
    assert vit.clone(parent=None).apply(vp, img).shape == (2, 10)

    ad = Adapter(vit=vit, num_memories_per_layer=4, num_classes=3)
    ap = ad.init(jax.random.PRNGKey(2), img)
    ap = {"params": {**ap["params"], "vit": vp["params"]}}
    assert ad.apply(ap, img).shape == (2, 3)


def test_vit_with_decorr():
    from vit_pytorch_tpu.models.vit_with_decorr import ViT

    v = ViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64, decorr_sample_frac=0.5)
    img = jnp.ones((2, 3, 64, 64))
    p = v.init(jax.random.PRNGKey(0), img)
    logits, aux = v.apply(p, img, train=True, rngs={"dropout": jax.random.PRNGKey(1), "decorr": jax.random.PRNGKey(2)})
    assert logits.shape == (2, 10) and float(aux) > 0
    _, aux_eval = v.apply(p, img)
    assert float(aux_eval) == 0.0


def test_keel_value_residual_fft():
    from vit_pytorch_tpu.models.vit_with_keel_post_ln import ViT as KeelViT
    from vit_pytorch_tpu.models.simple_vit_with_value_residual import SimpleViT as VRViT
    from vit_pytorch_tpu.models.simple_vit_with_fft import SimpleViT as FFTViT

    img = jnp.zeros((2, 3, 64, 64))
    for m in (
        KeelViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64),
        VRViT(image_size=64, patch_size=16, num_classes=10, dim=32, depth=3, heads=2, mlp_dim=64),
        FFTViT(image_size=64, patch_size=16, freq_patch_size=16, num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64),
    ):
        p = m.init(jax.random.PRNGKey(0), img)
        assert m.apply(p, img).shape == (2, 10)
