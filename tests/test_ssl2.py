"""Dino, DistillWrapper, EfficientViT shell, augmentation pipeline."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_pytorch_tpu import ViT

KW = dict(image_size=32, patch_size=8, num_classes=10, dim=32, depth=1, heads=2, mlp_dim=64)


def test_dino_full_cycle():
    from vit_pytorch_tpu.ssl.dino import Dino, dino_forward

    net = ViT(**KW)
    dino = Dino(net=net, image_size=32, num_classes_K=64, projection_hidden_size=32, projection_layers=2)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
    params = dino.init({"params": jax.random.PRNGKey(0)}, imgs)
    state = dino.create_state(params)

    loss, new_last = dino_forward(dino, params, state, imgs, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: dino_forward(dino, p, state, imgs, jax.random.PRNGKey(2))[0])(params)
    assert sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)) > 0

    state = state.replace(last_teacher_centers=new_last)
    state2 = dino.update_moving_average(params, state)
    assert float(jnp.abs(state2.teacher_centers).sum()) > 0

    proj, emb = dino.apply(params, imgs)
    assert proj.shape == (2, 64)


def test_distill():
    from vit_pytorch_tpu.ssl.distill import DistillableViT, DistillWrapper, distill_forward

    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
    labels = jnp.array([1, 2])

    teacher = ViT(**KW)
    tvars = teacher.clone(parent=None).init(jax.random.PRNGKey(0), img)
    w = DistillWrapper(teacher=teacher, student=DistillableViT(**KW), temperature=3, alpha=0.5, mlp_layernorm=True)
    params = w.init(jax.random.PRNGKey(2), img, labels, teacher_logits=jnp.zeros((2, 10)))
    loss = distill_forward(w, params, tvars, img, labels)
    assert np.isfinite(float(loss))

    w2 = DistillWrapper(teacher=ViT(**KW), student=DistillableViT(**KW), hard=True)
    p2 = w2.init(jax.random.PRNGKey(2), img, labels, teacher_logits=jnp.zeros((2, 10)))
    loss_h = distill_forward(w2, p2, tvars, img, labels)
    assert np.isfinite(float(loss_h))


def test_distillable_to_vit():
    from vit_pytorch_tpu.ssl.distill import DistillableViT

    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
    s = DistillableViT(**KW)
    p = s.init(jax.random.PRNGKey(0), img)
    v = s.to_vit()
    np.testing.assert_allclose(
        np.asarray(v.apply(p, img)), np.asarray(s.apply(p, img)), atol=1e-6
    )


def test_efficient_vit_shell():
    from vit_pytorch_tpu.models.efficient import ViT as EfficientViT
    from vit_pytorch_tpu.nn.blocks import Transformer

    t = Transformer(dim=32, depth=1, heads=2, dim_head=16, mlp_dim=64, final_norm=False)
    v = EfficientViT(image_size=32, patch_size=8, num_classes=10, dim=32, transformer=t)
    img = jnp.zeros((2, 3, 32, 32))
    params = v.init(jax.random.PRNGKey(0), img)
    assert v.apply(params, img).shape == (2, 10)


def test_augment_pipeline():
    from vit_pytorch_tpu.ssl.augment import byol_augment, random_resized_crop

    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 32, 32))
    out = byol_augment(jax.random.PRNGKey(1), img)
    assert out.shape == img.shape and np.all(np.isfinite(out))

    crop = random_resized_crop(jax.random.PRNGKey(2), img, (16, 16), scale=(0.5, 1.0))
    assert crop.shape == (2, 3, 16, 16)
    # different keys → different crops
    crop2 = random_resized_crop(jax.random.PRNGKey(3), img, (16, 16), scale=(0.5, 1.0))
    assert not np.allclose(crop, crop2)


def test_esvit():
    from vit_pytorch_tpu.ssl.es_vit import EsViTTrainer, esvit_forward

    net = ViT(**KW)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
    t = EsViTTrainer(net=net, image_size=32, num_classes_K=32, projection_hidden_size=32, projection_layers=2)
    p = t.init({"params": jax.random.PRNGKey(0)}, imgs)
    s = t.create_state(p)
    loss, (vc, rc) = esvit_forward(t, p, s, imgs, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    s2 = t.update_moving_average(
        p, s.replace(last_teacher_view_centers=vc, last_teacher_region_centers=rc)
    )
    assert float(jnp.abs(s2.teacher_view_centers).sum()) > 0


def test_lejepa():
    from vit_pytorch_tpu.ssl.lejepa import LeJEPA, lejepa_forward

    net = ViT(**KW)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 32, 32))
    lj = LeJEPA(net=net, image_size=32, num_classes_K=32, projection_hidden_size=32,
                projection_layers=2, sigreg_num_slices=64)
    p = lj.init({"params": jax.random.PRNGKey(0)}, imgs)
    loss = lejepa_forward(lj, p, imgs, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p_: lejepa_forward(lj, p_, imgs, jax.random.PRNGKey(3)))(p)
    assert sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g)) > 0
