"""SSL wrappers (SimMIM, MPP, MP3) and introspection (Recorder, Extractor)."""

import numpy as np
import jax
import jax.numpy as jnp

from vit_pytorch_tpu import ViT


def _vit(**kw):
    d = dict(image_size=64, patch_size=16, num_classes=10, dim=32, depth=2, heads=2, mlp_dim=64)
    d.update(kw)
    return ViT(**d)


def test_simmim():
    from vit_pytorch_tpu.ssl.simmim import SimMIM

    mim = SimMIM(encoder=_vit(), masking_ratio=0.5)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    params = mim.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, img)
    loss = mim.apply(params, img, rngs={"mask": jax.random.PRNGKey(2)})
    assert loss.shape == () and float(loss) > 0


def test_mpp():
    from vit_pytorch_tpu.ssl.mpp import MPP

    enc = _vit()
    mpp = MPP(transformer=enc, patch_size=16, dim=32)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))
    params = mpp.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, img)
    loss = mpp.apply(params, img, rngs={"mask": jax.random.PRNGKey(2)})
    assert loss.shape == () and float(loss) > 0


def test_mp3():
    from vit_pytorch_tpu.ssl.mp3 import MP3, ViT as MP3ViT

    vit = MP3ViT(num_classes=10, image_size=64, patch_size=16, dim=32, depth=2, heads=2, mlp_dim=64)
    mp3 = MP3(vit=vit, masking_ratio=0.75)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    params = mp3.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)}, img)
    loss = mp3.apply(params, img, rngs={"mask": jax.random.PRNGKey(2)})
    assert loss.shape == () and float(loss) > 0

    # the mp3 vit is a usable classifier on its own (mp3.py:106-146)
    p2 = vit.init(jax.random.PRNGKey(0), img)
    out = vit.apply(p2, img)
    assert out.shape == (2, 10)


def test_recorder():
    from vit_pytorch_tpu.wrappers.recorder import Recorder

    v = _vit()
    img = jnp.ones((1, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), img)
    rec = Recorder(v)
    preds, attns = rec(params, img)
    assert preds.shape == (1, 10)
    # (b, depth, heads, n, n); n = 16 patches + 1 cls (README.md:1461-1500)
    assert attns.shape == (1, 2, 2, 17, 17)
    # rows sum to one (post-softmax maps)
    np.testing.assert_allclose(np.asarray(attns.sum(-1)), 1.0, atol=1e-5)
    v2 = rec.eject()
    assert v2 is v


def test_recorder_ordering_nonstandard_names():
    """Depth ordering must come from the explicit per-layer sow index, not
    from module-name parsing: a transformer whose attention modules are
    named adversarially (alphabetical order inverts depth order) still
    returns depth-ordered maps (VERDICT r3 #9 / recorder.py:58 contract)."""
    import flax.linen as fnn
    from vit_pytorch_tpu.nn.blocks import Attention
    from vit_pytorch_tpu.wrappers.recorder import Recorder

    class TwoLayer(fnn.Module):
        names: tuple
        indexed: bool = True

        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            for i, nm in enumerate(self.names):
                a = Attention(dim=16, heads=2, dim_head=8,
                              sow_index=i if self.indexed else None, name=nm)
                x = a(x, train=train) + x
            return x

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 5, 16)), jnp.float32)
    # depth order zeta→alpha: alphabetical sort would swap them
    adv = TwoLayer(names=("zeta", "alpha"))
    params = adv.init(jax.random.PRNGKey(0), x)
    _, attns_adv = Recorder(adv)(params, x)

    # same weights under well-ordered names = ground-truth depth order
    ordered = TwoLayer(names=("layers_0_attn", "layers_1_attn"))
    rename = {"zeta": "layers_0_attn", "alpha": "layers_1_attn"}
    params_ord = {"params": {rename[k]: v for k, v in params["params"].items()}}
    _, attns_ord = Recorder(ordered)(params_ord, x)

    np.testing.assert_allclose(
        np.asarray(attns_adv), np.asarray(attns_ord), atol=1e-6
    )

    # without the explicit index the adversarial names DO come back swapped —
    # the regression this guards against
    adv_noidx = TwoLayer(names=("zeta", "alpha"), indexed=False)
    _, attns_noidx = Recorder(adv_noidx)(params, x)
    assert not np.allclose(np.asarray(attns_noidx), np.asarray(attns_ord))
    np.testing.assert_allclose(
        np.asarray(attns_noidx[:, ::-1]), np.asarray(attns_ord), atol=1e-6
    )


def test_extractor():
    from vit_pytorch_tpu.wrappers.extractor import Extractor

    v = _vit()
    img = jnp.ones((1, 3, 64, 64))
    params = v.init(jax.random.PRNGKey(0), img)
    ex = Extractor(v)
    logits, embeddings = ex(params, img)
    assert logits.shape == (1, 10)
    assert embeddings.shape == (1, 17, 32)

    ex2 = Extractor(v, return_embeddings_only=True)
    emb_only = ex2(params, img)
    np.testing.assert_allclose(np.asarray(emb_only), np.asarray(embeddings))
