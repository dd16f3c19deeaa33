"""Introspection-wrapper parity: Recorder attention maps and Extractor
embeddings match the reference's forward-hook implementations
(recorder.py:10-59, extractor.py:18-90) on converted weights."""

import numpy as np
import jax.numpy as jnp
import pytest


@pytest.fixture()
def _setup(reference, torch):
    from vit_pytorch import ViT as RefViT
    from vit_pytorch_tpu.models.vit import ViT
    from vit_pytorch_tpu.utils.convert import convert_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = RefViT(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    return ref, ViT(**kw), convert_vit(ref.state_dict()), x


@pytest.mark.parity
def test_recorder_parity(_setup, torch):
    from vit_pytorch.recorder import Recorder as RefRecorder
    from vit_pytorch_tpu.wrappers.recorder import Recorder

    ref, model, params, x = _setup
    rrec = RefRecorder(ref)
    with torch.no_grad():
        t_logits, t_attns = rrec(x)
    rrec.eject()

    j_logits, j_attns = Recorder(model)(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(j_attns), t_attns.numpy(), atol=5e-6)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=5e-5)


@pytest.mark.parity
def test_extractor_parity(_setup, torch):
    from vit_pytorch.extractor import Extractor as RefExtractor
    from vit_pytorch_tpu.wrappers.extractor import Extractor

    ref, model, params, x = _setup
    rext = RefExtractor(ref)
    with torch.no_grad():
        t_logits, t_emb = rext(x)
    rext.eject()

    j_logits, j_emb = Extractor(model)(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(j_emb), t_emb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(), atol=5e-5)


@pytest.mark.parity
def test_mp3_parity(reference, torch):
    """MP3 pretraining loss parity with injected mask indices."""
    from vit_pytorch.mp3 import ViT as RefViT, MP3 as RefMP3
    from vit_pytorch_tpu.ssl.mp3 import MP3, ViT
    from vit_pytorch_tpu.utils.convert import convert_mp3

    kw = dict(num_classes=7, image_size=32, patch_size=8, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = RefMP3(vit=RefViT(**kw), masking_ratio=0.5).eval()
    x = torch.randn(2, 3, 32, 32)
    b, n = 2, 16
    torch.manual_seed(3)
    with torch.no_grad():
        expected = float(ref(x))
    torch.manual_seed(3)
    idx = torch.rand(b, n).argsort(dim=-1).numpy()

    model = MP3(vit=ViT(**kw), masking_ratio=0.5)
    got = float(
        model.apply(convert_mp3(ref.state_dict()), jnp.asarray(x.numpy()),
                    rand_indices=jnp.asarray(idx))
    )
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-4)


@pytest.mark.parity
def test_vivit_moss_parity(reference, torch):
    from vit_pytorch.vivit_with_moss import ViViT as Ref
    from vit_pytorch_tpu.models.vivit_with_moss import ViViT
    from vit_pytorch_tpu.utils.convert import convert_vivit_moss

    kw = dict(image_size=32, image_patch_size=8, frames=4, frame_patch_size=2,
              num_classes=7, dim=32, spatial_depth=1, temporal_depth=1,
              heads=2, mlp_dim=64, dim_head=16)
    ref = Ref(**kw).eval()
    x = torch.randn(1, 3, 4, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViViT(**kw).apply(convert_vivit_moss(ref.state_dict()), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_wwt_parity(reference, torch):
    from vit_pytorch.wwt import WWT as Ref
    from vit_pytorch_tpu.models.wwt import WWT
    from vit_pytorch_tpu.utils.convert import convert_wwt

    kw = dict(num_classes=7, dim=32, depth=2, heads=2, dim_head=16, mlp_dim=64,
              image_size=64, patch_size=8, num_slots=4)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = WWT(**kw).apply(convert_wwt(ref.state_dict()), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4, rtol=1e-3)


@pytest.mark.parity
def test_adapter_parity(reference, torch):
    from vit_pytorch.learnable_memory_vit import ViT as RefViT, Adapter as RefAdapter
    from vit_pytorch_tpu.models.learnable_memory_vit import ViT, Adapter
    from vit_pytorch_tpu.utils.convert import convert_adapter

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    rv = RefViT(**kw).eval()
    ra = RefAdapter(vit=rv, num_classes=5, num_memories_per_layer=3).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ra(x).numpy()
    mine = Adapter(vit=ViT(**kw), num_classes=5, num_memories_per_layer=3)
    got = mine.apply(convert_adapter(ra.state_dict()), jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5, rtol=1e-3)


@pytest.mark.parity
def test_vat_vit_parity(reference, torch):
    """VAT's gated-attention ViT backbone (no trajectory conditioning)."""
    from vit_pytorch.vat import ViT as Ref
    from vit_pytorch_tpu.ssl.vat import ViT
    from vit_pytorch_tpu.utils.convert import convert_vat_vit

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32, depth=2,
              heads=2, dim_head=16, mlp_dim=64)
    ref = Ref(**kw).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        out = ref(x)
    expected = (out[0] if isinstance(out, tuple) else out).numpy()
    got = ViT(**kw).apply(convert_vat_vit(ref.state_dict()), jnp.asarray(x.numpy()))
    if isinstance(got, tuple):
        got = got[0]
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5, rtol=1e-3)


@pytest.mark.parity
def test_efficient_vit_parity(reference, torch):
    """The 'efficient' wrapper (external-transformer ViT) with an identity
    transformer on both sides, isolating the wrapper plumbing."""
    import flax.linen as fnn
    from vit_pytorch.efficient import ViT as Ref
    from vit_pytorch_tpu.models.efficient import ViT
    from vit_pytorch_tpu.utils.convert import convert_efficient_vit

    class TorchIdentity(torch.nn.Module):
        def forward(self, x):
            return x

    class FlaxIdentity(fnn.Module):
        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return x

    kw = dict(image_size=32, patch_size=8, num_classes=7, dim=32)
    ref = Ref(**kw, transformer=TorchIdentity()).eval()
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        expected = ref(x).numpy()
    got = ViT(**kw, transformer=FlaxIdentity()).apply(
        convert_efficient_vit(ref.state_dict()), jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=5e-5, rtol=1e-3)
