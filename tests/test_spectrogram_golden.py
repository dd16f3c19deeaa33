"""AST spectrogram front-end verification (VERDICT round-1 item 7).

torchaudio is not in this image (the conftest stubs it for reference
imports), but ``torchaudio.transforms.Spectrogram`` is a thin wrapper over
core ``torch.stft`` — same window padding, centering, reflect pad, rFFT and
power — so the goldens here are generated with torch.stft directly, with
exactly the parameters the reference AST uses (vaat.py:249-255:
n_fft=128, power=2, win_length=24, hop_length=None→12, hann window)."""

import numpy as np
import jax.numpy as jnp
import pytest


def _torch_golden(torch, x, n_fft, win_length, hop_length, power, center=True):
    spec = torch.stft(
        x,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=win_length,
        window=torch.hann_window(win_length),
        center=center,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs().pow(power).numpy()


@pytest.mark.parity
@pytest.mark.parametrize(
    "n_fft,win_length,hop_length,power",
    [
        (128, 24, None, 2),   # the reference AST config (vaat.py:221-224)
        (128, 24, None, 1),   # magnitude spectrogram
        (64, 64, 16, 2),      # win_length == n_fft (no window padding)
        (32, 20, 7, 2),       # odd hop, asymmetric window pad
    ],
)
def test_spectrogram_matches_torch_stft(torch, n_fft, win_length, hop_length, power):
    from vit_pytorch_tpu.ops.spectrogram import spectrogram

    g = torch.Generator().manual_seed(17)
    x = torch.randn(2, 960, generator=g)

    hop = hop_length if hop_length is not None else win_length // 2
    golden = _torch_golden(torch, x, n_fft, win_length, hop, power)

    got = spectrogram(
        jnp.asarray(x.numpy()),
        n_fft=n_fft,
        power=power,
        win_length=win_length,
        hop_length=hop_length,
    )
    assert got.shape == golden.shape
    np.testing.assert_allclose(np.asarray(got), golden, atol=2e-4, rtol=1e-4)


@pytest.mark.parity
def test_ast_crop_matches_reference_behaviour(torch):
    """The AST auto-crops the spectrogram to a whole patch grid
    (vaat.py:289-296); verify the repo front-end produces the same cropped
    shape for a non-divisible frame count."""
    from vit_pytorch_tpu.ops.spectrogram import spectrogram

    x = torch.randn(1, 1000)
    spec = spectrogram(jnp.asarray(x.numpy()), n_fft=128, win_length=24)
    freq, frames = spec.shape[-2], spec.shape[-1]
    assert freq == 128 // 2 + 1
    # torch.stft frame count with center=True: 1 + t // hop
    assert frames == 1 + 1000 // 12
