"""Power spectrogram for the AST audio branch (reference vaat.py:11 uses
``torchaudio.transforms.Spectrogram``).

Pure-jnp STFT: hann window of ``win_length`` center-padded to ``n_fft``,
framed with ``hop_length`` (default win_length // 2), rfft, magnitude to the
given power.  Output (b, n_fft//2 + 1, frames) — torchaudio's layout."""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np
import jax.numpy as jnp


def spectrogram(
    audio: jnp.ndarray,
    n_fft: int = 128,
    power: float = 2.0,
    win_length: int = 24,
    hop_length: Optional[int] = None,
    pad: int = 0,
    center: bool = True,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """audio (b, t) → (b, freq, frames)."""
    hop = hop_length if hop_length is not None else win_length // 2

    window = np.hanning(win_length + 1)[:-1] if win_length > 1 else np.ones(1)
    lpad = (n_fft - win_length) // 2
    window = np.pad(window, (lpad, n_fft - win_length - lpad))
    window = jnp.asarray(window, audio.dtype)

    if pad > 0:
        audio = jnp.pad(audio, ((0, 0), (pad, pad)))
    if center:
        audio = jnp.pad(
            audio, ((0, 0), (n_fft // 2, n_fft // 2)), mode=pad_mode
        )

    b, t = audio.shape
    num_frames = 1 + (t - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = audio[:, idx]  # (b, frames, n_fft)

    spec = jnp.fft.rfft(frames * window, axis=-1)
    spec = jnp.abs(spec) ** power
    return jnp.swapaxes(spec, 1, 2)  # (b, freq, frames)
