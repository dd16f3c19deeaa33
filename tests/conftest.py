"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware the JAX-native way —
``xla_force_host_platform_device_count`` fakes 8 devices on the host (the
reference has no distributed tests at all; SURVEY §4).
Env vars must be set before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# the suite is compile-bound (1-CPU box, hundreds of tiny eager-init
# compiles); backend opt level 0 cuts cold compile time ~30% and every
# parity tolerance still holds (tests compute, they don't benchmark)
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

import sys

import pytest

import jax

# this jax build's CPU backend defaults to TPU-like bf16 matmul passes —
# parity vs torch fp32 needs true fp32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")

# persistent compilation cache: the suite is compile-bound on this 1-CPU box
# — eager ``Module.init`` dispatches hundreds of tiny per-op CPU compiles
# (~0.1 s each) per test.  Caching EVERY compile (min time 0) makes warm
# runs ~5x faster, and ops shared between tests hit even on the first run.
# Keyed by HLO hash — correctness is unaffected.
# The cache key does NOT include host CPU features; an entry AOT-compiled on
# a previous round's box can SIGILL on this one ("machine type ... doesn't
# match", cpu_aot_loader.cc).  Key the cache directory by a fingerprint of
# the host's CPU flags so a machine change silently starts a fresh cache.
def _machine_fingerprint():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


_cache_dir = os.environ.get(
    "VIT_TPU_TEST_CACHE_DIR",
    os.path.join(
        os.path.dirname(__file__), f".jax_cache_{_machine_fingerprint()}"
    ),
)

# Pre-seeded cache: a cold run on this 1-CPU box pays ~17 min of compiles
# (hundreds of eager Module.init dispatches per test); a committed tarball
# of exactly the suite's compile set turns a fresh clone into a warm run
# (~6 min).  Seeds are keyed by the same CPU fingerprint as the live cache
# (tests/cache_seed/<fingerprint>.tar.gz) so entries AOT-compiled for a
# different host can never load (cross-machine XLA:CPU AOT can SIGILL);
# an unmatched machine just compiles cold as before.
if not os.path.isdir(_cache_dir):
    _seed = os.path.join(
        os.path.dirname(__file__), "cache_seed", f"{_machine_fingerprint()}.tar.gz"
    )
    if os.path.isfile(_seed):
        import tarfile

        os.makedirs(_cache_dir, exist_ok=True)
        with tarfile.open(_seed, "r:gz") as tf:
            try:
                tf.extractall(_cache_dir, filter="data")
            except TypeError:  # filter= needs >=3.10.12/3.11.4; seed is ours
                tf.extractall(_cache_dir)

# make the resolved dir visible to tests that spawn driver-style subprocesses
os.environ["VIT_TPU_TEST_CACHE_DIR"] = _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# the axon TPU tunnel plugin ignores JAX_PLATFORMS=cpu; pin the default
# device to host CPU so tests don't pay 5-40 ms tunnel latency per dispatch
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass

REFERENCE_PATH = "/root/reference"


def _stub_torchvision():
    """torchvision/torchaudio are not in this image; the reference only needs
    them at module-import time (dino.py:9, es_vit.py:8, lejepa.py:9,
    vaat.py:11).  Stub enough surface for imports to succeed."""
    import types

    if "torchvision" not in sys.modules:
        import torch as _torch

        tv = types.ModuleType("torchvision")
        transforms = types.ModuleType("torchvision.transforms")

        class _Any(_torch.nn.Module):
            """Identity stand-in.  Subclasses nn.Module so the reference can
            compose it in nn.Sequential (dino.py:207-229)."""

            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, x):
                return x

        for name in (
            "Compose",
            "RandomApply",
            "ColorJitter",
            "RandomGrayscale",
            "RandomHorizontalFlip",
            "GaussianBlur",
            "RandomResizedCrop",
            "Normalize",
            "RandomSolarize",
        ):
            setattr(transforms, name, _Any)
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
    if "torchaudio" not in sys.modules:
        import torch as _torch

        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class Spectrogram(_torch.nn.Module):
            """Functional stand-in implementing torchaudio.transforms.
            Spectrogram semantics on top of core ``torch.stft`` (the real
            torchaudio class is a thin wrapper over it) — lets the reference
            AST run end-to-end for parity tests (vaat.py:249-255)."""

            def __init__(self, n_fft=400, win_length=None, hop_length=None,
                         pad=0, power=2.0, center=True, pad_mode="reflect",
                         **_k):
                super().__init__()
                self.n_fft = n_fft
                self.win_length = win_length if win_length is not None else n_fft
                self.hop_length = (
                    hop_length if hop_length is not None else self.win_length // 2
                )
                self.pad = pad
                self.power = power
                self.center = center
                self.pad_mode = pad_mode

            def forward(self, waveform):
                x = waveform
                if self.pad > 0:
                    x = _torch.nn.functional.pad(x, (self.pad, self.pad))
                spec = _torch.stft(
                    x,
                    n_fft=self.n_fft,
                    hop_length=self.hop_length,
                    win_length=self.win_length,
                    window=_torch.hann_window(self.win_length, device=x.device),
                    center=self.center,
                    pad_mode=self.pad_mode,
                    normalized=False,
                    onesided=True,
                    return_complex=True,
                )
                return spec.abs().pow(self.power)

        tat.Spectrogram = Spectrogram
        ta.transforms = tat
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat


@pytest.fixture(scope="session")
def reference():
    """Import the PyTorch reference package for parity tests."""
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _stub_torchvision()
    import vit_pytorch

    return vit_pytorch


@pytest.fixture(scope="session")
def torch():
    import torch as _torch

    _torch.manual_seed(0)
    return _torch
