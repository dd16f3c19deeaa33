"""vit-pytorch-tpu — a TPU-native (JAX / Flax / Pallas) rebuild of the
lucidrains/vit-pytorch model zoo.

Public API mirrors the reference's ``vit_pytorch/__init__.py:1-5`` (ViT,
SimpleViT, MAE, Dino re-exported); every other variant is importable by
submodule path, e.g.::

    from vit_pytorch_tpu.models.na_vit import NaViT
    from vit_pytorch_tpu.models.max_vit import MaxViT
    from vit_pytorch_tpu.ssl.simmim import SimMIM
    from vit_pytorch_tpu.wrappers.recorder import Recorder

Packages:
    models/   — the ~60-variant model zoo (one file per reference variant)
    ssl/      — pretraining / distillation / policy wrappers
    wrappers/ — Recorder, Extractor, AcceptVideoWrapper
    nn/       — the shared block library (Attention, FeedForward, posemb zoo)
    ops/      — Pallas kernels (flash/short attention), packing, spectrogram
    parallel/ — mesh + pjit data/tensor-parallel training layer
    utils/    — torch→jax weight converters, orbax checkpointing,
                host→device prefetching input pipeline
"""

from vit_pytorch_tpu.models.vit import ViT
from vit_pytorch_tpu.models.simple_vit import SimpleViT
from vit_pytorch_tpu.ssl.mae import MAE
from vit_pytorch_tpu.ssl.dino import Dino

__all__ = ["ViT", "SimpleViT", "MAE", "Dino"]

__version__ = "0.1.0"
