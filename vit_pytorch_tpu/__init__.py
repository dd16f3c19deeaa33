"""vit-pytorch-tpu — a TPU-native (JAX / Flax / Pallas) rebuild of the
lucidrains/vit-pytorch model zoo.

Public API mirrors the reference's ``vit_pytorch/__init__.py:1-5`` (ViT,
SimpleViT, MAE, Dino re-exported; every other variant importable by submodule
path, e.g. ``from vit_pytorch_tpu.models.na_vit import NaViT``).
"""

from vit_pytorch_tpu.models.vit import ViT
from vit_pytorch_tpu.models.simple_vit import SimpleViT

__all__ = ["ViT", "SimpleViT"]

try:  # wrappers land as the zoo widens
    from vit_pytorch_tpu.ssl.mae import MAE  # noqa: F401

    __all__.append("MAE")
except ImportError:
    pass

try:
    from vit_pytorch_tpu.ssl.dino import Dino  # noqa: F401

    __all__.append("Dino")
except ImportError:
    pass

__version__ = "0.1.0"
