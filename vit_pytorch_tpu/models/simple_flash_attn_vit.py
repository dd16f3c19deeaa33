"""SimpleViT with explicit flash attention (reference
simple_flash_attn_vit.py:139-176).

The reference exists to select torch SDPA backends per-GPU
(simple_flash_attn_vit.py:49-54).  In this framework fused attention *is*
the default path — the dispatcher picks the Pallas kernel or XLA fused
attention per shape (ops/attention.py) — so this constructor returns a
SimpleViT with the kernel path forced on, keeping the reference's
``use_flash_attn`` kwarg."""

from __future__ import annotations

from .simple_vit import SimpleViT as _SimpleViT


def SimpleViT(*, use_flash_attn: bool = True, **kwargs) -> _SimpleViT:
    """reference simple_flash_attn_vit.py:139 — same keyword constructor."""
    return _SimpleViT(flash=True if use_flash_attn else None, **kwargs)
