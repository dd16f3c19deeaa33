"""SimpleViT-3D with explicit flash attention (reference
simple_flash_attn_vit_3d.py:136-171).  See simple_flash_attn_vit.py — the
kernel path is forced on; constructor matches the reference."""

from __future__ import annotations

from .simple_vit_3d import SimpleViT as _SimpleViT3D


def SimpleViT(*, use_flash_attn: bool = True, **kwargs) -> _SimpleViT3D:
    """reference simple_flash_attn_vit_3d.py:136 — same keyword constructor."""
    return _SimpleViT3D(flash=True if use_flash_attn else None, **kwargs)
