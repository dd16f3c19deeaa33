"""NaViT "nested tensor" variant — TPU-packed equivalent (reference
na_vit_nested_tensor.py:134-330).

The reference reimplements NaViT on ``torch.nested`` jagged tensors so no
masks or padding exist (na_vit_nested_tensor.py:270-300).  XLA has no ragged
tensors; the TPU-native equivalent of jagged attention *is* the packed
segment-id representation consumed by the Pallas flash kernel — the same
design as models/na_vit.py, which skips cross-segment tiles instead of
materializing padding (SURVEY §2.5, §5 long-context).

This module therefore exposes the nested-tensor variant's API on top of the
packed implementation: construct ``NaViT`` with the same arguments and call
it on a list of variable-resolution images; it returns one embedding/logit
row per image (what the jagged version returns).

Documented divergence (intentional, no weight-parity with this file): the
reference's jagged rewrite also swaps minor layer details relative to
na_vit.py — bias-carrying patch-embed LayerNorms (na_vit_nested_tensor.py:
177-181), mean-subtracting bias-free LayerNorm for qk normalization
(:59-60) instead of RMSNorm, and split q/k/v projections (:52-57).  We keep
ONE NaViT architecture (na_vit.py's, converted by ``convert_na_vit``) for
both entry points rather than duplicating the model for a prototype-stage
torch API; packed-vs-unpacked equivalence is tested in tests/test_na_vit.py."""

from __future__ import annotations

from .na_vit import NaViT, forward_packed  # noqa: F401

__all__ = ["NaViT", "forward_packed"]
