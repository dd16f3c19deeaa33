"""Recorder — collect per-layer post-softmax attention maps (reference
recorder.py:10-59).

The reference registers forward hooks on every ``Attention.attend`` softmax
(recorder.py:26-29).  Hooks don't exist under jit; instead every Attention
block ``sow``s its materialized attention matrix into the 'attn_maps'
collection whenever that collection is mutable (nn/blocks.py) — making the
collection mutable IS the "start recording" switch, and it automatically
forces the materialized-softmax path (flash kernels can't return probs;
same implicit behaviour as the reference, SURVEY §3.5).

Usage (mirrors README.md:1461-1500):
    v = ViT(...)
    recorder = Recorder(v)
    preds, attns = recorder(params, img)   # attns: (b, depth, heads, n, n)
"""

from __future__ import annotations

import re
from typing import Any

import jax.numpy as jnp


def _collect_attns(tree, path=()):
    """Depth-first collect of ('...', 'attn') sow leaves with their paths."""
    found = []
    if isinstance(tree, dict):
        for key, value in tree.items():
            if key == "attn" and isinstance(value, (tuple, list)):
                found.append((path, value[0]))
            else:
                found.extend(_collect_attns(value, path + (key,)))
    return found


class Recorder:
    """reference recorder.py:10 — wraps a model; returns (preds, attns)."""

    def __init__(self, vit: Any):
        self.vit = vit
        self.ejected = False

    def eject(self):
        """reference recorder.py:32-37 — returns the unwrapped model."""
        self.ejected = True
        return self.vit

    def __call__(self, variables, img, **kwargs):
        assert not self.ejected, "recorder has been ejected, cannot be used anymore"
        preds, mods = self.vit.apply(
            variables, img, mutable=["attn_maps"], **kwargs
        )
        inter = mods.get("attn_maps", {})
        found = _collect_attns(inter)

        def layer_key(item):
            path = "/".join(item[0])
            m = re.search(r"layers_(\d+)_attn", path)
            return (int(m.group(1)) if m else 1 << 30, path)

        found.sort(key=layer_key)
        attns = [a for _, a in found]
        if not attns:
            return preds, None
        return preds, jnp.stack(attns, axis=1)  # (b, depth, heads, n, n)
