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


_ATTN_LEAF = re.compile(r"attn(?:_(\d+))?$")


def _collect_attns(tree, path=()):
    """Depth-first collect of ('attn' / 'attn_NNNN') sow leaves with their
    paths and explicit indices (None when the module didn't set one)."""
    found = []
    if isinstance(tree, dict):
        for key, value in tree.items():
            m = _ATTN_LEAF.fullmatch(key)
            if m and isinstance(value, (tuple, list)):
                idx = int(m.group(1)) if m.group(1) is not None else None
                # sow appends — the LAST entry is this apply's map (earlier
                # ones are stale, e.g. from Module.init which runs with all
                # collections mutable and leaves its maps in the variables)
                found.append((idx, path + (key,), value[-1]))
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
        # drop any attn_maps collection riding in the variables (Module.init
        # runs with every collection mutable and leaves init-time maps there)
        variables = {k: v for k, v in variables.items() if k != "attn_maps"}
        preds, mods = self.vit.apply(
            variables, img, mutable=["attn_maps"], **kwargs
        )
        inter = mods.get("attn_maps", {})
        found = _collect_attns(inter)

        def layer_key(item):
            """Depth order: the explicit per-layer sow index when the module
            set one (nn/blocks.py Attention.sow_index — the robust path);
            otherwise fall back to a module-name parse, then path order."""
            idx, path_tuple, _ = item
            path = "/".join(path_tuple)
            if idx is not None:
                return (idx, path)
            m = re.search(r"layers_(\d+)_attn", path)
            return (int(m.group(1)) if m else 1 << 30, path)

        found.sort(key=layer_key)
        attns = [a for _, _, a in found]
        if not attns:
            return preds, None
        return preds, jnp.stack(attns, axis=1)  # (b, depth, heads, n, n)
