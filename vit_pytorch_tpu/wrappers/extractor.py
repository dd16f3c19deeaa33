"""Extractor — capture a named layer's embeddings (reference extractor.py:18-90).

The reference registers a single forward hook on a named submodule (default
``transformer``) and returns (logits, embeddings).  Here flax's
``capture_intermediates`` records that module's ``__call__`` output — the
jit-safe equivalent.

Usage (mirrors README.md:1536-1576):
    v = ViT(...)
    ex = Extractor(v)
    logits, embeddings = ex(params, img)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp


class Extractor:
    """reference extractor.py:18 — same options (layer name, capture input
    vs output, return_embeddings_only)."""

    def __init__(
        self,
        vit: Any,
        layer_name: str = "transformer",
        layer: Optional[Any] = None,
        return_embeddings_only: bool = False,
    ):
        if layer is not None:
            # the reference takes a module OBJECT (extractor.py:23); flax
            # modules are addressed by name — accept a name here, reject
            # anything else loudly rather than silently capturing the
            # default layer
            if not isinstance(layer, str):
                raise ValueError(
                    "flax modules are captured by NAME: pass "
                    "layer_name='<submodule name>' (or layer='<name>') "
                    "instead of a module object"
                )
            layer_name = layer
        self.vit = vit
        self.layer_name = layer_name
        self.return_embeddings_only = return_embeddings_only
        self.ejected = False

    def eject(self):
        self.ejected = True
        return self.vit

    def __call__(self, variables, img, **kwargs):
        assert not self.ejected, "extractor has been ejected, cannot be used anymore"
        target = self.layer_name

        def capture_filter(mdl, method_name):
            return mdl.name == target and method_name == "__call__"

        preds, mods = self.vit.apply(
            variables,
            img,
            capture_intermediates=capture_filter,
            mutable=["intermediates"],
            **kwargs,
        )

        inter = mods.get("intermediates", {})

        def find(tree):
            if isinstance(tree, dict):
                for key, value in tree.items():
                    if key == target and isinstance(value, dict) and "__call__" in value:
                        return value["__call__"][0]
                    result = find(value)
                    if result is not None:
                        return result
            return None

        embeddings = find(inter)
        if embeddings is None:
            # reference extractor.py:52 asserts the hook fired
            raise ValueError(
                f"layer {self.layer_name!r} whose output to take as "
                f"embedding not found in the model"
            )
        if isinstance(embeddings, tuple):
            embeddings = embeddings[0]

        if self.return_embeddings_only:
            return embeddings
        return preds, embeddings
