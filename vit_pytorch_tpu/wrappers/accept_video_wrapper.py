"""AcceptVideoWrapper — run any image network over video frames (reference
accept_video_wrapper.py:27-180).

Folds time into batch, calls the wrapped net (any method name), tree-maps
the outputs back to (b, t, ...), optionally projects the embedding output,
adds a learned time positional embedding, and optionally runs a MOSS module
over the patch tokens.  ``eval_with_no_grad`` becomes ``stop_gradient``."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils.helpers import default, exists, pair


def _accepts_kwarg(func, name: str) -> bool:
    """True if calling ``func(..., name=...)`` is valid (named param or
    **kwargs).  Unintrospectable callables default to True — flax modules
    always route extra kwargs to ``__call__``."""
    import inspect

    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return True
    params = sig.parameters.values()
    return any(
        p.kind is inspect.Parameter.VAR_KEYWORD or p.name == name for p in params
    )


class AcceptVideoWrapper(nn.Module):
    """reference accept_video_wrapper.py:27 — same keyword constructor."""

    image_net: Any
    forward_function: str = "__call__"
    add_time_pos_emb: bool = False
    dim_emb: Optional[int] = None
    time_seq_len: Optional[int] = None
    embed_is_channel_first: bool = False
    output_pos_add_pos_emb: int = 0
    proj_embed_to_dim: Optional[int] = None
    patch_size: Optional[Union[int, Tuple[int, int]]] = None
    moss: Optional[Any] = None

    @nn.compact
    def __call__(self, video, eval_with_no_grad: bool = False, forward_kwargs=None, *, train: bool = False):
        # train rides into the wrapped net (overridable via forward_kwargs);
        # only injected when the wrapped callable actually accepts it, so
        # plain callables without a ``train`` parameter keep working
        forward_kwargs = dict(forward_kwargs or {})
        if "train" not in forward_kwargs and _accepts_kwarg(
            self.image_net
            if self.forward_function == "__call__"
            else getattr(self.image_net, self.forward_function),
            "train",
        ):
            forward_kwargs["train"] = train
        time = video.shape[2]
        video_height, video_width = video.shape[-2:]

        if self.add_time_pos_emb:
            assert exists(self.dim_emb) and exists(self.time_seq_len)
            assert time <= self.time_seq_len

        frames = jnp.moveaxis(video, 2, 1)  # b t c h w
        frames = frames.reshape((-1,) + frames.shape[2:])

        func = (
            self.image_net
            if self.forward_function == "__call__"
            else getattr(self.image_net, self.forward_function)
        )
        outputs = func(frames, **forward_kwargs)
        if eval_with_no_grad:
            outputs = jax.tree.map(jax.lax.stop_gradient, outputs)

        leaves, treedef = jax.tree.flatten(outputs)
        leaves = [
            t.reshape((-1, time) + t.shape[1:])
            if hasattr(t, "shape") and t.size > 1
            else t
            for t in leaves
        ]

        pos_idx = self.output_pos_add_pos_emb

        if exists(self.proj_embed_to_dim):
            assert exists(self.dim_emb), "`dim_emb` must be passed in"
            leaves[pos_idx] = nn.Dense(self.proj_embed_to_dim, name="embed_proj")(
                leaves[pos_idx]
            )

        if self.add_time_pos_emb:
            dim_pos = default(self.proj_embed_to_dim, self.dim_emb)
            pos_emb = self.param(
                "pos_emb", nn.initializers.normal(1e-2), (self.time_seq_len, dim_pos)
            )
            embed = leaves[pos_idx]
            pe = pos_emb[None]  # (1, t, d)
            extra = embed.ndim - pe.ndim
            if self.embed_is_channel_first:
                pe = pe.reshape(pe.shape + (1,) * extra)
            else:
                pe = pe.reshape(pe.shape[:2] + (1,) * extra + (pe.shape[-1],))
            leaves[pos_idx] = embed + pe[:, : embed.shape[1]].astype(embed.dtype)

        if exists(self.moss):
            # reference accept_video_wrapper.py:78-79: a dict configures MOSS
            moss = self.moss
            if isinstance(moss, dict):
                from ..models.vivit_with_moss import MOSS

                moss = MOSS(**moss)
            # reference :70-74: fall back to image_net.patch_size, then the
            # nested image_net.vit.patch_size (e.g. Extractor-style wrappers)
            patch_size = self.patch_size
            if not exists(patch_size):
                patch_size = getattr(self.image_net, "patch_size", None)
            if not exists(patch_size):
                patch_size = getattr(
                    getattr(self.image_net, "vit", None), "patch_size", None
                )
            assert exists(patch_size), "`patch_size` must be provided for MOSS"
            ph, pw = pair(patch_size)
            num_h, num_w = video_height // ph, video_width // pw
            num_patches = num_h * num_w

            embed = leaves[pos_idx]
            num_cls = embed.shape[-2] - num_patches
            cls_tokens, patch_tokens = embed[:, :, :num_cls], embed[:, :, num_cls:]
            b, t = patch_tokens.shape[:2]
            patch_tokens = patch_tokens.reshape(b, t, num_h, num_w, -1)
            patch_tokens = moss(patch_tokens)
            patch_tokens = patch_tokens.reshape(b, t, num_patches, -1)
            leaves[pos_idx] = jnp.concatenate([cls_tokens, patch_tokens], axis=-2)

        return jax.tree.unflatten(treedef, leaves)
