"""torch → JAX weight conversion.

This is the parity path (BASELINE.md: logits must match the PyTorch reference
at fp32 tolerance) and the analogue of the reference's one real checkpoint
import, ``SigLIPVAT.load_siglip`` (vat_siglip.py:273-343).

Rules map torch ``state_dict`` keys onto flax param paths:
  - ``nn.Linear.weight`` (out, in)  → ``Dense.kernel`` (in, out): transpose
  - ``nn.LayerNorm.weight/bias``    → ``LayerNorm.scale/bias``
  - ``nn.Conv2d.weight`` (o,i,kh,kw)→ ``Conv.kernel`` (kh,kw,i,o)
"""

from __future__ import annotations

import re
from typing import Callable, Iterable, Mapping

import numpy as np
import jax.numpy as jnp


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def linear_w(t):
    return _np(t).T


def conv2d_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def conv3d_w(t):
    return _np(t).transpose(2, 3, 4, 1, 0)


def identity(t):
    return _np(t)


Rule = tuple[str, str, Callable]


def apply_rules(state_dict: Mapping, rules: Iterable[Rule]) -> dict:
    """Apply (regex, replacement-template, transform) rules to a state dict.

    Replacement templates may use backrefs (``\\1`` etc.).  Returns nested
    flax params {'params': {...}} keyed by '/'-joined paths.
    """
    flat = {}
    stats = {}
    unmatched = []
    for key, tensor in state_dict.items():
        for pattern, template, transform in rules:
            m = re.fullmatch(pattern, key)
            if m:
                path = m.expand(template)
                if path == "<drop>":
                    break
                # "stats:" prefix routes into the batch_stats collection
                # (BatchNorm running mean/var)
                target = flat
                if path.startswith("stats:"):
                    target = stats
                    path = path[len("stats:"):]
                target[tuple(path.split("/"))] = jnp.asarray(transform(tensor))
                break
        else:
            unmatched.append(key)
    if unmatched:
        raise ValueError(f"unconverted torch keys: {unmatched}")

    from flax.traverse_util import unflatten_dict

    out = {"params": unflatten_dict(flat)}
    if stats:
        out["batch_stats"] = unflatten_dict(stats)
    return out


def _ln(src: str, dst: str) -> list[Rule]:
    return [
        (rf"{src}\.weight", rf"{dst}/scale", identity),
        (rf"{src}\.bias", rf"{dst}/bias", identity),
    ]


def _linear(src: str, dst: str, bias: bool = True) -> list[Rule]:
    rules = [(rf"{src}\.weight", rf"{dst}/kernel", linear_w)]
    if bias:
        rules.append((rf"{src}\.bias", rf"{dst}/bias", identity))
    return rules


def transformer_rules(
    src: str = "transformer", dst: str = "transformer", *, simple: bool = False
) -> list[Rule]:
    """Shared Transformer mapping (reference vit.py:66-83 / simple_vit.py:64-78).

    ``simple=True``: to_out is a bare Linear and FF has no dropout indices
    (net.3 is fc2); otherwise to_out.0 / net.4 (vit.py:44-49, 18-24).
    """
    out_key = "to_out" if simple else r"to_out\.0"
    fc2_idx = "3" if simple else "4"
    rules: list[Rule] = []
    rules += _ln(rf"{src}\.layers\.(\d+)\.0\.norm", rf"{dst}/layers_\1_attn/norm")
    rules += [
        (
            rf"{src}\.layers\.(\d+)\.0\.to_qkv\.weight",
            rf"{dst}/layers_\1_attn/to_qkv/kernel",
            linear_w,
        ),
        (
            rf"{src}\.layers\.(\d+)\.0\.{out_key}\.weight",
            rf"{dst}/layers_\1_attn/to_out/kernel",
            linear_w,
        ),
        (
            rf"{src}\.layers\.(\d+)\.0\.{out_key}\.bias",
            rf"{dst}/layers_\1_attn/to_out/bias",
            identity,
        ),
    ]
    rules += _ln(rf"{src}\.layers\.(\d+)\.1\.net\.0", rf"{dst}/layers_\1_ff/norm")
    rules += _linear(rf"{src}\.layers\.(\d+)\.1\.net\.1", rf"{dst}/layers_\1_ff/fc1")
    rules += _linear(
        rf"{src}\.layers\.(\d+)\.1\.net\.{fc2_idx}", rf"{dst}/layers_\1_ff/fc2"
    )
    rules += _ln(rf"{src}\.norm", rf"{dst}/norm")
    return rules


def patch_embed_rules(
    src: str = "to_patch_embedding", dst: str = "patch_embedding"
) -> list[Rule]:
    """reference vit.py:99-104: Sequential(Rearrange, LN, Linear, LN)."""
    return (
        _ln(rf"{src}\.1", rf"{dst}/norm_pre")
        + _linear(rf"{src}\.2", rf"{dst}/proj")
        + _ln(rf"{src}\.3", rf"{dst}/norm_post")
    )


def convert_vit_1d(state_dict) -> dict:
    """reference vit_1d.py:72-113 → models/vit_1d.py (no transformer final
    norm; LN+Linear head)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += transformer_rules()[:-2]  # drop the final-norm rules
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vit_3d(state_dict) -> dict:
    """reference vit_3d.py:77-126 → models/vit_3d.py (same head layout as
    vit_1d)."""
    return convert_vit_1d(state_dict)


def convert_parallel_vit(state_dict) -> dict:
    """reference parallel_vit.py:90-135 → models/parallel_vit.py."""
    rules: list[Rule] = [
        (r"to_patch_embedding\.1\.weight", "patch_embedding/proj/kernel", linear_w),
        (r"to_patch_embedding\.1\.bias", "patch_embedding/proj/bias", identity),
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    # layers.{i}.{0|1}.fns.{j} → layers_{i}_{attn|ff}_{j}
    rules += _ln(
        r"transformer\.layers\.(\d+)\.0\.fns\.(\d+)\.norm", r"layers_\1_attn_\2/norm"
    )
    rules += [
        (
            r"transformer\.layers\.(\d+)\.0\.fns\.(\d+)\.to_qkv\.weight",
            r"layers_\1_attn_\2/to_qkv/kernel",
            linear_w,
        ),
        (
            r"transformer\.layers\.(\d+)\.0\.fns\.(\d+)\.to_out\.0\.weight",
            r"layers_\1_attn_\2/to_out/kernel",
            linear_w,
        ),
        (
            r"transformer\.layers\.(\d+)\.0\.fns\.(\d+)\.to_out\.0\.bias",
            r"layers_\1_attn_\2/to_out/bias",
            identity,
        ),
    ]
    rules += _ln(
        r"transformer\.layers\.(\d+)\.1\.fns\.(\d+)\.net\.0", r"layers_\1_ff_\2/norm"
    )
    rules += _linear(
        r"transformer\.layers\.(\d+)\.1\.fns\.(\d+)\.net\.1", r"layers_\1_ff_\2/fc1"
    )
    rules += _linear(
        r"transformer\.layers\.(\d+)\.1\.fns\.(\d+)\.net\.4", r"layers_\1_ff_\2/fc2"
    )
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_deepvit(state_dict) -> dict:
    """reference deepvit.py:87-130 → models/deepvit.py."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += _ln(r"transformer\.layers\.(\d+)\.0\.norm", r"layers_\1_attn/norm")
    rules += [
        (
            r"transformer\.layers\.(\d+)\.0\.to_qkv\.weight",
            r"layers_\1_attn/to_qkv/kernel",
            linear_w,
        ),
        (
            r"transformer\.layers\.(\d+)\.0\.reattn_weights",
            r"layers_\1_attn/reattn_weights",
            identity,
        ),
    ]
    rules += _ln(
        r"transformer\.layers\.(\d+)\.0\.reattn_norm\.1", r"layers_\1_attn/reattn_norm"
    )
    rules += _linear(
        r"transformer\.layers\.(\d+)\.0\.to_out\.0", r"layers_\1_attn/to_out"
    )
    rules += _ln(r"transformer\.layers\.(\d+)\.1\.net\.0", r"layers_\1_ff/norm")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.1", r"layers_\1_ff/fc1")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_cait(state_dict) -> dict:
    """reference cait.py:124-178 → models/cait.py."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    for src, dst in (
        ("patch_transformer", "patch_transformer"),
        ("cls_transformer", "cls_transformer"),
    ):
        rules += [
            (
                rf"{src}\.layers\.(\d+)\.0\.scale",
                rf"{dst}/layers_\1_attn_scale",
                identity,
            ),
            (
                rf"{src}\.layers\.(\d+)\.1\.scale",
                rf"{dst}/layers_\1_ff_scale",
                identity,
            ),
        ]
        rules += _ln(
            rf"{src}\.layers\.(\d+)\.0\.fn\.norm", rf"{dst}/layers_\1_attn/norm"
        )
        rules += [
            (
                rf"{src}\.layers\.(\d+)\.0\.fn\.to_q\.weight",
                rf"{dst}/layers_\1_attn/to_q/kernel",
                linear_w,
            ),
            (
                rf"{src}\.layers\.(\d+)\.0\.fn\.to_kv\.weight",
                rf"{dst}/layers_\1_attn/to_kv/kernel",
                linear_w,
            ),
            (
                rf"{src}\.layers\.(\d+)\.0\.fn\.mix_heads_pre_attn",
                rf"{dst}/layers_\1_attn/mix_heads_pre_attn",
                identity,
            ),
            (
                rf"{src}\.layers\.(\d+)\.0\.fn\.mix_heads_post_attn",
                rf"{dst}/layers_\1_attn/mix_heads_post_attn",
                identity,
            ),
        ]
        rules += _linear(
            rf"{src}\.layers\.(\d+)\.0\.fn\.to_out\.0", rf"{dst}/layers_\1_attn/to_out"
        )
        rules += _ln(
            rf"{src}\.layers\.(\d+)\.1\.fn\.net\.0", rf"{dst}/layers_\1_ff/norm"
        )
        rules += _linear(
            rf"{src}\.layers\.(\d+)\.1\.fn\.net\.1", rf"{dst}/layers_\1_ff/fc1"
        )
        rules += _linear(
            rf"{src}\.layers\.(\d+)\.1\.fn\.net\.4", rf"{dst}/layers_\1_ff/fc2"
        )
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def vit_rules(src: str = "", dst: str = "") -> list[Rule]:
    """reference vit.py:85-138 → models/vit.py ViT params.  ``src``/``dst``
    prefix the torch keys / flax paths (used when the ViT is a submodule,
    e.g. MAE's ``encoder.``)."""
    rules: list[Rule] = []
    rules += patch_embed_rules(rf"{src}to_patch_embedding", f"{dst}patch_embedding")
    rules += [
        (rf"{src}cls_token", f"{dst}cls_token", identity),
        (rf"{src}pos_embedding", f"{dst}pos_embedding", identity),
    ]
    rules += transformer_rules(rf"{src}transformer", f"{dst}transformer")
    rules += _linear(rf"{src}mlp_head", f"{dst}mlp_head")
    return rules


def convert_vit(state_dict) -> dict:
    """reference vit.py:85-138 → models/vit.py ViT params."""
    return apply_rules(state_dict, vit_rules())


def convert_mae(state_dict) -> dict:
    """reference mae.py:8-41 MAE(encoder=ViT, ...) → ssl/mae.py MAE params.

    Covers: the wrapped ViT encoder (prefixed ``encoder.``), enc→dec
    projection (absent when dims match, mae.py:36), mask token, decoder
    Transformer (vit.py:66-83 layout), decoder pos Embedding, to_pixels."""
    rules: list[Rule] = []
    rules += vit_rules(r"encoder\.", "encoder/")
    # patch_to_emb re-registers encoder.to_patch_embedding[1:] (mae.py:29-30)
    # -- same tensors, duplicate keys
    rules += [(r"patch_to_emb\..*", "<drop>", identity)]
    rules += _linear("enc_to_dec", "enc_to_dec")
    rules += [
        ("mask_token", "mask_token", identity),
        (r"decoder_pos_emb\.weight", "decoder_pos_emb/embedding", identity),
    ]
    rules += transformer_rules("decoder", "decoder")
    rules += _linear("to_pixels", "to_pixels")
    return apply_rules(state_dict, rules)


def _fuse_qkv(state_dict: Mapping, only_prefix: str = "") -> dict:
    """NaViT keeps separate to_q / to_kv projections (na_vit.py:127-128); our
    self-attention uses one fused qkv GEMM (better MXU utilization).  Fuse the
    torch weights: qkv = cat([q, kv], dim=out).  Cross-attention modules (e.g.
    attn_pool) keep split projections — filter with ``only_prefix``."""
    import numpy as np

    out = dict(state_dict)
    for key in list(out.keys()):
        if key.endswith(".to_q.weight") and key.startswith(only_prefix):
            base = key[: -len(".to_q.weight")]
            kv_key = base + ".to_kv.weight"
            if kv_key in out:
                q = _np(out.pop(key))
                kv = _np(out.pop(kv_key))
                out[base + ".to_qkv.weight"] = np.concatenate([q, kv], axis=0)
    return out


def navit_transformer_rules(src: str = "transformer", dst: str = "transformer") -> list[Rule]:
    """NaViT transformer (na_vit.py:171-193): bias-free custom LN (param
    'gamma'), qk RMSNorm, FF as Sequential indices (105-113)."""
    rules: list[Rule] = [
        (rf"{src}\.layers\.(\d+)\.0\.norm\.gamma", rf"{dst}/layers_\1_attn/norm/scale", identity),
        (rf"{src}\.layers\.(\d+)\.0\.q_norm\.gamma", rf"{dst}/layers_\1_attn/q_norm/gamma", identity),
        (rf"{src}\.layers\.(\d+)\.0\.k_norm\.gamma", rf"{dst}/layers_\1_attn/k_norm/gamma", identity),
        (rf"{src}\.layers\.(\d+)\.0\.to_qkv\.weight", rf"{dst}/layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{src}\.layers\.(\d+)\.0\.to_out\.0\.weight", rf"{dst}/layers_\1_attn/to_out/kernel", linear_w),
        (rf"{src}\.layers\.(\d+)\.1\.0\.gamma", rf"{dst}/layers_\1_ff/norm/scale", identity),
        (rf"{src}\.layers\.(\d+)\.1\.1\.weight", rf"{dst}/layers_\1_ff/fc1/kernel", linear_w),
        (rf"{src}\.layers\.(\d+)\.1\.1\.bias", rf"{dst}/layers_\1_ff/fc1/bias", identity),
        (rf"{src}\.layers\.(\d+)\.1\.4\.weight", rf"{dst}/layers_\1_ff/fc2/kernel", linear_w),
        (rf"{src}\.layers\.(\d+)\.1\.4\.bias", rf"{dst}/layers_\1_ff/fc2/bias", identity),
        (rf"{src}\.norm\.gamma", rf"{dst}/norm/scale", identity),
    ]
    return rules


def convert_na_vit(state_dict) -> dict:
    """reference na_vit.py:195-402 → models/na_vit.py NaViT params."""
    sd = {
        k: v
        for k, v in _fuse_qkv(state_dict, only_prefix="transformer.").items()
        if not k.endswith(".beta")
    }
    rules: list[Rule] = [
        (r"to_patch_embedding\.0\.gamma", "patch_norm_pre/scale", identity),
        (r"to_patch_embedding\.1\.weight", "patch_proj/kernel", linear_w),
        (r"to_patch_embedding\.1\.bias", "patch_proj/bias", identity),
        (r"to_patch_embedding\.2\.gamma", "patch_norm_post/scale", identity),
        ("pos_embed_height", "pos_embed_height", identity),
        ("pos_embed_width", "pos_embed_width", identity),
        ("attn_pool_queries", "attn_pool_queries", identity),
        (r"attn_pool\.norm\.gamma", "attn_pool/norm/scale", identity),
        (r"attn_pool\.q_norm\.gamma", "attn_pool/q_norm/gamma", identity),
        (r"attn_pool\.k_norm\.gamma", "attn_pool/k_norm/gamma", identity),
        (r"attn_pool\.to_q\.weight", "attn_pool/to_q/kernel", linear_w),
        (r"attn_pool\.to_kv\.weight", "attn_pool/to_kv/kernel", linear_w),
        (r"attn_pool\.to_out\.0\.weight", "attn_pool/to_out/kernel", linear_w),
        (r"mlp_head\.0\.gamma", "head_norm/scale", identity),
        (r"mlp_head\.1\.weight", "mlp_head/kernel", linear_w),
    ]
    rules += navit_transformer_rules()
    return apply_rules(sd, rules)


def _bn(src: str, dst: str) -> list[Rule]:
    return [
        (rf"{src}\.weight", rf"{dst}/scale", identity),
        (rf"{src}\.bias", rf"{dst}/bias", identity),
        (rf"{src}\.running_mean", rf"stats:{dst}/mean", identity),
        (rf"{src}\.running_var", rf"stats:{dst}/var", identity),
        (rf"{src}\.num_batches_tracked", "<drop>", identity),
    ]


def _conv(src: str, dst: str, bias: bool = True) -> list[Rule]:
    rules = [(rf"{src}\.weight", rf"{dst}/kernel", conv2d_w)]
    if bias:
        rules.append((rf"{src}\.bias", rf"{dst}/bias", identity))
    return rules


def convert_max_vit(state_dict) -> dict:
    """reference max_vit.py:208-291 → models/max_vit.py MaxViT params
    (incl. BatchNorm running stats into batch_stats)."""
    rules: list[Rule] = []
    rules += _conv(r"conv_stem\.0", "conv_stem_0")
    rules += _conv(r"conv_stem\.1", "conv_stem_1")

    # MBConv may be wrapped in MBConvResidual (fn.) — max_vit.py:114-116
    mb = r"layers\.(\d+)\.0\.(?:fn\.)?"
    dst = r"block_\1_mbconv"
    rules += _conv(mb + r"0", dst + "/conv_expand")
    rules += _bn(mb + r"1", dst + "/bn1")
    rules += _conv(mb + r"3", dst + "/conv_depthwise")
    rules += _bn(mb + r"4", dst + "/bn2")
    rules += [
        (mb + r"6\.gate\.1\.weight", dst + "/se/fc1/kernel", linear_w),
        (mb + r"6\.gate\.3\.weight", dst + "/se/fc2/kernel", linear_w),
    ]
    rules += _conv(mb + r"7", dst + "/conv_project")
    rules += _bn(mb + r"8", dst + "/bn3")

    # block attention (seq idx 2/3), grid attention (seq idx 6/7)
    for seq_idx, kind in ((2, "block_attn"), (3, "block_ff"), (6, "grid_attn"), (7, "grid_ff")):
        src = rf"layers\.(\d+)\.{seq_idx}\.fn\."
        d = rf"block_\1_{kind}"
        if "attn" in kind:
            rules += _ln(src + r"norm", d + "/norm")
            rules += [
                (src + r"to_qkv\.weight", d + "/to_qkv/kernel", linear_w),
                (src + r"to_out\.0\.weight", d + "/to_out/kernel", linear_w),
                (src + r"rel_pos_bias\.weight", d + "/rel_pos_bias", identity),
            ]
        else:
            rules += _ln(src + r"net\.0", d + "/norm")
            rules += _linear(src + r"net\.1", d + "/fc1")
            rules += _linear(src + r"net\.4", d + "/fc2")

    rules += _ln(r"mlp_head\.1", "head_norm")
    rules += _linear(r"mlp_head\.2", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vivit(state_dict) -> dict:
    """reference vivit.py:154-281 (factorized_encoder) → models/vivit.py."""
    rules: list[Rule] = []
    rules += _ln(r"to_patch_embedding\.1", "patch_norm_pre")
    rules += _linear(r"to_patch_embedding\.2", "patch_proj")
    rules += _ln(r"to_patch_embedding\.3", "patch_norm_post")
    rules += [
        ("pos_embedding", "pos_embedding", identity),
        ("spatial_cls_token", "spatial_cls_token", identity),
        ("temporal_cls_token", "temporal_cls_token", identity),
    ]
    rules += transformer_rules("spatial_transformer", "spatial_transformer")
    rules += transformer_rules("temporal_transformer", "temporal_transformer")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit(state_dict) -> dict:
    """reference simple_vit.py:80-120 → models/simple_vit.py SimpleViT params."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += transformer_rules(simple=True)
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)
