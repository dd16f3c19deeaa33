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


def convert_distillable_vit(state_dict) -> dict:
    """reference distill.py:46-75: DistillableViT shares the exact ViT layout
    (it subclasses ViT and only changes forward plumbing)."""
    return convert_vit(state_dict)


def convert_distillable_t2t(state_dict) -> dict:
    """reference distill.py:69-85: DistillableT2TViT shares the T2TViT layout."""
    return convert_t2t(state_dict)


def convert_distillable_efficient_vit(state_dict, transformer_rules_list=()) -> dict:
    """reference distill.py:87-101: DistillableEfficientViT shares the
    efficient.py ViT layout (external transformer rules pass through)."""
    return convert_efficient_vit(state_dict, transformer_rules_list)


def convert_vit_with_decorr(state_dict) -> dict:
    """reference vit_with_decorr.py:150-230 → models/vit_with_decorr.py ViT
    (decorrelation modules are parameter-free; FF carries its norm outside
    the net Sequential)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1"
    rules += _ln(rf"{f}\.norm", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.net\.0", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.net\.3", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vit_detpool(state_dict) -> dict:
    """reference vit_detpool.py:107-211 → models/vit_detpool.py ViTDetPool
    (ViT trunk flattened to top level, bare-Linear head; the det-pooling is
    parameter-free masked means)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [(rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w)]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vit_nd(state_dict) -> dict:
    """reference vit_nd.py:89-173 → models/vit_nd.py ViTND (same per-layer
    layout as vit_1d: no final transformer norm... mapped from the live keys:
    patch embed Linear+LN, vit-style blocks with final norm, bare head)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += _linear(r"to_patch_embedding\.1", "patch_proj")
    rules += _ln(r"to_patch_embedding\.2", "patch_norm")
    rules += transformer_rules()
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def _vit_nd_flat_rules() -> list[Rule]:
    """Shared vit_nd_rotary/pope block layout: flat top-level layers, fused
    to_qk + separate to_v, Linear+LN patch embed, bare head."""
    rules: list[Rule] = []
    rules += _linear(r"to_patch_embedding\.1", "patch_proj")
    rules += _ln(r"to_patch_embedding\.2", "patch_norm")
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qk\.weight", r"layers_\1_attn/to_qk/kernel", linear_w),
        (rf"{a}\.to_v\.weight", r"layers_\1_attn/to_v/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("mlp_head", "mlp_head")
    return rules


def convert_vit_nd_rotary(state_dict) -> dict:
    """reference vit_nd_rotary.py → models/vit_nd_rotary.py (golden-ratio
    rotary freqs are deterministic buffers — recomputed at trace time)."""
    rules: list[Rule] = [(r".*rotary_emb\.freqs", "<drop>", identity)]
    rules += _vit_nd_flat_rules()
    return apply_rules(state_dict, rules)


def convert_vit_nd_pope(state_dict) -> dict:
    """reference vit_nd_pope.py → models/vit_nd_pope.py (PoPE polar embedding:
    deterministic freqs dropped; the learned phase bias is shared between the
    top-level and transformer registrations — mapped once)."""
    rules: list[Rule] = [
        (r"polar_emb\.freqs", "<drop>", identity),
        (r"transformer\.polar_emb\..*", "<drop>", identity),
        (r"polar_emb\.learned_bias", "learned_bias", identity),
    ]
    rules += _vit_nd_flat_rules()
    return apply_rules(state_dict, rules)


def convert_mp3(state_dict) -> dict:
    """reference mp3.py:150-186 → ssl/mp3.py MP3 (split to_q/to_kv blocks;
    LN+Linear position-prediction head; the wrapped ViT's classification
    head is unused during pretraining -- dropped)."""
    rules: list[Rule] = [(r"vit\.linear_head\..*", "<drop>", identity)]
    rules += patch_embed_rules(r"vit\.to_patch_embedding", "vit/patch_embedding")
    a = r"vit\.transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"vit/transformer/layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"vit/transformer/layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"vit/transformer/layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"vit/transformer/layers_\1_attn/to_out")
    f = r"vit\.transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"vit/transformer/layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"vit/transformer/layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"vit/transformer/layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "mlp_head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


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


def convert_simmim(state_dict) -> dict:
    """reference simmim.py:6-87 SimMIM(encoder=ViT, ...) → ssl/simmim.py.
    ``to_patch``/``patch_to_emb`` re-register encoder submodules
    (simmim.py:22-23) — duplicate tensors, dropped."""
    rules: list[Rule] = []
    rules += vit_rules(r"encoder\.", "encoder/")
    rules += [(r"patch_to_emb\..*", "<drop>", identity)]
    rules += [("mask_token", "mask_token", identity)]
    rules += _linear("to_pixels", "to_pixels")
    return apply_rules(state_dict, rules)


def convert_dino(state_dict, projection_layers: int = 4) -> dict:
    """reference dino.py:184-303 Dino(net=ViT, ...) → ssl/dino.py Dino params.

    Only the student side carries trainable params on our side — the teacher
    is explicit ``DinoState`` created via ``Dino.create_state`` (a copy of
    the student, matching the reference's deepcopy-on-first-forward,
    dino.py:251-255) — so ``teacher_encoder.*`` and the center buffers are
    dropped.  Projector Sequential layout (dino.py:92-114): Linear/GELU
    pairs, L2Norm, final Linear."""
    L = projection_layers
    rules: list[Rule] = []
    # flax shares the wrapped net between Dino and NetWrapper — its params
    # live at the top-level 'net' scope (see ssl/dino.py Dino.net)
    rules += vit_rules(r"student_encoder\.net\.", "net/")
    for i in range(L - 1):
        rules += _linear(
            rf"student_encoder\.projector\.net\.{2 * i}",
            f"student_encoder/projector/fc{i}",
        )
    rules += _linear(
        rf"student_encoder\.projector\.net\.{2 * L - 1}",
        "student_encoder/projector/out",
    )
    rules += [
        # the raw net is registered twice (Dino.net AND student_encoder.net,
        # same tensors) — keep the student_encoder copy
        (r"net\..*", "<drop>", identity),
        (r"teacher_encoder\..*", "<drop>", identity),
        (r"teacher_centers", "<drop>", identity),
        (r"last_teacher_centers", "<drop>", identity),
    ]
    return apply_rules(state_dict, rules)


def convert_lejepa(state_dict, projection_layers: int = 4) -> dict:
    """reference lejepa.py:187-282 LeJEPA(net=ViT, ...) → ssl/lejepa.py.
    Same double-registration of the raw net as Dino; projector Sequential
    layout is dino's MLP (lejepa.py reuses it)."""
    L = projection_layers
    rules: list[Rule] = []
    rules += vit_rules(r"encoder\.net\.", "net/")
    for i in range(L - 1):
        rules += _linear(
            rf"encoder\.projector\.net\.{2 * i}", f"encoder/projector/fc{i}"
        )
    rules += _linear(
        rf"encoder\.projector\.net\.{2 * L - 1}", "encoder/projector/out"
    )
    rules += [(r"net\..*", "<drop>", identity)]
    return apply_rules(state_dict, rules)


def convert_mpp(state_dict) -> dict:
    """reference mpp.py:79-175 MPP(transformer=ViT, ...) → ssl/mpp.py.
    ``patch_to_emb`` re-registers transformer.to_patch_embedding[1:]
    (mpp.py:100) — duplicates, dropped.  MPPLoss holds no parameters."""
    rules: list[Rule] = []
    rules += vit_rules(r"transformer\.", "transformer/")
    rules += [(r"patch_to_emb\..*", "<drop>", identity)]
    rules += [("mask_token", "mask_token", identity)]
    rules += _linear("to_bits", "to_bits")
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


def convert_simple_uvit(state_dict) -> dict:
    """reference simple_uvit.py:106-158 → models/simple_uvit.py SimpleUViT.

    transformer.layers.N = [combine_skip Linear|None, Attention, FeedForward]
    (simple_uvit.py:77-81); None entries never reach the state_dict."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [("register_tokens", "register_tokens", identity)]
    rules += _linear(
        r"transformer\.layers\.(\d+)\.0", r"layers_\1_combine_skip"
    )
    a = r"transformer\.layers\.(\d+)\.1"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{a}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.2"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_vit_with_patch_dropout(state_dict) -> dict:
    """reference vit_with_patch_dropout.py:96-147 → models/vit_with_patch_dropout.py
    (bare-Linear patch embed, no transformer final norm, LN→Linear head)."""
    rules: list[Rule] = []
    rules += _linear(r"to_patch_embedding\.1", "patch_embedding/proj")
    rules += [
        ("pos_embedding", "pos_embedding", identity),
        ("cls_token", "cls_token", identity),
    ]
    rules += transformer_rules()[:-2]  # no final norm
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vit_with_keel_post_ln(state_dict) -> dict:
    """reference vit_with_keel_post_ln.py:121-217 → models/vit_with_keel_post_ln.py.

    The torch transformer is one flat ModuleList alternating
    Attention/FeedForward (layers.2i = attn of layer i, layers.2i+1 = ff,
    reference :90-94) plus bias-free post_norms; the head is a plain
    Linear."""
    import re as _re

    sd = {}
    for k, v in state_dict.items():
        m = _re.match(r"transformer\.layers\.(\d+)\.(.*)", k)
        if m:
            flat, rest = int(m.group(1)), m.group(2)
            kind = "attn" if flat % 2 == 0 else "ff"
            sd[f"transformer.layer_{flat // 2}_{kind}.{rest}"] = v
        else:
            sd[k] = v

    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("pos_embedding", "pos_embedding", identity),
        ("cls_token", "cls_token", identity),
    ]
    a = r"transformer\.layer_(\d+)_attn"
    rules += [
        (rf"{a}\.norm\.weight", r"layers_\1_attn/norm/scale", identity),
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layer_(\d+)_ff"
    rules += [
        (rf"{f}\.net\.0\.weight", r"layers_\1_ff/norm/scale", identity),
    ]
    rules += _linear(rf"{f}\.net\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.net\.4", r"layers_\1_ff/fc2")
    rules += [
        (r"transformer\.post_norms\.(\d+)\.weight", r"post_norms_\1/scale", identity),
    ]
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(sd, rules)


def convert_jet_vit(state_dict, attn_layers=None, depth=None) -> dict:
    """reference jet_vit.py:292-359 → models/jet_vit.py JetViT.

    The reference instantiates ALL THREE attention options per layer in a
    ModuleDict (jet_vit.py:270-277) even though only ``attn_layers[i]`` is
    ever selected; the flax model only creates the selected option(s), so
    unselected options' weights are dropped here.  ``attn_layers`` entries
    are 'FA' | 'WA' | 'LA' or tuples thereof (default all-'FA', matching the
    reference default jet_vit.py:262-263)."""
    import re as _re

    if depth is None:
        layer_idx = [
            int(m.group(1))
            for k in state_dict
            for m in [_re.match(r"transformer\.layers\.(\d+)\.", k)]
            if m
        ]
        depth = max(layer_idx) + 1
    if attn_layers is None:
        attn_layers = ["FA"] * depth

    keep = {}
    for i in range(depth):
        spec = attn_layers[i]
        keep[i] = set(spec if isinstance(spec, (tuple, list)) else (spec,))

    sd = {}
    for k, v in state_dict.items():
        m = _re.match(r"transformer\.layers\.(\d+)\.0\.options\.(FA|WA|LA)\.", k)
        if m and m.group(2) not in keep[int(m.group(1))]:
            continue
        sd[k] = v

    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [("pos_embedding", "pos_embedding", identity)]

    fa = r"transformer\.layers\.(\d+)\.0\.options\.FA"
    rules += _ln(rf"{fa}\.norm", r"layers_\1_fa/norm")
    rules += [(rf"{fa}\.to_qkv\.weight", r"layers_\1_fa/to_qkv/kernel", linear_w)]
    rules += _linear(rf"{fa}\.to_out\.0", r"layers_\1_fa/to_out")

    wa = r"transformer\.layers\.(\d+)\.0\.options\.WA"
    rules += _ln(rf"{wa}\.norm", r"layers_\1_wa/norm")
    rules += [
        (rf"{wa}\.to_qkv\.weight", r"layers_\1_wa/to_qkv/kernel", linear_w),
        (rf"{wa}\.to_out\.0\.weight", r"layers_\1_wa/to_out/kernel", linear_w),
        (rf"{wa}\.rel_pos_bias\.weight", r"layers_\1_wa/rel_pos_bias", identity),
    ]

    la = r"transformer\.layers\.(\d+)\.0\.options\.LA"
    rules += _ln(rf"{la}\.norm", r"layers_\1_la/norm")
    rules += [(rf"{la}\.to_qkv\.weight", r"layers_\1_la/to_qkv/kernel", linear_w)]
    rules += _linear(rf"{la}\.dynamic_conv\.mlp\.0", r"layers_\1_la/dynamic_conv/mlp_fc1")
    rules += _linear(rf"{la}\.dynamic_conv\.mlp\.2", r"layers_\1_la/dynamic_conv/mlp_fc2")
    rules += _linear(rf"{la}\.to_out\.0", r"layers_\1_la/to_out")

    rules += _ln(r"transformer\.layers\.(\d+)\.1\.net\.0", r"layers_\1_ff/norm")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.1", r"layers_\1_ff/fc1")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.4", r"layers_\1_ff/fc2")

    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(sd, rules)


def convert_local_vit(state_dict) -> dict:
    """reference local_vit.py:114-150 → models/local_vit.py LocalViT.

    Attention sits behind a Residual wrapper (layers.N.0.fn.*) and the conv
    FFN behind ExcludeCLS(Residual(...)) (layers.N.1.fn.fn.net.*,
    local_vit.py:97-105).  DepthWiseConv2d is a Sequential of a grouped 3x3
    and a 1x1 conv (local_vit.py:31-39)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    a = r"transformer\.layers\.(\d+)\.0\.fn"
    da = r"layers_\1_attn"
    rules += _ln(rf"{a}\.norm", rf"{da}/norm")
    rules += [(rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", linear_w)]
    rules += _linear(rf"{a}\.to_out\.0", rf"{da}/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.fn\.fn\.net"
    df = r"layers_\1_ff"
    rules += _ln(rf"{f}\.0", rf"{df}/norm")
    rules += [
        (rf"{f}\.1\.weight", rf"{df}/conv_in/kernel", conv2d_w),
        (rf"{f}\.1\.bias", rf"{df}/conv_in/bias", identity),
        (rf"{f}\.3\.net\.0\.weight", rf"{df}/depthwise/kernel", conv2d_w),
        (rf"{f}\.3\.net\.0\.bias", rf"{df}/depthwise/bias", identity),
        (rf"{f}\.3\.net\.1\.weight", rf"{df}/pointwise/kernel", conv2d_w),
        (rf"{f}\.3\.net\.1\.bias", rf"{df}/pointwise/bias", identity),
        (rf"{f}\.6\.weight", rf"{df}/conv_out/kernel", conv2d_w),
        (rf"{f}\.6\.bias", rf"{df}/conv_out/bias", identity),
    ]
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_na_vit_nested_tensor(state_dict, extra_rules: list = ()) -> dict:
    """reference na_vit_nested_tensor.py:134-301 →
    models/na_vit_nested_tensor.py NaViT params (split q/k/v, LayerNorm
    qk-norm, biased patch-embed LNs)."""

    def attn_rules(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.norm\.weight", rf"{dst}/norm/scale", identity),
            (rf"{src}\.to_queries\.weight", rf"{dst}/to_q/kernel", linear_w),
            (rf"{src}\.to_keys\.weight", rf"{dst}/to_k/kernel", linear_w),
            (rf"{src}\.to_values\.weight", rf"{dst}/to_v/kernel", linear_w),
            (rf"{src}\.query_norm\.weight", rf"{dst}/q_norm/scale", identity),
            (rf"{src}\.key_norm\.weight", rf"{dst}/k_norm/scale", identity),
            (rf"{src}\.to_out\.weight", rf"{dst}/to_out/kernel", linear_w),
        ]

    rules: list[Rule] = [
        (r"to_patch_embedding\.0\.weight", "patch_norm_pre/scale", identity),
        (r"to_patch_embedding\.0\.bias", "patch_norm_pre/bias", identity),
        (r"to_patch_embedding\.1\.weight", "patch_proj/kernel", linear_w),
        (r"to_patch_embedding\.1\.bias", "patch_proj/bias", identity),
        (r"to_patch_embedding\.2\.weight", "patch_norm_post/scale", identity),
        (r"to_patch_embedding\.2\.bias", "patch_norm_post/bias", identity),
        ("pos_embed_height", "pos_embed_height", identity),
        ("pos_embed_width", "pos_embed_width", identity),
        ("attn_pool_queries", "attn_pool_queries", identity),
        (r"transformer\.norm\.weight", "transformer/norm/scale", identity),
        (r"mlp_head\.0\.weight", "head_norm/scale", identity),
        (r"mlp_head\.1\.weight", "mlp_head/kernel", linear_w),
    ]
    rules += attn_rules(r"transformer\.layers\.(\d+)\.0", r"transformer/layers_\1_attn")
    rules += [
        (r"transformer\.layers\.(\d+)\.1\.0\.weight", r"transformer/layers_\1_ff/norm/scale", identity),
    ]
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.1", r"transformer/layers_\1_ff/fc1")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.4", r"transformer/layers_\1_ff/fc2")
    rules += attn_rules(r"attn_pool", "attn_pool")
    rules += list(extra_rules)
    return apply_rules(state_dict, rules)


def convert_na_vit_nested_tensor_3d(state_dict) -> dict:
    """reference na_vit_nested_tensor_3d.py:136-322 →
    models/na_vit_nested_tensor_3d.py NaViT params.  The transformer / pool
    layout is line-identical to the 2-D nested-tensor variant (reference
    na_vit_nested_tensor_3d.py:44-133 ≡ na_vit_nested_tensor.py:43-132);
    adds the factorized frame pos emb and the register tokens."""
    return convert_na_vit_nested_tensor(
        state_dict,
        extra_rules=[
            ("pos_embed_frame", "pos_embed_frame", identity),
            ("register_tokens", "register_tokens", identity),
        ],
    )


def convert_small_dataset_vit(state_dict) -> dict:
    """reference vit_for_small_dataset.py:98-140 → models/vit_for_small_dataset.py
    (SPT patch tokens, LSA learned-temperature attention)."""
    rules: list[Rule] = [
        (r"to_patch_embedding\.to_patch_tokens\.1\.weight", "patch_embedding/norm/scale", identity),
        (r"to_patch_embedding\.to_patch_tokens\.1\.bias", "patch_embedding/norm/bias", identity),
        (r"to_patch_embedding\.to_patch_tokens\.2\.weight", "patch_embedding/proj/kernel", linear_w),
        (r"to_patch_embedding\.to_patch_tokens\.2\.bias", "patch_embedding/proj/bias", identity),
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
        (r"transformer\.layers\.(\d+)\.0\.temperature", r"layers_\1_attn/temperature", identity),
    ]
    rules += _ln(r"transformer\.layers\.(\d+)\.0\.norm", r"layers_\1_attn/norm")
    rules += [
        (r"transformer\.layers\.(\d+)\.0\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _linear(r"transformer\.layers\.(\d+)\.0\.to_out\.0", r"layers_\1_attn/to_out")
    rules += _ln(r"transformer\.layers\.(\d+)\.1\.net\.0", r"layers_\1_ff/norm")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.1", r"layers_\1_ff/fc1")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_pit(state_dict) -> dict:
    """reference pit.py:117-182 → models/pit.py.

    The torch model interleaves Transformers and Pools in one Sequential
    (``layers.0`` = stage-0 transformer, ``layers.1`` = stage-0 pool, ...,
    pit.py:152-164); rename to stage-keyed names first, then map."""
    sd = {}
    for key, t in state_dict.items():
        m = re.match(r"layers\.(\d+)\.(.*)", key)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            if idx % 2 == 0:
                key = f"stage_{idx // 2}_transformer.{rest}"
            else:
                key = f"stage_{idx // 2}_pool.{rest}"
        sd[key] = t

    rules: list[Rule] = [
        (r"to_patch_embedding\.2\.weight", "patch_proj/kernel", linear_w),
        (r"to_patch_embedding\.2\.bias", "patch_proj/bias", identity),
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    # stage transformers: reference pit.py Transformer has no final norm.
    # concrete per-stage rules (a (\d+) group in the prefix would shift the
    # layer-index backref inside transformer_rules)
    stages = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"stage_(\d+)_transformer\.", k))
        }
    )
    for s in stages:
        rules += transformer_rules(
            rf"stage_{s}_transformer", f"stage_{s}_transformer"
        )[:-2]
    rules += [
        (r"stage_(\d+)_pool\.downsample\.net\.0\.weight", r"stage_\1_pool/downsample/depthwise/kernel", conv2d_w),
        (r"stage_(\d+)_pool\.downsample\.net\.0\.bias", r"stage_\1_pool/downsample/depthwise/bias", identity),
        (r"stage_(\d+)_pool\.downsample\.net\.1\.weight", r"stage_\1_pool/downsample/pointwise/kernel", conv2d_w),
        (r"stage_(\d+)_pool\.downsample\.net\.1\.bias", r"stage_\1_pool/downsample/pointwise/bias", identity),
    ]
    rules += _linear(r"stage_(\d+)_pool\.cls_ff", r"stage_\1_pool/cls_ff")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(sd, rules)


def convert_t2t(state_dict) -> dict:
    """reference t2t.py:26-66 → models/t2t.py T2TViT.

    ``to_patch_embedding`` is a flat Sequential of [RearrangeImage?, Unfold,
    Rearrange, Transformer?] groups plus a final Linear (t2t.py:36-48): the
    mini-transformer of group i sits at index 4i+3, the projection at the
    highest index."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    tf_idx = sorted(
        {
            int(m.group(1))
            for k in state_dict
            if (m := re.match(r"to_patch_embedding\.(\d+)\.layers\.", k))
        }
    )
    for idx in tf_idx:
        group = (idx - 3) // 4
        rules += transformer_rules(
            rf"to_patch_embedding\.{idx}", f"t2t_transformer_{group}"
        )
    proj_idx = max(
        int(m.group(1))
        for k in state_dict
        if (m := re.fullmatch(r"to_patch_embedding\.(\d+)\.weight", k))
    )
    rules += _linear(rf"to_patch_embedding\.{proj_idx}", "t2t_proj")
    rules += transformer_rules()
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def _cross_vit_attention_rules(src: str, dst: str) -> list[Rule]:
    """cross_vit.py:34-71 Attention: split to_q / to_kv, to_out.0 Linear."""
    rules = _ln(rf"{src}\.norm", rf"{dst}/norm")
    rules += [
        (rf"{src}\.to_q\.weight", rf"{dst}/to_q/kernel", linear_w),
        (rf"{src}\.to_kv\.weight", rf"{dst}/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{src}\.to_out\.0", rf"{dst}/to_out")
    return rules


def convert_cross_vit(state_dict) -> dict:
    """reference cross_vit.py:204-271 → models/cross_vit.py CrossViT."""
    # per-scale encoder self-attention: fuse to_q/to_kv into our single qkv
    # GEMM; the cross-attention blocks (layers.i.2...) keep split projections
    sd = dict(state_dict)
    for key in list(sd.keys()):
        m = re.fullmatch(
            r"(multi_scale_encoder\.layers\.\d+\.[01]\.layers\.\d+\.0)\.to_q\.weight",
            key,
        )
        if m:
            base = m.group(1)
            q = _np(sd.pop(key))
            kv = _np(sd.pop(base + ".to_kv.weight"))
            sd[base + ".to_qkv.weight"] = np.concatenate([q, kv], axis=0)
    state_dict = sd
    rules: list[Rule] = []
    for scale in ("sm", "lg"):
        emb = rf"{scale}_image_embedder"
        rules += patch_embed_rules(
            rf"{emb}\.to_patch_embedding", f"{emb}/patch_embedding"
        )
        rules += [
            (rf"{emb}\.cls_token", f"{emb}/cls_token", identity),
            (rf"{emb}\.pos_embedding", f"{emb}/pos_embedding", identity),
        ]
        rules += _ln(rf"{scale}_mlp_head\.0", f"{scale}_head_norm")
        rules += _linear(rf"{scale}_mlp_head\.1", f"{scale}_mlp_head")

    depth = sorted(
        {
            int(m.group(1))
            for k in state_dict
            if (m := re.match(r"multi_scale_encoder\.layers\.(\d+)\.", k))
        }
    )
    for i in depth:
        enc = rf"multi_scale_encoder\.layers\.{i}"
        # per-scale encoders: cross_vit's Transformer uses split to_q/to_kv
        # attention (cross_vit.py:60) unlike vit.py's fused to_qkv
        for seq, name in ((0, "sm"), (1, "lg")):
            src, dst = rf"{enc}\.{seq}", f"encoder_{i}_{name}"
            rules += [
                (
                    rf"{src}\.layers\.(\d+)\.0\.to_qkv\.weight",
                    rf"{dst}/layers_\1_attn/to_qkv/kernel",
                    linear_w,
                ),
            ]
            rules += _ln(rf"{src}\.layers\.(\d+)\.0\.norm", rf"{dst}/layers_\1_attn/norm")
            rules += _linear(
                rf"{src}\.layers\.(\d+)\.0\.to_out\.0", rf"{dst}/layers_\1_attn/to_out"
            )
            rules += _ln(rf"{src}\.layers\.(\d+)\.1\.net\.0", rf"{dst}/layers_\1_ff/norm")
            rules += _linear(rf"{src}\.layers\.(\d+)\.1\.net\.1", rf"{dst}/layers_\1_ff/fc1")
            rules += _linear(rf"{src}\.layers\.(\d+)\.1\.net\.4", rf"{dst}/layers_\1_ff/fc2")
            rules += _ln(rf"{src}\.norm", rf"{dst}/norm")
        # cross transformer
        src, dst = rf"{enc}\.2", f"encoder_{i}_cross"
        for side, attn in (("sm", "sm_attend_lg"), ("lg", "lg_attend_sm")):
            seq = 0 if side == "sm" else 1
            rules += [
                (
                    rf"{src}\.layers\.(\d+)\.{seq}\.project_in\.weight",
                    rf"{dst}/layers_\1_{side}_proj_in/kernel",
                    linear_w,
                ),
                (
                    rf"{src}\.layers\.(\d+)\.{seq}\.project_in\.bias",
                    rf"{dst}/layers_\1_{side}_proj_in/bias",
                    identity,
                ),
                (
                    rf"{src}\.layers\.(\d+)\.{seq}\.project_out\.weight",
                    rf"{dst}/layers_\1_{side}_proj_out/kernel",
                    linear_w,
                ),
                (
                    rf"{src}\.layers\.(\d+)\.{seq}\.project_out\.bias",
                    rf"{dst}/layers_\1_{side}_proj_out/bias",
                    identity,
                ),
            ]
            rules += _cross_vit_attention_rules(
                rf"{src}\.layers\.(\d+)\.{seq}\.fn", rf"{dst}/layers_\1_{attn}"
            )
    return apply_rules(state_dict, rules)


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


def convert_cct(state_dict, *, sine_pos: bool = False) -> dict:
    """reference cct.py:306-344 → models/cct.py CCT.

    ``sine_pos``: drop the (non-learnable but registered) sinusoidal
    positional parameter (cct.py:248) — our model builds it at trace time."""
    rules: list[Rule] = [
        (r"tokenizer\.conv_layers\.(\d+)\.0\.weight", r"tokenizer/conv_\1/kernel", conv2d_w),
        (r"tokenizer\.conv_layers\.(\d+)\.0\.bias", r"tokenizer/conv_\1/bias", identity),
        (
            r"classifier\.positional_emb",
            "<drop>" if sine_pos else "classifier/positional_emb",
            identity,
        ),
        (r"classifier\.class_emb", "classifier/class_emb", identity),
    ]
    blk = r"classifier\.blocks\.(\d+)"
    dst = r"classifier/blocks_\1"
    rules += _ln(rf"{blk}\.pre_norm", rf"{dst}/pre_norm")
    rules += [
        (rf"{blk}\.self_attn\.qkv\.weight", rf"{dst}/self_attn/qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{blk}\.self_attn\.proj", rf"{dst}/self_attn/proj")
    rules += _ln(rf"{blk}\.norm1", rf"{dst}/norm1")
    rules += _linear(rf"{blk}\.linear1", rf"{dst}/linear1")
    rules += _linear(rf"{blk}\.linear2", rf"{dst}/linear2")
    rules += _ln(r"classifier\.norm", "classifier/norm")
    rules += _linear(r"classifier\.attention_pool", "classifier/attention_pool")
    rules += _linear(r"classifier\.fc", "classifier/fc")
    return apply_rules(state_dict, rules)


def convert_cct_3d(state_dict, *, sine_pos: bool = False) -> dict:
    """reference cct_3d.py:325-388 → models/cct_3d.py CCT (Conv3d tokenizer;
    classifier identical to the 2-D CCT, cct_3d.py:228-323)."""
    rules: list[Rule] = [
        (r"tokenizer\.conv_layers\.(\d+)\.0\.weight", r"tokenizer/conv_\1/kernel", conv3d_w),
        (r"tokenizer\.conv_layers\.(\d+)\.0\.bias", r"tokenizer/conv_\1/bias", identity),
        (
            r"classifier\.positional_emb",
            "<drop>" if sine_pos else "classifier/positional_emb",
            identity,
        ),
        (r"classifier\.class_emb", "classifier/class_emb", identity),
    ]
    blk = r"classifier\.blocks\.(\d+)"
    dst = r"classifier/blocks_\1"
    rules += _ln(rf"{blk}\.pre_norm", rf"{dst}/pre_norm")
    rules += [
        (rf"{blk}\.self_attn\.qkv\.weight", rf"{dst}/self_attn/qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{blk}\.self_attn\.proj", rf"{dst}/self_attn/proj")
    rules += _ln(rf"{blk}\.norm1", rf"{dst}/norm1")
    rules += _linear(rf"{blk}\.linear1", rf"{dst}/linear1")
    rules += _linear(rf"{blk}\.linear2", rf"{dst}/linear2")
    rules += _ln(r"classifier\.norm", "classifier/norm")
    rules += _linear(r"classifier\.attention_pool", "classifier/attention_pool")
    rules += _linear(r"classifier\.fc", "classifier/fc")
    return apply_rules(state_dict, rules)


def convert_levit(state_dict) -> dict:
    """reference levit.py:139-201 → models/levit.py LeViT (1×1-conv q/k/v with
    BatchNorm, rel-pos Embedding bias, hardswish conv-FFN).

    ``backbone`` alternates stage transformers and downsample transformers
    (levit.py:176-184): even index → ``stage_{i}``, odd → ``stage_{i}_downsample``."""
    sd = {}
    for key, t in state_dict.items():
        m = re.match(r"backbone\.(\d+)\.(.*)", key)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            name = f"stage_{idx // 2}" + ("_downsample" if idx % 2 else "")
            key = f"{name}.{rest}"
        sd[key] = t

    rules: list[Rule] = [
        (r"conv_embedding\.(\d+)\.weight", r"conv_embedding_\1/kernel", conv2d_w),
        (r"conv_embedding\.(\d+)\.bias", r"conv_embedding_\1/bias", identity),
        (r".*\.pos_indices", "<drop>", identity),
    ]
    attn = r"(stage_\d+(?:_downsample)?)\.layers\.(\d+)\.0"
    dattn = r"\1/layers_\2_attn"
    for proj in ("q", "k", "v"):
        rules += [
            (rf"{attn}\.to_{proj}\.0\.weight", rf"{dattn}/to_{proj}/kernel", conv2d_w),
        ]
        rules += _bn(rf"{attn}\.to_{proj}\.1", rf"{dattn}/{proj}_bn")
    rules += [
        (rf"{attn}\.to_out\.1\.weight", rf"{dattn}/out_conv/kernel", conv2d_w),
        (rf"{attn}\.to_out\.1\.bias", rf"{dattn}/out_conv/bias", identity),
        (rf"{attn}\.pos_bias\.weight", rf"{dattn}/pos_bias", identity),
    ]
    rules += _bn(rf"{attn}\.to_out\.2", rf"{dattn}/out_bn")
    ff = r"(stage_\d+(?:_downsample)?)\.layers\.(\d+)\.1"
    dff = r"\1/layers_\2_ff"
    rules += [
        (rf"{ff}\.net\.0\.weight", rf"{dff}/conv1/kernel", conv2d_w),
        (rf"{ff}\.net\.0\.bias", rf"{dff}/conv1/bias", identity),
        (rf"{ff}\.net\.3\.weight", rf"{dff}/conv2/kernel", conv2d_w),
        (rf"{ff}\.net\.3\.bias", rf"{dff}/conv2/bias", identity),
    ]
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(sd, rules)


def convert_xcit(state_dict) -> dict:
    """reference xcit.py:190-264 → models/xcit.py XCiT (cross-covariance
    attention with LayerScale, LPI depthwise-conv blocks, cls cross-attention
    stage)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    x = r"xcit_transformer\.layers\.(\d+)"
    rules += [
        (rf"{x}\.0\.scale", r"xca_\1_attn_scale", identity),
        (rf"{x}\.0\.fn\.temperature", r"xca_\1_attn/temperature", identity),
        (rf"{x}\.0\.fn\.to_qkv\.weight", r"xca_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _ln(rf"{x}\.0\.fn\.norm", r"xca_\1_attn/norm")
    rules += _linear(rf"{x}\.0\.fn\.to_out\.0", r"xca_\1_attn/to_out")
    # LPI: LN → depthwise conv → BN → act → conv (xcit.py:151-171)
    rules += [(rf"{x}\.1\.scale", r"xca_\1_lpi_scale", identity)]
    rules += _ln(rf"{x}\.1\.fn\.net\.0", r"xca_\1_lpi/norm")
    rules += [
        (rf"{x}\.1\.fn\.net\.2\.weight", r"xca_\1_lpi/conv1/kernel", conv2d_w),
        (rf"{x}\.1\.fn\.net\.2\.bias", r"xca_\1_lpi/conv1/bias", identity),
        (rf"{x}\.1\.fn\.net\.5\.weight", r"xca_\1_lpi/conv2/kernel", conv2d_w),
        (rf"{x}\.1\.fn\.net\.5\.bias", r"xca_\1_lpi/conv2/bias", identity),
    ]
    rules += _bn(rf"{x}\.1\.fn\.net\.3", r"xca_\1_lpi/bn")
    rules += [(rf"{x}\.2\.scale", r"xca_\1_ff_scale", identity)]
    rules += _ln(rf"{x}\.2\.fn\.net\.0", r"xca_\1_ff/norm")
    rules += _linear(rf"{x}\.2\.fn\.net\.1", r"xca_\1_ff/fc1")
    rules += _linear(rf"{x}\.2\.fn\.net\.4", r"xca_\1_ff/fc2")

    c = r"cls_transformer\.layers\.(\d+)"
    rules += [
        (rf"{c}\.0\.scale", r"cls_\1_attn_scale", identity),
        (rf"{c}\.0\.fn\.to_q\.weight", r"cls_\1_attn/to_q/kernel", linear_w),
        (rf"{c}\.0\.fn\.to_kv\.weight", r"cls_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _ln(rf"{c}\.0\.fn\.norm", r"cls_\1_attn/norm")
    rules += _linear(rf"{c}\.0\.fn\.to_out\.0", r"cls_\1_attn/to_out")
    rules += [(rf"{c}\.1\.scale", r"cls_\1_ff_scale", identity)]
    rules += _ln(rf"{c}\.1\.fn\.net\.0", r"cls_\1_ff/norm")
    rules += _linear(rf"{c}\.1\.fn\.net\.1", r"cls_\1_ff/fc1")
    rules += _linear(rf"{c}\.1\.fn\.net\.4", r"cls_\1_ff/fc2")

    rules += _ln("final_norm", "final_norm")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


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


def flat_ln(t):
    """twins_svt.py:33-38 custom channel-first LayerNorm params (1,d,1,1) →
    flax LayerNorm (d,)."""
    return _np(t).reshape(-1)


def convert_twins_svt(state_dict) -> dict:
    """reference twins_svt.py:178-244 → models/twins_svt.py TwinsSVT.

    Each stage is Sequential(PatchEmbedding, Transformer, PEG, Transformer)
    (twins_svt.py:217-222); the trunk ends AdaptiveAvgPool → Linear
    (layers.6)."""
    sd = {}
    for key, t in state_dict.items():
        m = re.match(r"layers\.(\d+)\.(\d+)\.(.*)", key)
        if m and int(m.group(1)) <= 3:
            s, seq, rest = int(m.group(1)) + 1, int(m.group(2)), m.group(3)
            part = {0: "embed", 1: "transformer_pre", 2: "peg", 3: "transformer"}[seq]
            key = f"s{s}_{part}.{rest}"
        sd[key] = t

    rules: list[Rule] = [
        (r"(s\d+)_embed\.proj\.0\.g", r"\1_embed/norm_pre/scale", flat_ln),
        (r"(s\d+)_embed\.proj\.0\.b", r"\1_embed/norm_pre/bias", flat_ln),
        (r"(s\d+)_embed\.proj\.1\.weight", r"\1_embed/proj/kernel", conv2d_w),
        (r"(s\d+)_embed\.proj\.1\.bias", r"\1_embed/proj/bias", identity),
        (r"(s\d+)_embed\.proj\.2\.g", r"\1_embed/norm_post/scale", flat_ln),
        (r"(s\d+)_embed\.proj\.2\.b", r"\1_embed/norm_post/bias", flat_ln),
        (r"(s\d+)_peg\.proj\.fn\.weight", r"\1_peg/proj/kernel", conv2d_w),
        (r"(s\d+)_peg\.proj\.fn\.bias", r"\1_peg/proj/bias", identity),
        (r"layers\.6\.weight", "head/kernel", linear_w),
        (r"layers\.6\.bias", "head/bias", identity),
    ]
    tf = r"(s\d+_transformer(?:_pre)?)\.layers\.(\d+)"
    for seq, kind in ((0, "local_attn"), (2, "global_attn")):
        a, d = rf"{tf}\.{seq}\.fn", rf"\1/layers_\2_{kind}"
        rules += [
            (rf"{a}\.norm\.g", rf"{d}/norm/scale", flat_ln),
            (rf"{a}\.norm\.b", rf"{d}/norm/bias", flat_ln),
            (rf"{a}\.to_q\.weight", rf"{d}/to_q/kernel", conv2d_w),
            (rf"{a}\.to_kv\.weight", rf"{d}/to_kv/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.weight", rf"{d}/to_out/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.bias", rf"{d}/to_out/bias", identity),
        ]
    for seq, kind in ((1, "ff1"), (3, "ff2")):
        f, d = rf"{tf}\.{seq}\.fn\.net", rf"\1/layers_\2_{kind}"
        rules += [
            (rf"{f}\.0\.g", rf"{d}/norm/scale", flat_ln),
            (rf"{f}\.0\.b", rf"{d}/norm/bias", flat_ln),
            (rf"{f}\.1\.weight", rf"{d}/conv1/kernel", conv2d_w),
            (rf"{f}\.1\.bias", rf"{d}/conv1/bias", identity),
            (rf"{f}\.4\.weight", rf"{d}/conv2/kernel", conv2d_w),
            (rf"{f}\.4\.bias", rf"{d}/conv2/bias", identity),
        ]
    return apply_rules(sd, rules)


def convert_mobile_vit(state_dict) -> dict:
    """reference mobile_vit.py:180-243 → models/mobile_vit.py MobileViT
    (conv-bn-SiLU stem, MV2 inverted-residual blocks, MobileViT blocks with
    per-patch transformers, conv+pool+Linear head)."""

    def _convbn(src: str, dst: str) -> list[Rule]:
        return [
            (rf"{src}\.0\.weight", rf"{dst}/conv/kernel", conv2d_w),
        ] + _bn(rf"{src}\.1", rf"{dst}/bn")

    def _mv2(src: str, dst: str) -> list[Rule]:
        # MV2Block conv Sequential: pw 0 / bn 1 / dw 3 / bn 4 / pw-linear 6 /
        # bn 7 (mobile_vit.py:96-116, expansion > 1)
        rules = [
            (rf"{src}\.conv\.0\.weight", rf"{dst}/pw/kernel", conv2d_w),
            (rf"{src}\.conv\.3\.weight", rf"{dst}/dw/kernel", conv2d_w),
            (rf"{src}\.conv\.6\.weight", rf"{dst}/pw_linear/kernel", conv2d_w),
        ]
        rules += _bn(rf"{src}\.conv\.1", rf"{dst}/pw_bn")
        rules += _bn(rf"{src}\.conv\.4", rf"{dst}/dw_bn")
        rules += _bn(rf"{src}\.conv\.7", rf"{dst}/pw_linear_bn")
        return rules

    rules: list[Rule] = []
    rules += _convbn("conv1", "conv1")
    rules += _mv2(r"stem\.(\d+)", r"stem_\1")
    rules += _mv2(r"trunk\.(\d+)\.0", r"trunk_\1_mv2")
    trunk_ids = sorted(
        {
            int(m.group(1))
            for k in state_dict
            if (m := re.match(r"trunk\.(\d+)\.1\.", k))
        }
    )
    for i in trunk_ids:
        mvit, dmvit = rf"trunk\.{i}\.1", f"trunk_{i}_mvit"
        for c in ("conv1", "conv2", "conv3", "conv4"):
            rules += _convbn(rf"{mvit}\.{c}", rf"{dmvit}/{c}")
        rules += transformer_rules(rf"{mvit}\.transformer", rf"{dmvit}/transformer")[:-2]
    rules += _convbn(r"to_logits\.0", "to_logits_conv")
    rules += [(r"to_logits\.2\.weight", "to_logits/kernel", linear_w)]
    return apply_rules(state_dict, rules)


def convert_cvt(state_dict) -> dict:
    """reference cvt.py:77-188 → models/cvt.py CvT (conv token embedding per
    stage, depthwise-conv q/kv projections with BN, 1×1-conv attention out
    and FF, channel-first LayerNorms)."""
    sd = {}
    for key, t in state_dict.items():
        m = re.match(r"layers\.(\d+)\.(\d+)\.(.*)", key)
        if m:
            s, seq, rest = int(m.group(1)) + 1, int(m.group(2)), m.group(3)
            part = {0: "emb_conv", 1: "emb_norm", 2: "stage"}[seq]
            key = f"s{s}_{part}.{rest}" if rest else f"s{s}_{part}"
        sd[key] = t

    rules: list[Rule] = [
        (r"(s\d+)_emb_conv\.weight", r"\1_emb_conv/kernel", conv2d_w),
        (r"(s\d+)_emb_conv\.bias", r"\1_emb_conv/bias", identity),
        (r"(s\d+)_emb_norm\.g", r"\1_emb_norm/ln/scale", flat_ln),
        (r"(s\d+)_emb_norm\.b", r"\1_emb_norm/ln/bias", flat_ln),
        (r"to_logits\.2\.weight", "to_logits/kernel", linear_w),
        (r"to_logits\.2\.bias", "to_logits/bias", identity),
    ]
    a = r"(s\d+)_stage\.layers\.(\d+)\.0"
    da = r"\1_layers_\2_attn"
    rules += [
        (rf"{a}\.norm\.g", rf"{da}/norm/ln/scale", flat_ln),
        (rf"{a}\.norm\.b", rf"{da}/norm/ln/bias", flat_ln),
    ]
    for proj in ("q", "kv"):
        rules += [
            (rf"{a}\.to_{proj}\.net\.0\.weight", rf"{da}/to_{proj}/depthwise/kernel", conv2d_w),
            (rf"{a}\.to_{proj}\.net\.2\.weight", rf"{da}/to_{proj}/pointwise/kernel", conv2d_w),
        ]
        rules += _bn(rf"{a}\.to_{proj}\.net\.1", rf"{da}/to_{proj}/bn")
    rules += [
        (rf"{a}\.to_out\.0\.weight", rf"{da}/to_out/kernel", conv2d_w),
        (rf"{a}\.to_out\.0\.bias", rf"{da}/to_out/bias", identity),
    ]
    f = r"(s\d+)_stage\.layers\.(\d+)\.1\.net"
    df = r"\1_layers_\2_ff"
    rules += [
        (rf"{f}\.0\.g", rf"{df}/norm/ln/scale", flat_ln),
        (rf"{f}\.0\.b", rf"{df}/norm/ln/bias", flat_ln),
        (rf"{f}\.1\.weight", rf"{df}/conv1/kernel", conv2d_w),
        (rf"{f}\.1\.bias", rf"{df}/conv1/bias", identity),
        (rf"{f}\.4\.weight", rf"{df}/conv2/kernel", conv2d_w),
        (rf"{f}\.4\.bias", rf"{df}/conv2/bias", identity),
    ]
    return apply_rules(sd, rules)


def convert_jumbo_vit(state_dict) -> dict:
    """reference jumbo_vit.py:70-186 → models/jumbo_vit.py JumboViT (jumbo cls
    tokens with their own FF, sincos pos-emb as trace-time constant, simple
    bias-free attention, FF without dropout indices)."""
    rules: list[Rule] = [
        ("jumbo_cls_token", "jumbo_cls_token", identity),
    ]
    rules += patch_embed_rules()
    rules += _ln(r"layers\.(\d+)\.0\.norm", r"layers_\1_attn/norm")
    rules += [
        (r"layers\.(\d+)\.0\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (r"layers\.(\d+)\.0\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    rules += _ln(r"layers\.(\d+)\.1\.0", r"layers_\1_ff/norm")
    rules += _linear(r"layers\.(\d+)\.1\.1", r"layers_\1_ff/fc1")
    rules += _linear(r"layers\.(\d+)\.1\.3", r"layers_\1_ff/fc2")
    # jumbo cls FF (jumbo_ff.1 is the Sequential inside Residual)
    rules += _ln(r"jumbo_ff\.1\.0", "jumbo_ff/norm")
    rules += _linear(r"jumbo_ff\.1\.1", "jumbo_ff/fc1")
    rules += _linear(r"jumbo_ff\.1\.3", "jumbo_ff/fc2")
    rules += _ln("norm", "norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_look_vit(state_dict) -> dict:
    """reference look_vit.py:140-257 → models/look_vit.py LookViT.

    Layer tuple order (look_vit.py:190-196, 228): attn, mlp,
    lookup_cross_attn, highres_attn (value-only, reuses the lookup's qk
    similarity transposed), highres_norm, highres_mlp.  All norms are the
    bias-free gamma LayerNorm; sincos pos-emb is a buffer (dropped — ours is
    a trace-time constant)."""
    rules: list[Rule] = [
        ("pos_embedding", "<drop>", identity),
        (r"to_patches\.1\.weight", "patch_conv/kernel", conv2d_w),
        (r"to_patches\.1\.bias", "patch_conv/bias", identity),
        (r"to_patches\.3\.gamma", "patch_norm/gamma", identity),
        ("norm\\.gamma", "norm/gamma", identity),
        (r"highres_norm\.gamma", "highres_norm/gamma", identity),
        (r"to_logits\.weight", "to_logits/kernel", linear_w),
    ]

    def attn(seq, dst, *, context_norm=False, self_norm=True, qk=True):
        r: list[Rule] = []
        if self_norm:
            r.append((rf"layers\.(\d+)\.{seq}\.norm\.gamma", rf"{dst}/norm/gamma", identity))
        if context_norm:
            r.append((rf"layers\.(\d+)\.{seq}\.norm_context\.gamma", rf"{dst}/norm_context/gamma", identity))
        if qk:
            r += [
                (rf"layers\.(\d+)\.{seq}\.to_q\.weight", rf"{dst}/to_q/kernel", linear_w),
                (rf"layers\.(\d+)\.{seq}\.to_k\.weight", rf"{dst}/to_k/kernel", linear_w),
            ]
        r += [
            (rf"layers\.(\d+)\.{seq}\.to_v\.weight", rf"{dst}/to_v/kernel", linear_w),
            (rf"layers\.(\d+)\.{seq}\.to_out\.1\.weight", rf"{dst}/to_out/kernel", linear_w),
        ]
        return r

    def mlp(seq, dst):
        return [
            (rf"layers\.(\d+)\.{seq}\.0\.gamma", rf"{dst}/norm/gamma", identity),
            (rf"layers\.(\d+)\.{seq}\.1\.weight", rf"{dst}/fc1/kernel", linear_w),
            (rf"layers\.(\d+)\.{seq}\.1\.bias", rf"{dst}/fc1/bias", identity),
            (rf"layers\.(\d+)\.{seq}\.4\.weight", rf"{dst}/fc2/kernel", linear_w),
            (rf"layers\.(\d+)\.{seq}\.4\.bias", rf"{dst}/fc2/bias", identity),
        ]

    rules += attn(0, r"layers_\1_attn")
    rules += mlp(1, r"layers_\1_mlp")
    rules += attn(2, r"layers_\1_lookup_cross_attn", context_norm=True)
    rules += attn(3, r"layers_\1_highres_attn", context_norm=True, self_norm=False, qk=False)
    rules += [(r"layers\.(\d+)\.4\.gamma", r"layers_\1_highres_norm/gamma", identity)]
    rules += mlp(5, r"layers_\1_highres_mlp")
    return apply_rules(state_dict, rules)


def convert_max_vit_with_registers(state_dict) -> dict:
    """reference max_vit_with_registers.py:203-286 → models/
    max_vit_with_registers.py (MaxViT whose window/grid attention carries
    per-block learned register tokens; attention blocks are unwrapped —
    no ``.fn.`` indirection, bias-free to_out)."""
    rules: list[Rule] = []
    rules += _conv(r"conv_stem\.0", "conv_stem_0")
    rules += _conv(r"conv_stem\.1", "conv_stem_1")
    rules += [
        (r"register_tokens\.(\d+)", r"block_\1_register_tokens", identity),
    ]

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

    for seq, kind in ((1, "block"), (2, "grid")):
        a = rf"layers\.(\d+)\.{seq}\.0"
        da = rf"block_\1_{kind}_attn"
        rules += _ln(rf"{a}\.norm", rf"{da}/norm")
        rules += [
            (rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", linear_w),
            (rf"{a}\.to_out\.0\.weight", rf"{da}/to_out/kernel", linear_w),
            (rf"{a}\.rel_pos_bias\.weight", rf"{da}/rel_pos_bias", identity),
        ]
        f = rf"layers\.(\d+)\.{seq}\.1"
        df = rf"block_\1_{kind}_ff"
        rules += _ln(rf"{f}\.0", rf"{df}/norm")
        rules += _linear(rf"{f}\.1", rf"{df}/fc1")
        rules += _linear(rf"{f}\.4", rf"{df}/fc2")

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


def convert_wwt(state_dict) -> dict:
    """reference wwt.py → models/wwt.py WWT (white-whale: token/slot mutual
    attention with mask MLPs; bias-free gamma norms)."""
    rules: list[Rule] = [
        ("pos_embedding", "pos_embedding", identity),
        ("register_tokens", "register_tokens", identity),
        (r"slots\.(\d+)", r"slots_\1", identity),
        (r"register_slots\.(\d+)", r"register_slots_\1", identity),
        (r"to_patch_embedding\.1\.weight", "patch_embedding/norm_pre/scale", identity),
        (r"to_patch_embedding\.2\.weight", "patch_embedding/proj/kernel", linear_w),
        (r"to_patch_embedding\.2\.bias", "patch_embedding/proj/bias", identity),
        (r"to_patch_embedding\.3\.weight", "patch_embedding/norm_post/scale", identity),
        (r"layers\.(\d+)\.norms\.(\d+)\.weight", r"layers_\1_norm_\2/scale", identity),
        (r"mlp_head\.0\.weight", "head_norm/scale", identity),
    ]
    rules += _linear(r"mlp_head\.1", "mlp_head")
    a = r"layers\.(\d+)\.attns\.(\d+)"
    da = r"layers_\1_attn_\2"
    rules += [
        (rf"{a}\.to_q_v_tokens\.weight", rf"{da}/to_q_v_tokens/kernel", linear_w),
        (rf"{a}\.to_k_v_slots\.weight", rf"{da}/to_k_v_slots/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out_tokens\.0", rf"{da}/to_out_tokens")
    rules += _linear(rf"{a}\.to_out_slots\.0", rf"{da}/to_out_slots")
    rules += [
        (rf"{a}\.mlp_mask\.0\.weight", rf"{da}/mlp_mask/norm/scale", identity),
    ]
    rules += _linear(rf"{a}\.mlp_mask\.1", rf"{da}/mlp_mask/fc1")
    rules += _linear(rf"{a}\.mlp_mask\.4", rf"{da}/mlp_mask/fc2")
    m = r"layers\.(\d+)\.mlps\.(\d+)"
    dm = r"layers_\1_mlp_\2"
    rules += [
        (rf"{m}\.0\.weight", rf"{dm}/norm/scale", identity),
    ]
    rules += _linear(rf"{m}\.1", rf"{dm}/fc1")
    rules += _linear(rf"{m}\.4", rf"{dm}/fc2")
    return apply_rules(state_dict, rules)


def convert_vivit_moss(state_dict) -> dict:
    """reference vivit_with_moss.py:278-430 → models/vivit_with_moss.py ViViT
    (factorized space-time + MOSS state-space mixers: per-order encoders with
    2D convs and gamma chan-norms, shared time_to_out, per-order heads)."""
    rules: list[Rule] = [
        ("pos_embedding", "pos_embedding", identity),
        ("spatial_cls_token", "spatial_cls_token", identity),
        ("temporal_cls_token", "temporal_cls_token", identity),
    ]
    rules += _ln(r"to_patch_embedding\.1", "patch_norm_pre")
    rules += _linear(r"to_patch_embedding\.2", "patch_proj")
    rules += _ln(r"to_patch_embedding\.3", "patch_norm_post")
    rules += transformer_rules("spatial_transformer", "spatial_transformer")
    rules += transformer_rules("temporal_transformer", "temporal_transformer")
    e = r"moss\.encoders\.(\d+)"
    d = r"moss/encoders_\1"
    rules += _linear(rf"{e}\.spatial_to_hidden", rf"{d}/spatial_to_hidden")
    rules += [
        (rf"{e}\.conv\.0\.weight", rf"{d}/conv0/kernel", conv2d_w),
        (rf"{e}\.conv\.0\.bias", rf"{d}/conv0/bias", identity),
        (rf"{e}\.conv\.1\.gamma", rf"{d}/conv_norm0/scale", flat_ln),
        (rf"{e}\.conv\.3\.weight", rf"{d}/conv1/kernel", conv2d_w),
        (rf"{e}\.conv\.3\.bias", rf"{d}/conv1/bias", identity),
        (rf"{e}\.conv\.4\.gamma", rf"{d}/conv_norm1/scale", flat_ln),
    ]
    rules += _linear(rf"{e}\.time_to_out", rf"{d}/time_to_out")
    rules += _linear(r"moss\.to_order_out\.(\d+)", r"moss/to_order_out_\1")
    rules += _linear(r"moss\.to_out", "moss/to_out")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit(state_dict) -> dict:
    """reference simple_vit.py:80-120 → models/simple_vit.py SimpleViT params.
    The 1-D/3-D variants (simple_vit_1d.py:73, simple_vit_3d.py:78) share the
    exact layout (sincos pos-emb is a trace-time constant on both sides)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += transformer_rules(simple=True)
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


convert_simple_vit_1d = convert_simple_vit
convert_simple_vit_3d = convert_simple_vit


def convert_simple_flash_attn_vit(state_dict) -> dict:
    """reference simple_flash_attn_vit.py:139-176 → models/simple_flash_attn_vit.py.
    No transformer final norm; linear_head = Sequential(LayerNorm, Linear)
    after mean pool (reference :160-163)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += transformer_rules(simple=True)[:-2]  # drop final-norm rules
    rules += _ln(r"linear_head\.0", "head_norm")
    rules += _linear(r"linear_head\.1", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_flash_attn_vit_3d(state_dict) -> dict:
    """reference simple_flash_attn_vit_3d.py:136-171 → models/simple_flash_attn_vit_3d.py.
    No transformer final norm; plain Linear head (reference :158)."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += transformer_rules(simple=True)[:-2]
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_qk_norm(state_dict) -> dict:
    """reference simple_vit_with_qk_norm.py:84-134: SimpleViT + RMSNorm on q/k
    (gamma per head); the reference's ``linear_head`` is actually a LayerNorm
    (line 129) — mapped with identity, not transpose."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    t = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{t}\.norm", r"transformer_layers_\1_attn/norm")
    rules += [
        (rf"{t}\.q_norm\.gamma", r"transformer_layers_\1_attn/q_norm/gamma", identity),
        (rf"{t}\.k_norm\.gamma", r"transformer_layers_\1_attn/k_norm/gamma", identity),
        (rf"{t}\.to_qkv\.weight", r"transformer_layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{t}\.to_out\.weight", r"transformer_layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"transformer_layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"transformer_layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"transformer_layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "transformer_norm")
    rules += _ln("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_patch_dropout(state_dict) -> dict:
    """reference simple_vit_with_patch_dropout.py:98-145: SimpleViT layout
    (patch dropout has no params)."""
    return convert_simple_vit(state_dict)


def convert_simple_vit_with_value_residual(state_dict) -> dict:
    """reference simple_vit_with_value_residual.py:80-135: SimpleViT whose FF
    Sequential has no norm-name nesting (indices 0/1/3) and layers > 0 carry a
    learned residual-mix gate; our model flattens layers to the top level."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    t = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{t}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{t}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{t}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
        (rf"{t}\.to_residual_mix\.0\.weight", r"layers_\1_attn/to_residual_mix/kernel", linear_w),
        (rf"{t}\.to_residual_mix\.0\.bias", r"layers_\1_attn/to_residual_mix/bias", identity),
    ]
    f = r"transformer\.layers\.(\d+)\.1"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_specialized_cls(state_dict) -> dict:
    """reference simple_vit_with_specialized_cls.py: per-token-type LayerNorms
    (fns.0 = cls stream, fns.1 = patch stream) around shared projections."""

    def _split_norm(src: str, dst: str) -> list[Rule]:
        return (
            _ln(rf"{src}\.fns\.0", rf"{dst}norm_cls")
            + _ln(rf"{src}\.fns\.1", rf"{dst}norm_patch")
        )

    rules: list[Rule] = [("cls_token", "cls_token", identity)]
    rules += patch_embed_rules()
    t = r"transformer\.layers\.(\d+)\.0"
    rules += _split_norm(rf"{t}\.norm", r"layers_\1_attn/")
    rules += [
        (rf"{t}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{t}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.1"
    rules += _split_norm(rf"{f}\.norm", r"layers_\1_ff/")
    rules += _linear(rf"{f}\.net\.0", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.net\.2", r"layers_\1_ff/fc2")
    rules += _split_norm(r"transformer\.norm", "final_")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_fft(state_dict) -> dict:
    """reference simple_vit_with_fft.py:85-139: SimpleViT plus a second
    patch-embedding branch over the 2-channel FFT spectrum."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += patch_embed_rules("to_freq_embedding", "freq_embedding")
    rules += transformer_rules(simple=True)
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_hyper_connections(state_dict) -> dict:
    """reference simple_vit_with_hyper_connections.py: each block is wrapped
    in a HyperConnection (static/dynamic alpha-beta stream mixing,
    weight-only RMS-style norm); layer Sequential order is
    [attn_hyper, attn, ff_hyper, ff]."""
    rules: list[Rule] = [("register_tokens", "register_tokens", identity)]
    rules += patch_embed_rules()
    for seq, name in ((0, "attn_hyper"), (2, "ff_hyper")):
        h = rf"transformer\.layers\.(\d+)\.{seq}"
        d = rf"layers_\1_{name}"
        rules += [
            (rf"{h}\.static_beta", rf"{d}/static_beta", identity),
            (rf"{h}\.static_alpha", rf"{d}/static_alpha", identity),
            (rf"{h}\.dynamic_alpha_fn", rf"{d}/dynamic_alpha_fn", identity),
            (rf"{h}\.dynamic_alpha_scale", rf"{d}/dynamic_alpha_scale", identity),
            (rf"{h}\.dynamic_beta_fn", rf"{d}/dynamic_beta_fn", identity),
            (rf"{h}\.dynamic_beta_scale", rf"{d}/dynamic_beta_scale", identity),
            (rf"{h}\.norm\.weight", rf"{d}/norm/scale", identity),
        ]
    a = r"transformer\.layers\.(\d+)\.1"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{a}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.3\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def conv1d_to_dense(t):
    """torch Conv1d 1×1 (o, i, 1) → Dense kernel (i, o)."""
    return _np(t)[:, :, 0].T


def convert_sep_vit(state_dict) -> dict:
    """reference sep_vit.py:237-289 → models/sep_vit.py SepViT (overlapping
    patch embed, PEG, depthwise-separable window attention with learned
    window tokens)."""
    rules: list[Rule] = [
        (r"layers\.(\d+)\.0\.conv\.weight", r"stage_\1_ope/kernel", conv2d_w),
        (r"layers\.(\d+)\.0\.conv\.bias", r"stage_\1_ope/bias", identity),
        (r"layers\.(\d+)\.1\.proj\.weight", r"stage_\1_peg/kernel", conv2d_w),
        (r"layers\.(\d+)\.1\.proj\.bias", r"stage_\1_peg/bias", identity),
        (r"layers\.(\d+)\.2\.norm\.g", r"stage_\1_norm/scale", flat_ln),
        (r"layers\.(\d+)\.2\.norm\.b", r"stage_\1_norm/bias", flat_ln),
        (r"mlp_head\.1\.weight", "head_norm/scale", identity),
        (r"mlp_head\.1\.bias", "head_norm/bias", identity),
    ]
    rules += _linear(r"mlp_head\.2", "mlp_head")
    a = r"layers\.(\d+)\.2\.layers\.(\d+)\.0"
    da = r"stage_\1_layers_\2_attn"
    rules += [
        (rf"{a}\.window_tokens", rf"{da}/window_tokens", identity),
        (rf"{a}\.norm\.g", rf"{da}/norm/scale", flat_ln),
        (rf"{a}\.norm\.b", rf"{da}/norm/bias", flat_ln),
        (rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", conv1d_to_dense),
        (rf"{a}\.window_tokens_to_qk\.0\.weight", rf"{da}/window_norm/scale", identity),
        (rf"{a}\.window_tokens_to_qk\.0\.bias", rf"{da}/window_norm/bias", identity),
        (rf"{a}\.window_tokens_to_qk\.3\.weight", rf"{da}/window_to_qk/kernel", conv1d_to_dense),
        (rf"{a}\.window_tokens_to_qk\.3\.bias", rf"{da}/window_to_qk/bias", identity),
        (rf"{a}\.to_out\.0\.weight", rf"{da}/to_out/kernel", conv2d_w),
        (rf"{a}\.to_out\.0\.bias", rf"{da}/to_out/bias", identity),
    ]
    f = r"layers\.(\d+)\.2\.layers\.(\d+)\.1\.net"
    df = r"stage_\1_layers_\2_ff"
    rules += [
        (rf"{f}\.0\.g", rf"{df}/norm/scale", flat_ln),
        (rf"{f}\.0\.b", rf"{df}/norm/bias", flat_ln),
        (rf"{f}\.1\.weight", rf"{df}/conv1/kernel", conv2d_w),
        (rf"{f}\.1\.bias", rf"{df}/conv1/bias", identity),
        (rf"{f}\.4\.weight", rf"{df}/conv2/kernel", conv2d_w),
        (rf"{f}\.4\.bias", rf"{df}/conv2/bias", identity),
    ]
    return apply_rules(state_dict, rules)


def convert_crossformer(state_dict) -> dict:
    """reference crossformer.py:154-267 → models/crossformer.py CrossFormer
    (cross-scale CEL conv pyramid, short/long-distance attention with
    dynamic-position-bias MLPs)."""
    rules: list[Rule] = [
        (r"layers\.(\d+)\.0\.convs\.(\d+)\.weight", r"stage_\1_cel/conv_\2/kernel", conv2d_w),
        (r"layers\.(\d+)\.0\.convs\.(\d+)\.bias", r"stage_\1_cel/conv_\2/bias", identity),
    ]
    rules += _linear(r"to_logits\.1", "to_logits")
    for seq, kind in ((0, "short"), (2, "long")):
        a = rf"layers\.(\d+)\.1\.layers\.(\d+)\.{seq}"
        da = rf"stage_\1_layers_\2_{kind}_attn"
        rules += [
            (rf"{a}\.norm\.g", rf"{da}/norm/scale", flat_ln),
            (rf"{a}\.norm\.b", rf"{da}/norm/bias", flat_ln),
            (rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", conv2d_w),
            (rf"{a}\.to_out\.weight", rf"{da}/to_out/kernel", conv2d_w),
            (rf"{a}\.to_out\.bias", rf"{da}/to_out/bias", identity),
        ]
        # dynamic position bias MLP (crossformer.py:40-60):
        # Sequential(fc0, LN, ReLU, fc1, LN, ReLU, fc2, LN, ReLU, out)
        for t_idx, name in ((0, "fc0"), (3, "fc1"), (6, "fc2"), (9, "out")):
            rules += _linear(rf"{a}\.dpb\.{t_idx}", rf"{da}/dpb/{name}")
        for t_idx, name in ((1, "norm0"), (4, "norm1"), (7, "norm2")):
            rules += _ln(rf"{a}\.dpb\.{t_idx}", rf"{da}/dpb/{name}")
    for seq, kind in ((1, "short"), (3, "long")):
        f = rf"layers\.(\d+)\.1\.layers\.(\d+)\.{seq}"
        df = rf"stage_\1_layers_\2_{kind}_ff"
        rules += [
            (rf"{f}\.0\.g", rf"{df}/norm/scale", flat_ln),
            (rf"{f}\.0\.b", rf"{df}/norm/bias", flat_ln),
            (rf"{f}\.1\.weight", rf"{df}/conv1/kernel", conv2d_w),
            (rf"{f}\.1\.bias", rf"{df}/conv1/bias", identity),
            (rf"{f}\.4\.weight", rf"{df}/conv2/kernel", conv2d_w),
            (rf"{f}\.4\.bias", rf"{df}/conv2/bias", identity),
        ]
    return apply_rules(state_dict, rules)


def convert_normalized_vit(state_dict) -> dict:
    """reference normalized_vit.py:146-249 → models/normalized_vit.py nViT.

    torch stores NormLinear weights behind a parametrization
    (``...parametrizations.weight.original``); both sides l2-normalize at
    use, so the raw weight maps directly."""
    W = r"\.linear\.parametrizations\.weight\.original"
    rules: list[Rule] = [
        ("logit_scale", "logit_scale", identity),
        (rf"to_patch_embedding\.1{W}", "patch_embedding/kernel", linear_w),
        (rf"abs_pos_emb{W}", "abs_pos_emb", linear_w),
        (rf"to_pred{W}", "to_pred/kernel", linear_w),
        (r"residual_lerp_scales\.(\d+)\.0", r"residual_lerp_scales_\1_attn", identity),
        (r"residual_lerp_scales\.(\d+)\.1", r"residual_lerp_scales_\1_ff", identity),
    ]
    a = r"layers\.(\d+)\.0"
    rules += [
        (rf"{a}\.q_scale", r"layers_\1_attn/q_scale", identity),
        (rf"{a}\.k_scale", r"layers_\1_attn/k_scale", identity),
        (rf"{a}\.to_q{W}", r"layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_k{W}", r"layers_\1_attn/to_k/kernel", linear_w),
        (rf"{a}\.to_v{W}", r"layers_\1_attn/to_v/kernel", linear_w),
        (rf"{a}\.to_out{W}", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"layers\.(\d+)\.1"
    rules += [
        (rf"{f}\.hidden_scale", r"layers_\1_ff/hidden_scale", identity),
        (rf"{f}\.gate_scale", r"layers_\1_ff/gate_scale", identity),
        (rf"{f}\.to_hidden{W}", r"layers_\1_ff/to_hidden/kernel", linear_w),
        (rf"{f}\.to_gate{W}", r"layers_\1_ff/to_gate/kernel", linear_w),
        (rf"{f}\.to_out{W}", r"layers_\1_ff/to_out/kernel", linear_w),
    ]
    return apply_rules(state_dict, rules)


def convert_ats_vit(state_dict) -> dict:
    """reference ats_vit.py:200-262 → models/ats_vit.py ViT (adaptive token
    sampling; flat top-level layer names, vit-style blocks)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_scalable_vit(state_dict) -> dict:
    """reference scalable_vit.py:240-310 → models/scalable_vit.py ScalableViT
    (SSA reduced-kv attention + interactive windowed attention per block,
    channel-first g/b norms, all projections 1×1 convs)."""
    rules: list[Rule] = [
        (r"to_patches\.weight", "to_patches/kernel", conv2d_w),
        (r"to_patches\.bias", "to_patches/bias", identity),
        (r"layers\.(\d+)\.0\.norm\.g", r"stage_\1_norm/scale", flat_ln),
        (r"layers\.(\d+)\.0\.norm\.b", r"stage_\1_norm/bias", flat_ln),
        (r"layers\.(\d+)\.1\.conv\.weight", r"stage_\1_downsample/kernel", conv2d_w),
        (r"layers\.(\d+)\.1\.conv\.bias", r"stage_\1_downsample/bias", identity),
    ]
    rules += _ln(r"mlp_head\.1", "head_norm")
    rules += _linear(r"mlp_head\.2", "mlp_head")

    for seq, kind in ((0, "ssa"), (4, "iwsa")):
        a = rf"layers\.(\d+)\.0\.layers\.(\d+)\.{seq}"
        da = rf"stage_\1_block_\2_{kind}"
        rules += [
            (rf"{a}\.norm\.g", rf"{da}/norm/scale", flat_ln),
            (rf"{a}\.norm\.b", rf"{da}/norm/bias", flat_ln),
            (rf"{a}\.to_q\.weight", rf"{da}/to_q/kernel", conv2d_w),
            (rf"{a}\.to_k\.weight", rf"{da}/to_k/kernel", conv2d_w),
            (rf"{a}\.to_v\.weight", rf"{da}/to_v/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.weight", rf"{da}/to_out/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.bias", rf"{da}/to_out/bias", identity),
            (
                rf"{a}\.local_interactive_module\.weight",
                rf"{da}/local_interactive_module/kernel",
                conv2d_w,
            ),
            (
                rf"{a}\.local_interactive_module\.bias",
                rf"{da}/local_interactive_module/bias",
                identity,
            ),
        ]
    for seq, kind in ((1, "ff1"), (3, "ff2")):
        f = rf"layers\.(\d+)\.0\.layers\.(\d+)\.{seq}\.net"
        df = rf"stage_\1_block_\2_{kind}"
        rules += [
            (rf"{f}\.0\.g", rf"{df}/norm/scale", flat_ln),
            (rf"{f}\.0\.b", rf"{df}/norm/bias", flat_ln),
            (rf"{f}\.1\.weight", rf"{df}/conv1/kernel", conv2d_w),
            (rf"{f}\.1\.bias", rf"{df}/conv1/bias", identity),
            (rf"{f}\.4\.weight", rf"{df}/conv2/kernel", conv2d_w),
            (rf"{f}\.4\.bias", rf"{df}/conv2/bias", identity),
        ]
    rules += [
        (r"layers\.(\d+)\.0\.layers\.(\d+)\.2\.proj\.weight", r"stage_\1_block_\2_peg/kernel", conv2d_w),
        (r"layers\.(\d+)\.0\.layers\.(\d+)\.2\.proj\.bias", r"stage_\1_block_\2_peg/bias", identity),
    ]
    return apply_rules(state_dict, rules)


def convert_regionvit(state_dict) -> dict:
    """reference regionvit.py:186-295 → models/regionvit.py RegionViT
    (regional+local two-stream attention, per-stage downsample convs,
    local rel-pos-bias Embedding)."""
    rules: list[Rule] = [
        (r"local_encoder\.weight", "local_encoder/kernel", conv2d_w),
        (r"local_encoder\.bias", "local_encoder/bias", identity),
        (r"region_encoder\.1\.weight", "region_encoder/kernel", conv2d_w),
        (r"region_encoder\.1\.bias", "region_encoder/bias", identity),
        (r"layers\.(\d+)\.0\.conv\.weight", r"stage_\1_downsample/kernel", conv2d_w),
        (r"layers\.(\d+)\.0\.conv\.bias", r"stage_\1_downsample/bias", identity),
        (
            r"layers\.(\d+)\.2\.local_rel_pos_bias\.weight",
            r"stage_\1_transformer/local_rel_pos_bias",
            identity,
        ),
        (r"to_logits\.1\.weight", "head_norm/scale", identity),
        (r"to_logits\.1\.bias", "head_norm/bias", identity),
    ]
    rules += _linear(r"to_logits\.2", "to_logits")
    a = r"layers\.(\d+)\.2\.layers\.(\d+)\.0"
    da = r"stage_\1_transformer/layers_\2_attn"
    rules += _ln(rf"{a}\.norm", rf"{da}/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", rf"{da}/to_out")
    f = r"layers\.(\d+)\.2\.layers\.(\d+)\.1"
    df = r"stage_\1_transformer/layers_\2_ff"
    rules += _ln(rf"{f}\.0", rf"{df}/norm")
    rules += _linear(rf"{f}\.1", rf"{df}/fc1")
    rules += _linear(rf"{f}\.4", rf"{df}/fc2")
    return apply_rules(state_dict, rules)


def convert_nest(state_dict) -> dict:
    """reference nest.py:90-160 → models/nest.py NesT (all-1×1-conv blocks
    with channel-first g/b LayerNorms, per-level pos-emb, 3×3 aggregate)."""
    rules: list[Rule] = [
        (r"to_patch_embedding\.1\.g", "patch_norm_pre/scale", flat_ln),
        (r"to_patch_embedding\.1\.b", "patch_norm_pre/bias", flat_ln),
        (r"to_patch_embedding\.2\.weight", "patch_proj/kernel", conv2d_w),
        (r"to_patch_embedding\.2\.bias", "patch_proj/bias", identity),
        (r"to_patch_embedding\.3\.g", "patch_norm_post/scale", flat_ln),
        (r"to_patch_embedding\.3\.b", "patch_norm_post/bias", flat_ln),
        (r"layers\.(\d+)\.0\.pos_emb", r"level_\1_transformer/pos_emb", identity),
        (r"layers\.(\d+)\.1\.0\.weight", r"level_\1_aggregate_conv/kernel", conv2d_w),
        (r"layers\.(\d+)\.1\.0\.bias", r"level_\1_aggregate_conv/bias", identity),
        (r"layers\.(\d+)\.1\.1\.g", r"level_\1_aggregate_norm/scale", flat_ln),
        (r"layers\.(\d+)\.1\.1\.b", r"level_\1_aggregate_norm/bias", flat_ln),
        (r"mlp_head\.0\.g", "head_norm/scale", flat_ln),
        (r"mlp_head\.0\.b", "head_norm/bias", flat_ln),
    ]
    rules += _linear(r"mlp_head\.2", "mlp_head")
    level_ids = sorted(
        {
            int(m.group(1))
            for k in state_dict
            if (m := re.match(r"layers\.(\d+)\.0\.layers\.", k))
        }
    )
    for s in level_ids:
        a = rf"layers\.{s}\.0\.layers\.(\d+)\.0"
        da = rf"level_{s}_transformer/layers_\1_attn"
        rules += [
            (rf"{a}\.norm\.g", rf"{da}/norm/scale", flat_ln),
            (rf"{a}\.norm\.b", rf"{da}/norm/bias", flat_ln),
            (rf"{a}\.to_qkv\.weight", rf"{da}/to_qkv/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.weight", rf"{da}/to_out/kernel", conv2d_w),
            (rf"{a}\.to_out\.0\.bias", rf"{da}/to_out/bias", identity),
        ]
        f = rf"layers\.{s}\.0\.layers\.(\d+)\.1\.net"
        df = rf"level_{s}_transformer/layers_\1_ff"
        rules += [
            (rf"{f}\.0\.g", rf"{df}/norm/scale", flat_ln),
            (rf"{f}\.0\.b", rf"{df}/norm/bias", flat_ln),
            (rf"{f}\.1\.weight", rf"{df}/conv1/kernel", conv2d_w),
            (rf"{f}\.1\.bias", rf"{df}/conv1/bias", identity),
            (rf"{f}\.4\.weight", rf"{df}/conv2/kernel", conv2d_w),
            (rf"{f}\.4\.bias", rf"{df}/conv2/bias", identity),
        ]
    return apply_rules(state_dict, rules)


def convert_learnable_memory_vit(state_dict) -> dict:
    """reference learnable_memory_vit.py:92-166 → models/learnable_memory_vit.py
    ViT (split to_q / to_kv attention)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"transformer/layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"transformer/layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"transformer/layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"transformer/layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"transformer/layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"transformer/layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"transformer/layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_efficient_vit(state_dict, transformer_rules_list=()) -> dict:
    """reference efficient.py:9-56 → models/efficient.py ViT (wrapper around
    an arbitrary transformer; pass extra rules for the wrapped transformer's
    own keys, or none if it is parameter-free)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        ("pos_embedding", "pos_embedding", identity),
    ]
    rules += patch_embed_rules()
    rules += list(transformer_rules_list)
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_vat_vit(state_dict) -> dict:
    """reference vat.py:177-258 ViT → ssl/vat.py ViT (per-head sigmoid output
    gates, register tokens, split q/kv)."""
    rules: list[Rule] = [
        ("pos_embedding", "pos_embedding", identity),
        ("cls_token", "cls_token", identity),
        ("register_tokens", "register_tokens", identity),
    ]
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out_gates\.0", r"layers_\1_attn/to_out_gates")
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_ast(state_dict) -> dict:
    """reference vaat.py:205-333 AST → ssl/vaat.py AST (gated attention,
    register tokens; transformer trailing norm + final_norm are BOTH
    applied, vaat.py:199+329).  The Spectrogram front-end has no params."""
    rules: list[Rule] = [
        ("register_tokens", "register_tokens", identity),
        (r"to_patch_tokens\.1\.weight", "patch_norm_pre/scale", identity),
        (r"to_patch_tokens\.1\.bias", "patch_norm_pre/bias", identity),
        (r"to_patch_tokens\.2\.weight", "patch_proj/kernel", linear_w),
        (r"to_patch_tokens\.2\.bias", "patch_proj/bias", identity),
        (r"to_patch_tokens\.3\.weight", "patch_norm_post/scale", identity),
        (r"to_patch_tokens\.3\.bias", "patch_norm_post/bias", identity),
    ]
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out_gates\.0", r"layers_\1_attn/to_out_gates")
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _ln(r"final_norm", "final_norm")
    rules += _linear("mlp_head", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_adapter(state_dict) -> dict:
    """reference learnable_memory_vit.py:168-242 Adapter → models/
    learnable_memory_vit.py Adapter (frozen ViT + learned memory tokens per
    layer + new head; the block-triangular attn_mask is a buffer we rebuild
    at trace time)."""
    rules: list[Rule] = [
        ("memory_cls_token", "memory_cls_token", identity),
        ("memories_per_layer", "memories_per_layer", identity),
        ("attn_mask", "<drop>", identity),
        (r"vit\.cls_token", "vit/cls_token", identity),
        (r"vit\.pos_embedding", "vit/pos_embedding", identity),
    ]
    rules += patch_embed_rules(r"vit\.to_patch_embedding", "vit/patch_embedding")
    a = r"vit\.transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"vit/transformer/layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"vit/transformer/layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"vit/transformer/layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"vit/transformer/layers_\1_attn/to_out")
    f = r"vit\.transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"vit/transformer/layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"vit/transformer/layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"vit/transformer/layers_\1_ff/fc2")
    rules += [(r"vit\.mlp_head\..*", "<drop>", identity)]  # replaced by the adapter head
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_rvt(state_dict) -> dict:
    """reference rvt.py:120-185 → models/rvt.py RvT (axial rotary embeddings
    are a deterministic linspace buffer — recomputed at trace time, dropped;
    depthwise-conv q projection, GEGLU-free FF at net.1/net.4)."""
    rules: list[Rule] = [
        ("cls_token", "cls_token", identity),
        (r"transformer\.pos_emb\.scales", "<drop>", identity),
        (r"to_patch_embedding\.1\.weight", "patch_embedding/proj/kernel", linear_w),
        (r"to_patch_embedding\.1\.bias", "patch_embedding/proj/bias", identity),
    ]
    a = r"transformer\.layers\.(\d+)\.0"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.conv\.net\.0\.weight", r"layers_\1_attn/to_q/depthwise/kernel", conv2d_w),
        (rf"{a}\.to_q\.conv\.net\.1\.weight", r"layers_\1_attn/to_q/pointwise/kernel", conv2d_w),
        (rf"{a}\.to_kv\.weight", r"layers_\1_attn/to_kv/kernel", linear_w),
    ]
    rules += _linear(rf"{a}\.to_out\.0", r"layers_\1_attn/to_out")
    f = r"transformer\.layers\.(\d+)\.1\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.4", r"layers_\1_ff/fc2")
    rules += _ln(r"mlp_head\.0", "head_norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_attn_residual(state_dict) -> dict:
    """reference simple_vit_attn_residual.py:156-207: each FF is wrapped in an
    AttentionResidual (learned-query cross-attention pooling of the residual),
    with a final pooling block before the head."""
    rules: list[Rule] = []
    rules += patch_embed_rules()

    def pool_attn(src: str, dst: str) -> list[Rule]:
        r = [(rf"{src}\.learned_query", rf"{dst}/learned_query", identity)]
        r += _ln(rf"{src}\.attn\.norm", rf"{dst}/attn/norm")
        r += _ln(rf"{src}\.attn\.norm_context", rf"{dst}/attn/norm_context")
        r += [
            (rf"{src}\.attn\.to_q\.weight", rf"{dst}/attn/to_q/kernel", linear_w),
            (rf"{src}\.attn\.to_kv\.weight", rf"{dst}/attn/to_kv/kernel", linear_w),
            (rf"{src}\.attn\.to_out\.weight", rf"{dst}/attn/to_out/kernel", linear_w),
        ]
        return r

    a = r"transformer\.layers\.(\d+)\.0\.fn"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_q\.weight", r"layers_\1_attn/to_q/kernel", linear_w),
        (rf"{a}\.to_kv\.weight", r"layers_\1_attn/to_kv/kernel", linear_w),
        (rf"{a}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.1\.fn\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"layers_\1_ff/fc2")
    rules += pool_attn(r"transformer\.layers\.(\d+)\.0", r"layers_\1_attn_pool")
    rules += pool_attn(r"transformer\.layers\.(\d+)\.1", r"layers_\1_ff_pool")
    rules += pool_attn(r"transformer\.final_pool", "final_pool")
    # final_pool wraps a LayerNorm as its fn (simple_vit_attn_residual.py:133)
    rules += _ln(r"transformer\.final_pool\.fn", "final_norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_orthog_residual(state_dict) -> dict:
    """reference simple_vit_orthog_residual_update.py:146-196: SimpleViT whose
    residual adds only the component of each block output orthogonal to the
    residual stream (parameter-free); blocks live under ``.block``."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    a = r"transformer\.layers\.(\d+)\.0\.block"
    rules += _ln(rf"{a}\.norm", r"layers_\1_attn/norm")
    rules += [
        (rf"{a}\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
        (rf"{a}\.to_out\.weight", r"layers_\1_attn/to_out/kernel", linear_w),
    ]
    f = r"transformer\.layers\.(\d+)\.1\.block\.net"
    rules += _ln(rf"{f}\.0", r"layers_\1_ff/norm")
    rules += _linear(rf"{f}\.1", r"layers_\1_ff/fc1")
    rules += _linear(rf"{f}\.3", r"layers_\1_ff/fc2")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_simple_vit_with_register_tokens(state_dict) -> dict:
    """reference simple_vit_with_register_tokens.py:75-121: SimpleViT layout
    plus learned register tokens."""
    rules: list[Rule] = [("register_tokens", "register_tokens", identity)]
    rules += patch_embed_rules()
    rules += transformer_rules(simple=True)
    rules += _linear("linear_head", "linear_head")
    return apply_rules(state_dict, rules)


def convert_vit_with_patch_merger(state_dict) -> dict:
    """reference vit_with_patch_merger.py:103-167: ViT whose transformer owns
    a PatchMerger (learned queries + LN) at ``patch_merge_layer``; our model
    flattens the transformer into top-level layers."""
    rules: list[Rule] = []
    rules += patch_embed_rules()
    rules += [("pos_embedding", "pos_embedding", identity)]
    rules += _ln(r"transformer\.layers\.(\d+)\.0\.norm", r"layers_\1_attn/norm")
    rules += [
        (r"transformer\.layers\.(\d+)\.0\.to_qkv\.weight", r"layers_\1_attn/to_qkv/kernel", linear_w),
    ]
    rules += _linear(r"transformer\.layers\.(\d+)\.0\.to_out\.0", r"layers_\1_attn/to_out")
    rules += _ln(r"transformer\.layers\.(\d+)\.1\.net\.0", r"layers_\1_ff/norm")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.1", r"layers_\1_ff/fc1")
    rules += _linear(r"transformer\.layers\.(\d+)\.1\.net\.4", r"layers_\1_ff/fc2")
    rules += [
        (r"transformer\.patch_merger\.queries", "patch_merger/queries", identity),
    ]
    rules += _ln(r"transformer\.patch_merger\.norm", "patch_merger/norm")
    rules += _ln(r"transformer\.norm", "norm")
    rules += _linear(r"mlp_head\.1", "mlp_head")
    return apply_rules(state_dict, rules)


def convert_accept_video_wrapper(state_dict, image_net_converter=None) -> dict:
    """reference accept_video_wrapper.py:27-230 →
    wrappers/accept_video_wrapper.py.  The wrapped image net's weights are
    converted by ``image_net_converter`` (default: ``convert_vit``) and
    nested under ``image_net``; the wrapper's own params are the optional
    embed projection (reference :53) and the learned time pos emb (:64)."""
    if image_net_converter is None:
        image_net_converter = convert_vit
    inner = {
        k[len("image_net."):]: v
        for k, v in state_dict.items()
        if k.startswith("image_net.")
    }
    own = {k: v for k, v in state_dict.items() if not k.startswith("image_net.")}
    converted = image_net_converter(inner)
    out = {"image_net": converted["params"]}
    if own:
        rules: list[Rule] = [("pos_emb", "pos_emb", identity)]
        rules += _linear("embed_proj", "embed_proj")
        out.update(apply_rules(own, rules)["params"])
    result = {"params": out}
    for coll, tree in converted.items():
        if coll != "params":
            result[coll] = {"image_net": tree}
    return result
