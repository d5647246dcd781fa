"""Mask specs for the mPLUG towers.

Mirrors the name tables + shipped weight-type selection of
`mPLUG/masking/maskers.py:16-65` and `mPLUG/vqa_mplug.py:99-112`:
  visual_encoder: mlp c_fc / c_proj for all 12 ViT blocks
  text_encoder:   K/Q/V/AO/I/O, layers 0..5
  fusion_encoder: self + cross K/Q/V/AO + I/O, layers 6..11
  text_decoder:   self + cross K/Q/V/AO + I/O, layers 0..11

Stride fusion layers (rel != 0 and rel % stride_layer == 0) have NO
cross-attention module (modeling_mplug.py:496-506), so their C* specs are
omitted. Momentum `_m` twins (the chain at maskers.py:80-84) need no specs
of their own: they live in `state.params_m` under the SAME paths and are
masked with the live scores by `apply_masks(momentum_tree=True)`; the
`_m`-prefixed torch names exist only in the mask.pt export
(cli/vqa_mplug.py builds them). Modality is uniform ('Uni').
"""
from __future__ import annotations

from typing import Sequence

from .spec import MaskSpec


def _self_attn(prefix_path, prefix_torch, layer, what):
    sub = {
        "K": (("attention", "self", "key"), "attention.self.key"),
        "Q": (("attention", "self", "query"), "attention.self.query"),
        "V": (("attention", "self", "value"), "attention.self.value"),
        "AO": (("attention", "output", "dense"), "attention.output.dense"),
        "CK": (("crossattention", "self", "key"), "crossattention.self.key"),
        "CQ": (("crossattention", "self", "query"), "crossattention.self.query"),
        "CV": (("crossattention", "self", "value"), "crossattention.self.value"),
        "CAO": (("crossattention", "output", "dense"), "crossattention.output.dense"),
        "I": (("intermediate", "dense"), "intermediate.dense"),
        "O": (("output", "dense"), "output.dense"),
    }[what]
    path = prefix_path + (f"layer_{layer}",) + sub[0] + ("kernel",)
    torch = f"{prefix_torch}.layer.{layer}.{sub[1]}"
    return path, torch


def mplug_mask_specs(vit_layers: int = 12, text_encoder_layers: int = 6,
                     fusion_layers: int = 6, decoder_layers: int = 12,
                     stride_layer: int = 3,
                     mask_classifier: bool = False) -> list[MaskSpec]:
    specs: list[MaskSpec] = []

    def add(path, torch, wt):
        specs.append(MaskSpec(path=tuple(path), torch_name=torch,
                              weight_type=wt, modality="Uni"))

    # visual encoder MLPs (I_visual / O_visual, vqa_mplug.py:101)
    for l in range(vit_layers):
        add(("visual_encoder", f"resblocks_{l}", "mlp_c_fc", "kernel"),
            f"visual_encoder.visual.transformer.resblocks.{l}.mlp.c_fc",
            "I_visual")
        add(("visual_encoder", f"resblocks_{l}", "mlp_c_proj", "kernel"),
            f"visual_encoder.visual.transformer.resblocks.{l}.mlp.c_proj",
            "O_visual")

    # text encoder
    for l in range(text_encoder_layers):
        for wt in ("K", "Q", "V", "AO", "I", "O"):
            path, torch = _self_attn(("text_encoder",),
                                     "text_encoder.encoder", l, wt)
            add(path, torch, wt)

    # fusion encoder: absolute layer indices start at text_encoder_layers
    for rel in range(fusion_layers):
        l = text_encoder_layers + rel
        is_stride = rel != 0 and rel % stride_layer == 0
        wts = ["SK", "SQ", "SV", "SAO", "I", "O"]
        if not is_stride:
            wts += ["CK", "CQ", "CV", "CAO"]
        for wt in wts:
            base = wt[1:] if wt.startswith("S") else wt
            path, torch = _self_attn(("fusion_encoder",),
                                     "fusion_encoder.encoder", l,
                                     base if not wt.startswith("C") else wt)
            add(path, torch, wt)

    # text decoder
    for l in range(decoder_layers):
        for wt in ("SK", "SQ", "SV", "SAO", "CK", "CQ", "CV", "CAO", "I", "O"):
            base = wt[1:] if wt.startswith("S") else wt
            path, torch = _self_attn(("text_decoder",),
                                     "text_decoder.bert.encoder", l,
                                     base if not wt.startswith("C") else wt)
            add(path, torch, wt)

    if mask_classifier:
        # the reference's `mask_classifier` flag adds exactly one module —
        # the MOMENTUM twin's LM-head transform dense (a shipped quirk:
        # `names_tobe_masked.add("text_decoder_m.cls.predictions.transform.
        # dense")`, vqa_mplug.py:116-117). Off by default
        # (mask_config.py:mask_classifier=False).
        specs.append(MaskSpec(
            path=("text_decoder", "predictions_transform_dense", "kernel"),
            torch_name="text_decoder_m.cls.predictions.transform.dense",
            weight_type="classifier", modality="Uni", momentum_only=True))

    return specs
