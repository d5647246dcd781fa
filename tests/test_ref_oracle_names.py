"""Reference-oracle parity: the masking SURFACE (which modules get masked).

Runs the ACTUAL reference name chains — `masking/maskers_Robust.
chain_module_names` (:70-95) with the stage-2 driver's exact arguments
(`prune_debias_VQA.py:278,301-308`, layers_to_mask default '0,..,11'),
`masking/maskers_visualBert.chain_module_names` (:83-95), and the four
mPLUG tower chains exactly as `mPLUG/vqa_mplug.py:99-117` composes them —
and asserts the EFFECTIVE masked-module set (names that exist as modules,
since `Masker.replace` only patches existing ones) equals our spec tables'
torch names, modality-for-modality.

Also pins two structural facts: the reference overgenerates names that
no-op (lang layers 9-11, r/x layers 5-8 from the 12-wide default), and it
DOES patch the stride fusion layers' crossattention modules — torch
constructs them unconditionally (`modeling_mplug.py:453`) even though the
stride forward never calls them (:496-508). Our flax model has no such dead
modules; the documented deviation is that those 4 dead specs are absent
from our table (their reference scores are unreachable by gradients and
frozen at init).
"""
import numpy as np
import pytest

import ref_oracle

from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
from crvqa_tpu.masking.spec import (VISUALBERT_WEIGHT_TYPES,
                                    lxmert_mask_specs, visualbert_mask_specs)

torch = ref_oracle.install()

LXMERT_WEIGHT_TYPES = [
    "E", "VV", "VB", "lK", "lQ", "lV", "lAO", "lI", "lO", "vK", "vQ", "vV",
    "vAO", "vI", "vO", "vlVK", "vlVQ", "vlVV", "vlVAO", "vlLaK", "vlLaQ",
    "vlLaV", "vlLaAO", "vlVaK", "vlVaQ", "vlVaV", "vlVaAO", "vlLi", "vlLo",
    "vlVi", "vlVo", "P",
]  # prune_debias_VQA.py:278


def _exists(model, name):
    try:
        model.get_submodule(name)
        return True
    except AttributeError:
        return False


def test_lxmert_name_table_oracle():
    from masking import maskers_Robust

    from hg_transformers.configuration_lxmert import LxmertConfig as TorchCfg
    from hg_transformers.modeling_lxmert import LxmertForMultipleChoice

    names, name_in_modal, name_in_module, _ = maskers_Robust.chain_module_names(
        "lxmert", list(range(12)), LXMERT_WEIGHT_TYPES)

    tcfg = TorchCfg(vocab_size=64, hidden_size=16, num_attention_heads=2,
                    l_layers=9, r_layers=5, x_layers=5, intermediate_size=16,
                    visual_feat_dim=8, visual_pos_dim=4,
                    max_position_embeddings=32)
    tcfg.ans_num = 4
    tm = LxmertForMultipleChoice(tcfg)

    effective = {n for n in names if _exists(tm, n)}
    assert effective < names  # the 12-wide default overgenerates no-ops

    specs = lxmert_mask_specs(9, 5, 5)
    ours = {s.torch_name for s in specs}
    assert ours == effective, sorted(ours.symmetric_difference(effective))[:6]
    for s in specs:
        assert name_in_modal[s.torch_name] == s.modality, s.torch_name
        assert name_in_module[s.torch_name] == s.weight_type, s.torch_name
    # the shared bidirectional cross-attention is ONE module: no separate
    # lang->vis attention name exists anywhere in the chain
    assert not any("lang_att" in n or "visn_att.att" in n for n in names)


def test_visualbert_name_table_oracle():
    vb_maskers = ref_oracle.load_ref_module("ref_vb_maskers",
                                            "masking/maskers_visualBert.py")

    names = vb_maskers.chain_module_names(
        "visual_bert", list(range(12)), list(VISUALBERT_WEIGHT_TYPES))
    ours = {s.torch_name for s in visualbert_mask_specs(12)}
    assert ours == names, sorted(ours.symmetric_difference(names))[:6]
    # VP exists in the reference name TABLE but not in the shipped driver's
    # weight_types (prune_debias_VQA_visualBERT.py:145) — same split as our
    # VISUALBERT_WEIGHT_TYPES vs VISUALBERT_ALL_WEIGHT_TYPES
    assert "VP" not in VISUALBERT_WEIGHT_TYPES
    assert "visual_bert.embeddings.visual_projection" in {
        s.torch_name for s in visualbert_mask_specs(
            12, weight_types=VISUALBERT_WEIGHT_TYPES + ("VP",))}


def test_mplug_name_table_oracle():
    ref_oracle.install_mplug()
    mm = ref_oracle.load_ref_module("ref_mplug_maskers",
                                    "mPLUG/masking/maskers.py")

    # vqa_mplug.py:99-112, verbatim
    weight_types = {
        "visual_encoder": ["I_visual", "O_visual"],
        "text_encoder": ["K", "Q", "V", "AO", "I", "O"],
        "fusion_encoder": ["SK", "SQ", "SV", "SAO", "CK", "CQ", "CV", "CAO",
                           "I", "O"],
        "text_decoder": ["SK", "SQ", "SV", "SAO", "CK", "CQ", "CV", "CAO",
                         "I", "O"],
    }
    layers_to_mask = {
        "visual_encoder": list(range(12)),
        "text_encoder": list(range(6)),
        "fusion_encoder": list(range(6, 12)),
        "text_decoder": list(range(12)),
    }
    ref_names = set()
    for tower in weight_types:
        ref_names.update(mm.chain_module_names(
            tower, layers_to_mask[tower], weight_types[tower]))

    # every live name has its _m twin in the chain (maskers.py:77-80); our
    # twins live in params_m under the SAME paths (mplug_specs docstring)
    base = {n for n in ref_names if "_m." not in n and not n.startswith(
        tuple(t + "_m" for t in weight_types))}
    for n in base:
        tower = n.split(".")[0]
        assert n.replace(tower, tower + "_m", 1) in ref_names, n

    # the stride fusion layers' crossattention modules are dead in the
    # forward but DO exist in torch and get patched: with 6 fusion layers /
    # stride 3 that is absolute layer 9 (rel 3)
    dead = {f"fusion_encoder.encoder.layer.9.crossattention.{s}"
            for s in ("self.key", "self.query", "self.value", "output.dense")}
    assert dead < base

    ours = {s.torch_name for s in mplug_mask_specs()}
    assert ours == base - dead, sorted(
        ours.symmetric_difference(base - dead))[:6]

    # mask_classifier adds exactly the momentum twin's head dense
    # (vqa_mplug.py:116-117)
    with_cls = {s.torch_name for s in mplug_mask_specs(mask_classifier=True)}
    assert with_cls - ours == {
        "text_decoder_m.cls.predictions.transform.dense"}
