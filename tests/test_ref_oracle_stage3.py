"""Reference-oracle parity: stage-3 pruning machinery.

Runs the ACTUAL reference stage-3 functions (`run_vqa_stage3.py`:
`pruning_model_with_mask` :227-324, `see_weight_rate` :75-178,
`mag_pruning` :209-226) under torch on a tiny 9/5/5 LXMERT with
transplanted flax params, and asserts:

- a mask.pt we export prunes the reference model to EXACTLY the weights our
  `Masker.prune_params` produces (per matrix, both orientations);
- the reference's `see_weight_rate` audit equals our
  `cli.run_vqa_stage3.see_weight_rate`;
- `mag_pruning` (the FT_randMask baseline) produces EXACTLY the masks of
  `masking.reference_rand_masks` — including its real scope: language
  layers + pooler + word embeddings only (its range(12) loop names
  layers 9-11 that never match, and it never lists r_layers / x_layers /
  visn_fc), with round(rate*n) pruned per matrix.

The layer counts are the real 9/5/5 because the reference functions hardcode
those ranges; hidden sizes stay tiny.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.core import torch_compat
from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import (Masker, ModalSparsity, lxmert_mask_specs,
                               reference_rand_masks)
from crvqa_tpu.models import LxmertConfig, LxmertForVQA

torch = ref_oracle.install()


@pytest.fixture(scope="module")
def full_depth_tiny():
    """Tiny widths, real 9/5/5 depth (the reference fns hardcode the ranges)."""
    config = dataclasses.replace(
        LxmertConfig.tiny(), l_layers=9, r_layers=5, x_layers=5)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=2, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    return config, model, params


def _torch_lxmert(config, params):
    from hg_transformers.configuration_lxmert import LxmertConfig as TorchCfg
    from hg_transformers.modeling_lxmert import LxmertForMultipleChoice

    tcfg = TorchCfg(
        vocab_size=config.vocab_size, hidden_size=config.hidden_size,
        num_attention_heads=config.num_attention_heads,
        l_layers=config.l_layers, r_layers=config.r_layers,
        x_layers=config.x_layers, intermediate_size=config.intermediate_size,
        visual_feat_dim=config.visual_feat_dim,
        visual_pos_dim=config.visual_pos_dim,
        max_position_embeddings=config.max_position_embeddings,
        hidden_act=config.hidden_act,
    )
    tcfg.ans_num = config.ans_num
    tm = LxmertForMultipleChoice(tcfg)
    tm.eval()
    ref_oracle.load_flax_into_torch(tm, params)
    return tm


def _ref_stage3():
    return ref_oracle.load_ref_module("ref_stage3", "run_vqa_stage3.py")


def test_pruning_model_with_mask_and_see_weight_rate_oracle(
        full_depth_tiny, tmp_path):
    """Export a stage-2 mask.pt at mixed modal rates, prune the REFERENCE
    model with `pruning_model_with_mask`, and check every pruned weight and
    the `see_weight_rate` audit against our stage-3 path."""
    config, _, params = full_depth_tiny
    ref = _ref_stage3()

    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    masker = Masker.create(
        specs,
        ModalSparsity.from_compression(lang_comp=0.7, vis_comp=0.5,
                                       fus_comp=0.4, zero_rate=0.7),
        controlled_init="magnitude")
    scores, thresholds = masker.init(params, jax.random.PRNGKey(1))
    masks = jax.device_get(masker.binary_masks(scores, thresholds))

    # roundtrip through the on-disk artifact the reference consumes
    mask_path = str(tmp_path / "mask.pt")
    torch_compat.export_mask_pt(mask_path, masks, masker.specs)
    mask_dict = torch.load(mask_path, weights_only=False)

    tm = _torch_lxmert(config, params)
    ref.pruning_model_with_mask(tm.lxmert, mask_dict, "lxmert")

    ours = jax.device_get(masker.prune_params(
        params, {k: jnp.asarray(v) for k, v in masks.items()}))
    ours_sd = torch_compat.flax_to_torch_state_dict(ours)
    for spec in masker.specs:
        mod = tm.get_submodule(spec.torch_name)
        ref_w = mod.weight.detach().numpy()
        np.testing.assert_array_equal(
            ref_w, ours_sd[f"{spec.torch_name}.weight"],
            err_msg=spec.torch_name)
        # reference CustomFromMask must actually have zeroed something
        assert (ref_w == 0).any(), spec.torch_name

    from crvqa_tpu.cli.run_vqa_stage3 import see_weight_rate

    ref_rate = ref.see_weight_rate(tm, "lxmert")
    our_rate = 100.0 * see_weight_rate(masker, params, masks)
    assert abs(ref_rate - our_rate) < 1e-6, (ref_rate, our_rate)
    # mixed modal rates -> the global audit sits strictly between them
    assert 30.0 < ref_rate < 70.0


def test_mag_pruning_oracle(full_depth_tiny):
    """`mag_pruning` (FT_randMask) vs `reference_rand_masks`: identical
    masks, reference scope (language + pooler + embeddings ONLY), torch's
    round(rate*n) prune count."""
    config, _, params = full_depth_tiny
    ref = _ref_stage3()
    zero_rate = 0.43  # round() != int() for these matrix sizes

    tm = _torch_lxmert(config, params)
    ref.mag_pruning(tm.lxmert, zero_rate)

    specs = list(lxmert_mask_specs(config.l_layers, config.r_layers,
                                   config.x_layers))
    ours = jax.device_get(jax.jit(
        lambda p: reference_rand_masks(p, specs, zero_rate))(params))

    in_scope = pruned_modules = 0
    for spec in specs:
        mod = tm.get_submodule(spec.torch_name)
        has_mask = hasattr(mod, "weight_mask")
        m = ours[spec.key]
        if not spec.is_embedding:
            m = m.T
        if has_mask:
            pruned_modules += 1
            ref_mask = mod.weight_mask.detach().numpy().astype(bool)
            np.testing.assert_array_equal(ref_mask, m,
                                          err_msg=spec.torch_name)
            assert (~m).sum() == round(zero_rate * m.size), spec.torch_name
        else:
            # out of mag_pruning's scope -> we must leave it dense
            assert m.all(), spec.torch_name
        in_scope += int(has_mask)
    # 9 language layers x 6 linears + pooler + word embeddings
    assert in_scope == 9 * 6 + 2 == pruned_modules
    # and the visual/fusion branches really were out of scope
    assert not hasattr(
        tm.lxmert.encoder.r_layers[0].attention.self.query, "weight_mask")
    assert not hasattr(
        tm.lxmert.encoder.x_layers[0].visual_attention.att.query,
        "weight_mask")
