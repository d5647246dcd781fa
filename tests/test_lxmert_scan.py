"""Scan-over-layers LXMERT: exact numerical equivalence with the unrolled
model, stacked mask specs, per-layer threshold semantics, stacked mask.pt
export round trip, and a full stage-2 step."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.masking.spec import lxmert_scan_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.models.lxmert_scan import (
    ScanLxmertForVQA,
    stack_params,
    unstack_params,
)
from crvqa_tpu.train import stage2


@pytest.fixture(scope="module")
def setup():
    config = LxmertConfig.tiny()
    unrolled = LxmertForVQA(config)
    scanned = ScanLxmertForVQA(config)
    batch = synthetic_batch(
        batch_size=4, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_feat_dim, pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}
    params_u = unrolled.init(
        jax.random.PRNGKey(0), input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"])["params"]
    return config, unrolled, scanned, params_u, jb


def test_stack_unstack_round_trip(setup):
    config, _, scanned, params_u, jb = setup
    stacked = stack_params(params_u, config)
    # structure matches a fresh scanned init
    fresh = scanned.init(jax.random.PRNGKey(1), input_ids=jb["input_ids"],
                         visual_feats=jb["visual_feats"],
                         visual_pos=jb["visual_pos"])["params"]
    fu = traverse_util.flatten_dict(fresh)
    su = traverse_util.flatten_dict(stacked)
    assert set(fu) == set(su)
    for k in fu:
        assert fu[k].shape == su[k].shape, k
    back = unstack_params(stacked, config)
    bu = traverse_util.flatten_dict(back)
    pu = traverse_util.flatten_dict(params_u)
    assert set(bu) == set(pu)
    for k in pu:
        np.testing.assert_array_equal(np.asarray(bu[k]), np.asarray(pu[k]))


def test_forward_equivalence(setup):
    config, unrolled, scanned, params_u, jb = setup
    lo_u, po_u = unrolled.apply(
        {"params": params_u}, input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"],
        attention_mask=jb["attention_mask"], deterministic=True)
    lo_s, po_s = scanned.apply(
        {"params": stack_params(params_u, config)}, input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"],
        attention_mask=jb["attention_mask"], deterministic=True)
    np.testing.assert_allclose(np.asarray(lo_u), np.asarray(lo_s),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(po_u), np.asarray(po_s),
                               rtol=1e-5, atol=1e-5)


def test_collect_hidden_equivalence(setup):
    """The scan model's collect_hidden (layer-wise KD surface) matches the
    unrolled model's hidden-state list element-wise, and honors
    config.classifier_dropout like the unrolled head."""
    config, unrolled, scanned, params_u, jb = setup
    kw = dict(input_ids=jb["input_ids"], visual_feats=jb["visual_feats"],
              visual_pos=jb["visual_pos"],
              attention_mask=jb["attention_mask"], deterministic=True,
              collect_hidden=True)
    lo_u, po_u, hid_u = unrolled.apply({"params": params_u}, **kw)
    lo_s, po_s, hid_s = scanned.apply(
        {"params": stack_params(params_u, config)}, **kw)
    assert len(hid_u) == len(hid_s) == 1 + config.l_layers + config.x_layers
    for hu, hs in zip(hid_u, hid_s):
        np.testing.assert_allclose(np.asarray(hu), np.asarray(hs),
                                   rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lo_u), np.asarray(lo_s),
                               rtol=1e-5, atol=1e-5)

    # classifier_dropout must be honored (the scan head previously
    # hardcoded 0.5): with EVERY dropout rate zeroed, a training-mode
    # forward must equal the deterministic one — it would differ if the
    # head still dropped at 0.5.
    import dataclasses as _dc

    cfg0 = _dc.replace(config, classifier_dropout=0.0,
                       hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
    sc0 = ScanLxmertForVQA(cfg0)
    base_kw = dict(input_ids=jb["input_ids"], visual_feats=jb["visual_feats"],
                   visual_pos=jb["visual_pos"],
                   attention_mask=jb["attention_mask"])
    sp = {"params": stack_params(params_u, config)}
    lo_train, _ = sc0.apply(sp, **base_kw, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(3)})
    lo_det, _ = sc0.apply(sp, **base_kw, deterministic=True)
    np.testing.assert_allclose(np.asarray(lo_train), np.asarray(lo_det),
                               rtol=1e-6, atol=1e-6)


def test_scan_specs_and_per_layer_thresholds(setup):
    config, _, _, params_u, _ = setup
    params_s = stack_params(params_u, config)
    specs = lxmert_scan_mask_specs(config.l_layers, config.r_layers,
                                   config.x_layers)
    # 32 weight types: 3 singles + 28 stacked + P
    assert len(specs) == 32
    flat = traverse_util.flatten_dict(params_s)
    for s in specs:
        assert s.path in flat, s.path
        if s.stacked:
            assert flat[s.path].shape[0] == s.stacked

    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")
    scores, thresholds = jax.jit(masker.init)(params_s, jax.random.PRNGKey(2))
    stacked_spec = next(s for s in specs if s.stacked)
    assert thresholds[stacked_spec.key].shape == (stacked_spec.stacked,)
    # per-layer sparsity == target for EVERY layer
    report = masker.sparsity_report(scores, thresholds)
    assert abs(float(report["all"]) - 0.7) < 0.01
    sc = scores[stacked_spec.key]
    for l in range(stacked_spec.stacked):
        zero = float(jnp.mean(sc[l] <= 0.01))
        n = sc[l].size
        assert abs(zero - max(int(n * 0.7), 1) / n) < 1e-6

    # reset after perturbation restores per-layer targets
    scores2 = {k: v + 0.001 * jax.random.normal(jax.random.PRNGKey(3), v.shape)
               for k, v in scores.items()}
    thr2 = jax.jit(masker.reset_thresholds)(scores2)
    report2 = masker.sparsity_report(scores2, thr2)
    assert abs(float(report2["all"]) - 0.7) < 0.01


def test_scan_mask_pt_matches_unrolled_export(setup):
    """Stacked export must produce byte-identical keys/values to the unrolled
    export given equivalent masks."""
    from crvqa_tpu.core.torch_compat import export_mask_pt, import_mask_pt

    config, _, _, params_u, _ = setup
    params_s = stack_params(params_u, config)
    specs_u = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    specs_s = lxmert_scan_mask_specs(config.l_layers, config.r_layers,
                                     config.x_layers)
    m_u = Masker.create(specs_u, ModalSparsity.from_compression(.3, .3, .3, .7))
    m_s = Masker.create(specs_s, ModalSparsity.from_compression(.3, .3, .3, .7))
    sc_u, th_u = jax.jit(m_u.init)(params_u)
    sc_s, th_s = jax.jit(m_s.init)(params_s)
    masks_u = jax.device_get(m_u.binary_masks(sc_u, th_u))
    masks_s = jax.device_get(m_s.binary_masks(sc_s, th_s))
    with tempfile.TemporaryDirectory() as d:
        pu, ps = os.path.join(d, "u.pt"), os.path.join(d, "s.pt")
        export_mask_pt(pu, masks_u, m_u.specs)
        export_mask_pt(ps, masks_s, m_s.specs)
        import torch

        ru = torch.load(pu, weights_only=False)
        rs = torch.load(ps, weights_only=False)
        assert set(ru) == set(rs)
        for k in ru:
            np.testing.assert_array_equal(ru[k].numpy(), rs[k].numpy())
        # stacked import round-trips
        back = import_mask_pt(ps, m_s.specs)
        for k, v in masks_s.items():
            np.testing.assert_array_equal(back[k], np.asarray(v))


def test_scan_stage2_step(setup):
    config, _, scanned, params_u, jb = setup
    params_s = stack_params(params_u, config)
    specs = lxmert_scan_mask_specs(config.l_layers, config.r_layers,
                                   config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(scanned, masker, params_s, cfg,
                                  jax.random.PRNGKey(1))
    step = stage2.make_train_step(scanned, masker, tx, cfg)
    state, metrics = step(state, jb)
    assert np.isfinite(float(metrics.loss))
    state = stage2.make_threshold_reset(masker)(state)
    report = masker.sparsity_report(state.scores, state.thresholds)
    assert abs(float(report["all"]) - 0.7) < 0.02
