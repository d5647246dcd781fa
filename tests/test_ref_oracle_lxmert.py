"""Reference-oracle parity: LXMERT forward/loss, LearnedMixin, masker init.

Transplants tiny-config flax params into the ACTUAL reference torch modules
(`hg_transformers/modeling_lxmert.py:233-360`, `masking/maskers_Robust.py:
212-380`, `hg_transformers/vqa_debias_loss_functions.py:125-196`) and
asserts numerics parity. These are the cross-implementation checks VERDICT
r2 called the single highest-leverage verification available without data.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.losses import vqa_losses
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA

torch = ref_oracle.install()


@pytest.fixture(scope="module")
def tiny():
    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=4, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    return config, model, params, jb


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


def test_lxmert_forward_and_bce_parity(tiny):
    """Logits, pooled output, and the in-model instance_bce loss must match
    the reference forward (`modeling_lxmert.py:248-360`) to fp32 noise."""
    config, model, params, jb = tiny
    tm = _torch_lxmert(config, params)

    # attention mask with real padding to exercise the -10000 bias path
    att = np.array(jb["attention_mask"], np.float32)
    att[:, -2:] = 0.0
    labels = np.asarray(jb["labels"], np.float32)

    logits, pooled = model.apply(
        {"params": params}, input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"],
        attention_mask=jnp.asarray(att), deterministic=True)
    ours_loss = vqa_losses.plain_bce(logits, jnp.asarray(labels))

    with torch.no_grad():
        t_loss, t_logits, t_pooled = tm(
            input_ids=torch.from_numpy(np.asarray(jb["input_ids"])),
            visual_feats=torch.from_numpy(np.asarray(jb["visual_feats"], np.float32)),
            visual_pos=torch.from_numpy(np.asarray(jb["visual_pos"], np.float32)),
            attention_mask=torch.from_numpy(att),
            token_type_ids=torch.zeros_like(torch.from_numpy(np.asarray(jb["input_ids"]))),
            labels=torch.from_numpy(labels))

    np.testing.assert_allclose(np.asarray(pooled), t_pooled.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), t_logits.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(float(ours_loss), float(t_loss),
                               rtol=2e-6, atol=2e-6)


def test_learned_mixin_oracle(tiny):
    """learned_mixin vs the reference `LearnedMixin(0.36)` module
    (`vqa_debias_loss_functions.py:125-196`) on shared random inputs."""
    config, _, _, _ = tiny
    rng = np.random.default_rng(3)
    b, n, h = 6, config.ans_num, config.hidden_size
    hidden = rng.normal(size=(b, h)).astype(np.float32)
    logits = rng.normal(size=(b, n)).astype(np.float32) * 2
    bias = rng.uniform(1e-3, 1 - 1e-3, size=(b, n)).astype(np.float32)
    labels = (rng.uniform(size=(b, n)) < 0.3).astype(np.float32)

    lmh_params = vqa_losses.learned_mixin_init(jax.random.PRNGKey(7), h)
    ours = vqa_losses.learned_mixin(
        jax.tree.map(jnp.asarray, lmh_params), jnp.asarray(hidden),
        jnp.asarray(logits), jnp.asarray(bias), jnp.asarray(labels), w=0.36)

    from hg_transformers.vqa_debias_loss_functions import LearnedMixin

    lm = LearnedMixin(0.36)
    lm.bias_lin = torch.nn.Linear(h, 1)  # ctor hardcodes 768 (:137)
    with torch.no_grad():
        lm.bias_lin.weight.copy_(torch.from_numpy(
            np.asarray(lmh_params["bias_lin"]["kernel"]).T))
        lm.bias_lin.bias.copy_(torch.from_numpy(
            np.asarray(lmh_params["bias_lin"]["bias"])))
        lm.smooth_param.copy_(torch.from_numpy(
            np.asarray(lmh_params["smooth_param"])))
        ref = lm(torch.from_numpy(hidden), torch.from_numpy(logits),
                 torch.from_numpy(bias), torch.from_numpy(labels), "cpu")
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5, atol=1e-6)


def test_other_losses_oracle(tiny):
    """Plain / BiasProduct / ReweightByInvBias vs their reference modules
    (`vqa_debias_loss_functions.py:66-122`)."""
    config, _, _, _ = tiny
    rng = np.random.default_rng(11)
    b, n = 5, config.ans_num
    logits = rng.normal(size=(b, n)).astype(np.float32) * 2
    bias = rng.uniform(1e-3, 1 - 1e-3, size=(b, n)).astype(np.float32)
    labels = (rng.uniform(size=(b, n)) < 0.3).astype(np.float32)
    t = lambda x: torch.from_numpy(x)

    from hg_transformers.vqa_debias_loss_functions import (
        BiasProduct, Plain, ReweightByInvBias)

    with torch.no_grad():
        ref_plain = Plain()(None, t(logits), t(bias), t(labels))
        ref_rw = ReweightByInvBias()(None, t(logits), t(bias), t(labels))
        bp = BiasProduct()
        ref_bp = bp(None, t(logits), t(bias), t(labels))
        bp_smooth = float(bp.smooth_param)

    np.testing.assert_allclose(
        float(vqa_losses.plain_bce(jnp.asarray(logits), jnp.asarray(labels))),
        float(ref_plain), rtol=1e-6)
    np.testing.assert_allclose(
        float(vqa_losses.reweight_by_inv_bias(
            jnp.asarray(logits), jnp.asarray(bias), jnp.asarray(labels))),
        float(ref_rw), rtol=1e-6)
    np.testing.assert_allclose(
        float(vqa_losses.bias_product(
            jnp.asarray(logits), jnp.asarray(bias), jnp.asarray(labels),
            smooth_param=jnp.asarray([bp_smooth]))),
        float(ref_bp), rtol=1e-5)


def _ref_masked_linear(w_torch, sparsity, controlled_init="magnitude",
                       threshold=1e-2, name="encoder.layer.0.attention.self.query"):
    """Instantiate the reference MaskedLinear1 on a given weight."""
    from masking.maskers_Robust import MaskedLinear1

    return MaskedLinear1(
        name=name,
        weight=torch.nn.Parameter(w_torch),
        bias=torch.nn.Parameter(torch.zeros(w_torch.shape[0])),
        padding_idx=None,
        mask_biases=False,
        threshold=torch.tensor(threshold),
        init_sparsity=sparsity,
        init_scale=2e-2,
        controlled_init=controlled_init,
        structured_masking_info={
            "ptl_config": None,
            "structured_masking": None,
            "structured_masking_types": None,
            "force_masking": "bert",
        },
    )


def test_masker_magnitude_init_oracle(tiny):
    """Masker.init('magnitude') + binary_masks vs the reference
    `MaskedLinearX.controlled_init` + `binarizer_fn1`
    (`maskers_Robust.py:212-280,338-379`) on every tiny-LXMERT spec."""
    config, _, params, _ = tiny
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    sparsity = ModalSparsity.from_compression(.3, .3, .3, .7)
    masker = Masker.create(specs, sparsity, controlled_init="magnitude")
    scores, thresholds = masker.init(params)
    masks = masker.binary_masks(scores, thresholds)

    from masking.maskers_Robust import binarizer_fn1

    rates = masker.zerorate_dict
    for spec in specs:
        leaf = params
        for p in spec.path:
            leaf = leaf[p]
        w = np.asarray(leaf, np.float32)
        wt = torch.from_numpy(w if spec.is_embedding
                              else np.ascontiguousarray(w.T))
        ml = _ref_masked_linear(wt, rates[spec.modality])
        ref_mask = binarizer_fn1(ml.weight_mask.data,
                                 torch.tensor(1e-2)).numpy().astype(bool)
        ours = np.asarray(masks[spec.key])
        if not spec.is_embedding:
            ours = ours.T
        np.testing.assert_array_equal(ours, ref_mask, err_msg=spec.key)


def test_masker_init_tie_case():
    """Duplicated |w| values straddling the kth-value: both sides use strict
    `> kth`, so tied weights are all dropped — assert that agreement."""
    w = np.array([[0.5, 0.2, 0.2], [0.2, 0.9, 0.1]], np.float32)
    from masking.maskers_Robust import binarizer_fn1

    ml = _ref_masked_linear(torch.from_numpy(np.ascontiguousarray(w.T)), 0.5)
    ref_mask = binarizer_fn1(ml.weight_mask.data,
                             torch.tensor(1e-2)).numpy().astype(bool)

    from crvqa_tpu.masking.spec import MaskSpec

    spec = MaskSpec(path=("lin", "kernel"), torch_name="lin",
                    weight_type="K", modality="Uni")
    masker = Masker.create([spec], {"Uni": 0.5}, controlled_init="magnitude")
    scores, thresholds = masker.init({"lin": {"kernel": jnp.asarray(w)}})
    ours = np.asarray(masker.binary_masks(scores, thresholds)[spec.key])
    np.testing.assert_array_equal(ours.T, ref_mask)
    # the tie makes the achieved zero rate exceed the target; both agree on it
    assert ref_mask.sum() == 2


def test_reset_threshold_oracle(tiny):
    """Masker.reset_thresholds vs `Trainer.reset_threshold`'s kth-value over
    the score tensors (`mask_trainer_Robust_VQA.py:467-482`), after a score
    perturbation away from the two-point init."""
    config, _, params, _ = tiny
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.4, .5, .3, .6),
                           controlled_init="magnitude")
    scores, _ = masker.init(params)
    rng = np.random.default_rng(0)
    scores = {k: jnp.asarray(np.asarray(v)
                             + rng.normal(size=v.shape).astype(np.float32) * 1e-3)
              for k, v in scores.items()}
    thresholds = masker.reset_thresholds(scores)
    rates = masker.zerorate_dict
    for spec in specs:
        sc = torch.from_numpy(np.asarray(scores[spec.key]))
        k = int(sc.numel() * rates[spec.modality]) or 1
        ref_thr = torch.kthvalue(sc.view(-1), k=k).values
        np.testing.assert_allclose(float(thresholds[spec.key]),
                                   float(ref_thr), rtol=1e-6,
                                   err_msg=spec.key)


def test_cosine_rep_loss_oracle():
    """cosine_rep_loss vs the reference `CosineLoss`
    (mask_trainer_Robust_VQA.py:95-97) on pooled-shaped AND
    hidden-state-shaped tensors (the layer-wise KD operand)."""
    from hg_transformers.mask_trainer_Robust_VQA import CosineLoss

    rng = np.random.default_rng(21)
    for shape in [(6, 32), (4, 9, 32)]:
        s = rng.normal(size=shape).astype(np.float32)
        t = rng.normal(size=shape).astype(np.float32)
        ours = vqa_losses.cosine_rep_loss(jnp.asarray(s), jnp.asarray(t))
        with torch.no_grad():
            ref = CosineLoss()(torch.from_numpy(s), torch.from_numpy(t))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-6)


def test_layerwise_kd_trains(tiny):
    """kd_mode='layerwise' (the INTENDED per-layer distillation of
    mask_trainer_Robust_VQA.py:857-865) runs, differs from pooled KD, and
    still moves the scores."""
    from crvqa_tpu.train import stage2

    config, model, params, jb = tiny
    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")
    losses = {}
    for mode in ("pooled", "layerwise"):
        cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                                  hidden_size=config.hidden_size,
                                  use_kd=True, kd_mode=mode, kd_weight=5.0)
        st, tx = stage2.init_state(model, masker, params, cfg,
                                   jax.random.PRNGKey(1))
        s0 = np.asarray(st.scores[specs[3].key]).copy()
        step = stage2.make_train_step(model, masker, tx, cfg)
        st, m = step(st, jb)
        losses[mode] = float(m.loss)
        assert np.isfinite(losses[mode])
        assert np.abs(np.asarray(st.scores[specs[3].key]) - s0).max() > 0
    assert losses["pooled"] != losses["layerwise"]
