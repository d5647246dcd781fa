"""Stage-2 mask-training integration tests on a tiny LXMERT + synthetic data.

Asserts the reference trainer's core invariants (SURVEY.md §4): frozen
weights stay frozen, mask scores + classifier move, threshold reset restores
per-modality target sparsity mid-training, and the mask export round-trips
through the reference's mask.pt format.
"""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.train import stage2
from crvqa_tpu.train.evaluation import make_json, predict, vqa_accuracy


@pytest.fixture(scope="module")
def setup():
    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    batch = synthetic_batch(
        batch_size=4, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_feat_dim, pos_dim=config.visual_pos_dim,
    )
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_feats=jnp.asarray(batch["visual_feats"]),
        visual_pos=jnp.asarray(batch["visual_pos"]),
    )["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    sparsity = ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7)
    masker = Masker.create(specs, sparsity, controlled_init="magnitude")
    return config, model, params, masker, batch


def _jb(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}


@pytest.mark.parametrize("masker_type", ["normal", "lmh", "lpf", "rubi"])
def test_stage2_step_all_losses(setup, masker_type):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type=masker_type, total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)
    state2, metrics = step(state, _jb(batch))
    assert np.isfinite(float(metrics.loss))
    assert int(state2.step) == 1


def test_stage2_freezes_backbone_trains_scores_and_classifier(setup):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)
    frozen_before = jax.device_get(state.frozen_params)
    scores_before = jax.device_get(state.scores)
    clf_before = jax.device_get(state.train_params["classifier"])

    for i in range(2):
        state, _ = step(state, _jb(synthetic_batch(
            batch_size=4, seed=i, vocab_size=config.vocab_size,
            ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
            pos_dim=config.visual_pos_dim)))

    frozen_after = jax.device_get(state.frozen_params)
    # backbone params identical
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(frozen_before),
        jax.tree_util.tree_leaves_with_path(frozen_after),
    ):
        np.testing.assert_array_equal(a, b, err_msg=str(pa))
    # scores moved (at least for some modules)
    moved = sum(
        float(np.abs(np.asarray(state.scores[k]) - scores_before[k]).max()) > 0
        for k in scores_before
    )
    assert moved > len(scores_before) * 0.5
    # classifier moved
    assert float(np.abs(
        np.asarray(state.train_params["classifier"]["main_0"]["v"]) -
        clf_before["main_0"]["v"]).max()) > 0
    # LMH params exist and moved
    assert "lmh" in state.train_params


def test_threshold_reset_restores_target_sparsity(setup):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="normal", total_steps=20,
                              learning_rate=5e-3, hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)
    for i in range(5):
        state, _ = step(state, _jb(synthetic_batch(
            batch_size=4, seed=i, vocab_size=config.vocab_size,
            ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
            pos_dim=config.visual_pos_dim)))
    reset = stage2.make_threshold_reset(masker)
    state = reset(state)
    report = jax.jit(masker.sparsity_report)(state.scores, state.thresholds)
    assert abs(float(report["Lang"]) - 0.7) < 0.02
    assert abs(float(report["Vis"]) - 0.7) < 0.02
    assert abs(float(report["Fus"]) - 0.7) < 0.02
    assert abs(float(report["P"]) - 0.7) < 0.02


def test_eval_predict_and_json(setup):
    config, model, params, masker, _ = setup
    cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                              hidden_size=config.hidden_size)
    state, _ = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    eval_step = stage2.make_eval_step(model, masker)

    def batches():
        for i in range(3):
            b = synthetic_batch(
                batch_size=4, seed=100 + i, vocab_size=config.vocab_size,
                ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                pos_dim=config.visual_pos_dim)
            b["valid"][3] = i != 0  # exercise ragged-batch padding
            yield b

    out = predict(eval_step, state, batches(), shard_fn=_jb)
    assert out["num_examples"] == 11
    assert out["logits"].shape == (11, config.ans_num)
    acc = vqa_accuracy(out["logits"], out["labels"])
    assert 0.0 <= acc <= 100.0
    label2ans = [f"ans_{i}" for i in range(config.ans_num)]
    js = make_json(out["logits"], out["question_id"], label2ans)
    assert len(js) == 11
    assert set(js[0]) == {"question_id", "answer"}


def test_mask_export_roundtrip_mask_pt(setup):
    config, model, params, masker, _ = setup
    from crvqa_tpu.core.torch_compat import export_mask_pt, import_mask_pt

    cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                              hidden_size=config.hidden_size)
    state, _ = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    masks = jax.device_get(masker.binary_masks(state.scores, state.thresholds))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "mask.pt")
        export_mask_pt(path, masks, masker.specs)
        # reference contract: torch-loadable dict of bool tensors keyed by
        # '<torch module name>.weight'
        import torch

        raw = torch.load(path, weights_only=False)
        key = "lxmert.encoder.x_layers.0.visual_attention.att.query.weight"
        assert key in raw
        assert raw[key].dtype == torch.bool
        # torch orientation is (out, in) = transposed flax kernel mask
        spec = next(s for s in masker.specs if s.torch_name.endswith("att.query"))
        assert tuple(raw[key].shape) == masks[spec.key].T.shape

        back = import_mask_pt(path, masker.specs)
        for k, m in masks.items():
            np.testing.assert_array_equal(back[k], np.asarray(m))


def test_checkpoint_roundtrip(setup):
    config, model, params, masker, batch = setup
    from crvqa_tpu.core import load_checkpoint, save_checkpoint

    cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)
    state, _ = step(state, _jb(batch))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt_1")
        save_checkpoint(path, state, metadata={"step": 1})
        fresh, _ = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
        restored = load_checkpoint(path, fresh)
        assert int(restored.step) == 1
        np.testing.assert_array_equal(
            np.asarray(restored.scores["lxmert/pooler/dense/kernel"]),
            np.asarray(state.scores["lxmert/pooler/dense/kernel"]))


def test_multi_step_scan_matches_sequential(setup):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                              hidden_size=config.hidden_size)
    jb = _jb(batch)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (3,) + x.shape), jb)

    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    multi = stage2.make_multi_step(model, masker, tx, cfg, 3)
    state_m, losses, scores = multi(state, stacked)
    assert losses.shape == (3,)
    assert int(state_m.step) == 3

    state_s, tx_s = stage2.init_state(model, masker, params, cfg,
                                      jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx_s, cfg)
    seq_losses = []
    for _ in range(3):
        state_s, m = step(state_s, jb)
        seq_losses.append(float(m.loss))
    np.testing.assert_allclose(np.asarray(losses), np.asarray(seq_losses),
                               rtol=1e-4)


def test_gradient_accumulation_matches_full_batch(setup):
    """accum over microbatches == one big batch in expectation (same grads
    up to dropout rng; compare in deterministic-ish setting via tiny lr)."""
    config, model, params, masker, _ = setup
    batch = synthetic_batch(
        batch_size=8, seed=5, vocab_size=config.vocab_size,
        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
        pos_dim=config.visual_pos_dim)
    jb = _jb(batch)
    cfg_full = stage2.Stage2Config(masker_type="normal", total_steps=10,
                                   hidden_size=config.hidden_size)
    cfg_acc = stage2.Stage2Config(masker_type="normal", total_steps=10,
                                  hidden_size=config.hidden_size,
                                  grad_accum_steps=2)
    s1, tx1 = stage2.init_state(model, masker, params, cfg_full,
                                jax.random.PRNGKey(1))
    s2, tx2 = stage2.init_state(model, masker, params, cfg_acc,
                                jax.random.PRNGKey(1))
    step1 = stage2.make_train_step(model, masker, tx1, cfg_full)
    step2 = stage2.make_train_step(model, masker, tx2, cfg_acc)
    s1, m1 = step1(s1, jb)
    s2, m2 = step2(s2, jb)
    # same data, different dropout partitioning -> losses close but not equal
    assert abs(float(m1.loss) - float(m2.loss) / 1.0) < 1.0
    assert np.isfinite(float(m2.loss))
    assert int(s2.step) == 1


def test_mask_drift_metric(setup):
    config, model, params, masker, _ = setup
    scores, thresholds = masker.init(params)
    masks = jax.device_get(masker.binary_masks(scores, thresholds))
    assert float(masker.mask_drift(scores, thresholds, masks)) == 0.0
    flipped = dict(masks)
    key = masker.specs[0].key
    flipped[key] = ~masks[key]
    drift = float(masker.mask_drift(scores, thresholds, flipped))
    assert drift > 0


def test_hf_adamw_matches_torch_reference_math():
    """Trajectory parity with the reference custom AdamW (optimization.py:
    66-129): eps added to the UNCORRECTED sqrt(v), bias correction folded
    into the step size, decoupled decay via p -= lr*wd*p. Oracle implemented
    in torch from those formulas."""
    import torch

    from crvqa_tpu.train.common import hf_adamw

    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 4).astype(np.float32)
    grads = [rng.randn(5, 4).astype(np.float32) for _ in range(6)]
    lr, b1, b2, eps, wd = 1e-2, 0.9, 0.999, 1e-6, 0.01

    # torch oracle
    p = torch.tensor(p0.copy())
    m = torch.zeros_like(p)
    v = torch.zeros_like(p)
    for t, g_np in enumerate(grads, start=1):
        g = torch.tensor(g_np)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        step_size = lr * (1 - b2 ** t) ** 0.5 / (1 - b1 ** t)
        p = p - step_size * m / (v.sqrt() + eps)
        p = p - lr * wd * p

    tx = hf_adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    jp = {"w": jnp.asarray(p0)}
    st = tx.init(jp)
    for g_np in grads:
        upd, st = tx.update({"w": jnp.asarray(g_np)}, st, jp)
        jp = jax.tree_util.tree_map(lambda x, u: x + u, jp, upd)
    np.testing.assert_allclose(np.asarray(jp["w"]), p.numpy(),
                               rtol=2e-5, atol=2e-6)


def test_hf_adamw_grad_mask_and_abs_sum():
    """grad_mask multiplies gradients leaf-wise (optimization.py:81-82);
    with no grad_mask, abs_grad_sum integrates |grad| (:100-101)."""
    from crvqa_tpu.train.common import abs_grad_sum, hf_adamw

    g1 = {"w": jnp.asarray([[1.0, -2.0]]), "b": jnp.asarray([3.0])}
    g2 = {"w": jnp.asarray([[-1.0, 1.0]]), "b": jnp.asarray([-1.0])}
    p = jax.tree_util.tree_map(jnp.zeros_like, g1)

    tx = hf_adamw(1e-2, accumulate_abs_grad=True)
    st = tx.init(p)
    _, st = tx.update(g1, st, p)
    _, st = tx.update(g2, st, p)
    sums = abs_grad_sum((st,))  # chained-state shape
    np.testing.assert_allclose(np.asarray(sums["w"]), [[2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(sums["b"]), [4.0])

    mask = {"w": jnp.asarray([[0.0, 1.0]]), "b": jnp.asarray([1.0])}
    txm = hf_adamw(1e-2, grad_mask=mask)
    stm = txm.init(p)
    upd, stm = txm.update(g1, stm, p)
    assert float(upd["w"][0, 0]) == 0.0  # masked grad -> no movement
    assert abs(float(upd["w"][0, 1])) > 0
    assert stm.abs_grad_sum is None  # reference skips sum when grad_mask set


def test_stage2_accumulate_abs_grad_end_to_end(setup):
    """Stage2Config.accumulate_abs_grad carries the accumulator through the
    jitted train step."""
    from crvqa_tpu.train.common import abs_grad_sum

    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="normal", total_steps=4,
                              hidden_size=config.hidden_size,
                              accumulate_abs_grad=True)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(0))
    step = stage2.make_train_step(model, masker, tx, cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state, _ = step(state, jb)
    state, _ = step(state, jb)
    sums = abs_grad_sum(state.opt_state)
    assert sums is not None
    total = sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(sums))
    assert total > 0


def test_hf_adamw_schedule_convention_first_step_at_zero():
    """torch LambdaLR steps AFTER optimizer.step(), so the first optimizer
    step runs at lambda(0) — with linear warmup that is lr=0 and the first
    update must be exactly zero (review finding: the schedule was read at
    the post-increment count, shifting every step by one)."""
    from crvqa_tpu.train.common import hf_adamw

    sched = lambda c: 1e-2 * jnp.minimum(c / 3.0, 1.0)
    tx = hf_adamw(sched, weight_decay=0.0)
    p = {"w": jnp.ones((2, 2))}
    st = tx.init(p)
    upd, st = tx.update({"w": jnp.full((2, 2), 0.5)}, st, p)
    np.testing.assert_array_equal(np.asarray(upd["w"]), 0.0)  # sched(0) == 0
    upd, st = tx.update({"w": jnp.full((2, 2), 0.5)}, st, p)
    assert np.abs(np.asarray(upd["w"])).max() > 0               # sched(1) > 0
