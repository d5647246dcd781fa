"""Stage-1 fine-tuning and stage-3 pruned-subnetwork fine-tuning tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs, magnitude_masks
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.train import stage1


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
    masker = Masker.create(specs, ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
                           controlled_init="magnitude")
    return config, model, params, masker, batch


def _jb(batch):
    return {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}


@pytest.mark.parametrize("ft_type", ["normal", "lmh"])
def test_stage1_step_trains_all_params(setup, ft_type):
    config, model, params, _, batch = setup
    cfg = stage1.Stage1Config(ft_type=ft_type, total_steps=10, warmup_steps=2,
                              hidden_size=config.hidden_size,
                              learning_rate=1e-3)
    state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1))
    step = stage1.make_train_step(model, cfg, tx)
    emb_before = np.asarray(
        params["lxmert"]["embeddings"]["word_embeddings"]["embedding"]).copy()
    for i in range(2):
        state, metrics = step(state, _jb(batch))
    assert np.isfinite(float(metrics.loss))
    emb_after = np.asarray(
        state.params["lxmert"]["embeddings"]["word_embeddings"]["embedding"])
    assert np.abs(emb_after - emb_before).max() > 0  # backbone trains in stage 1


def test_stage3_pruned_weights_stay_zero(setup):
    """The JAX analogue of prune.CustomFromMask: masked entries get zero grad
    (w enters only as w*mask), so they remain zero through training."""
    config, model, params, masker, batch = setup
    masks = magnitude_masks(params, list(masker.specs), masker.zerorate_dict)
    pruned_params = masker.prune_params(params, masks)
    cfg = stage1.Stage1Config(ft_type="normal", total_steps=10, warmup_steps=0,
                              learning_rate=1e-2, hidden_size=config.hidden_size)
    state, tx = stage1.init_state(pruned_params, cfg, jax.random.PRNGKey(1),
                                  masks=masks)
    step = stage1.make_train_step(model, cfg, tx, masker=masker)
    for i in range(3):
        state, metrics = step(state, _jb(synthetic_batch(
            batch_size=4, seed=i, vocab_size=config.vocab_size,
            ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
            pos_dim=config.visual_pos_dim)))
    # achieved zero rate audit (see_weight_rate, run_vqa_stage3.py:75-178)
    effective = masker.prune_params(state.params, state.masks)
    key_spec = masker.specs[5]
    w = np.asarray(_leaf(effective, key_spec.path))
    zero_rate = float((w == 0).mean())
    assert zero_rate >= 0.69
    # surviving weights did move
    w0 = np.asarray(_leaf(masker.prune_params(pruned_params, masks), key_spec.path))
    kept = np.asarray(masks[key_spec.key])
    assert np.abs((w - w0)[kept]).max() > 0


def _leaf(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def test_ft_randmask_matches_target_rate(setup):
    config, model, params, masker, _ = setup
    masks = magnitude_masks(params, list(masker.specs), masker.zerorate_dict)
    total = sum(int((~np.asarray(m)).sum()) for m in masks.values())
    n = sum(np.asarray(m).size for m in masks.values())
    assert abs(total / n - 0.7) < 0.01


def test_stage1_grad_accum_matches_full_batch(setup):
    """grad_accum_steps=2 (microbatch scan, averaged grads — the reference's
    gradient_accumulation_steps arm): identical loss/score/params to the
    full-batch step up to fp reassociation. Dropout must be off — the
    microbatch steps draw per-microbatch masks."""
    import dataclasses as dc

    config, model, params, _, batch = setup
    config0 = dc.replace(config, hidden_dropout_prob=0.0,
                         attention_probs_dropout_prob=0.0,
                         classifier_dropout=0.0)
    model0 = LxmertForVQA(config0)
    outs = {}
    for accum in (1, 2):
        cfg = stage1.Stage1Config(ft_type="normal", total_steps=10,
                                  warmup_steps=0, learning_rate=1e-3,
                                  hidden_size=config.hidden_size,
                                  grad_accum_steps=accum)
        state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1))
        step = stage1.make_train_step(model0, cfg, tx)
        state, m = step(state, _jb(batch))
        outs[accum] = (float(m.loss), float(m.score),
                       np.asarray(state.params["classifier"]["main_0"]["v"]))
    np.testing.assert_allclose(outs[1][0], outs[2][0], rtol=1e-5)
    np.testing.assert_allclose(outs[1][1], outs[2][1], rtol=1e-6)
    np.testing.assert_allclose(outs[1][2], outs[2][2], rtol=1e-4, atol=1e-6)


def test_torch_adam_matches_optax_adam():
    """make_adam(moment_dtype=fp32-ish) paths: torch_adam with md=None-math
    must reproduce optax.adam exactly (same update math, same schedule
    convention), and bf16 moments must stay a small perturbation — the
    stage-1 analogue of stage-2's bf16-Adam-moments guard."""
    import jax
    import jax.numpy as jnp
    import optax

    from crvqa_tpu.train.common import make_adam, torch_adam

    rng = jax.random.PRNGKey(0)
    params = {"w": jax.random.normal(rng, (32, 16)),
              "b": jnp.zeros((16,))}
    exact = make_adam(5e-3, warmup_steps=3, total_steps=50)
    mirror = optax.chain(
        optax.clip_by_global_norm(1.0),
        torch_adam(  # same schedule as make_adam builds
            optax.join_schedules(
                [optax.linear_schedule(0.0, 5e-3, 3),
                 optax.linear_schedule(5e-3, 0.0, 47)], [3]),
            eps=1e-8))
    bf16 = make_adam(5e-3, warmup_steps=3, total_steps=50,
                     moment_dtype=jnp.bfloat16)

    s_e, s_m, s_b = exact.init(params), mirror.init(params), bf16.init(params)
    p_e = p_m = p_b = params
    for i in range(6):
        g = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + i) * 0.1, params)
        u_e, s_e = exact.update(g, s_e, p_e)
        u_m, s_m = mirror.update(g, s_m, p_m)
        u_b, s_b = bf16.update(g, s_b, p_b)
        p_e = optax.apply_updates(p_e, u_e)
        p_m = optax.apply_updates(p_m, u_m)
        p_b = optax.apply_updates(p_b, u_b)
    for a, b in zip(jax.tree_util.tree_leaves(p_e),
                    jax.tree_util.tree_leaves(p_m)):
        assert jnp.allclose(a, b, atol=1e-6), "torch_adam != optax.adam"
    for a, b in zip(jax.tree_util.tree_leaves(p_e),
                    jax.tree_util.tree_leaves(p_b)):
        # bf16 carried moments: small drift only
        assert jnp.max(jnp.abs(a - b)) < 5e-4


def test_stage1_moment_dtype_state_and_cli(tmp_path, setup):
    """moment_dtype='bfloat16' stores bf16 m/v in the state, and the
    stage-1 driver's --moment_dtype/--gradient_accumulation_steps flags
    reach the config (end-to-end tiny run)."""
    config, model, params, masker, batch = setup
    cfg = stage1.Stage1Config(total_steps=10,
                              hidden_size=config.hidden_size,
                              moment_dtype="bfloat16")
    state, _ = stage1.init_state(params, cfg, jax.random.PRNGKey(0))
    leaves = jax.tree_util.tree_leaves(state.opt_state)
    assert any(getattr(l, "dtype", None) == jnp.bfloat16 for l in leaves)

    from crvqa_tpu.cli import run_vqa_stage1

    out = tmp_path / "s1bf16"
    run_vqa_stage1.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "16",
        "--train_batch_size", "8", "--num_train_epochs", "1",
        "--logging_steps", "1", "--save_steps", "2", "--warmup_steps", "1",
        "--moment_dtype", "bfloat16", "--gradient_accumulation_steps", "2",
        "--do_train", "--seed", "0", "--dtype", "float32",
    ])
    assert (out / "ckpt_2").exists()
