"""Multi-device pjit tests on the 8-device virtual CPU mesh.

Exercises the data-parallel sharding the driver dry-runs via
`__graft_entry__.dryrun_multichip`: batch split over the `data` axis,
state replicated, gradients/metrics reduced by XLA collectives.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from crvqa_tpu.train import stage2


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=8, model=1))


@pytest.fixture(scope="module")
def setup():
    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=16, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(b["input_ids"]),
        visual_feats=jnp.asarray(b["visual_feats"]),
        visual_pos=jnp.asarray(b["visual_pos"]),
    )["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
                           controlled_init="magnitude")
    return config, model, params, masker, b


def test_stage2_train_step_data_parallel(mesh, setup):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = stage2.make_train_step(model, masker, tx, cfg)

    dev_batch = shard_batch(mesh, {k: v for k, v in batch.items() if k != "valid"})
    # batch really is sharded over the data axis
    assert dev_batch["labels"].sharding.spec == batch_sharding(mesh).spec
    state2, metrics = step(state, dev_batch)
    assert np.isfinite(float(metrics.loss))
    assert int(state2.step) == 1

    # numerics must match the single-device run
    state_s, tx_s = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step_s = stage2.make_train_step(model, masker, tx_s, cfg)
    _, metrics_s = step_s(state_s, {k: jnp.asarray(v) for k, v in batch.items()
                                    if k != "valid"})
    np.testing.assert_allclose(float(metrics.loss), float(metrics_s.loss),
                               rtol=1e-4)


def test_threshold_reset_sharded(mesh, setup):
    config, model, params, masker, _ = setup
    cfg = stage2.Stage2Config(masker_type="normal", total_steps=10,
                              hidden_size=config.hidden_size)
    state, _ = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated_sharding(mesh))
    reset = stage2.make_threshold_reset(masker)
    state = reset(state)
    report = masker.sparsity_report(state.scores, state.thresholds)
    assert abs(float(report["all"]) - 0.7) < 0.02


def test_eval_gather_across_devices(mesh, setup):
    """Eval logits computed under data-sharding equal the unsharded result —
    the jax.sharding analogue of distributed_concat correctness."""
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="normal", hidden_size=config.hidden_size)
    state, _ = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    eval_step = stage2.make_eval_step(model, masker)
    dev_batch = shard_batch(mesh, {k: v for k, v in batch.items() if k != "valid"})
    sharded = np.asarray(eval_step(jax.device_put(state, replicated_sharding(mesh)),
                                   dev_batch))
    local = np.asarray(eval_step(state, {k: jnp.asarray(v) for k, v in batch.items()
                                         if k != "valid"}))
    np.testing.assert_allclose(sharded, local, atol=2e-4)


def test_mplug_mask_step_with_zero_sharding(mesh):
    """mPLUG mask-train step with ZeRO-sharded optimizer state on the
    8-device mesh (the DeepSpeed ZeRO-2 analogue, parallel/zero.py)."""
    from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig
    from crvqa_tpu.train import mplug_train
    from crvqa_tpu.data.mplug_data import synthetic_mplug_batch
    from crvqa_tpu.parallel.zero import shard_opt_state, zero_spec
    from crvqa_tpu.masking import Masker, ModalSparsity

    config = MPlugConfig.tiny()
    model = MPlug(config)
    b = synthetic_mplug_batch(batch_size=8, image_res=config.vit.image_res,
                              vocab_size=config.bert.vocab_size)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "qid"}
    params = model.init(jax.random.PRNGKey(0), jb["images"],
                        jb["question_ids"], jb["question_mask"],
                        jb["answer_ids"], jb["answer_mask"],
                        jb["weights"])["params"]
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=10,
                                       warmup_steps=1)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(1), masker=masker)
    from crvqa_tpu.parallel import replicated_sharding, shard_batch

    state = jax.device_put(state, replicated_sharding(mesh))
    state = state.replace(opt_state=shard_opt_state(state.opt_state, mesh))
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker, mesh=mesh)
    dev_batch = shard_batch(mesh, {k: v for k, v in b.items() if k != "qid"})
    state, loss = step(state, dev_batch)
    assert np.isfinite(float(loss))
    # tiny-config leaves fall below the ZeRO size threshold (legitimately
    # replicated); the sharding rule itself must shard real-size leaves:
    big = jnp.zeros((30522, 768))
    assert "data" in str(zero_spec(big, 8))
    small = jnp.zeros((4, 4))
    assert zero_spec(small, 8) == jax.sharding.PartitionSpec()


def test_stage1_data_parallel(mesh, setup):
    from crvqa_tpu.train import stage1

    config, model, params, masker, batch = setup
    cfg = stage1.Stage1Config(ft_type="lmh", total_steps=10, warmup_steps=0,
                              hidden_size=config.hidden_size)
    state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = stage1.make_train_step(model, cfg, tx)
    dev_batch = shard_batch(mesh, {k: v for k, v in batch.items() if k != "valid"})
    state, metrics = step(state, dev_batch)
    assert np.isfinite(float(metrics.loss))


def test_stage2_zero_sharded_optimizer(mesh, setup, monkeypatch):
    """Stage-2 with ZeRO-sharded Adam moments for the mask scores: numerics
    match the replicated run; the moment leaves really live sharded over the
    data axis across steps (the DeepSpeed ZeRO-2 analogue extended to the
    LXMERT path, parallel/zero.py)."""
    from crvqa_tpu.parallel import zero
    from crvqa_tpu.parallel.zero import shard_opt_state, zero_spec

    # the tiny test model's score matrices are all below the production
    # don't-bother floor; lower it so sharding actually engages here
    monkeypatch.setattr(zero, "_MIN_SHARD_ELEMS", 64)

    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    state = jax.device_put(state, replicated_sharding(mesh))
    state = state.replace(opt_state=shard_opt_state(state.opt_state, mesh))
    step = stage2.make_train_step(model, masker, tx, cfg, mesh=mesh)
    dev_batch = shard_batch(mesh, {k: v for k, v in batch.items() if k != "valid"})
    losses = []
    for _ in range(2):
        state, metrics = step(state, dev_batch)
        losses.append(float(metrics.loss))
    assert all(np.isfinite(l) for l in losses)

    # a score-moment leaf stays sharded over 'data' after the update
    big_leaves = [l for l in jax.tree_util.tree_leaves(state.opt_state)
                  if hasattr(l, "sharding")
                  and "data" in str(zero_spec(l, 8))]
    assert big_leaves, "no shardable optimizer leaves found"
    assert any("data" in str(l.sharding.spec) for l in big_leaves)

    # numerics equal the replicated (no-ZeRO) path
    state_r, tx_r = stage2.init_state(model, masker, params, cfg,
                                      jax.random.PRNGKey(1))
    state_r = jax.device_put(state_r, replicated_sharding(mesh))
    step_r = stage2.make_train_step(model, masker, tx_r, cfg)
    losses_r = []
    for _ in range(2):
        state_r, metrics_r = step_r(state_r, dev_batch)
        losses_r.append(float(metrics_r.loss))
    np.testing.assert_allclose(losses, losses_r, rtol=1e-5)
