"""Tensor-parallel sharding over the `model` mesh axis: placement rules,
numerics equivalence on a (data=4, model=2) mesh, stage-2 training step."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
from crvqa_tpu.models import LxmertConfig, LxmertForVQA
from crvqa_tpu.parallel import MeshConfig, make_mesh, replicated_sharding, shard_batch
from crvqa_tpu.parallel.tp import (
    param_partition_spec,
    shard_params_tp,
    shard_scores_tp,
)
from crvqa_tpu.train import stage2


def test_partition_rules():
    k = jnp.zeros((32, 32))
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "attention", "self", "query",
         "kernel"), k) == P(None, "model")
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "intermediate", "dense", "kernel"),
        k) == P(None, "model")
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "attention", "output", "dense",
         "kernel"), k) == P("model", None)
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "output", "dense", "kernel"),
        k) == P("model", None)
    assert param_partition_spec(
        ("lxmert", "embeddings", "word_embeddings", "embedding"),
        k) == P()
    b = jnp.zeros((32,))
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "attention", "self", "query",
         "bias"), b) == P("model")
    # LayerNorm params replicate
    assert param_partition_spec(
        ("lxmert", "encoder", "layer_0", "attention", "output", "LayerNorm",
         "scale"), b) == P()


@pytest.fixture(scope="module")
def setup():
    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=16, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    jb = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(jax.random.PRNGKey(0), input_ids=jb["input_ids"],
                        visual_feats=jb["visual_feats"],
                        visual_pos=jb["visual_pos"])["params"]
    return config, model, params, jb


def test_tp_forward_matches_replicated(setup):
    config, model, params, jb = setup
    mesh = make_mesh(MeshConfig(data=4, model=2))
    tp_params = shard_params_tp(params, mesh)
    # some kernels really are sharded over 'model'
    q = tp_params["lxmert"]["encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"]
    assert "model" in str(q.sharding.spec)
    batch = shard_batch(mesh, jb)
    out_tp, _ = jax.jit(lambda p, b: model.apply(
        {"params": p}, input_ids=b["input_ids"], visual_feats=b["visual_feats"],
        visual_pos=b["visual_pos"], attention_mask=b["attention_mask"],
        deterministic=True))(tp_params, batch)
    out_ref, _ = model.apply(
        {"params": params}, input_ids=jb["input_ids"],
        visual_feats=jb["visual_feats"], visual_pos=jb["visual_pos"],
        attention_mask=jb["attention_mask"], deterministic=True)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-4)


def test_tp_stage2_train_step(setup):
    config, model, params, jb = setup
    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    masker = Masker.create(specs, ModalSparsity.from_compression(.3, .3, .3, .7),
                           controlled_init="magnitude")
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    # place: frozen params + scores TP-sharded; rest replicated
    state = jax.device_put(state, replicated_sharding(mesh))
    state = state.replace(
        frozen_params=shard_params_tp(jax.device_get(state.frozen_params), mesh),
        scores=shard_scores_tp(jax.device_get(state.scores), masker.specs, mesh))
    step = stage2.make_train_step(model, masker, tx, cfg)
    batch = shard_batch(mesh, jb)
    state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics.loss))

    # numerics match the unsharded run
    state_s, tx_s = stage2.init_state(model, masker, params, cfg,
                                      jax.random.PRNGKey(1))
    step_s = stage2.make_train_step(model, masker, tx_s, cfg)
    _, metrics_s = step_s(state_s, jb)
    np.testing.assert_allclose(float(metrics.loss), float(metrics_s.loss),
                               rtol=1e-4)

    # threshold reset works on TP-sharded scores
    state2 = stage2.make_threshold_reset(masker)(state2)
    report = masker.sparsity_report(state2.scores, state2.thresholds)
    assert abs(float(report["all"]) - 0.7) < 0.02
