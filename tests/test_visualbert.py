"""VisualBERT model + uniform-sparsity stage-2 tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking import Masker, ModalSparsity, visualbert_mask_specs
from crvqa_tpu.models.visualbert import VisualBertConfig, VisualBertForVQA
from crvqa_tpu.train import stage2


@pytest.fixture(scope="module")
def setup():
    config = VisualBertConfig.tiny()
    model = VisualBertForVQA(config)
    batch = synthetic_batch(
        batch_size=4, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_embedding_dim, style="visualbert")
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_embeds=jnp.asarray(batch["visual_embeds"]),
    )["params"]
    specs = visualbert_mask_specs(config.num_hidden_layers)
    masker = Masker.create(specs, ModalSparsity.uniform(0.7),
                           controlled_init="magnitude")
    return config, model, params, masker, batch


def test_forward_shapes(setup):
    config, model, params, _, batch = setup
    logits, pooled = model.apply(
        {"params": params},
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_embeds=jnp.asarray(batch["visual_embeds"]),
        deterministic=True)
    assert logits.shape == (4, config.ans_num)
    assert pooled.shape == (4, config.hidden_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_specs_exist_and_torch_names(setup):
    config, params, = setup[0], setup[2]
    flat = traverse_util.flatten_dict(params)
    specs = visualbert_mask_specs(config.num_hidden_layers)
    # tiny: 2 layers * 6 + P + E = 14
    assert len(specs) == 14
    for s in specs:
        assert s.path in flat, s.path
    names = {s.torch_name for s in specs}
    assert "visual_bert.encoder.layer.1.attention.self.query" in names
    assert "visual_bert.embeddings.word_embeddings" in names
    assert "visual_bert.pooler.dense" in names
    # full: 12*6 + 2 = 74
    assert len(visualbert_mask_specs()) == 74


def test_stage2_uniform_sparsity_training(setup):
    config, model, params, masker, batch = setup
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10,
                              hidden_size=config.hidden_size,
                              classifier_key="cls")
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))
    step = stage2.make_train_step(model, masker, tx, cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "valid"}
    state, metrics = step(state, jb)
    assert np.isfinite(float(metrics.loss))
    state = stage2.make_threshold_reset(masker)(state)
    report = masker.sparsity_report(state.scores, state.thresholds)
    assert abs(float(report["Uni"]) - 0.7) < 0.02
    eval_step = stage2.make_eval_step(model, masker, cfg)
    logits = eval_step(state, jb)
    assert logits.shape == (4, config.ans_num)


def test_visualbert_vp_spec():
    """'VP' (visual_projection) is part of the reference masker's capability
    table (maskers_visualBert.py:36) even though the shipped driver omits it."""
    from crvqa_tpu.masking.spec import (
        VISUALBERT_ALL_WEIGHT_TYPES, visualbert_mask_specs)

    specs = visualbert_mask_specs(num_layers=2,
                                  weight_types=VISUALBERT_ALL_WEIGHT_TYPES)
    vp = [s for s in specs if s.weight_type == "VP"]
    assert len(vp) == 1
    assert vp[0].path == ("visual_bert", "embeddings", "visual_projection",
                          "kernel")
    assert vp[0].torch_name == "visual_bert.embeddings.visual_projection"
