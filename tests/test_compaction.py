"""Physical head/FFN compaction (masking/compaction.py): exact equivalence
between the compacted small-shape model and the dense masked model, padding
semantics for uneven per-layer kept counts, and the head-score binarizer
parity with `binarizer_fn_head` (prune_debias_VQA.py:642-650)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from crvqa_tpu.data import synthetic_batch
from crvqa_tpu.masking.compaction import (
    apply_dense_ffn_mask,
    apply_dense_head_mask,
    compact_lang_ffns,
    compact_lang_heads,
    head_mask_from_scores,
)
from crvqa_tpu.masking.structured import binarize_head_ste
from crvqa_tpu.models import LxmertConfig, LxmertForVQA


def _setup():
    config = LxmertConfig.tiny()
    model = LxmertForVQA(config)
    batch = synthetic_batch(
        batch_size=4, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_feat_dim, pos_dim=config.visual_pos_dim)
    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_feats=jnp.asarray(batch["visual_feats"]),
        visual_pos=jnp.asarray(batch["visual_pos"]))["params"]
    inputs = dict(
        input_ids=jnp.asarray(batch["input_ids"]),
        visual_feats=jnp.asarray(batch["visual_feats"]),
        visual_pos=jnp.asarray(batch["visual_pos"]),
        attention_mask=jnp.asarray(batch["attention_mask"]))
    return config, model, params, inputs


def _logits(model, params, inputs):
    return np.asarray(model.apply({"params": params}, **inputs,
                                  deterministic=True)[0])


def test_compact_heads_equivalence_with_uneven_padding():
    config, model, params, inputs = _setup()
    # layer 0 keeps 3/4 heads, layer 1 keeps 2/4 -> padded to n_keep=3
    head_mask = np.array([[1, 0, 1, 1], [0, 1, 0, 1]], dtype=np.float32)
    dense_params = apply_dense_head_mask(params, head_mask, config.head_size)
    ref = _logits(model, dense_params, inputs)

    cparams, n_keep = compact_lang_heads(params, head_mask, config.head_size,
                                         pad_to_multiple=1)
    assert n_keep == 3
    q = cparams["lxmert"]["encoder"]["layer_0"]["attention"]["self"]["query"]
    assert q["kernel"].shape == (config.hidden_size, n_keep * config.head_size)
    assert q["bias"].shape == (n_keep * config.head_size,)
    ao = cparams["lxmert"]["encoder"]["layer_0"]["attention"]["output"]["dense"]
    assert ao["kernel"].shape == (n_keep * config.head_size, config.hidden_size)
    # layer 1's padded third head slice must be exactly zero
    q1 = np.asarray(
        cparams["lxmert"]["encoder"]["layer_1"]["attention"]["self"]["query"]["kernel"])
    np.testing.assert_array_equal(q1[:, 2 * config.head_size:], 0)

    cconfig = dataclasses.replace(config, lang_num_heads=n_keep)
    out = _logits(LxmertForVQA(cconfig), cparams, inputs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_compact_ffn_equivalence():
    config, model, params, inputs = _setup()
    rng = np.random.default_rng(3)
    # keep ~half the neurons, different count per layer
    ffn_mask = (rng.random((config.l_layers, config.intermediate_size)) < 0.5
                ).astype(np.float32)
    ffn_mask[0, :5] = 1.0  # make counts uneven
    dense_params = apply_dense_ffn_mask(params, ffn_mask)
    ref = _logits(model, dense_params, inputs)

    cparams, n_keep = compact_lang_ffns(params, ffn_mask, pad_to_multiple=8)
    assert n_keep % 8 == 0 and n_keep < config.intermediate_size
    inter = cparams["lxmert"]["encoder"]["layer_0"]["intermediate"]["dense"]
    assert inter["kernel"].shape == (config.hidden_size, n_keep)
    fo = cparams["lxmert"]["encoder"]["layer_0"]["output"]["dense"]
    assert fo["kernel"].shape == (n_keep, config.hidden_size)
    # attention output must be untouched
    ao = cparams["lxmert"]["encoder"]["layer_0"]["attention"]["output"]["dense"]
    assert ao["kernel"].shape == (config.hidden_size, config.hidden_size)

    cconfig = dataclasses.replace(config, lang_intermediate_size=n_keep)
    out = _logits(LxmertForVQA(cconfig), cparams, inputs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_compact_heads_and_ffns_combined():
    config, model, params, inputs = _setup()
    head_mask = np.array([[1, 1, 0, 0], [1, 0, 1, 0]], dtype=np.float32)
    rng = np.random.default_rng(7)
    ffn_mask = (rng.random((config.l_layers, config.intermediate_size)) < 0.6
                ).astype(np.float32)
    ref = _logits(model, apply_dense_ffn_mask(
        apply_dense_head_mask(params, head_mask, config.head_size), ffn_mask),
        inputs)
    cparams, nh = compact_lang_heads(params, head_mask, config.head_size,
                                     pad_to_multiple=1)
    cparams, ni = compact_lang_ffns(cparams, ffn_mask, pad_to_multiple=8)
    cconfig = dataclasses.replace(config, lang_num_heads=nh,
                                  lang_intermediate_size=ni)
    out = _logits(LxmertForVQA(cconfig), cparams, inputs)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_head_mask_from_scores_matches_ste_binarizer():
    scores = np.asarray([[0.9, 0.1, 0.8], [0.2, 0.7, 0.05]], np.float32)
    got = head_mask_from_scores(scores, num_to_mask=3)
    want = np.asarray(binarize_head_ste(jnp.asarray(scores), 3))
    np.testing.assert_array_equal(got, want)


def test_compacted_model_trains():
    """Stage-3 fine-tuning of the compacted subnetwork: grads flow and the
    compacted shapes stay fixed (the physical analogue of CustomFromMask —
    pruned heads cannot come back because they no longer exist)."""
    config, model, params, inputs = _setup()
    head_mask = np.array([[1, 0, 1, 1], [0, 1, 0, 1]], dtype=np.float32)
    cparams, n_keep = compact_lang_heads(params, head_mask, config.head_size,
                                         pad_to_multiple=1)
    cconfig = dataclasses.replace(config, lang_num_heads=n_keep)
    cmodel = LxmertForVQA(cconfig)
    labels = jnp.zeros((4, config.ans_num)).at[:, 0].set(1.0)

    def loss_fn(p):
        logits, _ = cmodel.apply({"params": p}, **inputs, deterministic=True)
        return jnp.mean((jax.nn.sigmoid(logits) - labels) ** 2)

    grads = jax.grad(loss_fn)(cparams)
    g = np.asarray(
        grads["lxmert"]["encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"])
    assert g.shape == (config.hidden_size, n_keep * config.head_size)
    assert np.abs(g).max() > 0


def test_compact_visualbert_equivalence():
    """Compaction generalizes to the single-stream BERT stack — the model HF
    prune_heads actually dispatches to in the reference (BertModel._prune_heads,
    modeling_bert.py:685-693). Same `layer_{i}` param naming, so the same
    transform applies; `compact_num_heads` runs the compacted stack."""
    from crvqa_tpu.models.visualbert import VisualBertConfig, VisualBertForVQA

    config = VisualBertConfig.tiny()
    model = VisualBertForVQA(config)
    rng = np.random.default_rng(5)
    input_ids = jnp.asarray(rng.integers(0, config.vocab_size, (4, 6)))
    visual_embeds = jnp.asarray(
        rng.normal(size=(4, 3, config.visual_embedding_dim)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), input_ids=input_ids,
                        visual_embeds=visual_embeds)["params"]

    head_mask = np.array([[1, 0, 1, 1], [0, 1, 1, 0]], dtype=np.float32)
    dense = apply_dense_head_mask(params, head_mask, config.head_size)
    ref = np.asarray(model.apply({"params": dense}, input_ids=input_ids,
                                 visual_embeds=visual_embeds,
                                 deterministic=True)[0])

    cparams, n_keep = compact_lang_heads(params, head_mask, config.head_size,
                                         pad_to_multiple=1)
    cconfig = dataclasses.replace(config, compact_num_heads=n_keep)
    out = np.asarray(
        VisualBertForVQA(cconfig).apply({"params": cparams},
                                        input_ids=input_ids,
                                        visual_embeds=visual_embeds,
                                        deterministic=True)[0])
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
