"""mPLUG model family tests: forward/loss shapes, stride fusion behavior,
mask specs, mask training, generation, momentum update."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import traverse_util

from crvqa_tpu.masking import Masker, ModalSparsity
from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
from crvqa_tpu.models.mplug import MPlug, MPlugConfig, momentum_update
from crvqa_tpu.train import mplug_train


def _batch(config, b=2, a=3, ql=6, al=5, seed=0):
    rng = np.random.RandomState(seed)
    v = config.bert.vocab_size
    res = config.vit.image_res
    return {
        "images": rng.randn(b, res, res, 3).astype(np.float32),
        "question_ids": rng.randint(1, v, (b, ql)).astype(np.int32),
        "question_mask": np.ones((b, ql), np.float32),
        "answer_ids": rng.randint(1, v, (b, a, al)).astype(np.int32),
        "answer_mask": np.ones((b, a, al), np.float32),
        "weights": np.concatenate(
            [np.ones((b, 1), np.float32) * 0.7,
             np.ones((b, a - 1), np.float32) * 0.15], axis=1),
        "bias": rng.rand(b, a).astype(np.float32) * 0.5,
    }


@pytest.fixture(scope="module")
def setup():
    config = MPlugConfig.tiny()
    model = MPlug(config)
    batch = _batch(config)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(
        jax.random.PRNGKey(0), jb["images"], jb["question_ids"],
        jb["question_mask"], jb["answer_ids"], jb["answer_mask"],
        jb["weights"])["params"]
    return config, model, params, jb


def test_train_loss_scalar_and_finite(setup):
    config, model, params, jb = setup
    loss = model.apply({"params": params}, jb["images"], jb["question_ids"],
                       jb["question_mask"], jb["answer_ids"],
                       jb["answer_mask"], jb["weights"], bias=jb["bias"],
                       deterministic=True)
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_bias_reweighting_reduces_loss(setup):
    config, model, params, jb = setup
    base = float(model.apply({"params": params}, jb["images"],
                             jb["question_ids"], jb["question_mask"],
                             jb["answer_ids"], jb["answer_mask"],
                             jb["weights"], deterministic=True))
    rew = float(model.apply({"params": params}, jb["images"],
                            jb["question_ids"], jb["question_mask"],
                            jb["answer_ids"], jb["answer_mask"],
                            jb["weights"], bias=jb["bias"],
                            deterministic=True))
    assert rew < base  # (1-bias) in (0,1] strictly shrinks positive loss


def test_fusion_tower_structure(setup):
    """Fusion layers are named layer_2..layer_3 in tiny (start at
    text_encoder_layers); the stride layer has no crossattention."""
    config, model, params, _ = setup
    fusion = params["fusion_encoder"]
    start = config.bert.text_encoder_layers
    names = set(fusion.keys())
    assert f"layer_{start}" in names
    # tiny: fusion_layers=2, stride_layer=2 -> rel 0 normal, rel 1 normal
    # (1 % 2 != 0); no stride layer in tiny default. Check a stride config:
    from crvqa_tpu.models.mplug.bert import MPlugBertConfig
    from crvqa_tpu.models.mplug.mplug import MPlugConfig as MC

    cfg3 = MC(bert=MPlugBertConfig.tiny(fusion_layers=4, stride_layer=2),
              vit=config.vit)
    m3 = MPlug(cfg3)
    b = _batch(cfg3)
    jb = {k: jnp.asarray(v) for k, v in b.items()}
    p3 = m3.init(jax.random.PRNGKey(0), jb["images"], jb["question_ids"],
                 jb["question_mask"], jb["answer_ids"], jb["answer_mask"],
                 jb["weights"])["params"]
    f3 = p3["fusion_encoder"]
    s = cfg3.bert.text_encoder_layers
    assert "crossattention" in f3[f"layer_{s}"]          # rel 0: normal
    assert "crossattention" in f3[f"layer_{s + 1}"]      # rel 1: normal
    assert "crossattention" not in f3[f"layer_{s + 2}"]  # rel 2: stride/joint
    assert "crossattention" in f3[f"layer_{s + 3}"]      # rel 3: normal


def test_mplug_mask_specs_exist(setup):
    config, model, params, _ = setup
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    flat = traverse_util.flatten_dict(params)
    for s in specs:
        assert s.path in flat, s.path
    # full-size count: 12*2 vit + 6*6 text + (5*10 + 1*6) fusion + 12*10 dec
    full = mplug_mask_specs()
    assert len(full) == 24 + 36 + 56 + 120


def test_mplug_mask_training_step(setup):
    config, model, params, jb = setup
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
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    before = jax.device_get(state.params)
    s0 = {k: np.asarray(v).copy() for k, v in state.scores.items()}
    for _ in range(2):
        state, loss = step(state, jb)
    assert np.isfinite(float(loss))
    # params frozen, scores moved
    after = jax.device_get(state.params)
    np.testing.assert_array_equal(
        before["text_encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"],
        after["text_encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"])
    moved = sum(np.abs(np.asarray(state.scores[k]) - s0[k]).max() > 0
                for k in s0)
    assert moved > len(s0) * 0.5
    # threshold reset hits the target
    state = mplug_train.make_threshold_reset(masker)(state)
    report = masker.sparsity_report(state.scores, state.thresholds)
    assert abs(float(report["Uni"]) - 0.5) < 0.02


def test_mplug_full_model_step_and_momentum(setup):
    config, model, params, jb = setup
    cfg = mplug_train.MPlugTrainConfig(mode="full", total_steps=10,
                                       warmup_steps=1, distill=True)
    state, tx = mplug_train.init_state(model, params, cfg, jax.random.PRNGKey(1))
    step = mplug_train.make_train_step(model, cfg, tx)
    p0 = np.asarray(
        state.params["text_encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"]).copy()
    state, loss = step(state, jb)  # warmup step: lr still 0
    state, loss = step(state, jb)
    assert np.isfinite(float(loss))
    p1 = np.asarray(
        state.params["text_encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"])
    assert np.abs(p1 - p0).max() > 0
    # momentum twin lags behind
    m1 = np.asarray(
        state.params_m["text_encoder"]["layer_0"]["attention"]["self"]["query"]["kernel"])
    assert np.abs(m1 - p0).max() < np.abs(p1 - p0).max() + 1e-9


def test_generation_greedy_and_beam(setup):
    config, model, params, jb = setup
    from crvqa_tpu.models.mplug.generator import beam_generate, greedy_generate

    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)

    def decode(ids, mask, st, st_mask):
        return model.apply({"params": params}, ids, mask, st, st_mask,
                           method=model.decode_logits)

    ids = greedy_generate(decode, states, state_mask, max_len=6,
                          bos=config.bos_token_id % config.bert.vocab_size,
                          eos=config.eos_token_id % config.bert.vocab_size)
    assert ids.shape == (2, 6)
    best_ids, best_scores = beam_generate(
        decode, states, state_mask, beam_size=3, max_len=6,
        bos=config.bos_token_id % config.bert.vocab_size,
        eos=config.eos_token_id % config.bert.vocab_size)
    assert best_ids.shape == (2, 6)
    assert np.isfinite(np.asarray(best_scores)).all()


def test_momentum_update_math():
    p = {"a": jnp.ones((3,))}
    m = {"a": jnp.zeros((3,))}
    out = momentum_update(p, m, momentum=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1 * np.ones(3), rtol=1e-6)


def test_cross_kv_cache_equivalence(setup):
    """Decoding with precomputed cross-attention K/V must be numerically
    identical to the in-module projections (same kernels, same math)."""
    from crvqa_tpu.models.mplug.generator import precompute_cross_kv

    config, model, params, jb = setup
    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)
    c = config.bert
    kv = precompute_cross_kv(params["text_decoder"], states,
                             c.text_decode_layers, c.num_attention_heads,
                             c.head_size)
    ids = jb["answer_ids"][:, 0]  # [B, L]
    mask = jb["answer_mask"][:, 0]
    plain = model.apply({"params": params}, ids, mask, states, state_mask,
                        method=model.decode_logits)
    cached = model.apply({"params": params}, ids, mask, states, state_mask,
                         cross_kv=kv, method=model.decode_logits)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)


def test_generate_step_with_kv_cache(setup):
    """mplug_train.make_generate_step (which now precomputes cross-K/V) still
    produces valid beams."""
    from crvqa_tpu.train import mplug_train

    config, model, params, jb = setup
    cfg = mplug_train.MPlugTrainConfig(mode="full", total_steps=10,
                                       warmup_steps=1)
    state, _ = mplug_train.init_state(model, params, cfg, jax.random.PRNGKey(1))
    gen = mplug_train.make_generate_step(model, cfg, beam_size=3, max_len=5)
    ids, scores = gen(state, jb)
    assert ids.shape == (2, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_mask_mode_trains_lm_head(setup):
    """Mask training must update the decoder LM-head ('predictions') params
    alongside the scores — the reference never freezes modules named
    'predictions' (mPLUG/masking/maskers.py:620-626). Backbone stays frozen."""
    config, model, params, jb = setup
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
    dec0 = jax.device_get(state.params["text_decoder"])
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    for _ in range(2):
        state, loss = step(state, jb)
    dec1 = jax.device_get(state.params["text_decoder"])
    # head moved
    assert np.abs(dec1["predictions_transform_dense"]["kernel"]
                  - dec0["predictions_transform_dense"]["kernel"]).max() > 0
    assert np.abs(dec1["predictions_bias"] - dec0["predictions_bias"]).max() > 0
    assert np.abs(dec1["predictions_transform_LayerNorm"]["scale"]
                  - dec0["predictions_transform_LayerNorm"]["scale"]).max() > 0
    # non-head decoder backbone frozen
    np.testing.assert_array_equal(
        dec0["layer_0"]["attention"]["self"]["query"]["kernel"],
        dec1["layer_0"]["attention"]["self"]["query"]["kernel"])


def test_two_group_labels_and_decay_mask(setup):
    """Dual-LR grouping must catch visual-encoder leaves in BOTH nested param
    trees and flat '/'-keyed score dicts (the round-1 bug labeled every flat
    score 'body'); weight decay must skip bias/LayerNorm leaves
    (optim_factory.py:141-171 no_decay)."""
    config, model, params, jb = setup
    labels = mplug_train.two_group_labels(params)
    flat = traverse_util.flatten_dict(labels)
    vis = [v for k, v in flat.items() if k[0] == "visual_encoder"]
    body = [v for k, v in flat.items() if k[0] != "visual_encoder"]
    assert set(vis) == {"visual"} and set(body) == {"body"}

    # flat score-style keys
    tree = {"scores": {"visual_encoder/resblocks_0/mlp_c_fc/kernel": 1.0,
                       "text_decoder/layer_0/attention/self/query/kernel": 2.0},
            "head": {"text_decoder/predictions_bias": 3.0}}
    lab = mplug_train.two_group_labels(tree)
    assert lab["scores"]["visual_encoder/resblocks_0/mlp_c_fc/kernel"] == "visual"
    assert lab["scores"]["text_decoder/layer_0/attention/self/query/kernel"] == "body"
    assert lab["head"]["text_decoder/predictions_bias"] == "body"

    dm = mplug_train.decay_mask(
        {"a": {"kernel": 1.0, "bias": 2.0},
         "LayerNorm": {"scale": 3.0, "bias": 4.0},
         "ln_1": {"scale": 3.5, "bias": 4.5},
         "head": {"text_decoder/predictions_bias": 5.0},
         "emb": {"embedding": 6.0}})
    assert dm["a"]["kernel"] is True and dm["a"]["bias"] is False
    # the reference's no_decay substring is "LayerNorm.weight": BERT-named
    # norms are exempt, the CLIP ViT's ln_* norm weights ARE decayed
    # (oracle: tests/test_ref_oracle_optim.py)
    assert dm["LayerNorm"]["scale"] is False and dm["LayerNorm"]["bias"] is False
    assert dm["ln_1"]["scale"] is True and dm["ln_1"]["bias"] is False
    assert dm["head"]["text_decoder/predictions_bias"] is False
    assert dm["emb"]["embedding"] is True


def test_threshold_reset_single_compile_across_targets(setup):
    """A moving AGP schedule must NOT retrigger compilation: the target is a
    traced scalar (VERDICT r1 item 6; compiles through the axon tunnel cost
    minutes)."""
    config, model, params, jb = setup
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=10,
                                       warmup_steps=1)
    state, _ = mplug_train.init_state(model, params, cfg,
                                      jax.random.PRNGKey(1), masker=masker)
    reset = mplug_train.make_threshold_reset(masker)
    outs = {}
    for t in (0.1, 0.3, 0.5, 0.62):
        outs[t] = reset(state, t)
    assert reset._reset_target._cache_size() == 1
    # and the traced target is semantically live: different targets,
    # different achieved sparsity
    for t in (0.1, 0.5):
        rep = jax.device_get(masker.sparsity_report(
            outs[t].scores, outs[t].thresholds))
        assert abs(float(rep["all"]) - t) < 0.03


def test_distill_mask_train_step(setup):
    """--distill wiring: momentum twins produce soft labels that mix into the
    loss at weight alpha (model_vqa_mplug.py:84-116, modeling_mplug.py:
    1915-1917). params_m must influence the loss and EMA toward params."""
    config, model, params, jb = setup
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=10,
                                       warmup_steps=1, distill=True,
                                       alpha=0.4, alpha_warmup_steps=0)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(1), masker=masker)
    assert state.params_m is not None
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)

    def copy_state(s):  # the step donates its state arg
        return jax.tree_util.tree_map(jnp.copy, s)

    # perturbing params_m changes the loss -> twins are live in the graph
    bumped = jax.tree_util.tree_map(lambda x: x + 0.05, state.params_m)
    state_b = copy_state(state).replace(
        params_m=jax.tree_util.tree_map(jnp.copy, bumped))
    state1, loss_distill = step(copy_state(state), jb)
    _, loss_bumped = step(state_b, jb)
    assert abs(float(loss_distill) - float(loss_bumped)) > 1e-6

    # alpha=0 config gives the pure-CE loss (distinct from the mixed loss)
    cfg0 = dataclasses_replace(cfg, alpha=0.0)
    step0 = mplug_train.make_train_step(model, cfg0, tx, masker=masker)
    _, loss_ce = step0(copy_state(state), jb)
    assert abs(float(loss_ce) - float(loss_distill)) > 1e-6


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)


def test_rank_answers_topk_matches_full(setup):
    """With k = n_answers the shortlist is the whole list, so the re-ranked
    best answer must equal the argmax of the dense chain-rule score
    log p(first) - full_loss; and shapes hold at k<n."""
    config, model, params, jb = setup
    n_ans, al = 12, 5
    rng = np.random.RandomState(7)
    v = config.bert.vocab_size
    alist = rng.randint(2, v, (n_ans, al)).astype(np.int32)
    alist[:, 0] = 1  # shared bos
    amask = np.ones((n_ans, al), np.float32)
    args = (jnp.asarray(jb["images"]), jb["question_ids"], jb["question_mask"],
            jnp.asarray(alist), jnp.asarray(amask))

    ids_full, probs_full = model.apply({"params": params}, *args, k=n_ans,
                                       method=model.rank_answers_topk)
    # dense reference: chain-rule score per candidate
    losses = model.apply({"params": params}, *args, method=model.rank_answers)
    # recompute first-token probs exactly as rank_answers_topk does
    states, state_mask = model.apply(
        {"params": params}, jnp.asarray(jb["images"]), jb["question_ids"],
        jb["question_mask"], method=model.encode)
    start = model.apply({"params": params},
                        jnp.full((states.shape[0], 1), int(alist[0, 0]), jnp.int32),
                        jnp.ones((states.shape[0], 1), jnp.float32),
                        states, state_mask, method=model.decode_logits)
    pf = jax.nn.softmax(start[:, 0, :], axis=-1)[:, alist[:, 1]]
    dense_score = jnp.log(pf) - losses
    np.testing.assert_array_equal(np.asarray(ids_full[:, 0]),
                                  np.asarray(dense_score.argmax(axis=1)))

    ids_k, probs_k = model.apply({"params": params}, *args, k=4,
                                 method=model.rank_answers_topk)
    assert ids_k.shape == (states.shape[0], 4)
    assert np.all(np.asarray(probs_k)[:, 0] >= np.asarray(probs_k)[:, -1])


def test_mask_classifier_spec_momentum_only(setup):
    """mask_classifier adds exactly one momentum-only spec targeting the
    twin's LM-head transform dense (vqa_mplug.py:116-117); apply_masks must
    skip it on the live tree and apply it on the twin tree."""
    config, model, params, jb = setup
    c = config.bert
    kw = dict(vit_layers=config.vit.layers,
              text_encoder_layers=c.text_encoder_layers,
              fusion_layers=c.fusion_layers,
              decoder_layers=c.text_decode_layers,
              stride_layer=c.stride_layer)
    base = mplug_mask_specs(**kw)
    specs = mplug_mask_specs(mask_classifier=True, **kw)
    assert len(specs) == len(base) + 1
    extra = specs[-1]
    assert extra.momentum_only
    assert extra.torch_name == "text_decoder_m.cls.predictions.transform.dense"

    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    scores, thresholds = jax.jit(masker.init)(params)
    live = masker.apply_masks(params, scores, thresholds)
    twin = masker.apply_masks(params, scores, thresholds, momentum_tree=True)
    w = np.asarray(params["text_decoder"]["predictions_transform_dense"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(live["text_decoder"]["predictions_transform_dense"]["kernel"]), w)
    tw = np.asarray(twin["text_decoder"]["predictions_transform_dense"]["kernel"])
    assert (tw == 0).mean() > 0.3  # masked on the twin tree


def test_mplug_forward_with_fused_attention(setup):
    """--fused_attention is exposed on the mPLUG CLI: the kernel engages on
    the short text towers (shape guard permitting) while the 577-patch image
    cross-attention AND the causal decoder self-attention ([B,1,L,L] bias,
    query-dependent) fall back to XLA. Compares full decoder LOGITS — a
    scalar-loss comparison at random init is ~log(V) regardless of the
    attention pattern and missed a broken causal mask (review finding)."""
    from crvqa_tpu.models import layers

    config, model, params, jb = setup
    args = (jb["images"], jb["question_ids"], jb["question_mask"],
            jb["answer_ids"], jb["answer_mask"])
    ref = np.asarray(model.apply({"params": params}, *args,
                                 deterministic=True,
                                 method=model.answer_logits))
    layers.FUSED_ATTENTION = True
    layers.FUSED_ATTENTION_INTERPRET = True
    try:
        out = np.asarray(model.apply({"params": params}, *args,
                                     deterministic=True,
                                     method=model.answer_logits))
    finally:
        layers.FUSED_ATTENTION = False
        layers.FUSED_ATTENTION_INTERPRET = False
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_use_remat_trains_and_matches(setup):
    """Activation checkpointing (`use_remat` on the BERT towers AND the
    ViT — the DeepSpeed partition_activations analogue, ds_config.json:12-16)
    must trace under jit with dropout (deterministic is a static remat arg;
    a traced bool was a latent TracerBoolConversionError) and reproduce the
    non-remat loss exactly."""
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig
    from crvqa_tpu.models.mplug.bert import MPlugBertConfig
    from crvqa_tpu.models.mplug.vit import ViTConfig

    config, model, params, jb = setup
    cfg_r = MPlugConfig(bert=MPlugBertConfig.tiny(use_remat=True),
                        vit=ViTConfig.tiny(use_remat=True))
    model_r = MPlug(cfg_r)
    args = (jb["images"], jb["question_ids"], jb["question_mask"],
            jb["answer_ids"], jb["answer_mask"], jb["weights"])
    ref = float(model.apply({"params": params}, *args, deterministic=True))
    out = float(model_r.apply({"params": params}, *args, deterministic=True))
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    # jitted train path (dropout rng + grads) must trace
    loss, grads = jax.jit(jax.value_and_grad(
        lambda p, k: model_r.apply({"params": p}, *args, deterministic=False,
                                   rngs={"dropout": k})))(
        params, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_position_sliced_decode_matches_full(setup):
    """Generation with the position-sliced LM head (decode_logits(position=))
    produces identical tokens to the full-logits path — the vocab projection
    is the decode loop's largest matmul and now runs on one row."""
    from crvqa_tpu.models.mplug.generator import beam_generate, greedy_generate

    config, model, params, jb = setup
    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)

    def decode_full(ids, mask, st, st_mask):
        return model.apply({"params": params}, ids, mask, st, st_mask,
                           method=model.decode_logits)

    def decode_sliced(ids, mask, st, st_mask, position=None):
        return model.apply({"params": params}, ids, mask, st, st_mask,
                           position=position, method=model.decode_logits)

    kw = dict(max_len=6, bos=config.bos_token_id % config.bert.vocab_size,
              eos=config.eos_token_id % config.bert.vocab_size)
    g_full = greedy_generate(decode_full, states, state_mask, **kw)
    g_sliced = greedy_generate(decode_sliced, states, state_mask, **kw)
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_sliced))
    b_full = beam_generate(decode_full, states, state_mask, beam_size=3, **kw)
    b_sliced = beam_generate(decode_sliced, states, state_mask, beam_size=3,
                             **kw)
    np.testing.assert_array_equal(np.asarray(b_full[0]),
                                  np.asarray(b_sliced[0]))
    np.testing.assert_allclose(np.asarray(b_full[1]), np.asarray(b_sliced[1]),
                               rtol=1e-6)


def test_self_kv_cache_decode_matches_full(setup):
    """Incremental decoding with per-layer self-attention KV caches
    (decode_logits_step) must produce identical tokens and scores to the
    full-prefix recompute — the cache holds exactly the rows the full pass
    would recompute, and beam reorders carry the parent's cache."""
    from crvqa_tpu.models.mplug.generator import (
        beam_generate,
        greedy_generate,
        init_self_caches,
    )

    config, model, params, jb = setup
    c = config.bert
    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)

    def decode_full(ids, mask, st, st_mask):
        return model.apply({"params": params}, ids, mask, st, st_mask,
                           method=model.decode_logits)

    def decode_step(ids, st, st_mask, position, caches):
        return model.apply({"params": params}, ids, st, st_mask, position,
                           caches, method=model.decode_logits_step)

    max_len, w = 6, 3
    b = states.shape[0]
    kw = dict(max_len=max_len,
              bos=config.bos_token_id % c.vocab_size,
              eos=config.eos_token_id % c.vocab_size)
    mk = lambda n: init_self_caches(n, c.text_decode_layers, max_len,
                                    c.num_attention_heads, c.head_size)
    g_full = greedy_generate(decode_full, states, state_mask, **kw)
    g_cached = greedy_generate(decode_full, states, state_mask,
                               decode_step=decode_step, init_caches=mk(b),
                               **kw)
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_cached))

    b_full = beam_generate(decode_full, states, state_mask, beam_size=w, **kw)
    b_cached = beam_generate(decode_full, states, state_mask, beam_size=w,
                             decode_step=decode_step,
                             init_caches=mk(b * w), **kw)
    np.testing.assert_array_equal(np.asarray(b_full[0]),
                                  np.asarray(b_cached[0]))
    np.testing.assert_allclose(np.asarray(b_full[1]), np.asarray(b_cached[1]),
                               rtol=1e-5)
    # the two cache-reorder spellings (one-hot MXU dot vs take_along_axis
    # select) must be BIT-identical — the one-hot dot multiplies each row
    # by exactly 1.0/0.0 and accumulates one nonzero
    b_gather = beam_generate(decode_full, states, state_mask, beam_size=w,
                             decode_step=decode_step, init_caches=mk(b * w),
                             reorder="gather", **kw)
    np.testing.assert_array_equal(np.asarray(b_cached[0]),
                                  np.asarray(b_gather[0]))
    np.testing.assert_array_equal(np.asarray(b_cached[1]),
                                  np.asarray(b_gather[1]))


def test_bf16_lm_head_fp32_logits_and_close(setup):
    """lm_head_dtype=bf16 rounds only the head matmul's OPERANDS: logits
    stay fp32 (fp32 accumulation) and track the fp32 head to bf16 input
    rounding."""
    import dataclasses

    config, model, params, jb = setup
    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)
    ids, mask = jb["answer_ids"][:, 0], jb["answer_mask"][:, 0]
    full = model.apply({"params": params}, ids, mask, states, state_mask,
                       method=model.decode_logits)
    cfg_bf = dataclasses.replace(
        config, bert=dataclasses.replace(config.bert,
                                         lm_head_dtype=jnp.bfloat16))
    model_bf = MPlug(cfg_bf)
    bf = model_bf.apply({"params": params}, ids, mask, states, state_mask,
                        method=model_bf.decode_logits)
    assert bf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(bf), np.asarray(full),
                               rtol=2e-2, atol=2e-2)


def test_generate_step_use_cache_matches(setup):
    """make_generate_step(use_cache=True) — grouped memory + cross-KV +
    self-KV caches composed — matches the uncached path exactly."""
    from crvqa_tpu.train import mplug_train

    config, model, params, jb = setup
    cfg = mplug_train.MPlugTrainConfig(mode="full", total_steps=10,
                                       warmup_steps=1)
    state, _ = mplug_train.init_state(model, params, cfg,
                                      jax.random.PRNGKey(1))
    gen = mplug_train.make_generate_step(model, cfg, beam_size=3, max_len=5)
    gen_c = mplug_train.make_generate_step(model, cfg, beam_size=3, max_len=5,
                                           use_cache=True)
    ids, scores = gen(state, jb)
    ids_c, scores_c = gen_c(state, jb)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_c))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(scores_c),
                               rtol=1e-5)


def test_distill_twin_scores_ema_and_reset(setup):
    """Mask-mode distill EMAs the twins' mask SCORES from the live ones
    (reference `_momentum_update` covers patched modules' weight_mask
    params) and `reset_threshold` re-derives twin thresholds from the
    twins' own scores (maskers.py:689-711)."""
    config, model, params, jb = setup
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=10,
                                       warmup_steps=1, distill=True,
                                       momentum=0.9, alpha=0.4)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(2), masker=masker)
    assert state.scores_m is not None and state.thresholds_m is not None
    key = next(iter(state.scores))
    # twins start as copies
    np.testing.assert_array_equal(np.asarray(state.scores[key]),
                                  np.asarray(state.scores_m[key]))

    # bump the twin scores; one step must EMA them toward the PRE-update
    # live scores at the configured momentum
    bumped = jax.tree_util.tree_map(lambda x: x + 0.25, state.scores_m)
    live0 = jax.tree_util.tree_map(jnp.copy, state.scores)
    state = state.replace(scores_m=bumped)
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    state1, _ = step(jax.tree_util.tree_map(jnp.copy, state), jb)
    expect = 0.9 * (np.asarray(live0[key]) + 0.25) + 0.1 * np.asarray(live0[key])
    np.testing.assert_allclose(np.asarray(state1.scores_m[key]), expect,
                               rtol=1e-6)

    # threshold reset: twin thresholds come from the twin scores — both
    # sides hit the target zero rate on their OWN score tensors
    reset = mplug_train.make_threshold_reset(masker)
    state1 = reset(state1, 0.5)
    for k in (key,):
        sc, th = np.asarray(state1.scores[k]), float(state1.thresholds[k])
        sc_m, th_m = np.asarray(state1.scores_m[k]), float(state1.thresholds_m[k])
        assert abs((sc <= th).mean() - 0.5) < 0.1
        assert abs((sc_m <= th_m).mean() - 0.5) < 0.1
    assert float(state1.thresholds_m[key]) != float(state1.thresholds[key])


def test_epoch_granular_schedule_under_jit():
    """The CLI's default epoch-granular LR driving (timm_epoch_schedule)
    must trace/jit inside the optimizer update — the rehearsals opt into
    step mode via --warmup_steps, so pin the epoch path here. LR values at
    probe steps match the eager schedule."""
    import optax

    cfg = mplug_train.MPlugTrainConfig(
        lr1=3e-5, lr2=5e-6, weight_decay=0.02,
        steps_per_epoch=10, epochs=8, warmup_epochs=4,
        warmup_lr_init=1e-5, sched="cosine", max_grad_norm=1.0)
    tx = mplug_train.make_two_group_adamw(cfg)
    params = {"visual_encoder": {"k": jnp.ones((4,))},
              "body": {"k": jnp.ones((4,))}}
    state = tx.init(params)

    @jax.jit
    def one(state, params):
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, state = tx.update(g, state, params)
        return state, optax.apply_updates(params, updates)

    for _ in range(3):
        state, params = one(state, params)
    assert np.isfinite(np.asarray(params["body"]["k"])).all()

    sched = mplug_train.timm_epoch_schedule(
        "cosine", 3e-5, 4, 8, 1e-6, 10, warmup_lr_init=1e-5)
    # epoch 0 runs at warmup_lr_init (10 steps/epoch < 100 per warmup unit);
    # epoch 5 runs at cosine(t'=4-... e-1+warmup=4+4=8-4=4) of 8
    assert float(sched(0)) == np.float32(1e-5)
    assert float(sched(5)) == np.float32(1e-5)
    import math

    expect = 1e-6 + 0.5 * (3e-5 - 1e-6) * (1 + math.cos(math.pi * 4 / 8))
    assert abs(float(sched(55)) - expect) < 1e-10


def test_mplug_mask_biases_trains(setup):
    """mask_biases=True in the mPLUG mask step: bias-score entries exist,
    are binarized with the module's weight threshold, and receive updates
    through the jitted step."""
    from crvqa_tpu.masking.masker import bias_key

    config, model, params, jb = setup
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft", mask_biases=True)
    # fresh flax biases are ZERO-initialized -> |b| scores would be all-zero
    # masks with vanishing STE grads; give them realistic values
    kb = jax.random.PRNGKey(9)

    def _bump(path, x):
        if path[-1].key == "bias":
            return jax.random.normal(
                jax.random.fold_in(kb, hash(path) % (2**31)), x.shape) * 0.05
        return x

    params = jax.tree_util.tree_map_with_path(_bump, params)
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=10,
                                       warmup_steps=1)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(3), masker=masker)
    bk = bias_key(specs[2])  # a text-tower linear
    assert bk in state.scores
    before = np.asarray(state.scores[bk]).copy()

    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    # two steps: the warmup schedule runs the first update at lr 0
    state, loss = step(state, jb)
    state, loss = step(state, jb)
    assert np.isfinite(float(loss))
    after = np.asarray(state.scores[bk])
    assert not np.array_equal(before, after)  # bias scores actually train


def test_memory_groups_equivalence(setup):
    """The grouped cross-attention (memory_groups=A over UNREPLICATED
    states) must equal the replicate-then-decode formulation exactly:
    key-wise-bias cross attention over a shared memory is invariant to
    batching the A answer rows as one (A*L)-query row group."""
    config, model, params, jb = setup
    b, a, l = jb["answer_ids"].shape
    bound = model.bind({"params": params})
    states, state_mask = bound.encode(
        jb["images"], jb["question_ids"], jb["question_mask"],
        deterministic=True)

    # new path (grouped, what answer_logits now does)
    grouped = bound.text_decoder(
        jb["answer_ids"].reshape(b * a, l),
        jb["answer_mask"].reshape(b * a, l),
        states, state_mask, deterministic=True, memory_groups=a)

    # old path (explicit per-answer memory replication)
    rep = bound.text_decoder(
        jb["answer_ids"].reshape(b * a, l),
        jb["answer_mask"].reshape(b * a, l),
        jnp.repeat(states, a, axis=0), jnp.repeat(state_mask, a, axis=0),
        deterministic=True)

    np.testing.assert_allclose(np.asarray(grouped), np.asarray(rep),
                               rtol=1e-5, atol=1e-5)

    # and the training loss goes through the grouped path unchanged
    loss = bound(jb["images"], jb["question_ids"], jb["question_mask"],
                 jb["answer_ids"], jb["answer_mask"], jb["weights"],
                 deterministic=True)
    assert np.isfinite(float(loss))


def test_grouped_beam_decode_equivalence(setup):
    """make_generate_step's grouped beam decode (unreplicated memory,
    memory_groups=W, grouped cross_kv) must select exactly the sequences and
    scores of the replicate-per-beam formulation."""
    from crvqa_tpu.models.mplug.generator import beam_generate
    from crvqa_tpu.train import mplug_train

    config, model, params, jb = setup
    cfg = mplug_train.MPlugTrainConfig(mode="full", total_steps=10,
                                       warmup_steps=1)
    state, _ = mplug_train.init_state(model, params, cfg,
                                      jax.random.PRNGKey(1))
    gen = mplug_train.make_generate_step(model, cfg, beam_size=3, max_len=5)
    ids_g, scores_g = gen(state, jb)

    states, state_mask = model.apply(
        {"params": params}, jb["images"], jb["question_ids"],
        jb["question_mask"], method=model.encode)

    def decode(i, m, st, sm, position=None):
        return model.apply({"params": params}, i, m, st, sm,
                           position=position, method=model.decode_logits)

    c = model.config
    ids_r, scores_r = beam_generate(
        decode, states, state_mask, beam_size=3, max_len=5,
        bos=c.bos_token_id, eos=c.eos_token_id, pad=c.pad_token_id)
    np.testing.assert_array_equal(np.asarray(ids_g), np.asarray(ids_r))
    np.testing.assert_allclose(np.asarray(scores_g), np.asarray(scores_r),
                               rtol=1e-4, atol=1e-5)


def test_build_model_applies_common_dropout_overrides():
    """The common parity-alignment flags must ACT on the mPLUG configs
    (rehearsals run with dropout 0 / no shuffle); silently parsing them
    would let a step-paired comparison never match with no error."""
    import pytest

    from crvqa_tpu.cli import vqa_mplug

    p = vqa_mplug.build_parser()
    base = ["--output_dir", "/tmp/x", "--tiny", "--synthetic", "8"]
    args = p.parse_args(base + ["--hidden_dropout_prob", "0.0",
                                "--attention_probs_dropout_prob", "0.0"])
    config, _, _ = vqa_mplug.build_model(args)
    assert config.bert.hidden_dropout_prob == 0.0
    assert config.bert.attention_probs_dropout_prob == 0.0
    assert config.vit.attn_dropout == 0.0

    # defaults untouched when the flags are absent
    config2, _, _ = vqa_mplug.build_model(p.parse_args(base))
    assert config2.bert.hidden_dropout_prob == 0.1
    assert config2.vit.attn_dropout == 0.1

    # classifier_dropout has no mPLUG surface -> explicit rejection
    with pytest.raises(SystemExit):
        vqa_mplug.build_model(
            p.parse_args(base + ["--classifier_dropout", "0.1"]))
