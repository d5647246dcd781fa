"""Reference-oracle parity: the four mPLUG towers + the composite VQA loss.

Transplants tiny-config flax params into the ACTUAL reference modules —
`mPLUG/models/clip/model.py:VisualTransformer` (the live visual tower,
`initialize_clip`, `model_vqa_mplug.py:22`), `mPLUG/models/modeling_mplug.py`
BertModel (:981) / FusionModel (:1231, stride layers :445-520) /
BertLMHeadModel (:1804) — and asserts encoder states, fused states,
per-sequence LM losses, and the composite weighted train loss
(`model_vqa_mplug.py:30-117`) match to fp32 noise.

The reference modules import under the pip transformers with the
pytorch_utils shims in ref_oracle.install_mplug(); the clip model file is
loaded directly (its package __init__ needs torchvision, absent here).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.models.mplug.bert import (
    FusionEncoder, MPlugBertConfig, TextDecoder, TextEncoder,
    lm_loss_per_sequence)
from crvqa_tpu.models.mplug.vit import ViTConfig, VisionTransformer

torch = ref_oracle.install_mplug()
clip_model = ref_oracle.load_ref_module("ref_clip_model",
                                        "mPLUG/models/clip/model.py")
mplug_ref = ref_oracle.load_ref_module("ref_modeling_mplug",
                                       "mPLUG/models/modeling_mplug.py")


def _bert_cfg(c: MPlugBertConfig, num_layers: int, **kw):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        vocab_size=c.vocab_size, hidden_size=c.hidden_size,
        num_attention_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        num_hidden_layers=num_layers,
        max_position_embeddings=c.max_position_embeddings,
        hidden_act=c.hidden_act, layer_norm_eps=c.layer_norm_eps,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    cfg.encoder_width = c.hidden_size
    cfg.stride_layer = c.stride_layer
    cfg.fusion_layers = c.fusion_layers
    for k, v in kw.items():
        setattr(cfg, k, v)
    return cfg


def _fusion_dead_params(c):
    """Torch FusionModel params its forward never touches: the sub-start
    layers (FusionEncoder runs start_layer.. only, modeling_mplug.py:633),
    the unused embeddings (encoder_embeds path), and the crossattention
    modules of STRIDE layers (constructed unconditionally at :453 but the
    stride branch never calls them, :496-508)."""
    dead = [f"encoder.layer.{i}." for i in range(c.text_encoder_layers)]
    for rel in range(c.fusion_layers):
        if rel != 0 and rel % c.stride_layer == 0:
            dead.append(
                f"encoder.layer.{c.text_encoder_layers + rel}.crossattention.")
    return tuple(dead) + ("position_ids", "embeddings.")


def _remap(sd, rules):
    out = {}
    for k, v in sd.items():
        for a, b in rules:
            if k.startswith(a):
                k = b + k[len(a):]
                break
        out[k] = v
    return out


def _load(tm, flax_params, rules, allow_missing=("position_ids",)):
    from crvqa_tpu.core.torch_compat import flax_to_torch_state_dict

    sd = _remap(flax_to_torch_state_dict(flax_params), rules)
    sd = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
          for k, v in sd.items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, f"unmapped: {sorted(unexpected)[:8]}"
    leftover = [m for m in missing
                if not any(s in m for s in allow_missing)]
    assert not leftover, f"uncovered: {sorted(leftover)[:8]}"
    tm.eval()
    return tm


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    b, seq = 2, 6
    c = MPlugBertConfig.tiny(fusion_layers=3, stride_layer=2)
    ids = rng.integers(1, c.vocab_size, (b, seq)).astype(np.int32)
    mask = np.ones((b, seq), np.float32)
    mask[:, -2:] = 0.0
    return c, ids, mask, rng


def test_text_encoder_oracle(data):
    c, ids, mask, _ = data
    model = TextEncoder(c)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                        jnp.asarray(mask))["params"]
    ours = model.apply({"params": params}, jnp.asarray(ids),
                       jnp.asarray(mask), deterministic=True)

    tm = mplug_ref.BertModel(_bert_cfg(c, c.text_encoder_layers),
                             add_pooling_layer=False)
    _load(tm, params, [("layer.", "encoder.layer.")])
    with torch.no_grad():
        ref = tm(torch.from_numpy(ids).long(),
                 attention_mask=torch.from_numpy(mask),
                 return_dict=True).last_hidden_state
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_fusion_encoder_oracle(data):
    """Fusion layers 2..4 with a live STRIDE layer at relative index 2
    (joint self-attention + residual image update,
    modeling_mplug.py:496-520,681-683)."""
    c, ids, mask, rng = data
    b, seq = ids.shape
    n_img = 5
    text_embeds = rng.normal(size=(b, seq, c.hidden_size)).astype(np.float32)
    image_embeds = rng.normal(size=(b, n_img, c.hidden_size)).astype(np.float32)

    model = FusionEncoder(c)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(text_embeds),
                        jnp.asarray(mask), jnp.asarray(image_embeds))["params"]
    img_out, txt_out = model.apply(
        {"params": params}, jnp.asarray(text_embeds), jnp.asarray(mask),
        jnp.asarray(image_embeds),
        jnp.ones((b, n_img), jnp.float32), deterministic=True)

    total = c.text_encoder_layers + c.fusion_layers
    tm = mplug_ref.FusionModel(_bert_cfg(c, total), add_pooling_layer=False)
    _load(tm, params, [("layer.", "encoder.layer.")],
          allow_missing=_fusion_dead_params(c))
    with torch.no_grad():
        ref_img, ref_txt = tm(
            encoder_embeds=torch.from_numpy(text_embeds),
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=torch.from_numpy(image_embeds),
            encoder_attention_mask=torch.ones(b, n_img),
            return_dict=False)
    np.testing.assert_allclose(np.asarray(img_out), ref_img.numpy(),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(txt_out), ref_txt.numpy(),
                               rtol=2e-5, atol=2e-5)


def _decoder_pair(c, rng):
    b, l, n_mem = 3, 5, 4
    ans = rng.integers(3, c.vocab_size, (b, l)).astype(np.int32)
    ans[:, -1] = 0  # pad tail
    amask = (ans != 0).astype(np.float32)
    states = rng.normal(size=(b, n_mem, c.hidden_size)).astype(np.float32)
    smask = np.ones((b, n_mem), np.float32)

    model = TextDecoder(c)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(ans),
                        jnp.asarray(amask), jnp.asarray(states),
                        jnp.asarray(smask))["params"]

    dec_cfg = _bert_cfg(c, c.text_decode_layers,
                        add_cross_attention=True, is_decoder=True)
    tm = mplug_ref.BertLMHeadModel(dec_cfg)
    _load(tm, params, [
        ("embeddings.", "bert.embeddings."),
        ("layer.", "bert.encoder.layer."),
        ("predictions_transform_dense.", "cls.predictions.transform.dense."),
        ("predictions_transform_LayerNorm.",
         "cls.predictions.transform.LayerNorm."),
        ("predictions_bias", "cls.predictions.bias"),
    ], allow_missing=("position_ids", "cls.predictions.decoder"))
    with torch.no_grad():  # tie the decoder to the word embeddings
        tm.cls.predictions.decoder.weight.copy_(
            tm.bert.embeddings.word_embeddings.weight)
        tm.cls.predictions.decoder.bias.copy_(
            torch.from_numpy(np.asarray(params["predictions_bias"])))
    return model, params, tm, (ans, amask, states, smask)


def test_decoder_logits_and_lm_loss_oracle(data):
    c, _, _, rng = data
    model, params, tm, (ans, amask, states, smask) = _decoder_pair(c, rng)

    logits = model.apply({"params": params}, jnp.asarray(ans),
                         jnp.asarray(amask), jnp.asarray(states),
                         jnp.asarray(smask), deterministic=True)
    ours_loss = lm_loss_per_sequence(logits, jnp.asarray(ans), pad_id=0)

    labels = torch.from_numpy(ans).long().masked_fill(
        torch.from_numpy(ans == 0), -100)
    with torch.no_grad():
        out = tm(torch.from_numpy(ans).long(),
                 attention_mask=torch.from_numpy(amask),
                 encoder_hidden_states=torch.from_numpy(states),
                 encoder_attention_mask=torch.from_numpy(smask),
                 labels=labels, return_dict=True, reduction="none",
                 is_decoder=True)
    np.testing.assert_allclose(np.asarray(logits), out.logits.numpy(),
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(ours_loss), out.loss.numpy(),
                               rtol=3e-5, atol=3e-5)


def test_vit_tower_oracle():
    """CLIP VisualTransformer with skip_last_layer=True
    (clip/model.py:229-249) — conv patch embed orientation, packed
    in_proj q/k/v split, QuickGELU, ln_post."""
    c = ViTConfig.tiny()
    model = VisionTransformer(c)
    rng = np.random.default_rng(4)
    imgs = rng.normal(size=(2, c.image_res, c.image_res, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(imgs))["params"]
    ours = model.apply({"params": params}, jnp.asarray(imgs),
                       deterministic=True)

    tm = clip_model.VisualTransformer(
        input_resolution=c.image_res, patch_size=c.patch_size, width=c.width,
        layers=c.layers, heads=c.heads, output_dim=16)
    _load_vit(tm, params, c)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))),
                 skip_last_layer=True, use_checkpoint=False)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=3e-5, atol=3e-5)


def test_mplug_composite_train_loss_oracle(data):
    """The full weighted k-expansion train loss (`model_vqa_mplug.py:40-117`,
    incl. the (1-bias) debias reweighting) on transplanted towers, with our
    static answer-slot layout vs the reference's per-question Python
    replication."""
    from crvqa_tpu.models.mplug.mplug import MPlug, MPlugConfig

    c, ids, mask, rng = data
    vit_c = ViTConfig.tiny()
    cfg = MPlugConfig(bert=c, vit=vit_c)
    model = MPlug(cfg)
    b, a, l = ids.shape[0], 2, 5
    imgs = rng.normal(size=(b, vit_c.image_res, vit_c.image_res, 3)
                      ).astype(np.float32)
    answers = rng.integers(3, c.vocab_size, (b, a, l)).astype(np.int32)
    answers[:, :, -1] = 0
    amask = (answers != 0).astype(np.float32)
    # question 0 has 2 live answers, question 1 has 1 (slot padded w/ w=0)
    weights = np.array([[0.7, 0.3], [1.0, 0.0]], np.float32)
    bias = np.array([[0.2, 0.5], [0.4, 0.9]], np.float32)

    jargs = dict(images=jnp.asarray(imgs), question_ids=jnp.asarray(ids),
                 question_mask=jnp.asarray(mask),
                 answer_ids=jnp.asarray(answers),
                 answer_mask=jnp.asarray(amask),
                 weights=jnp.asarray(weights))
    variables = model.init(jax.random.PRNGKey(5), **jargs)
    params = variables["params"]
    ours = model.apply({"params": params}, **jargs, bias=jnp.asarray(bias),
                       deterministic=True)

    # --- reference composition (model_vqa_mplug.forward train=True) ---
    vt = clip_model.VisualTransformer(
        input_resolution=vit_c.image_res, patch_size=vit_c.patch_size,
        width=vit_c.width, layers=vit_c.layers, heads=vit_c.heads,
        output_dim=16)
    # reuse the ViT transplant from test_vit_tower_oracle via a tiny helper
    _load_vit(vt, params["visual_encoder"], vit_c)
    te = mplug_ref.BertModel(_bert_cfg(c, c.text_encoder_layers),
                             add_pooling_layer=False)
    _load(te, params["text_encoder"], [("layer.", "encoder.layer.")])
    fu = mplug_ref.FusionModel(
        _bert_cfg(c, c.text_encoder_layers + c.fusion_layers),
        add_pooling_layer=False)
    _load(fu, params["fusion_encoder"], [("layer.", "encoder.layer.")],
          allow_missing=_fusion_dead_params(c))
    dec_cfg = _bert_cfg(c, c.text_decode_layers, add_cross_attention=True,
                        is_decoder=True)
    de = mplug_ref.BertLMHeadModel(dec_cfg)
    _load(de, params["text_decoder"], [
        ("embeddings.", "bert.embeddings."),
        ("layer.", "bert.encoder.layer."),
        ("predictions_transform_dense.", "cls.predictions.transform.dense."),
        ("predictions_transform_LayerNorm.",
         "cls.predictions.transform.LayerNorm."),
        ("predictions_bias", "cls.predictions.bias"),
    ], allow_missing=("position_ids", "cls.predictions.decoder"))
    with torch.no_grad():
        de.cls.predictions.decoder.weight.copy_(
            de.bert.embeddings.word_embeddings.weight)
        de.cls.predictions.decoder.bias.copy_(torch.from_numpy(
            np.asarray(params["text_decoder"]["predictions_bias"])))

    k = [2, 1]  # live answers per question
    flat = [(q, s) for q in range(b) for s in range(k[q])]
    t_ans = torch.from_numpy(
        np.stack([answers[q, s] for q, s in flat])).long()
    t_amask = torch.from_numpy(np.stack([amask[q, s] for q, s in flat]))
    t_w = torch.from_numpy(np.array([weights[q, s] for q, s in flat]))
    t_bias = torch.from_numpy(np.array([bias[q, s] for q, s in flat]))

    with torch.no_grad():
        image_embeds = vt(torch.from_numpy(np.transpose(imgs, (0, 3, 1, 2))),
                          skip_last_layer=True, use_checkpoint=False)
        image_atts = torch.ones(image_embeds.size()[:-1], dtype=torch.long)
        text_embeds = te(torch.from_numpy(ids).long(),
                         attention_mask=torch.from_numpy(mask),
                         return_dict=True).last_hidden_state
        image_out, question_out = fu(
            encoder_embeds=text_embeds,
            attention_mask=torch.from_numpy(mask),
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=image_atts, return_dict=False)
        question_output = torch.cat([image_out, question_out], 1)
        merge_atts = torch.cat([image_atts.float(),
                                torch.from_numpy(mask)], 1)
        q_states = torch.stack(
            [question_output[q] for q, _ in flat], 0)
        q_atts = torch.stack([merge_atts[q] for q, _ in flat], 0)
        targets = t_ans.masked_fill(t_ans == 0, -100)
        out = de(t_ans, attention_mask=t_amask,
                 encoder_hidden_states=q_states,
                 encoder_attention_mask=q_atts, labels=targets,
                 return_dict=True, reduction="none", is_decoder=True)
        ref_loss = ((1 - t_bias) * (t_w * out.loss)).sum() / b

    np.testing.assert_allclose(float(ours), float(ref_loss),
                               rtol=5e-5, atol=5e-5)


def _load_vit(vt, params, c):
    sd = {
        "conv1.weight": np.transpose(
            np.asarray(params["conv1"]["kernel"]), (3, 2, 0, 1)),
        "class_embedding": np.asarray(params["class_embedding"]),
        "positional_embedding": np.asarray(params["positional_embedding"]),
        "ln_pre.weight": np.asarray(params["ln_pre"]["scale"]),
        "ln_pre.bias": np.asarray(params["ln_pre"]["bias"]),
        "ln_post.weight": np.asarray(params["ln_post"]["scale"]),
        "ln_post.bias": np.asarray(params["ln_post"]["bias"]),
        "proj": np.zeros((c.width, 16), np.float32),
    }
    for i in range(c.layers):
        p = params[f"resblocks_{i}"]
        pre = f"transformer.resblocks.{i}."
        sd[pre + "attn.in_proj_weight"] = np.asarray(
            p["attn_in_proj"]["kernel"]).T
        sd[pre + "attn.in_proj_bias"] = np.asarray(p["attn_in_proj"]["bias"])
        sd[pre + "attn.out_proj.weight"] = np.asarray(
            p["attn_out_proj"]["kernel"]).T
        sd[pre + "attn.out_proj.bias"] = np.asarray(p["attn_out_proj"]["bias"])
        sd[pre + "ln_1.weight"] = np.asarray(p["ln_1"]["scale"])
        sd[pre + "ln_1.bias"] = np.asarray(p["ln_1"]["bias"])
        sd[pre + "ln_2.weight"] = np.asarray(p["ln_2"]["scale"])
        sd[pre + "ln_2.bias"] = np.asarray(p["ln_2"]["bias"])
        sd[pre + "mlp.c_fc.weight"] = np.asarray(p["mlp_c_fc"]["kernel"]).T
        sd[pre + "mlp.c_fc.bias"] = np.asarray(p["mlp_c_fc"]["bias"])
        sd[pre + "mlp.c_proj.weight"] = np.asarray(p["mlp_c_proj"]["kernel"]).T
        sd[pre + "mlp.c_proj.bias"] = np.asarray(p["mlp_c_proj"]["bias"])
    vt.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    vt.eval()
