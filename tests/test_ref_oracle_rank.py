"""Reference-oracle parity: the mPLUG answer re-ranking.

Runs the ACTUAL `MPLUG.rank_answer` (`mPLUG/models/model_vqa_mplug.py:
188-245`) unbound on a namespace holding the reference BertLMHeadModel
(transplanted from our flax decoder params) and the pad id, on shared fused
states — and asserts `MPlug.rank_answers_from_states` returns the same
shortlist ids, the same re-ranked order, and the same re-ranked
probabilities. This covers the first-token softmax shortlist, the
chain-rule log-prob combination (including the reference's double count of
the first answer token), and the final softmax/topk.
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ref_oracle

from crvqa_tpu.models.mplug.bert import MPlugBertConfig, TextDecoder

torch = ref_oracle.install_mplug_package()

from models import model_vqa_mplug  # noqa: E402  (reference package)

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


def _torch_decoder(c, params):
    from crvqa_tpu.core.torch_compat import flax_to_torch_state_dict

    dec_cfg = _bert_cfg(c, c.text_decode_layers, add_cross_attention=True,
                        is_decoder=True)
    tm = mplug_ref.BertLMHeadModel(dec_cfg)
    rules = [
        ("embeddings.", "bert.embeddings."),
        ("layer.", "bert.encoder.layer."),
        ("predictions_transform_dense.", "cls.predictions.transform.dense."),
        ("predictions_transform_LayerNorm.",
         "cls.predictions.transform.LayerNorm."),
        ("predictions_bias", "cls.predictions.bias"),
    ]
    sd = {}
    for k, v in flax_to_torch_state_dict(params).items():
        for a, b in rules:
            if k.startswith(a):
                k = b + k[len(a):]
                break
        sd[k] = torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, sorted(unexpected)[:8]
    leftover = [m for m in missing
                if "position_ids" not in m and "cls.predictions.decoder" not in m]
    assert not leftover, sorted(leftover)[:8]
    with torch.no_grad():
        tm.cls.predictions.decoder.weight.copy_(
            tm.bert.embeddings.word_embeddings.weight)
        tm.cls.predictions.decoder.bias.copy_(
            torch.from_numpy(np.asarray(params["predictions_bias"])))
    tm.eval()
    return tm


def test_rank_answer_oracle():
    rng = np.random.default_rng(11)
    c = MPlugBertConfig.tiny(fusion_layers=3, stride_layer=2)
    b, n_mem, n_ans, l, k = 3, 4, 8, 5, 4

    # candidate answer list: bos + distinct-ish first tokens + pad tails
    ans = rng.integers(3, c.vocab_size, (n_ans, l)).astype(np.int32)
    ans[:, 0] = 2  # shared bos (answer_ids[0,0] in the reference)
    ans[:, -1] = 0
    ans[::2, -2] = 0  # varied lengths
    amask = (ans != 0).astype(np.float32)

    states = rng.normal(size=(b, n_mem, c.hidden_size)).astype(np.float32)
    smask = np.ones((b, n_mem), np.float32)

    model = TextDecoder(c)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(ans),
                        jnp.asarray(amask),
                        jnp.asarray(np.repeat(states[:1], n_ans, 0)),
                        jnp.asarray(np.ones((n_ans, n_mem), np.float32))
                        )["params"]
    tm = _torch_decoder(c, params)

    # --- reference: the real MPLUG.rank_answer, unbound ---
    ns = types.SimpleNamespace(
        text_decoder=tm,
        tokenizer=types.SimpleNamespace(pad_token_id=0))
    with torch.no_grad():
        ref_ids, ref_probs = model_vqa_mplug.MPLUG.rank_answer(
            ns, torch.from_numpy(states), torch.from_numpy(smask),
            torch.from_numpy(ans).long(), torch.from_numpy(amask), k)

    # --- ours: rank_answers_from_states on a decoder-only shell ---
    from crvqa_tpu.models.mplug.mplug import MPlug, MPlugConfig

    # bind our decoder into an MPlug shell so the method resolves
    # self.text_decoder / self.config
    import flax.linen as nn

    class _Shell(nn.Module):
        config: MPlugConfig

        def setup(self):
            self.text_decoder = TextDecoder(self.config.bert)

        def rank(self, states, state_mask, ans_ids, ans_mask, k):
            return MPlug.rank_answers_from_states(
                self, states, state_mask, ans_ids, ans_mask, k,
                deterministic=True)

    from crvqa_tpu.models.mplug.vit import ViTConfig

    shell = _Shell(MPlugConfig(bert=c, vit=ViTConfig.tiny()))
    ours_ids, ours_probs = shell.apply(
        {"params": {"text_decoder": params}},
        jnp.asarray(states), jnp.asarray(smask), jnp.asarray(ans),
        jnp.asarray(amask), k, method=_Shell.rank)

    np.testing.assert_array_equal(np.asarray(ours_ids), ref_ids.numpy())
    np.testing.assert_allclose(np.asarray(ours_probs), ref_probs.numpy(),
                               rtol=3e-5, atol=3e-5)
    assert np.asarray(ours_probs).shape == (b, k)
    # non-degenerate: re-ranked probs strictly descending (real topk) and a
    # proper sub-distribution over the k shortlisted candidates
    p = np.asarray(ours_probs)
    assert (np.diff(p, axis=1) <= 0).all()
    np.testing.assert_allclose(p.sum(axis=1), 1.0, rtol=1e-5)
