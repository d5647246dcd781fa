"""LXMERT in flax — the stage-1/2/3 workhorse model.

Re-design of `hg_transformers/modeling_lxmert.py` (LxmertForMultipleChoice:
233-360, LxmertModel: 1316-1451, LxmertEncoder: 1041-1120, LxmertXLayer:
922-1011). Canonical config: hidden 768, 12 heads, l/r/x layers = 9/5/5,
visual_feat_dim 2048, visual_pos_dim 4 (`lxmert_config/config.json`).

Layer loops are unrolled (19 small heterogeneous layers) so each layer gets a
stable param path (`encoder/layer_3/...`) that maps onto the reference's
module names for mask.pt interop. Attention softmax runs in fp32; everything
else follows the configured compute dtype (bf16 on TPU by default).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .classifier import SimpleClassifier
from .layers import (
    AttentionOutput,
    CrossAttentionLayer,
    FFNOutput,
    Intermediate,
    PadFrozenEmbed,
    SelfAttentionLayer,
    TransformerLayer,
    extend_attention_mask,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class LxmertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    l_layers: int = 9
    r_layers: int = 5
    x_layers: int = 5
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    # SimpleClassifier head dropout (reference hardcodes 0.5,
    # modeling_lxmert.py:242-243); configurable so oracle/trajectory tests
    # can zero every dropout
    classifier_dropout: float = 0.5
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    visual_feat_dim: int = 2048
    visual_pos_dim: int = 4
    ans_num: int = 2274  # VQA-CP v2 answer vocabulary (train_test_ans2label.pkl)
    initializer_range: float = 0.02
    dtype: Any = jnp.float32
    # Structurally-compacted language branch (masking/compaction.py — the
    # TPU-native analogue of HF prune_heads/prune_ffns used by the
    # reference's stage-3 structured path, run_vqa_stage3.py:307-324).
    # None = dense (num_attention_heads / intermediate_size).
    lang_num_heads: Optional[int] = None
    lang_intermediate_size: Optional[int] = None

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "LxmertConfig":
        """2/1/1-layer config for integration tests (SURVEY.md §4)."""
        base = dict(
            vocab_size=128, hidden_size=32, num_attention_heads=4,
            l_layers=2, r_layers=1, x_layers=1, intermediate_size=64,
            max_position_embeddings=32, visual_feat_dim=16, visual_pos_dim=4,
            ans_num=16,
        )
        base.update(kw)
        return cls(**base)


class LxmertEmbeddings(nn.Module):
    """word + position + token-type embeddings -> LayerNorm -> dropout
    (`LxmertEmbeddings`, modeling_lxmert.py:729-767)."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, deterministic=True):
        c = self.config
        emb_init = nn.initializers.normal(stddev=c.initializer_range)
        # all three tables carry padding_idx=0 grad semantics in the
        # reference (modeling_lxmert.py:734-736) — layers.PadFrozenEmbed
        words = PadFrozenEmbed(
            c.vocab_size, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        seq_len = input_ids.shape[1]
        pos_ids = jnp.arange(seq_len)[None, :]
        pos = PadFrozenEmbed(c.max_position_embeddings, c.hidden_size,
                             embedding_init=emb_init, param_dtype=jnp.float32,
                             name="position_embeddings")(pos_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = PadFrozenEmbed(
            c.type_vocab_size, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="token_type_embeddings")(token_type_ids)
        h = (words + pos + tok).astype(c.dtype)
        h = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="LayerNorm")(h)
        return nn.Dropout(c.hidden_dropout_prob)(h, deterministic=deterministic)


class LxmertVisualFeatureEncoder(nn.Module):
    """(visn_fc(feats) + box_fc(pos)) / 2 with per-branch LayerNorms
    (`LxmertVisualFeatureEncoder`, modeling_lxmert.py:1014-1038)."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, visual_feats, visual_pos, deterministic=True):
        c = self.config
        x = nn.Dense(c.hidden_size, dtype=c.dtype, name="visn_fc")(
            visual_feats.astype(c.dtype))
        x = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="visn_layer_norm")(x)
        y = nn.Dense(c.hidden_size, dtype=c.dtype, name="box_fc")(
            visual_pos.astype(c.dtype))
        y = nn.LayerNorm(epsilon=1e-12, dtype=c.dtype, name="box_layer_norm")(y)
        out = (x + y) / 2
        return nn.Dropout(c.hidden_dropout_prob)(out, deterministic=deterministic)


class LxmertXLayer(nn.Module):
    """Cross-modality layer (`LxmertXLayer`, modeling_lxmert.py:922-1011).

    ONE `visual_attention` CrossAttentionLayer serves both directions
    (lang->vis context and vis->lang context) — the flax module instance is
    called twice, sharing params exactly like the reference (:947-958).
    """

    config: LxmertConfig

    @nn.compact
    def __call__(self, lang, lang_bias, visn, visn_bias, deterministic=True):
        c = self.config
        kw = dict(num_heads=c.num_attention_heads, head_size=c.head_size,
                  hidden_size=c.hidden_size,
                  attn_dropout=c.attention_probs_dropout_prob,
                  hidden_dropout=c.hidden_dropout_prob, dtype=c.dtype)
        from . import layers as _layers

        cross = CrossAttentionLayer(**kw, name="visual_attention")
        if _layers.JOINT_CROSS_ATTENTION:
            # one projection set over the [lang; visn] concat; same shared
            # params, half the dispatches (layers.JOINT_CROSS_ATTENTION)
            s = lang.shape[1]
            joint = cross(jnp.concatenate([lang, visn], axis=1), None,
                          deterministic=deterministic, joint_split=s,
                          joint_biases=(lang_bias, visn_bias))
            lang_att, visn_att = joint[:, :s], joint[:, s:]
        else:
            lang_att = cross(lang, visn, visn_bias, deterministic)
            visn_att = cross(visn, lang, lang_bias, deterministic)

        lang_att = SelfAttentionLayer(**kw, name="lang_self_att")(
            lang_att, lang_bias, deterministic)
        visn_att = SelfAttentionLayer(**kw, name="visn_self_att")(
            visn_att, visn_bias, deterministic)

        lang_inter = Intermediate(c.intermediate_size, c.hidden_act, c.dtype,
                                  name="lang_inter")(lang_att)
        visn_inter = Intermediate(c.intermediate_size, c.hidden_act, c.dtype,
                                  name="visn_inter")(visn_att)
        lang_out = FFNOutput(c.hidden_size, c.hidden_dropout_prob, c.dtype,
                             name="lang_output")(lang_inter, lang_att, deterministic)
        visn_out = FFNOutput(c.hidden_size, c.hidden_dropout_prob, c.dtype,
                             name="visn_output")(visn_inter, visn_att, deterministic)
        return lang_out, visn_out


class LxmertEncoder(nn.Module):
    """visn_fc -> 9x lang layers -> 5x visual layers -> 5x cross layers
    (`LxmertEncoder`, modeling_lxmert.py:1041-1120)."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, lang_feats, lang_bias, visual_feats, visual_pos,
                 visn_bias=None, deterministic=True, collect_hidden=False):
        """`collect_hidden=True` additionally returns the language-branch
        hidden-state sequence (embedding output + after every lang/x layer)
        — the `language_hidden_states` tuple of the reference encoder
        (modeling_lxmert.py:1070-1117), consumed by layer-wise KD."""
        c = self.config
        visn = LxmertVisualFeatureEncoder(c, name="visn_fc")(
            visual_feats, visual_pos, deterministic)
        layer_kw = dict(num_heads=c.num_attention_heads, head_size=c.head_size,
                        hidden_size=c.hidden_size,
                        intermediate_size=c.intermediate_size, act=c.hidden_act,
                        attn_dropout=c.attention_probs_dropout_prob,
                        hidden_dropout=c.hidden_dropout_prob, dtype=c.dtype)
        lang_kw = dict(layer_kw)
        if c.lang_num_heads is not None:
            lang_kw["num_heads"] = c.lang_num_heads
        if c.lang_intermediate_size is not None:
            lang_kw["intermediate_size"] = c.lang_intermediate_size
        lang = lang_feats
        hidden = [lang]
        for i in range(c.l_layers):
            lang = TransformerLayer(**lang_kw, name=f"layer_{i}")(
                lang, lang_bias, deterministic)
            hidden.append(lang)
        for i in range(c.r_layers):
            visn = TransformerLayer(**layer_kw, name=f"r_layers_{i}")(
                visn, visn_bias, deterministic)
        for i in range(c.x_layers):
            lang, visn = LxmertXLayer(c, name=f"x_layers_{i}")(
                lang, lang_bias, visn, visn_bias, deterministic)
            hidden.append(lang)
        if collect_hidden:
            return lang, visn, hidden
        return lang, visn


class LxmertPooler(nn.Module):
    """tanh(Dense(h[:, 0])) (`LxmertPooler`, modeling_lxmert.py:1123-1133)."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, hidden):
        first = hidden[:, 0]
        h = nn.Dense(self.config.hidden_size, dtype=self.config.dtype,
                     name="dense")(first)
        return jnp.tanh(h)


class LxmertModel(nn.Module):
    """`LxmertModel` (modeling_lxmert.py:1316-1451): embeddings + encoder +
    pooler, additive -10000 attention masks."""

    config: LxmertConfig

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_attention_mask=None,
                 token_type_ids=None, deterministic=True,
                 collect_hidden=False):
        lang_bias = extend_attention_mask(attention_mask)
        visn_bias = extend_attention_mask(visual_attention_mask)
        emb = LxmertEmbeddings(self.config, name="embeddings")(
            input_ids, token_type_ids, deterministic)
        out = LxmertEncoder(self.config, name="encoder")(
            emb, lang_bias, visual_feats, visual_pos, visn_bias, deterministic,
            collect_hidden=collect_hidden)
        if collect_hidden:
            lang, visn, hidden = out
            pooled = LxmertPooler(self.config, name="pooler")(lang)
            return lang, visn, pooled, hidden
        lang, visn = out
        pooled = LxmertPooler(self.config, name="pooler")(lang)
        return lang, visn, pooled


class LxmertForVQA(nn.Module):
    """`LxmertForMultipleChoice` (modeling_lxmert.py:233-360): LxmertModel +
    SimpleClassifier(768 -> 1536 -> ans_num) on the pooled output.

    Returns (logits, pooled) — the BCE / debias losses are pure functions in
    `crvqa_tpu.losses` applied by the train step, mirroring the trainer-side
    dispatch rather than the in-model loss.
    """

    config: LxmertConfig

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos,
                 attention_mask=None, visual_attention_mask=None,
                 token_type_ids=None, deterministic=True,
                 collect_hidden=False):
        """`collect_hidden=True` returns (logits, pooled, hidden) where
        `hidden` is the language-branch hidden-state list (for layer-wise
        KD, `Stage2Config.kd_mode='layerwise'`)."""
        c = self.config
        out = LxmertModel(c, name="lxmert")(
            input_ids, visual_feats, visual_pos, attention_mask,
            visual_attention_mask, token_type_ids, deterministic,
            collect_hidden=collect_hidden)
        pooled = out[2]
        logits = SimpleClassifier(
            hid_dim=2 * c.hidden_size, out_dim=c.ans_num,
            dropout=c.classifier_dropout, dtype=c.dtype, name="classifier",
        )(pooled, deterministic=deterministic)
        if collect_hidden:
            return (logits.astype(jnp.float32), pooled.astype(jnp.float32),
                    out[3])
        return logits.astype(jnp.float32), pooled.astype(jnp.float32)
