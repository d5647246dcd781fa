"""VisualBERT in flax — the single-stream uniform-sparsity model family.

Re-design of `hg_transformers/modeling_visualbert.py`
(VisualBertForMultipleChoice: 1021; VisualBertEmbeddings incl.
visual_projection: 77-205): text embeddings (word + position + token type)
concatenated with projected visual features (+ visual token-type + a constant
visual position-0 embedding), one shared LayerNorm over the combined
sequence, then a single 12-layer BERT stack and a first-token pooler feeding
SimpleClassifier. The stage-2 trainer calls it with only
(input_ids, visual_embeds) (`mask_trainer_visualBERT_VQA.py:820`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .classifier import SimpleClassifier
from .layers import PadFrozenEmbed, TransformerLayer, extend_attention_mask


@dataclasses.dataclass(frozen=True)
class VisualBertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    # SimpleClassifier head dropout (reference hardcodes 0.5,
    # modeling_visualbert.py:1028-1029); see LxmertConfig.classifier_dropout
    classifier_dropout: float = 0.5
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    visual_embedding_dim: int = 2048
    ans_num: int = 2274
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-12
    dtype: Any = jnp.float32
    # Structurally-compacted stack (masking/compaction.py): VisualBERT is the
    # model HF `prune_heads`/`prune_ffns` actually dispatches to in the
    # reference (BertModel._prune_heads walks `encoder.layer`,
    # modeling_bert.py:677-693). None = dense.
    compact_num_heads: Optional[int] = None
    compact_intermediate_size: Optional[int] = None

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "VisualBertConfig":
        base = dict(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=64,
                    max_position_embeddings=32, visual_embedding_dim=16,
                    ans_num=16)
        base.update(kw)
        return cls(**base)


class VisualBertEmbeddings(nn.Module):
    """Text + visual embedding fusion (modeling_visualbert.py:77-205)."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, input_ids, visual_embeds, token_type_ids=None,
                 visual_token_type_ids=None, deterministic=True):
        c = self.config
        emb_init = nn.initializers.normal(stddev=c.initializer_range)
        # padding_idx=0 grad semantics on the word table only
        # (modeling_visualbert.py:82) — layers.PadFrozenEmbed
        word = PadFrozenEmbed(
            c.vocab_size, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="word_embeddings")(input_ids)
        seq_len = input_ids.shape[1]
        pos_ids = jnp.arange(seq_len)[None, :]
        pos_table = nn.Embed(c.max_position_embeddings, c.hidden_size,
                             embedding_init=emb_init, param_dtype=jnp.float32,
                             name="position_embeddings")
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=emb_init,
                       param_dtype=jnp.float32, name="token_type_embeddings")(token_type_ids)
        text = word + pos_table(pos_ids) + tok

        # visual branch: projection(2048->768) + token-type(1) + position(0)
        # (modeling_visualbert.py:193-199)
        vis = nn.Dense(c.hidden_size, dtype=jnp.float32,
                       name="visual_projection")(visual_embeds)
        if visual_token_type_ids is None:
            visual_token_type_ids = jnp.ones(vis.shape[:-1], jnp.int32)
        vtok = nn.Embed(c.type_vocab_size, c.hidden_size, embedding_init=emb_init,
                        param_dtype=jnp.float32,
                        name="visual_token_type_embeddings")(visual_token_type_ids)
        vpos_ids = jnp.zeros(vis.shape[:-1], jnp.int32)
        vpos = nn.Embed(c.max_position_embeddings, c.hidden_size,
                        embedding_init=emb_init, param_dtype=jnp.float32,
                        name="visual_position_embeddings")(vpos_ids)
        visual = vis + vpos + vtok

        combined = jnp.concatenate([text, visual], axis=1).astype(c.dtype)
        combined = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                                name="LayerNorm")(combined)
        return nn.Dropout(c.hidden_dropout_prob)(combined,
                                                 deterministic=deterministic)


class VisualBertEncoder(nn.Module):
    config: VisualBertConfig

    @nn.compact
    def __call__(self, h, bias, deterministic=True, collect_hidden=False):
        c = self.config
        layer_kw = dict(num_heads=c.compact_num_heads or c.num_attention_heads,
                        head_size=c.head_size, hidden_size=c.hidden_size,
                        intermediate_size=(c.compact_intermediate_size
                                           or c.intermediate_size),
                        act=c.hidden_act,
                        attn_dropout=c.attention_probs_dropout_prob,
                        hidden_dropout=c.hidden_dropout_prob, dtype=c.dtype)
        hidden = [h]
        for i in range(c.num_hidden_layers):
            h = TransformerLayer(**layer_kw, name=f"layer_{i}")(
                h, bias, deterministic)
            hidden.append(h)
        if collect_hidden:
            return h, hidden
        return h


class VisualBertPooler(nn.Module):
    config: VisualBertConfig

    @nn.compact
    def __call__(self, first_token):
        h = nn.Dense(self.config.hidden_size, dtype=self.config.dtype,
                     name="dense")(first_token)
        return jnp.tanh(h)


class VisualBertModel(nn.Module):
    """Embeddings + encoder + first-token pooler
    (modeling_visualbert.py:687-877)."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, input_ids, visual_embeds, attention_mask=None,
                 visual_attention_mask=None, token_type_ids=None,
                 deterministic=True, collect_hidden=False):
        c = self.config
        h = VisualBertEmbeddings(c, name="embeddings")(
            input_ids, visual_embeds, token_type_ids,
            deterministic=deterministic)
        if attention_mask is not None:
            if visual_attention_mask is None:
                visual_attention_mask = jnp.ones(visual_embeds.shape[:-1],
                                                 attention_mask.dtype)
            bias = extend_attention_mask(jnp.concatenate(
                [attention_mask, visual_attention_mask], axis=1))
        else:
            bias = None
        out = VisualBertEncoder(c, name="encoder")(
            h, bias, deterministic, collect_hidden=collect_hidden)
        if collect_hidden:
            h, hidden = out
            pooled = VisualBertPooler(c, name="pooler")(h[:, 0])
            return h, pooled, hidden
        h = out
        pooled = VisualBertPooler(c, name="pooler")(h[:, 0])
        return h, pooled


class VisualBertForVQA(nn.Module):
    """`VisualBertForMultipleChoice` (modeling_visualbert.py:1021-1184):
    VisualBertModel + SimpleClassifier head (named 'cls' like the reference;
    the stage-2 trainer saves `model.cls` as the classifier artifact)."""

    config: VisualBertConfig

    @nn.compact
    def __call__(self, input_ids, visual_embeds, attention_mask=None,
                 visual_attention_mask=None, token_type_ids=None,
                 deterministic=True, collect_hidden=False):
        c = self.config
        out = VisualBertModel(c, name="visual_bert")(
            input_ids, visual_embeds, attention_mask, visual_attention_mask,
            token_type_ids, deterministic, collect_hidden=collect_hidden)
        pooled = out[1]
        # the reference drops out the pooled rep before the head
        # (modeling_visualbert.py:1146-1147); LXMERT's equivalent is
        # commented out there (modeling_lxmert.py:346)
        dropped = nn.Dropout(c.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        logits = SimpleClassifier(
            hid_dim=2 * c.hidden_size, out_dim=c.ans_num,
            dropout=c.classifier_dropout, dtype=c.dtype, name="cls",
        )(dropped, deterministic=deterministic)
        if collect_hidden:
            return (logits.astype(jnp.float32), pooled.astype(jnp.float32),
                    out[2])
        return logits.astype(jnp.float32), pooled.astype(jnp.float32)
