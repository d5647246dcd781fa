"""mPLUG's custom BERT stack in flax: text encoder, stride fusion encoder,
causal LM decoder.

Re-design of `mPLUG/models/modeling_mplug.py`:
- `BertModel` (:981) — 6-layer self-attention text encoder.
- `FusionModel` (:1231, FusionEncoder :600-686, FusionLayer :445-520) —
  layers 6..11 of a 12-layer stack; non-stride layers do text self-attn +
  text->image cross-attn; every `stride_layer`-th layer instead does ONE
  joint self-attention over the concat [image; text] and the image stream is
  updated residually from the split output.
- `BertLMHeadModel` (:1804) — 12-layer causal decoder with cross-attention
  to the fused states and a tied-embedding LM head; per-sequence summed
  next-token CE with -100 padding masking (:1904-1916) and optional
  soft-label distillation (:1915-1916).

Config: `mPLUG/configs/config_bert_stride3.json` (text_encoder_layers 6,
fusion_layers 6, text_decode_layers 12, stride_layer 3, hidden 768).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import layers
from ..layers import (
    AttentionOutput,
    FFNOutput,
    Intermediate,
    MultiHeadAttention,
    extend_attention_mask,
)


@dataclasses.dataclass(frozen=True)
class MPlugBertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    text_encoder_layers: int = 6
    fusion_layers: int = 6
    text_decode_layers: int = 12
    stride_layer: int = 3
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    initializer_range: float = 0.02
    dtype: Any = jnp.float32
    # activation checkpointing (the reference's `use_checkpoint` +
    # DeepSpeed partition_activations, mPLUG/configs/ds_config.json:12-16,
    # model_vqa_mplug.py:149) -> flax nn.remat on each layer
    use_remat: bool = False
    # tied-LM-head matmul dtype. None = fp32 operands (reference-exact: the
    # torch model runs the whole head in fp32). jnp.bfloat16 rounds the
    # OPERANDS to bf16 but keeps fp32 accumulation + fp32 logits
    # (preferred_element_type) — the decode loop's largest matmul
    # ([N, hidden] @ [hidden, 30522] every step) moves to the bf16 MXU
    # path. Opt-in for the bf16 eval mode; the beam A/B is in
    # benchmarks/bench_generate.py --bf16-head.
    lm_head_dtype: Any = None

    @property
    def head_size(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def tiny(cls, **kw) -> "MPlugBertConfig":
        base = dict(vocab_size=128, hidden_size=32, num_attention_heads=4,
                    intermediate_size=64, text_encoder_layers=2,
                    fusion_layers=2, text_decode_layers=2, stride_layer=2,
                    max_position_embeddings=64)
        base.update(kw)
        return cls(**base)


class BertEmbeddings(nn.Module):
    """word + position + token-type -> LayerNorm -> dropout.

    setup-style so the decoder can tie its LM head to `word_embeddings` via
    `attend` (the flax idiom for HF's tie_word_embeddings).
    """

    config: MPlugBertConfig

    def setup(self):
        c = self.config
        emb_init = nn.initializers.normal(stddev=c.initializer_range)
        # padding_idx=pad_token_id grad semantics on the word table only
        # (modeling_mplug.py:173) — layers.PadFrozenEmbed; `attend` (tied LM
        # head) inherits unfrozen, like torch
        self.word_embeddings = layers.PadFrozenEmbed(
            c.vocab_size, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="word_embeddings",
            pad_idx=c.pad_token_id if hasattr(c, "pad_token_id") else 0)
        self.position_embeddings = nn.Embed(
            c.max_position_embeddings, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, embedding_init=emb_init,
            param_dtype=jnp.float32, name="token_type_embeddings")
        self.layer_norm = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                                       name="LayerNorm")
        self.dropout = nn.Dropout(c.hidden_dropout_prob)

    def __call__(self, input_ids, deterministic=True, position=None):
        """`position` (traced scalar): embed input_ids ([N, 1], the single
        current decode row) at that absolute position instead of 0..L-1 —
        the incremental-decode entry (generator KV cache)."""
        c = self.config
        if position is None:
            pos_ids = jnp.arange(input_ids.shape[1])[None, :]
        else:
            pos_ids = jnp.reshape(position, (1, 1))
        h = (self.word_embeddings(input_ids)
             + self.position_embeddings(pos_ids)
             + self.token_type_embeddings(jnp.zeros_like(input_ids)))
        h = self.layer_norm(h.astype(c.dtype))
        return self.dropout(h, deterministic=deterministic)

    def attend(self, hidden):
        """hidden @ word_embedding_table.T (tied LM head)."""
        return self.word_embeddings.attend(hidden)

    def attend_cast(self, hidden, dtype):
        """Tied LM head with the operands rounded to `dtype` (bf16 MXU
        path) but fp32 accumulation and fp32 logits — the only error vs
        `attend(fp32)` is the input rounding, not the reduction."""
        table = jnp.asarray(self.word_embeddings.embedding).astype(dtype)
        return jax.lax.dot_general(
            hidden.astype(dtype), table,
            (((hidden.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


class BertSelfBlock(nn.Module):
    """attention(self, named 'attention') like the LXMERT SelfAttentionLayer
    but reusable for causal masks via the additive bias."""

    config: MPlugBertConfig

    @nn.compact
    def __call__(self, x, context, bias, deterministic=True, kv=None,
                 self_cache=None, cache_position=None):
        c = self.config
        mha = MultiHeadAttention(
            c.num_attention_heads, c.head_size, c.attention_probs_dropout_prob,
            c.dtype, name="self")
        out = AttentionOutput(
            c.hidden_size, c.hidden_dropout_prob, c.dtype, name="output")
        if self_cache is not None:
            att, new_cache = mha(x, context, bias, deterministic,
                                 self_cache=self_cache,
                                 cache_position=cache_position)
            return out(att, x, deterministic), new_cache
        att = mha(x, context, bias, deterministic, kv=kv)
        return out(att, x, deterministic)


class BertLayer(nn.Module):
    """Self-attn (+optional cross-attn) + FFN (modeling_mplug.py:BertLayer).

    `memory_groups` g > 1: the batch rows come in g-sized groups (question-
    major) sharing one `enc_states` row, which is passed UNREPLICATED with
    batch N/g. The cross-attention reshapes queries (N, L) -> (N/g, g*L) and
    attends the shared memory once — identical math to repeating the memory
    per row (key-wise bias only; every query row sees the full memory), but
    the cross K/V projections run on N/g rows instead of N. At mPLUG answer
    shapes (g=answers-per-question, Sk=602 memory vs L=8 answer tokens) the
    K/V projections are ~94%% of the decoder cross-attention FLOPs, so the
    reference's replicate-then-project formulation (`question_states +=
    [out]*n`, model_vqa_mplug.py:58-62) pays g-fold for them; this doesn't."""

    config: MPlugBertConfig
    has_cross: bool = False
    memory_groups: int = 1

    @nn.compact
    def __call__(self, x, self_bias=None, enc_states=None, enc_bias=None,
                 deterministic=True, cross_kv=None, self_cache=None,
                 cache_position=None):
        c = self.config
        g = self.memory_groups
        new_cache = None
        if self_cache is not None:
            x, new_cache = BertSelfBlock(c, name="attention")(
                x, x, self_bias, deterministic, self_cache=self_cache,
                cache_position=cache_position)
        else:
            x = BertSelfBlock(c, name="attention")(x, x, self_bias,
                                                   deterministic)
        if self.has_cross:
            block = BertSelfBlock(c, name="crossattention")
            if g > 1:
                n, length, d = x.shape
                xg = x.reshape(n // g, g * length, d)
                xg = block(xg, enc_states, enc_bias, deterministic,
                           kv=cross_kv)
                x = xg.reshape(n, length, d)
            else:
                x = block(x, enc_states, enc_bias, deterministic, kv=cross_kv)
        inter = Intermediate(c.intermediate_size, c.hidden_act, c.dtype,
                             name="intermediate")(x)
        x = FFNOutput(c.hidden_size, c.hidden_dropout_prob, c.dtype,
                      name="output")(inter, x, deterministic)
        return x if new_cache is None else (x, new_cache)


class TextEncoder(nn.Module):
    """`BertModel` with text_encoder_layers self-only layers
    (modeling_mplug.py:981)."""

    config: MPlugBertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, deterministic=True):
        c = self.config
        h = BertEmbeddings(c, name="embeddings")(input_ids, deterministic)
        bias = extend_attention_mask(attention_mask)
        # deterministic must be STATIC under remat (arg 5, counting self;
        # a traced bool breaks nn.Dropout's Python branch)
        layer_cls = (nn.remat(BertLayer, static_argnums=(5,))
                     if c.use_remat else BertLayer)
        for i in range(c.text_encoder_layers):
            h = layer_cls(c, has_cross=False, name=f"layer_{i}")(
                h, bias, None, None, deterministic)
        return h


class FusionLayer(nn.Module):
    """One fusion layer (modeling_mplug.py:445-520).

    stride=False: text self-attn -> text->image cross-attn -> FFN(text).
    stride=True: one joint self-attention + FFN over concat [image; text];
    caller splits and residually updates the image stream.
    """

    config: MPlugBertConfig
    stride: bool = False

    @nn.compact
    def __call__(self, text, text_bias, image, image_bias, deterministic=True):
        c = self.config
        if not self.stride:
            x = BertSelfBlock(c, name="attention")(
                text, text, text_bias, deterministic)
            x = BertSelfBlock(c, name="crossattention")(
                x, image, image_bias, deterministic)
            inter = Intermediate(c.intermediate_size, c.hidden_act, c.dtype,
                                 name="intermediate")(x)
            text = FFNOutput(c.hidden_size, c.hidden_dropout_prob, c.dtype,
                             name="output")(inter, x, deterministic)
            return text, image
        # joint self-attention over [image; text] (modeling_mplug.py:557-568)
        joint = jnp.concatenate([image, text], axis=1)
        joint_bias = None
        if text_bias is not None or image_bias is not None:
            ib = image_bias if image_bias is not None else jnp.zeros(
                (text.shape[0], 1, 1, image.shape[1]), jnp.float32)
            tb = text_bias if text_bias is not None else jnp.zeros(
                (text.shape[0], 1, 1, text.shape[1]), jnp.float32)
            joint_bias = jnp.concatenate([ib, tb], axis=3)
        x = BertSelfBlock(c, name="attention")(joint, joint, joint_bias,
                                               deterministic)
        inter = Intermediate(c.intermediate_size, c.hidden_act, c.dtype,
                             name="intermediate")(x)
        out = FFNOutput(c.hidden_size, c.hidden_dropout_prob, c.dtype,
                        name="output")(inter, x, deterministic)
        image_new, text = jnp.split(out, [image.shape[1]], axis=1)
        # residual image-stream update (FusionEncoder, modeling_mplug.py:681-683)
        return text, image + image_new


class FusionEncoder(nn.Module):
    """`FusionModel` layers 6..11 of the 12-layer stack (start_layer=6,
    vqa_mplug.py layers_to_mask 'fusion_encoder': range(6,12)); relative
    layer index drives the stride rule `rel != 0 and rel % stride == 0`."""

    config: MPlugBertConfig

    @nn.compact
    def __call__(self, text_embeds, attention_mask, image_embeds,
                 image_mask=None, deterministic=True):
        c = self.config
        text_bias = extend_attention_mask(attention_mask)
        image_bias = extend_attention_mask(image_mask)
        text, image = text_embeds, image_embeds
        start = c.text_encoder_layers
        layer_cls = (nn.remat(FusionLayer, static_argnums=(5,))
                     if c.use_remat else FusionLayer)
        for rel in range(c.fusion_layers):
            stride = rel != 0 and rel % c.stride_layer == 0
            text, image = layer_cls(c, stride=stride,
                                    name=f"layer_{start + rel}")(
                text, text_bias, image, image_bias, deterministic)
        return image, text


def causal_mask_bias(seq_len: int, attention_mask=None):
    """Lower-triangular additive bias (+ padding mask) for the decoder."""
    causal = jnp.tril(jnp.ones((seq_len, seq_len), jnp.float32))
    bias = (1.0 - causal) * -10000.0
    bias = bias[None, None]  # [1, 1, L, L]
    if attention_mask is not None:
        pad = extend_attention_mask(attention_mask)  # [B, 1, 1, L]
        bias = bias + pad
    return bias


class TextDecoder(nn.Module):
    """`BertLMHeadModel.bert` (12 causal layers with cross-attention) +
    LM head. The head ('cls.predictions') uses the HF transform
    (dense + gelu + LayerNorm) with the decoder weight TIED to the word
    embeddings (HF tie_word_embeddings default) plus a free bias."""

    config: MPlugBertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, enc_states, enc_mask,
                 deterministic=True, cross_kv=None, position=None,
                 memory_groups: int = 1, self_caches=None,
                 cache_position=None):
        """`cross_kv`: optional per-layer list of precomputed cross-attention
        (k, v) projections of `enc_states` — decode-time caching of the
        static encoder memory (generator.precompute_cross_kv).

        `memory_groups` g > 1: input rows come in g-sized question-major
        groups sharing one `enc_states` row (passed with batch N/g); see
        BertLayer. Composes with `cross_kv`: the cached (k, v) must then be
        projected from the UNREPLICATED memory (batch N/g) — the beam-decode
        path groups the W beams of each item this way so the per-step
        cross-attend reads the memory K/V once per item, not per beam.

        `position` (traced scalar): slice the hidden states to that single
        row BEFORE the LM head and return [N, 1, V]. Autoregressive
        generation reads exactly one position per step, and the tied
        [hidden, 30522] vocab projection is the decode loop's largest
        matmul — computing it for all L rows was an L-fold waste.

        `self_caches`/`cache_position`: incremental decode. Per-layer
        [(k, v)] self-attention caches [N, max_len, H, D]; only the
        `cache_position` row of `input_ids` is embedded and pushed through
        the layers (the prefix rows come from the caches instead of being
        recomputed — the reference predictor's `state.cache` analogue,
        `mPLUG/models/predictor.py:243-253`). Returns (logits [N, 1, V],
        updated_caches). `attention_mask` is ignored (the causal structure
        IS the cache-validity mask)."""
        c = self.config
        emb = BertEmbeddings(c, name="embeddings")
        if self_caches is not None:
            tok = jax.lax.dynamic_slice_in_dim(input_ids, cache_position, 1,
                                               axis=1)
            h = emb(tok, deterministic, position=cache_position)
            max_len = self_caches[0][0].shape[1]
            # the single query row attends cache rows <= cache_position
            self_bias = jnp.where(
                jnp.arange(max_len)[None, None, None, :] <= cache_position,
                0.0, -10000.0).astype(jnp.float32)
        else:
            h = emb(input_ids, deterministic)
            self_bias = causal_mask_bias(input_ids.shape[1], attention_mask)
        enc_bias = extend_attention_mask(enc_mask)
        layer_cls = (nn.remat(BertLayer, static_argnums=(5,))
                     if c.use_remat and self_caches is None else BertLayer)
        new_caches = []
        for i in range(c.text_decode_layers):
            layer = layer_cls(c, has_cross=True, memory_groups=memory_groups,
                              name=f"layer_{i}")
            layer_kv = None if cross_kv is None else cross_kv[i]
            if self_caches is not None:
                h, cache_i = layer(h, self_bias, enc_states, enc_bias,
                                   deterministic, cross_kv=layer_kv,
                                   self_cache=self_caches[i],
                                   cache_position=cache_position)
                new_caches.append(cache_i)
            else:
                h = layer(h, self_bias, enc_states, enc_bias, deterministic,
                          cross_kv=layer_kv)
        if position is not None and self_caches is None:
            h = jax.lax.dynamic_slice_in_dim(h, position, 1, axis=1)
        # LM head: transform + tied decoder
        t = nn.Dense(c.hidden_size, dtype=c.dtype,
                     name="predictions_transform_dense")(h)
        # transform_act_fn is ACT2FN["gelu"] = erf gelu (modeling_mplug.py:
        # 802, pip transformers GELUActivation); dtype-adaptive like the
        # rest of the zoo (exact in fp32, tanh form in bf16 — layers.gelu)
        t = layers.gelu(t)
        t = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=c.dtype,
                         name="predictions_transform_LayerNorm")(t)
        if c.lm_head_dtype is None:
            logits = emb.attend(t.astype(jnp.float32))
        else:
            logits = emb.attend_cast(t, c.lm_head_dtype)
        bias = self.param("predictions_bias", nn.initializers.zeros,
                          (c.vocab_size,), jnp.float32)
        if self_caches is not None:
            return logits + bias, new_caches
        return logits + bias


def lm_loss_per_sequence(logits, labels, pad_id: int = 0):
    """Per-sequence summed next-token CE with padding ignored
    (`BertLMHeadModel.forward`, modeling_mplug.py:1904-1916: shift by one,
    CrossEntropyLoss(ignore_index=-100) summed over the sequence)."""
    shifted_logits = logits[:, :-1]
    shifted_labels = labels[:, 1:]
    mask = (shifted_labels != pad_id).astype(jnp.float32)
    logp = jax.nn.log_softmax(shifted_logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.maximum(shifted_labels, 0)[..., None].astype(jnp.int32),
        axis=-1)[..., 0]
    return jnp.sum(nll * mask, axis=1)


def soft_label_distill_loss(logits, soft_labels, labels, pad_id: int = 0):
    """Soft-label distillation term (modeling_mplug.py:1915-1916).

    NOTE: the reference computes log_softmax over dim=1 (the sequence axis) —
    we reproduce the *intended* semantics (vocab axis) here; flagged in docs.
    """
    shifted = logits[:, :-1]
    mask = (labels[:, 1:] != pad_id).astype(jnp.float32)
    ld = -jnp.sum(jax.nn.log_softmax(shifted, axis=-1) * soft_labels, axis=-1)
    return jnp.sum(ld * mask, axis=1)
