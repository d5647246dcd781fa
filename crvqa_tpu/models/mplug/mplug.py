"""The composite mPLUG VQA model — CLIP-ViT + text encoder + fusion + LM
decoder.

Re-design of `mPLUG/models/model_vqa_mplug.py:MPLUG` (:13-253): the train
path encodes image and question, fuses them (image states prepended to the
question states for the decoder's cross-attention), replicates the fused
states per candidate answer, and sums the per-answer weighted LM losses with
optional `(1-bias)` debias reweighting (:112-115).

TPU-native static-shape reformulation: the reference replicates question
states by a Python loop over per-question answer counts
(`question_states += [out]*n`, :58-62) — dynamic shapes XLA can't compile,
and the replicate-then-project order pays answers-per-question-fold for the
decoder's cross K/V projections of the 602-token memory (~94% of its
cross-attention FLOPs). Here every question carries a fixed
`answers_per_question` slot dimension with zero `weights` marking padding,
and the decoder attends the UNREPLICATED memory via question-major query
grouping (`TextDecoder(memory_groups=a)`, bert.py:BertLayer) — identical
math, no replication anywhere. Momentum-distillation twins (`_m` modules
+ EMA update,
:150-181) are represented as a second param tree updated by
`momentum_update`; the shipped VQA config runs with distill=False
(`configs/full_model_debias.yaml`).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bert import (
    FusionEncoder,
    MPlugBertConfig,
    TextDecoder,
    TextEncoder,
    lm_loss_per_sequence,
    soft_label_distill_loss,
)
from .vit import ViTConfig, VisionTransformer


@dataclasses.dataclass(frozen=True)
class MPlugConfig:
    bert: MPlugBertConfig = MPlugBertConfig()
    vit: ViTConfig = ViTConfig()
    pad_token_id: int = 0
    eos_token_id: int = 102  # '[SEP]' (full_model_debias.yaml: eos '[SEP]')
    bos_token_id: int = 101  # '[CLS]'
    distill: bool = False
    momentum: float = 0.995

    @classmethod
    def tiny(cls, **kw) -> "MPlugConfig":
        return cls(bert=MPlugBertConfig.tiny(), vit=ViTConfig.tiny(), **kw)

    @classmethod
    def vit_l(cls, image_res: int = 392, bert: Optional[MPlugBertConfig] = None,
              **kw) -> "MPlugConfig":
        """`clip_name: ViT-L-14` preset (`models/visual_transformers.py:
        46-47`): the 1024-wide visual tower plus the 'large' visn_fc/
        visn_layer_norm adapter MPlug.setup adds whenever vit.width !=
        bert.hidden_size (model_vqa_mplug.py:143-147)."""
        return cls(bert=bert if bert is not None else MPlugBertConfig(),
                   vit=ViTConfig.vit_l_14(image_res=image_res), **kw)


class MPlug(nn.Module):
    """Module tree mirrors the torch names: visual_encoder / text_encoder /
    fusion_encoder / text_decoder (mPLUG/masking/maskers.py:16-65)."""

    config: MPlugConfig

    def setup(self):
        c = self.config
        self.visual_encoder = VisionTransformer(c.vit, name="visual_encoder")
        self.text_encoder = TextEncoder(c.bert, name="text_encoder")
        self.fusion_encoder = FusionEncoder(c.bert, name="fusion_encoder")
        self.text_decoder = TextDecoder(c.bert, name="text_decoder")
        if c.vit.width != c.bert.hidden_size:
            # the reference's 'large' adapter (ViT-L-14's 1024-wide tower):
            # dropout(LayerNorm(Linear(image_embeds)))
            # (model_vqa_mplug.py:143-147, applied at :34-35)
            self.visn_fc = nn.Dense(c.bert.hidden_size, dtype=c.bert.dtype,
                                    name="visn_fc")
            self.visn_layer_norm = nn.LayerNorm(
                epsilon=1e-12, dtype=c.bert.dtype, name="visn_layer_norm")
            self.visn_dropout = nn.Dropout(c.bert.hidden_dropout_prob)

    def encode(self, images, question_ids, question_mask, deterministic=True):
        """image + question -> fused decoder memory
        (`MPLUG.forward` train=False path, model_vqa_mplug.py:119-130)."""
        image_embeds = self.visual_encoder(images, deterministic=deterministic)
        if self.config.vit.width != self.config.bert.hidden_size:
            image_embeds = self.visn_dropout(
                self.visn_layer_norm(self.visn_fc(image_embeds)),
                deterministic=deterministic)
        image_mask = jnp.ones(image_embeds.shape[:-1], jnp.float32)
        text_embeds = self.text_encoder(question_ids, question_mask,
                                        deterministic=deterministic)
        image_out, question_out = self.fusion_encoder(
            text_embeds, question_mask, image_embeds, image_mask,
            deterministic=deterministic)
        states = jnp.concatenate([image_out, question_out], axis=1)
        state_mask = jnp.concatenate([image_mask, question_mask], axis=1)
        return states, state_mask

    def answer_logits(self, images, question_ids, question_mask, answer_ids,
                      answer_mask, deterministic=True):
        """Flat per-answer-slot decoder logits [B*A, L, V] — the
        `return_logits=True` decoder path the momentum twins use to produce
        soft labels (model_vqa_mplug.py:84-92, modeling_mplug.py:1903-1904)."""
        states, state_mask = self.encode(images, question_ids, question_mask,
                                         deterministic)
        b, a, l = answer_ids.shape
        # memory_groups: the A answer rows per question share that question's
        # states — attend the UNREPLICATED memory (the reference replicates
        # it per answer and pays A-fold for the cross K/V projections)
        return self.text_decoder(answer_ids.reshape(b * a, l),
                                 answer_mask.reshape(b * a, l),
                                 states, state_mask,
                                 deterministic=deterministic,
                                 memory_groups=a)

    def __call__(self, images, question_ids, question_mask, answer_ids,
                 answer_mask, weights, bias=None, deterministic=True,
                 soft_labels=None, alpha=0.0):
        """Training loss.

        answer_ids/answer_mask: [B, A, L] — A answer slots per question;
        weights [B, A] with 0 for padded slots (the reference's per-answer
        `weights` flattened list). Returns the scalar
        sum(weights * (1-bias) * per-answer-LM-loss) / B
        (model_vqa_mplug.py:112-116).

        `soft_labels` [B*A, L-1, V] (softmax of the momentum twin's shifted
        logits) mixes a distillation term at weight `alpha`:
        (1-alpha)*CE + alpha*distill (modeling_mplug.py:1915-1917).
        """
        c = self.config
        b, a, l = answer_ids.shape
        logits = self.answer_logits(images, question_ids, question_mask,
                                    answer_ids, answer_mask, deterministic)
        flat_ids = answer_ids.reshape(b * a, l)
        per_answer = lm_loss_per_sequence(logits, flat_ids, c.pad_token_id)
        if soft_labels is not None:
            distill = soft_label_distill_loss(logits, soft_labels, flat_ids,
                                              c.pad_token_id)
            per_answer = (1.0 - alpha) * per_answer + alpha * distill
        w = weights.reshape(b * a)
        loss = w * per_answer
        if bias is not None:
            loss = (1.0 - bias.reshape(b * a)) * loss
        return jnp.sum(loss) / b

    def decode_logits(self, answer_ids, answer_mask, states, state_mask,
                      deterministic=True, cross_kv=None, position=None,
                      memory_groups: int = 1):
        """Decoder logits for generation / answer ranking. `cross_kv` caches
        the per-layer cross-attention projections of the static states;
        `position` slices the LM head to one decode row (generation);
        `memory_groups` groups W beam rows per unreplicated memory row."""
        return self.text_decoder(answer_ids, answer_mask, states, state_mask,
                                 deterministic=deterministic,
                                 cross_kv=cross_kv, position=position,
                                 memory_groups=memory_groups)

    def decode_logits_step(self, answer_ids, states, state_mask,
                           cache_position, self_caches, cross_kv=None,
                           memory_groups: int = 1, deterministic=True):
        """One incremental decode step: embeds only the `cache_position` row
        of `answer_ids`, reads the prefix from the per-layer self-attention
        `self_caches` (and the static memory from `cross_kv`). Returns
        (logits [N, 1, V], updated self_caches). The TPU-native analogue of
        the reference predictor's `state.cache` + `map_batch_fn`
        (`mPLUG/models/predictor.py:243-253`)."""
        return self.text_decoder(answer_ids, None, states, state_mask,
                                 deterministic=deterministic,
                                 cross_kv=cross_kv,
                                 memory_groups=memory_groups,
                                 self_caches=self_caches,
                                 cache_position=cache_position)

    def rank_answers(self, images, question_ids, question_mask,
                     answer_list_ids, answer_list_mask, deterministic=True):
        """`rank_answer` re-ranking (model_vqa_mplug.py:188-245): score every
        candidate answer by its summed LM loss against the fused states and
        return per-question losses [B, K] (lower = better).

        Static-shape variant: scores ALL K candidates (the reference
        shortlists top-k by first-token prob; with K ~ 100s on TPU the full
        matmul is cheaper than the gather dance).
        """
        c = self.config
        states, state_mask = self.encode(images, question_ids, question_mask,
                                         deterministic)
        b = states.shape[0]
        k, l = answer_list_ids.shape
        tiled_ids = jnp.tile(answer_list_ids, (b, 1))
        tiled_mask = jnp.tile(answer_list_mask, (b, 1))
        # question-major grouping: rows [q0a0..q0aK, q1a0..] share states[q]
        logits = self.text_decoder(tiled_ids, tiled_mask, states, state_mask,
                                   deterministic=deterministic,
                                   memory_groups=k)
        losses = lm_loss_per_sequence(logits, tiled_ids, c.pad_token_id)
        return losses.reshape(b, k)

    def rank_answers_topk(self, images, question_ids, question_mask,
                          answer_list_ids, answer_list_mask, k: int = 10,
                          deterministic=True):
        """First-token top-k shortlist + chain-rule re-rank
        (`rank_answer`, model_vqa_mplug.py:188-245): one bos-only decoder
        pass scores every candidate's FIRST token, the k most probable
        candidates get a full decoder pass, and final scores combine
        log p(first) with the full-sequence losses exactly as the reference
        does (including its double count of the first answer token). With the
        real 3,129-answer list this is B*(1+k) decoder rows instead of
        B*3129.

        Returns (topk_ids [B, k] — indices into the answer list, re-ranked
        best first; topk_probs [B, k]). `k` is static (lax.top_k + gather).
        """
        states, state_mask = self.encode(images, question_ids, question_mask,
                                         deterministic)
        return self.rank_answers_from_states(
            states, state_mask, answer_list_ids, answer_list_mask, k,
            deterministic)

    def rank_answers_from_states(self, states, state_mask, answer_list_ids,
                                 answer_list_mask, k: int = 10,
                                 deterministic=True):
        """The post-encoder half of `rank_answers_topk`, oracle-testable
        against the reference `MPLUG.rank_answer` on shared fused states
        (tests/test_ref_oracle_rank.py)."""
        c = self.config
        b = states.shape[0]
        n_ans, l = answer_list_ids.shape
        # 1. bos-only pass: p(first token | states)
        start_ids = jnp.full((b, 1), answer_list_ids[0, 0], jnp.int32)
        start_mask = jnp.ones((b, 1), jnp.float32)
        start_logits = self.text_decoder(start_ids, start_mask, states,
                                         state_mask,
                                         deterministic=deterministic)
        first_tokens = answer_list_ids[:, 1]  # [n_ans]
        prob_first = jax.nn.softmax(start_logits[:, 0, :], axis=-1)[
            :, first_tokens]  # [B, n_ans]
        topk_probs, topk_ids = jax.lax.top_k(prob_first, k)  # [B, k]
        # 2. full decoder pass over the shortlist
        short_ids = answer_list_ids[topk_ids.reshape(-1)]  # [B*k, L]
        short_mask = answer_list_mask[topk_ids.reshape(-1)]
        logits = self.text_decoder(short_ids, short_mask, states, state_mask,
                                   deterministic=deterministic,
                                   memory_groups=k)
        losses = lm_loss_per_sequence(logits, short_ids, c.pad_token_id)
        # 3. chain-rule re-rank: log p(first) - full loss, softmaxed over k
        log_probs_sum = jnp.log(topk_probs.reshape(-1)) - losses
        rerank_probs = jax.nn.softmax(log_probs_sum.reshape(b, k), axis=-1)
        rerank_probs, rerank_id = jax.lax.top_k(rerank_probs, k)
        topk_ids = jnp.take_along_axis(topk_ids, rerank_id, axis=1)
        return topk_ids, rerank_probs


def momentum_update(params, params_m, momentum: float = 0.995):
    """EMA update of the distillation twins (`_momentum_update`,
    model_vqa_mplug.py:150-181) as a pure pytree op."""
    return jax.tree_util.tree_map(
        lambda m, p: m * momentum + p * (1.0 - momentum), params_m, params)
