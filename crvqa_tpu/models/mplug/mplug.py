"""The composite mPLUG VQA model — CLIP-ViT + text encoder + fusion + LM
decoder.

Re-design of `mPLUG/models/model_vqa_mplug.py:MPLUG` (:13-253): the train
path encodes image and question, fuses them (image states prepended to the
question states for the decoder's cross-attention), replicates the fused
states per candidate answer, and sums the per-answer weighted LM losses with
optional `(1-bias)` debias reweighting (:112-115).

TPU-native static-shape reformulation: the reference replicates question
states by a Python loop over per-question answer counts
(`question_states += [out]*n`, :58-62) — dynamic shapes XLA can't compile.
Here every question carries a fixed `answers_per_question` slot dimension
with zero `weights` marking padding, and replication is a static
jnp.repeat. Momentum-distillation twins (`_m` modules + EMA update,
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

    def encode(self, images, question_ids, question_mask, deterministic=True):
        """image + question -> fused decoder memory
        (`MPLUG.forward` train=False path, model_vqa_mplug.py:119-130)."""
        image_embeds = self.visual_encoder(images, deterministic=deterministic)
        image_mask = jnp.ones(image_embeds.shape[:-1], jnp.float32)
        text_embeds = self.text_encoder(question_ids, question_mask,
                                        deterministic=deterministic)
        image_out, question_out = self.fusion_encoder(
            text_embeds, question_mask, image_embeds, image_mask,
            deterministic=deterministic)
        states = jnp.concatenate([image_out, question_out], axis=1)
        state_mask = jnp.concatenate([image_mask, question_mask], axis=1)
        return states, state_mask

    def __call__(self, images, question_ids, question_mask, answer_ids,
                 answer_mask, weights, bias=None, deterministic=True):
        """Training loss.

        answer_ids/answer_mask: [B, A, L] — A answer slots per question;
        weights [B, A] with 0 for padded slots (the reference's per-answer
        `weights` flattened list). Returns the scalar
        sum(weights * (1-bias) * per-answer-LM-loss) / B
        (model_vqa_mplug.py:112-116).
        """
        c = self.config
        states, state_mask = self.encode(images, question_ids, question_mask,
                                         deterministic)
        b, a, l = answer_ids.shape
        rep_states = jnp.repeat(states, a, axis=0)
        rep_mask = jnp.repeat(state_mask, a, axis=0)
        flat_ids = answer_ids.reshape(b * a, l)
        flat_mask = answer_mask.reshape(b * a, l)
        logits = self.text_decoder(flat_ids, flat_mask, rep_states, rep_mask,
                                   deterministic=deterministic)
        per_answer = lm_loss_per_sequence(logits, flat_ids, c.pad_token_id)
        w = weights.reshape(b * a)
        loss = w * per_answer
        if bias is not None:
            loss = (1.0 - bias.reshape(b * a)) * loss
        return jnp.sum(loss) / b

    def decode_logits(self, answer_ids, answer_mask, states, state_mask,
                      deterministic=True, cross_kv=None):
        """Decoder logits for generation / answer ranking. `cross_kv` caches
        the per-layer cross-attention projections of the static states."""
        return self.text_decoder(answer_ids, answer_mask, states, state_mask,
                                 deterministic=deterministic,
                                 cross_kv=cross_kv)

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
        rep_states = jnp.repeat(states, k, axis=0)
        rep_mask = jnp.repeat(state_mask, k, axis=0)
        tiled_ids = jnp.tile(answer_list_ids, (b, 1))
        tiled_mask = jnp.tile(answer_list_mask, (b, 1))
        logits = self.text_decoder(tiled_ids, tiled_mask, rep_states, rep_mask,
                                   deterministic=deterministic)
        losses = lm_loss_per_sequence(logits, tiled_ids, c.pad_token_id)
        return losses.reshape(b, k)


def momentum_update(params, params_m, momentum: float = 0.995):
    """EMA update of the distillation twins (`_momentum_update`,
    model_vqa_mplug.py:150-181) as a pure pytree op."""
    return jax.tree_util.tree_map(
        lambda m, p: m * momentum + p * (1.0 - momentum), params_m, params)
