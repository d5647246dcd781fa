"""Autoregressive answer generation for mPLUG — XLA-compilable decoding.

Re-design of `mPLUG/models/predictor.py:TextGenerator` (ONMT-style beam
search, :33-519). The reference mutates Python lists per step; here decoding
is a `lax.fori_loop` over a fixed `max_len` with static shapes. VQA answers
are <= ~12 tokens and the decoder is 12 layers, so prefix re-computation per
step (no KV cache) costs less than the bookkeeping it avoids at these sizes;
a cached variant is a later optimization.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def _supports_position(decode_logits: Callable) -> bool:
    """Decode closures that accept `position` get the sliced LM head
    ([N,1,V] for one row instead of [N,L,V] — the vocab projection is the
    decode loop's largest matmul); others keep the full-logits contract."""
    import inspect

    try:
        return "position" in inspect.signature(decode_logits).parameters
    except (TypeError, ValueError):
        return False


def greedy_generate(decode_logits: Callable, states, state_mask,
                    max_len: int = 12, bos: int = 101, eos: int = 102,
                    pad: int = 0):
    """Greedy decoding. `decode_logits(ids, mask, states, state_mask[,
    position])` returns [N, L, V] logits (or [N, 1, V] when it accepts
    `position`). Returns token ids [B, max_len] (bos included)."""
    b = states.shape[0]
    ids = jnp.full((b, max_len), pad, jnp.int32).at[:, 0].set(bos)
    done = jnp.zeros((b,), bool)
    sliced = _supports_position(decode_logits)

    def body(t, carry):
        ids, done = carry
        mask = (jnp.arange(max_len)[None, :] < t).astype(jnp.float32)
        if sliced:
            step = decode_logits(ids, mask, states, state_mask,
                                 position=t - 1)[:, 0]
        else:
            step = decode_logits(ids, mask, states, state_mask)[:, t - 1]
        next_tok = jnp.argmax(step, axis=-1).astype(jnp.int32)
        next_tok = jnp.where(done, pad, next_tok)
        ids = ids.at[:, t].set(next_tok)
        done = jnp.logical_or(done, next_tok == eos)
        return ids, done

    ids, _ = jax.lax.fori_loop(1, max_len, body, (ids, done))
    return ids


def beam_generate(decode_logits: Callable, states, state_mask,
                  beam_size: int = 5, max_len: int = 12, bos: int = 101,
                  eos: int = 102, pad: int = 0):
    """Beam search (beam 5 default, `vqa_mplug.py:475`).

    Returns (best_ids [B, max_len], best_scores [B]). Finished beams are
    frozen (forced pad continuation at zero added score); final selection is
    by total log-prob (the reference's length-normalization alpha is 0 in the
    shipped config).
    """
    b, s, h = states.shape
    w = beam_size
    # expand memory per beam: [B*W, S, H]
    rep_states = jnp.repeat(states, w, axis=0)
    rep_mask = jnp.repeat(state_mask, w, axis=0)

    ids = jnp.full((b, w, max_len), pad, jnp.int32).at[:, :, 0].set(bos)
    # only beam 0 is live at t=0 so the first expansion isn't degenerate
    scores = jnp.full((b, w), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    done = jnp.zeros((b, w), bool)
    sliced = _supports_position(decode_logits)

    def body(t, carry):
        ids, scores, done = carry
        mask = (jnp.arange(max_len)[None, :] < t).astype(jnp.float32)
        flat_ids = ids.reshape(b * w, max_len)
        flat_mask = jnp.broadcast_to(mask, (b * w, max_len))
        if sliced:
            step = decode_logits(flat_ids, flat_mask, rep_states, rep_mask,
                                 position=t - 1)[:, 0]
        else:
            step = decode_logits(flat_ids, flat_mask, rep_states,
                                 rep_mask)[:, t - 1]
        logp = jax.nn.log_softmax(step.astype(jnp.float32), axis=-1)
        v = logp.shape[-1]
        logp = logp.reshape(b, w, v)
        # finished beams may only continue with pad at zero cost
        pad_only = jnp.full((v,), NEG_INF).at[pad].set(0.0)
        logp = jnp.where(done[:, :, None], pad_only[None, None, :], logp)
        cand = scores[:, :, None] + logp  # [B, W, V]
        flat_cand = cand.reshape(b, w * v)
        top_scores, top_idx = jax.lax.top_k(flat_cand, w)
        beam_idx = top_idx // v  # which parent beam
        tok_idx = (top_idx % v).astype(jnp.int32)
        ids = jnp.take_along_axis(ids, beam_idx[:, :, None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        ids = ids.at[:, :, t].set(jnp.where(done, pad, tok_idx))
        done = jnp.logical_or(done, tok_idx == eos)
        return ids, top_scores, done

    ids, scores, done = jax.lax.fori_loop(1, max_len, body, (ids, scores, done))
    best = jnp.argmax(scores, axis=1)
    best_ids = jnp.take_along_axis(ids, best[:, None, None], axis=1)[:, 0]
    best_scores = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]
    return best_ids, best_scores


def precompute_cross_kv(decoder_params: dict, states, num_layers: int,
                        num_heads: int, head_size: int, dtype=None):
    """Project the static encoder memory through every decoder layer's
    cross-attention key/value ONCE (instead of every decode step).

    The cross-attention K/V of a fixed `states` tensor never change during
    autoregressive decoding; recomputing them dominated per-step cost
    (12 layers x 2 projections over ~600 memory tokens per step). Returns the
    per-layer [(k, v)] list consumed by `TextDecoder(cross_kv=...)`. Numerics
    identical to the in-module Dense (same kernels, same math).
    """
    out = []
    b, s, _ = states.shape
    compute_states = states if dtype is None else states.astype(dtype)
    for i in range(num_layers):
        att = decoder_params[f"layer_{i}"]["crossattention"]["self"]
        def proj(p):
            kern = p["kernel"]
            bias = p["bias"]
            if dtype is not None:
                kern = kern.astype(dtype)
                bias = bias.astype(dtype)
            y = compute_states @ kern + bias
            return y.reshape(b, s, num_heads, head_size)
        out.append((proj(att["key"]), proj(att["value"])))
    return out
