"""Shared training-step machinery.

The reference's trainers (`hg_transformers/mask_trainer_*.py`) are stateful
Python loops; here each stage is a pure jitted step function over an explicit
state pytree, pjit-sharded over the mesh: batch split on the `data` axis,
params/scores replicated, gradient and metric reductions handled by XLA
collectives over ICI.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

PyTree = Any


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    """`get_linear_schedule_with_warmup` (hg_transformers/optimization.py):
    linear ramp to lr over warmup, then linear decay to 0 at total_steps."""
    if warmup_steps > 0:
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, warmup_steps),
                optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    return optax.linear_schedule(lr, 0.0, max(total_steps, 1))


class HfAdamWState(NamedTuple):
    """State for `hf_adamw`. `abs_grad_sum` mirrors the reference's
    `state['sum']` integrated-|grad| accumulator (optimization.py:100-101);
    None when accumulation is off."""

    count: jax.Array
    mu: Any
    nu: Any
    abs_grad_sum: Any


def hf_adamw(learning_rate, b1: float = 0.9, b2: float = 0.999,
             eps: float = 1e-6, weight_decay: float = 0.0,
             correct_bias: bool = True, grad_mask=None,
             accumulate_abs_grad: bool = False,
             moment_dtype=None) -> optax.GradientTransformation:
    """The reference's custom AdamW (root `optimization.py:8-129`), exactly:

      m_t = b1*m + (1-b1)*g;  v_t = b2*v + (1-b2)*g^2
      step = lr * sqrt(1-b2^t)/(1-b1^t)          (correct_bias)
      p   -= step * m_t/(sqrt(v_t)+eps)          (eps OUTSIDE the bias
                                                  correction — HF-v2 style,
                                                  NOT torch.optim.AdamW's
                                                  sqrt(v_hat)+eps)
      p   -= lr * weight_decay * p               (decoupled decay)

    plus the two extras the reference carries (optimization.py:81-101):
    `grad_mask` multiplies gradients leaf-wise before every moment update,
    and when grad_mask is None an `abs_grad_sum` accumulator integrates
    |grad| per step (importance scoring for pruning research).

    `moment_dtype` (e.g. jnp.bfloat16) stores m/v in a narrower dtype —
    halves the optimizer-state HBM traffic of the 210M-score stage-2 update
    (the profile's adam_update + fp32-DMA ~10%). Moment math still runs in
    fp32 each step; only the carried state rounds. None = exact fp32.
    """
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)
    md = moment_dtype

    def _zeros(p):
        return jnp.zeros_like(p, dtype=md) if md is not None else jnp.zeros_like(p)

    def init(params):
        sums = (jax.tree_util.tree_map(jnp.zeros_like, params)
                if accumulate_abs_grad and grad_mask is None else None)
        return HfAdamWState(count=jnp.zeros((), jnp.int32),
                            mu=jax.tree_util.tree_map(_zeros, params),
                            nu=jax.tree_util.tree_map(_zeros, params),
                            abs_grad_sum=sums)

    def update(grads, state, params=None):
        if grad_mask is not None:
            grads = jax.tree_util.tree_map(jnp.multiply, grads, grad_mask)
        count = state.count + 1
        sums = state.abs_grad_sum
        if sums is not None:
            sums = jax.tree_util.tree_map(lambda s, g: s + jnp.abs(g),
                                          sums, grads)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
            state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
            state.nu, grads)
        # torch LambdaLR convention: the FIRST optimizer step runs at
        # lambda(0) (scheduler.step() advances AFTER optimizer.step()), so
        # the schedule reads the pre-increment count; bias correction uses
        # the post-increment step exactly like the reference's
        # state['step'] += 1 (optimization.py:85-97).
        lr = sched(state.count)
        c = count.astype(jnp.float32)
        if correct_bias:
            step_size = lr * jnp.sqrt(1.0 - b2 ** c) / (1.0 - b1 ** c)
        else:
            step_size = lr
        updates = jax.tree_util.tree_map(
            lambda m, v: -step_size * m / (jnp.sqrt(v) + eps), mu, nu)
        if weight_decay > 0.0:
            assert params is not None
            # reference decays the POST-main-update param (p.data.add_ runs
            # after addcdiv_, optimization.py:124-127): p + u, not p
            updates = jax.tree_util.tree_map(
                lambda u, p: u - lr * weight_decay * (p + u), updates, params)
        if md is not None:
            mu = jax.tree_util.tree_map(lambda m: m.astype(md), mu)
            nu = jax.tree_util.tree_map(lambda v: v.astype(md), nu)
        return updates, HfAdamWState(count=count, mu=mu, nu=nu,
                                     abs_grad_sum=sums)

    return optax.GradientTransformation(init, update)


def abs_grad_sum(opt_state):
    """Extract the |grad| accumulator from a (possibly chained) opt state
    (`AdamW.get_accumulator`, optimization.py:54-64). Returns None if
    accumulation was off."""
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, HfAdamWState)):
        if isinstance(s, HfAdamWState):
            return s.abs_grad_sum
    return None


def make_adamw(lr: float, warmup_steps: int, total_steps: int,
               weight_decay: float = 0.0, max_grad_norm: float = 1.0,
               eps: float = 1e-8, b1: float = 0.9, b2: float = 0.999,
               grad_mask=None, accumulate_abs_grad: bool = False,
               moment_dtype=None):
    """Stage-2 optimizer: root `optimization.py:AdamW` (bias-corrected Adam,
    decoupled weight decay, grads pre-clipped to max_grad_norm by the trainer
    loop at `mask_trainer_Robust_VQA.py:661-663`)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        hf_adamw(
            learning_rate=linear_warmup_schedule(lr, warmup_steps, total_steps),
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
            grad_mask=grad_mask, accumulate_abs_grad=accumulate_abs_grad,
            moment_dtype=moment_dtype,
        ),
    )


class TorchAdamState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def torch_adam(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8,
               moment_dtype=None) -> optax.GradientTransformation:
    """`torch.optim.Adam` math (the stage-1/3 optimizer,
    `run_vqa_stage1.py:355`) with optional narrow moment STORAGE:

      m_t = b1*m + (1-b1)*g;  v_t = b2*v + (1-b2)*g^2
      p  -= lr/(1-b1^t) * m_t / (sqrt(v_t/(1-b2^t)) + eps)

    identical trajectories to `optax.adam` at moment_dtype=None; with
    jnp.bfloat16 only the CARRIED m/v round (per-step math stays fp32) —
    at the canonical stage-1 bs 64 the dense update moves ~28 fp32
    bytes/param/step regardless of batch size (the profile_stage1
    speed-of-light's optimizer floor), and halving the m/v traffic is the
    one lever that doesn't touch the recipe. Schedule reads the
    pre-increment count (torch LambdaLR steps AFTER optimizer.step())."""
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))
    md = moment_dtype

    def _zeros(p):
        return jnp.zeros_like(p, dtype=md) if md is not None else jnp.zeros_like(p)

    def init(params):
        return TorchAdamState(jnp.zeros((), jnp.int32),
                              jax.tree_util.tree_map(_zeros, params),
                              jax.tree_util.tree_map(_zeros, params))

    def update(grads, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(g.dtype) + (1 - b1) * g,
            state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(g.dtype) + (1 - b2) * g * g,
            state.nu, grads)
        lr = sched(state.count)
        c = count.astype(jnp.float32)
        step_size = lr / (1.0 - b1 ** c)
        bc2 = jnp.sqrt(1.0 - b2 ** c)
        updates = jax.tree_util.tree_map(
            lambda m, v: -step_size * m / (jnp.sqrt(v) / bc2 + eps), mu, nu)
        if md is not None:
            mu = jax.tree_util.tree_map(lambda m: m.astype(md), mu)
            nu = jax.tree_util.tree_map(lambda v: v.astype(md), nu)
        return updates, TorchAdamState(count, mu, nu)

    return optax.GradientTransformation(init, update)


def make_adam(lr: float, warmup_steps: int, total_steps: int,
              max_grad_norm: float = 1.0, eps: float = 1e-8,
              moment_dtype=None):
    """Stage-1/3 optimizer: `torch.optim.Adam` + linear warmup
    (`run_vqa_stage1.py:341-362`). moment_dtype=None keeps the exact
    optax.adam path the trajectory oracle pins to torch at 1e-7;
    jnp.bfloat16 swaps in `torch_adam` with rounded carried moments."""
    schedule = linear_warmup_schedule(lr, warmup_steps, total_steps)
    if moment_dtype is None:
        inner = optax.adam(learning_rate=schedule, eps=eps)
    else:
        inner = torch_adam(schedule, eps=eps, moment_dtype=moment_dtype)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), inner)


def batch_score(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """VQA soft accuracy: sum over batch of labels[argmax(logits)]
    (`compute_score_with_logits`, hg_transformers/data/metrics/__init__.py:90-104)."""
    idx = jnp.argmax(logits, axis=1)
    return jnp.sum(jnp.take_along_axis(labels, idx[:, None], axis=1)[:, 0])


class TrainMetrics(struct.PyTreeNode):
    loss: jax.Array
    score: jax.Array  # summed soft accuracy over the batch
    batch_size: jax.Array


def model_inputs(batch: dict) -> dict:
    """Extract forward-pass kwargs from a batch dict.

    LXMERT batches carry (visual_feats, visual_pos); VisualBERT batches carry
    visual_embeds (`mask_trainer_visualBERT_VQA.py:820` passes only
    input_ids + visual_embeds).
    """
    kw = {"input_ids": batch["input_ids"]}
    if "visual_embeds" in batch:
        kw["visual_embeds"] = batch["visual_embeds"]
    else:
        kw["visual_feats"] = batch["visual_feats"]
        kw["visual_pos"] = batch["visual_pos"]
    if "attention_mask" in batch:
        kw["attention_mask"] = batch["attention_mask"]
    return kw
