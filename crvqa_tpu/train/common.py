"""Shared training-step machinery.

The reference's trainers (`hg_transformers/mask_trainer_*.py`) are stateful
Python loops; here each stage is a pure jitted step function over an explicit
state pytree, pjit-sharded over the mesh: batch split on the `data` axis,
params/scores replicated, gradient and metric reductions handled by XLA
collectives over ICI.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

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


def make_adamw(lr: float, warmup_steps: int, total_steps: int,
               weight_decay: float = 0.0, max_grad_norm: float = 1.0,
               eps: float = 1e-8, b1: float = 0.9, b2: float = 0.999):
    """Stage-2 optimizer: root `optimization.py:AdamW` (bias-corrected Adam,
    decoupled weight decay, grads pre-clipped to max_grad_norm by the trainer
    loop at `mask_trainer_Robust_VQA.py:661-663`)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(
            learning_rate=linear_warmup_schedule(lr, warmup_steps, total_steps),
            b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
        ),
    )


def make_adam(lr: float, warmup_steps: int, total_steps: int,
              max_grad_norm: float = 1.0, eps: float = 1e-8):
    """Stage-1/3 optimizer: `torch.optim.Adam` + linear warmup
    (`run_vqa_stage1.py:341-362`)."""
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(
            learning_rate=linear_warmup_schedule(lr, warmup_steps, total_steps),
            eps=eps,
        ),
    )


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
