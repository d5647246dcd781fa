"""Debias loss zoo — pure functions (logits, hidden, bias, labels) -> scalar.

Exact functional ports of the formulas in
`hg_transformers/vqa_debias_loss_functions.py` (Plain/BiasProduct/
ReweightByInvBias/LearnedMixin) and the LPF/RUBI losses defined inline in
`hg_transformers/mask_trainer_Robust_VQA.py:161-186`. Small numeric
differences in LMH move VQA-CP accuracy by points, so the log-space binary
renormalization and NaN guard are reproduced bit-for-bit (in fp32).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- primitives

def convert_sigmoid_logits_to_binary_logprobs(logits):
    """log(sigmoid(l)), log(1 - sigmoid(l)) (vqa_debias_loss_functions.py:10-14)."""
    log_prob = -jax.nn.softplus(-logits)
    log_one_minus_prob = -logits + log_prob
    return log_prob, log_one_minus_prob


def elementwise_logsumexp(a, b):
    """log(exp(a) + exp(b)) (vqa_debias_loss_functions.py:17-19)."""
    return jnp.maximum(a, b) + jnp.log1p(jnp.exp(-jnp.abs(a - b)))


def renormalize_binary_logits(a, b):
    """Normalize so exp(a) + exp(b) == 1 (vqa_debias_loss_functions.py:22-25)."""
    norm = elementwise_logsumexp(a, b)
    return a - norm, b - norm


def bce_with_logits(logits, labels):
    """Numerically-stable elementwise binary cross entropy with logits."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


# -------------------------------------------------------------------- losses

def plain_bce(logits, labels):
    """Multi-label soft-score BCE scaled by the answer count.

    `instance_bce_with_logits` (`modeling_lxmert.py:248-253`) and `Plain`
    (`vqa_debias_loss_functions.py:66-70`): mean over all elements * n_answers.
    """
    return jnp.mean(bce_with_logits(logits, labels)) * labels.shape[1]


def reweight_by_inv_bias(logits, bias, labels):
    """`ReweightByInvBias` (vqa_debias_loss_functions.py:73-80)."""
    log_prob, log_one_minus_prob = convert_sigmoid_logits_to_binary_logprobs(logits)
    loss = -(log_prob * labels + (1 - labels) * log_one_minus_prob)
    weights = 1 - bias
    return jnp.sum(loss * weights) / jnp.sum(weights)


def bias_product(logits, bias, labels, smooth_param: Optional[jax.Array] = None,
                 constant_smooth: float = 0.0):
    """`BiasProduct` PoE (vqa_debias_loss_functions.py:83-122).

    `smooth_param` is the learned scalar (init -1); pass None to disable the
    learned smoothing (`smooth=False`).
    """
    smooth = constant_smooth
    if smooth_param is not None:
        smooth = smooth + jax.nn.sigmoid(smooth_param)
    bias_lp = jnp.log(bias + smooth)
    bias_l_inv = jnp.log1p(-bias + smooth)
    log_prob, log_one_minus_prob = convert_sigmoid_logits_to_binary_logprobs(logits)
    log_prob = log_prob + bias_lp
    log_one_minus_prob = log_one_minus_prob + bias_l_inv
    log_prob, log_one_minus_prob = renormalize_binary_logits(log_prob, log_one_minus_prob)
    return -jnp.mean(jnp.sum(log_prob * labels + (1 - labels) * log_one_minus_prob, axis=1))


def learned_mixin_init(rng: jax.Array, hidden_size: int = 768,
                       smooth_init: float = -1.0) -> dict:
    """Trainable params of `LearnedMixin.__init__`
    (vqa_debias_loss_functions.py:125-146): bias_lin Dense(hidden->1) +
    learned smooth scalar."""
    kkey, bkey = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(hidden_size)  # torch Linear default init
    return {
        "bias_lin": {
            "kernel": jax.random.uniform(kkey, (hidden_size, 1), jnp.float32, -bound, bound),
            # torch nn.Linear inits the BIAS uniformly too (zeros deviated
            # from the reference's step-0 trajectory)
            "bias": jax.random.uniform(bkey, (1,), jnp.float32, -bound, bound),
        },
        "smooth_param": jnp.full((1,), smooth_init, jnp.float32),
    }


def learned_mixin(params: dict, hidden, logits, bias, labels,
                  w: float = 0.36, constant_smooth: float = 0.0,
                  smooth: bool = True):
    """`LearnedMixin(+H)` — the paper's headline debiasing loss
    (vqa_debias_loss_functions.py:148-196), w=0.36 as instantiated in every
    trainer ctor (`mask_trainer_Robust_VQA.py:248`).
    """
    factor = hidden @ params["bias_lin"]["kernel"] + params["bias_lin"]["bias"]
    factor = jax.nn.softplus(factor)  # [batch, 1]
    bias2 = jnp.stack([bias, 1 - bias], axis=2)  # [batch, n_answers, 2]
    bias2 = bias2 + constant_smooth
    if smooth:
        soften = jax.nn.sigmoid(params["smooth_param"])
        bias2 = bias2 + soften[None, :]
    bias2 = jnp.log(bias2)
    bias2 = bias2 * factor[:, :, None]

    log_prob, log_one_minus_prob = convert_sigmoid_logits_to_binary_logprobs(logits)
    log_probs = jnp.stack([log_prob, log_one_minus_prob], axis=2)
    fused = bias2 + log_probs
    log_prob, log_one_minus_prob = renormalize_binary_logits(fused[:, :, 0], fused[:, :, 1])

    sum_prob = jnp.sum(log_prob * labels + (1 - labels) * log_one_minus_prob, axis=1)
    sum_prob = jnp.where(jnp.isnan(sum_prob), 0.0, sum_prob)  # NaN guard (:183)
    loss = -jnp.mean(sum_prob)

    bias_norm = elementwise_logsumexp(bias2[:, :, 0], bias2[:, :, 1])
    bias_logprob = bias2 - bias_norm[:, :, None]
    entropy = -jnp.mean(jnp.sum(jnp.exp(bias_logprob) * bias_logprob, axis=2))
    return loss + w * entropy


def lpf_loss(logits, bias, max_label, gamma: float = 5.0):
    """LPF focal-style debiasing (`mask_trainer_Robust_VQA.py:161-179`):
    (1 - bias_prob_of_gt)^gamma * CE(logits, argmax-label)."""
    vqa_pt = jax.nn.softmax(logits, axis=-1)
    vqa_pt = jnp.maximum(vqa_pt, 1.0e-7)
    qo_pt = jnp.maximum(bias, 1.0e-7)
    idx = max_label.astype(jnp.int32)
    vqa_logpt = jnp.take_along_axis(jnp.log(vqa_pt), idx[:, None], axis=-1)[:, 0]
    qo_logpt = jnp.take_along_axis(jnp.log(qo_pt), idx[:, None], axis=-1)[:, 0]
    ce = -vqa_logpt
    feedback = jnp.exp(qo_logpt)
    return jnp.mean((1 - feedback) ** gamma * ce)


def rubi_loss(logits, bias, max_label):
    """RUBI (`mask_trainer_Robust_VQA.py:182-186`):
    CE(logits * sigmoid(bias), argmax-label)."""
    fused = logits * jax.nn.sigmoid(bias)
    logp = jax.nn.log_softmax(fused, axis=-1)
    idx = max_label.astype(jnp.int32)
    nll = -jnp.take_along_axis(logp, idx[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def cosine_rep_loss(student_rep, teacher_rep):
    """KD representation loss (`mask_trainer_Robust_VQA.py:95-97`).

    Full behavioral parity note: the reference's KD block
    (`mask_trainer_Robust_VQA.py:857-865`) reads `student_reps =
    outputs[-1][1:]` — but the model's training forward returns
    `(loss, logits, pooled_output)` (`modeling_lxmert.py:360`), so
    `outputs[-1]` is the [B, hidden] POOLED tensor and the `[1:]` slice +
    per-"layer" zip actually iterates over batch rows (dropping row 0).
    The reference KD therefore computes exactly a mean pooled-representation
    cosine loss, which is what this function is applied to in
    `train/stage2.py` (minus the drop-first-row artifact). There is no
    per-layer hidden-state distillation to port; `use_kd` is false in every
    shipped script.
    """
    num = jnp.sum(student_rep * teacher_rep, axis=-1)
    den = jnp.linalg.norm(student_rep, axis=-1) * jnp.linalg.norm(teacher_rep, axis=-1)
    return jnp.mean(1.0 - num / jnp.maximum(den, 1e-8))


LOSS_NAMES = ("normal", "lmh", "lpf", "rubi", "poe", "reweight")


def dispatch_loss(loss_type: str, *, logits, pooled, labels, bias, max_label,
                  lmh_params: Optional[dict] = None, gamma: float = 5.0,
                  lmh_w: float = 0.36):
    """The `Masker_type` / `FT_type` loss dispatch of `_training_step`
    (`mask_trainer_Robust_VQA.py:812-831`)."""
    if loss_type == "normal":
        return plain_bce(logits, labels)
    if loss_type == "lmh":
        return learned_mixin(lmh_params, pooled, logits, bias, labels, w=lmh_w)
    if loss_type == "lpf":
        return lpf_loss(logits, bias, max_label, gamma=gamma)
    if loss_type == "rubi":
        return rubi_loss(logits, bias, max_label)
    if loss_type == "poe":
        smooth = lmh_params["smooth_param"] if lmh_params else None
        return bias_product(logits, bias, labels, smooth_param=smooth)
    if loss_type == "reweight":
        return reweight_by_inv_bias(logits, bias, labels)
    raise NotImplementedError(f"loss_type={loss_type!r}")
