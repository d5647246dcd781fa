"""Stage 2 — mask training (the hot path).

TPU-native re-design of `hg_transformers/mask_trainer_Robust_VQA.py` +
`prune_debias_VQA.py`. The frozen fine-tuned params stay constant inside the
jitted step; the trainable leaves are (mask scores, classifier params, debias
loss params). Per-modality binarization thresholds are periodically reset on
device to the kth-value of each module's scores
(`Trainer.reset_threshold`, mask_trainer_Robust_VQA.py:467-482).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import dispatch_loss, learned_mixin_init
from ..masking.masker import Masker
from .common import TrainMetrics, batch_score, make_adamw, model_inputs

PyTree = Any


class Stage2State(struct.PyTreeNode):
    step: jax.Array
    frozen_params: PyTree  # full model params; classifier overridden at merge
    train_params: PyTree  # {'classifier': ..., 'lmh': ...}
    scores: dict
    thresholds: dict
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class Stage2Config:
    masker_type: str = "lmh"  # normal | lmh | lpf | rubi | poe | reweight
    learning_rate: float = 5e-5
    warmup_steps: int = 0
    total_steps: int = 100_000
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    adam_epsilon: float = 1e-8
    gamma: float = 5.0  # LPF focal exponent
    lmh_w: float = 0.36
    hidden_size: int = 768
    # Reference parity: LearnedMixin lives on the Trainer
    # (`mask_trainer_Robust_VQA.py:248`) while the optimizer is built from
    # model.named_parameters() only (`prune_debias_VQA.py:612-630`), so the
    # reference NEVER steps bias_lin / smooth_param — they stay at their
    # random init. True = actually train them (beyond-reference option).
    train_lmh: bool = False
    classifier_key: str = "classifier"  # 'cls' for VisualBERT
    # KD: cosine representation loss against the dense (unmasked) teacher —
    # the frozen stage-1 params themselves (`use_kd` is false in all shipped
    # scripts; CosineLoss at `mask_trainer_Robust_VQA.py:95-97`).
    # kd_mode='pooled': one cosine loss on the pooled rep — what the
    #   reference KD block ACTUALLY computes (its `outputs[-1][1:]` at
    #   :857-865 slices batch rows of the pooled tensor, since the model
    #   returns (loss, logits, pooled), modeling_lxmert.py:360).
    # kd_mode='layerwise': per-layer language-branch hidden-state cosine
    #   losses averaged over layers — the INTENDED per-layer distillation
    #   the reference code was written for (`student_reps[1:]` zip).
    use_kd: bool = False
    kd_mode: str = "pooled"  # 'pooled' | 'layerwise'
    kd_weight: float = 1.0
    # microbatch gradient accumulation (`gradient_accumulation_steps`,
    # mask_trainer_Robust_VQA.py:656-676) as a lax.scan over batch slices
    grad_accum_steps: int = 1
    # integrate |grad| per step into the optimizer state, the reference
    # AdamW's `state['sum']` importance accumulator (optimization.py:100-101)
    accumulate_abs_grad: bool = False
    # storage dtype of the frozen backbone. The masked apply re-reads every
    # frozen weight each step (masker.apply_masks); storing bf16 halves that
    # HBM traffic. Scores, thresholds, and trainables stay fp32. 'float32'
    # (default) matches the reference exactly; 'bfloat16' is the TPU-fast
    # mode (weights quantize once at init — the model computes in bf16
    # anyway when config.dtype is bf16).
    backbone_dtype: str = "float32"
    # storage dtype of the Adam moments (train/common.hf_adamw moment_dtype):
    # 'bfloat16' halves the 210M-score optimizer-state traffic; moment math
    # stays fp32 per step. 'float32' = exact default.
    moment_dtype: str = "float32"


def init_state(model, masker: Masker, params: PyTree, config: Stage2Config,
               rng: jax.Array, grad_mask: Optional[PyTree] = None
               ) -> tuple[Stage2State, optax.GradientTransformation]:
    """Freeze params, build scores via controlled init, split trainables.

    The classifier head stays dense + trainable (`maskers_Robust.py:584-588`
    excludes 'classifier' from freezing); LMH's bias_lin/smooth_param join the
    trainables exactly as in the reference trainer ctor
    (`mask_trainer_Robust_VQA.py:244-248`).
    """
    rng, init_rng, lmh_rng = jax.random.split(rng, 3)
    # one compiled program instead of ~170 eager kth-value dispatches
    scores, thresholds = jax.jit(masker.init)(params, init_rng)
    # Copy params into fresh buffers: the train step donates its input state,
    # which would otherwise invalidate the caller's arrays. The classifier
    # moves to the trainable tree and OUT of the frozen tree (no aliasing).
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    ck = config.classifier_key
    train_params = {"classifier": params[ck]}
    params = {k: v for k, v in params.items() if k != ck}
    if config.backbone_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, params)
    if config.masker_type in ("lmh", "poe"):
        train_params["lmh"] = learned_mixin_init(lmh_rng, config.hidden_size)
    tx = make_adamw(config.learning_rate, config.warmup_steps,
                    config.total_steps, config.weight_decay,
                    config.max_grad_norm, eps=config.adam_epsilon,
                    grad_mask=grad_mask,
                    accumulate_abs_grad=config.accumulate_abs_grad,
                    moment_dtype=(jnp.bfloat16
                                  if config.moment_dtype == "bfloat16"
                                  else None))
    opt_state = tx.init({"train": train_params, "scores": scores})
    return Stage2State(
        step=jnp.zeros((), jnp.int32),
        frozen_params=params,
        train_params=train_params,
        scores=scores,
        thresholds=thresholds,
        opt_state=opt_state,
        rng=rng,
    ), tx


def merge_params(frozen: PyTree, train_params: PyTree,
                 classifier_key: str = "classifier") -> PyTree:
    """Frozen backbone (classifier-free) + trainable classifier."""
    merged = dict(frozen)
    merged[classifier_key] = train_params["classifier"]
    return merged


def make_train_step(model, masker: Masker, tx: optax.GradientTransformation,
                    config: Stage2Config, jit: bool = True,
                    mesh=None) -> Callable:
    """Build the jitted stage-2 train step (`_training_step`,
    mask_trainer_Robust_VQA.py:801-886).

    `mesh` (optional): ZeRO-shard the Adam moments of the 210M mask scores
    over the `data` axis (parallel/zero.py — the DeepSpeed ZeRO-2 analogue
    the reference only applies to mPLUG; here it buys the same
    optimizer-state memory scaling for the LXMERT path). Pair with
    `parallel.zero.shard_opt_state` at init.
    """

    def loss_fn(trainable, state: Stage2State, batch, dropout_rng):
        params = merge_params(state.frozen_params, trainable["train"],
                              config.classifier_key)
        # the rng only feeds MaskedLinear3's bernoulli binarizer
        # (maskers_Robust.py:436-450); schemes 1/2 ignore it
        masked = masker.apply_masks(
            params, trainable["scores"], state.thresholds,
            rng=jax.random.fold_in(dropout_rng, 1))
        layerwise = config.use_kd and config.kd_mode == "layerwise"
        extra = {"collect_hidden": True} if layerwise else {}
        out = model.apply(
            {"params": masked}, **model_inputs(batch),
            deterministic=False, rngs={"dropout": dropout_rng}, **extra,
        )
        logits, pooled = out[0], out[1]
        loss = dispatch_loss(
            config.masker_type, logits=logits, pooled=pooled,
            labels=batch["labels"], bias=batch["bias"],
            max_label=batch["max_label"],
            lmh_params=trainable["train"].get("lmh"),
            gamma=config.gamma, lmh_w=config.lmh_w,
        )
        if config.use_kd:
            from ..losses import cosine_rep_loss

            t_out = model.apply(
                {"params": params}, **model_inputs(batch),
                deterministic=True, **extra)
            if layerwise:
                # per-layer rep loss averaged over layers, embedding state
                # dropped — the reference's `reps[1:]` zip + `/len` at
                # mask_trainer_Robust_VQA.py:857-865
                s_reps, t_reps = out[2][1:], t_out[2][1:]
                rep = sum(
                    cosine_rep_loss(s, jax.lax.stop_gradient(t))
                    for s, t in zip(s_reps, t_reps)) / len(s_reps)
            else:
                rep = cosine_rep_loss(
                    pooled, jax.lax.stop_gradient(t_out[1]))
            loss = loss + config.kd_weight * rep
        return loss, batch_score(logits, batch["labels"])

    def train_step(state: Stage2State, batch) -> tuple[Stage2State, TrainMetrics]:
        rng, dropout_rng = jax.random.split(state.rng)
        trainable = {"train": state.train_params, "scores": state.scores}
        accum = config.grad_accum_steps
        if accum > 1:
            # reshape [B, ...] -> [A, B/A, ...] and scan microbatches,
            # averaging grads (the reference divides loss by accum)
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                batch)
            rngs = jax.random.split(dropout_rng, accum)

            def body(carry, inp):
                g_sum, loss_sum, score_sum = carry
                mb, r = inp
                (l, s), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    trainable, state, mb, r)
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
                return (g_sum, loss_sum + l, score_sum + s), None

            zero = jax.tree_util.tree_map(jnp.zeros_like, trainable)
            (grads, loss, score), _ = jax.lax.scan(
                body, (zero, 0.0, 0.0), (micro, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss / accum
        else:
            (loss, score), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, state, batch, dropout_rng)
        if not config.train_lmh and "lmh" in trainable["train"]:
            # outside the reference optimizer AND its clip_grad_norm_
            # (model.parameters() — the trainer-level LMH module isn't in it)
            grads["train"]["lmh"] = jax.tree_util.tree_map(
                jnp.zeros_like, grads["train"]["lmh"])
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        if mesh is not None:
            from ..parallel.zero import constrain_opt_state

            opt_state = constrain_opt_state(opt_state, mesh)
        new = optax.apply_updates(trainable, updates)
        if not config.train_lmh and "lmh" in trainable["train"]:
            new["train"]["lmh"] = trainable["train"]["lmh"]
        if masker.binarizer_name == "MaskedLinear2":
            # scheme 2's in-place clamp_(-1, 1) after every optimizer step
            # (maskers_Robust.py:398-404 via binarizers.clamp_scores_sign)
            from ..masking import clamp_scores_sign

            new["scores"] = jax.tree_util.tree_map(clamp_scores_sign,
                                                   new["scores"])
        metrics = TrainMetrics(
            loss=loss, score=score,
            batch_size=jnp.asarray(batch["labels"].shape[0], jnp.float32),
        )
        return state.replace(
            step=state.step + 1,
            train_params=new["train"],
            scores=new["scores"],
            opt_state=opt_state,
            rng=rng,
        ), metrics

    return jax.jit(train_step, donate_argnums=(0,)) if jit else train_step


def make_multi_step(model, masker: Masker, tx: optax.GradientTransformation,
                    config: Stage2Config, n_steps: int, mesh=None) -> Callable:
    """Scan `n_steps` train steps in ONE device dispatch.

    TPU-native driver-loop optimization: the host round trip per step (25+ ms
    through a tunneled chip; dataloader/log overhead on any host) disappears
    — XLA runs the whole window on device. The batch argument is a stacked
    pytree with leading dim n_steps; returns (state, per-step losses,
    per-step scores). The reference's per-step Python loop
    (`mask_trainer_Robust_VQA.py:610-623`) has no equivalent.
    """
    step = make_train_step(model, masker, tx, config, jit=False, mesh=mesh)

    def multi(state: Stage2State, batches):
        def body(st, batch):
            st, m = step(st, batch)
            return st, (m.loss, m.score)

        state, (losses, scores) = jax.lax.scan(body, state, batches)
        return state, losses, scores

    return jax.jit(multi, donate_argnums=(0,))


def make_threshold_reset(masker: Masker) -> Callable:
    """Jitted per-modality kth-value threshold reset, applied every
    logging_steps and before each mask export (mask_trainer_Robust_VQA.py:
    700-701, 726-733)."""

    @jax.jit
    def reset(state: Stage2State) -> Stage2State:
        return state.replace(thresholds=masker.reset_thresholds(state.scores))

    return reset


def make_eval_step(model, masker: Masker,
                   config: Optional[Stage2Config] = None) -> Callable:
    """Forward-only step on the masked model (`_prediction_loop`,
    mask_trainer_Robust_VQA.py:1096-1245): returns logits for accumulation."""
    config = config or Stage2Config()

    @jax.jit
    def eval_step(state: Stage2State, batch):
        params = merge_params(state.frozen_params, state.train_params,
                              config.classifier_key)
        # fixed key: eval must be deterministic across batches; only
        # MaskedLinear3's bernoulli binarizer consumes it
        masked = masker.apply_masks(params, state.scores, state.thresholds,
                                    rng=jax.random.PRNGKey(0))
        logits, _ = model.apply({"params": masked}, **model_inputs(batch),
                                deterministic=True)
        return logits

    return eval_step
