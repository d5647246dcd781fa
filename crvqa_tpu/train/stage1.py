"""Stage 1 — full fine-tuning (and stage 3, which is the same loop on a
permanently pruned model).

Re-design of `hg_transformers/mask_trainer_VQA.py` + `run_vqa_stage1.py` /
`run_vqa_stage3.py`. All params train; `FT_type` dispatches the debias loss.
For stage 3 a constant bool-mask pytree multiplies the masked weights every
forward (the JAX analogue of `prune.CustomFromMask`: masked entries then get
exactly zero gradient, so Adam never moves them).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import dispatch_loss, learned_mixin_init
from ..masking.masker import Masker
from .common import TrainMetrics, batch_score, make_adam, model_inputs

PyTree = Any


class Stage1State(struct.PyTreeNode):
    step: jax.Array
    params: PyTree
    lmh_params: Optional[PyTree]
    masks: Optional[dict]  # stage 3: constant bool masks keyed by spec key
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class Stage1Config:
    ft_type: str = "normal"  # normal | lmh | lpf | rubi
    learning_rate: float = 5e-5
    warmup_steps: int = 34235  # bash_files/Stage1/run_vqa_stage1.sh
    total_steps: int = 100_000
    max_grad_norm: float = 1.0
    adam_epsilon: float = 1e-8
    gamma: float = 5.0
    lmh_w: float = 0.36
    hidden_size: int = 768
    # Reference parity: the LMH module lives on the Trainer while the
    # optimizer covers only model.named_parameters()
    # (`run_vqa_stage1.py:341-362`, `mask_trainer_Robust_VQA.py:248`), so
    # bias_lin / smooth_param receive gradients but are NEVER stepped.
    # True = actually train them (beyond-reference option).
    train_lmh: bool = False
    # microbatch gradient accumulation (`gradient_accumulation_steps`,
    # mask_trainer_VQA.py grad-accum arm — same semantics as stage2's):
    # the batch splits into `grad_accum_steps` microbatches whose grads
    # average before ONE Adam update. At the canonical bs 64 the dense
    # optimizer update (fp32 moments over 209M params) is a fixed HBM cost
    # per step — accumulation amortizes it without changing the recipe's
    # effective batch arithmetic (loss/grad averages match to fp noise).
    grad_accum_steps: int = 1
    # storage dtype of the Adam moments (train/common.torch_adam): at the
    # canonical bs 64 the dense fp32 m/v traffic is ~27% of the step
    # (profile_stage1 optimizer floor); 'bfloat16' halves it. 'float32' =
    # the exact optax.adam path (trajectory-oracle-pinned to torch).
    moment_dtype: str = "float32"


def init_state(params: PyTree, config: Stage1Config, rng: jax.Array,
               masks: Optional[dict] = None
               ) -> tuple[Stage1State, optax.GradientTransformation]:
    rng, lmh_rng = jax.random.split(rng)
    # fresh buffers: the train step donates its input state
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    if masks is not None:
        masks = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), masks)
    lmh_params = (learned_mixin_init(lmh_rng, config.hidden_size)
                  if config.ft_type in ("lmh", "poe") else None)
    tx = make_adam(config.learning_rate, config.warmup_steps,
                   config.total_steps, config.max_grad_norm,
                   eps=config.adam_epsilon,
                   moment_dtype=(jnp.bfloat16
                                 if config.moment_dtype == "bfloat16"
                                 else None))
    opt_state = tx.init({"params": params, "lmh": lmh_params})
    return Stage1State(
        step=jnp.zeros((), jnp.int32), params=params, lmh_params=lmh_params,
        masks=masks, opt_state=opt_state, rng=rng,
    ), tx


def make_train_step(model, config: Stage1Config,
                    tx: optax.GradientTransformation,
                    masker: Optional[Masker] = None,
                    jit: bool = True) -> Callable:
    """`masker` present => stage 3 (apply the constant mask each forward)."""

    def loss_fn(trainable, state: Stage1State, batch, dropout_rng):
        params = trainable["params"]
        if masker is not None and state.masks is not None:
            params = masker.prune_params(params, state.masks)
        logits, pooled = model.apply(
            {"params": params}, **model_inputs(batch),
            deterministic=False, rngs={"dropout": dropout_rng},
        )
        loss = dispatch_loss(
            config.ft_type, logits=logits, pooled=pooled,
            labels=batch["labels"], bias=batch["bias"],
            max_label=batch["max_label"], lmh_params=trainable["lmh"],
            gamma=config.gamma, lmh_w=config.lmh_w,
        )
        return loss, batch_score(logits, batch["labels"])

    def train_step(state: Stage1State, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        trainable = {"params": state.params, "lmh": state.lmh_params}
        accum = config.grad_accum_steps
        if accum > 1:
            # [B, ...] -> [A, B/A, ...] microbatch scan, grads averaged
            # before the single Adam update (stage2.py pattern)
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
            loss = loss / accum  # score is a batch SUM — microbatch sums add
        else:
            (loss, score), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, state, batch, dropout_rng)
        if not config.train_lmh and trainable["lmh"] is not None:
            # LMH params are outside the reference optimizer AND outside its
            # clip_grad_norm_(model.parameters()) — zeroing before tx.update
            # keeps them out of the global clip norm too
            grads["lmh"] = jax.tree_util.tree_map(jnp.zeros_like, grads["lmh"])
        updates, opt_state = tx.update(grads, state.opt_state, trainable)
        new = optax.apply_updates(trainable, updates)
        if not config.train_lmh and trainable["lmh"] is not None:
            new["lmh"] = trainable["lmh"]
        metrics = TrainMetrics(
            loss=loss, score=score,
            batch_size=jnp.asarray(batch["labels"].shape[0], jnp.float32),
        )
        return state.replace(
            step=state.step + 1, params=new["params"], lmh_params=new["lmh"],
            opt_state=opt_state, rng=rng,
        ), metrics

    return jax.jit(train_step, donate_argnums=(0,)) if jit else train_step


def make_multi_step(model, config: Stage1Config,
                    tx: optax.GradientTransformation, n_steps: int,
                    masker: Optional[Masker] = None) -> Callable:
    """Scan `n_steps` stage-1/3 train steps in ONE device dispatch (the
    stage-2 `make_multi_step` pattern — stage2.py:261-282): the per-step host
    round trip disappears. Batches are a stacked pytree with leading dim
    n_steps; returns (state, per-step losses, per-step scores)."""
    step = make_train_step(model, config, tx, masker=masker, jit=False)

    def multi(state: Stage1State, batches):
        def body(st, batch):
            st, m = step(st, batch)
            return st, (m.loss, m.score)

        state, (losses, scores) = jax.lax.scan(body, state, batches)
        return state, losses, scores

    return jax.jit(multi, donate_argnums=(0,))


def make_eval_step(model, masker: Optional[Masker] = None) -> Callable:
    @jax.jit
    def eval_step(state: Stage1State, batch):
        params = state.params
        if masker is not None and state.masks is not None:
            params = masker.prune_params(params, state.masks)
        logits, _ = model.apply({"params": params}, **model_inputs(batch),
                                deterministic=True)
        return logits

    return eval_step
