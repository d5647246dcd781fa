"""mPLUG training — full-model fine-tuning and mask training.

Re-design of `mPLUG/vqa_mplug.py:train` (:130-218): DeepSpeed drove
backward/step over NCCL; here one jitted step computes the weighted
(1-bias)-reweighted LM loss, takes grads w.r.t. either the full params
(full-model mode) or the mask scores (mask-train mode), applies the
dual-LR AdamW (`mPLUG/optim/optim_factory.py:create_two_optimizer` — lr1
body, lr2 visual encoder) with cosine schedule
(`full_model_debias.yaml` optimizer/schedular blocks), and keeps Adam
moments ZeRO-sharded over the `data` mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from ..masking.masker import Masker
from ..models.mplug.mplug import momentum_update

PyTree = Any


class MPlugState(struct.PyTreeNode):
    step: jax.Array
    params: PyTree  # trainable in full mode; frozen in mask mode
    scores: Optional[dict]
    thresholds: Optional[dict]
    params_m: Optional[PyTree]  # momentum twins (distill)
    opt_state: Any
    rng: jax.Array
    # EMA of the twins' mask scores (distill + mask mode): the reference's
    # patched `_m` modules carry their own weight_mask params that
    # `_momentum_update` EMAs from the live ones at momentum 0.995
    # (model_vqa_mplug.py:150-181 over model_pairs incl. masked modules),
    # and `reset_threshold` re-derives the twins' thresholds from THEIR
    # scores (mPLUG/masking/maskers.py:689-711 walks every patched module).
    scores_m: Optional[dict] = None
    thresholds_m: Optional[dict] = None


@dataclasses.dataclass(frozen=True)
class MPlugTrainConfig:
    mode: str = "mask"  # 'full' | 'mask'
    lr1: float = 3e-5  # body
    lr2: float = 5e-6  # visual encoder
    weight_decay: float = 0.02
    warmup_steps: int = 1000
    total_steps: int = 100_000
    min_lr: float = 1e-6
    sched: str = "cosine"  # cosine | tanh | step (scheduler_factory.py:10)
    decay_rate: float = 0.1  # 'step' schedule only
    decay_steps: int = 0  # 'step' schedule only
    # Reference-exact epoch-granular driving (timm t_in_epochs=True): when
    # steps_per_epoch > 0 the LR follows `timm_epoch_schedule` — the exact
    # trajectory of the reference loop (yaml `schedular:` block: epochs 8,
    # warmup_epochs 4, warmup_lr 1e-5, decay_rate 1). steps_per_epoch == 0
    # keeps the smooth step-granular surface (`make_lr_schedule`) driven by
    # warmup_steps/total_steps above.
    steps_per_epoch: int = 0
    epochs: int = 8
    warmup_epochs: int = 4
    warmup_lr_init: float = 1e-5
    decay_epochs: int = 1  # 'step' sched, epoch mode
    opt: str = "adamw"  # optim_factory.py:56-127 surface (yaml `opt:`)
    opt_momentum: float = 0.9  # sgd/momentum/rmsprop only
    max_grad_norm: float = 1.0
    use_bias_reweight: bool = True  # the (1-bias)*loss debias term
    distill: bool = False
    momentum: float = 0.995
    # distillation mixing weight; ramps 0 -> alpha over the first
    # `alpha_warmup_steps` steps (= one epoch) exactly like the reference's
    # `alpha * min(1, i/len(data_loader))` warm_up (vqa_mplug.py:165-168,
    # full_model.yaml alpha: 0.4, warm_up: True)
    alpha: float = 0.4
    alpha_warmup_steps: int = 0  # 0 disables the ramp (warm_up: False)
    # Mask mode keeps these param-name substrings trainable alongside the
    # scores: the reference skips `requires_grad=False` for any module whose
    # name contains 'predictions' and (with train_classifier=True, the
    # shipped default) 'classifier' (mPLUG/masking/maskers.py:620-626,
    # mask_config.py:train_classifier). For MPlug that is the decoder LM head
    # transform + the untied predictions bias (the tied decoder weight IS the
    # frozen word embedding, same as torch where the shared tensor inherits
    # the embedding freeze).
    train_classifier: bool = True

    @property
    def head_substrings(self) -> tuple[str, ...]:
        return ("predictions", "classifier") if self.train_classifier else (
            "predictions",)


def _path_parts(prefix: tuple[str, ...]) -> list[str]:
    """Expand a pytree path whose components may themselves be '/'-joined
    flat score keys into individual name parts."""
    parts: list[str] = []
    for p in prefix:
        parts.extend(str(p).split("/"))
    return parts


def _map_with_path(tree, fn, prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        return {k: _map_with_path(v, fn, prefix + (k,)) for k, v in tree.items()}
    return fn(_path_parts(prefix))


def split_head_params(params: PyTree, substrings: Sequence[str]
                      ) -> dict[str, jax.Array]:
    """Flat '/'-keyed dict of the params that stay trainable in mask mode."""
    flat = traverse_util.flatten_dict(params)
    return {"/".join(k): v for k, v in flat.items()
            if any(s in part for part in k for s in substrings)}


def merge_head_params(params: PyTree, head: dict[str, jax.Array]) -> PyTree:
    flat = dict(traverse_util.flatten_dict(params))
    for k, v in head.items():
        flat[tuple(k.split("/"))] = v
    return traverse_util.unflatten_dict(flat)


def _cosine(lr: float, warmup: int, total: int, min_lr: float):
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=lr, warmup_steps=max(warmup, 1),
        decay_steps=max(total, warmup + 1), end_value=min_lr)


def timm_epoch_schedule(sched: str, lr: float, warmup_epochs: int,
                        epochs: int, min_lr: float, steps_per_epoch: int,
                        decay_rate: float = 1.0, decay_epochs: int = 1,
                        warmup_lr_init: float = 1e-5,
                        step_size: int = 100) -> optax.Schedule:
    """The EXACT LR trajectory the reference mPLUG loop produces, as a pure
    function of the global step.

    The reference drives the vendored timm schedulers epoch-granularly
    (`t_in_epochs=True`): during epoch 0 it advances warmup one unit every
    `step_size`=100 iterations while `i <= warmup_epochs*step_size`
    (`vqa_mplug.py:145-146,200-201`), and at each epoch end calls
    `lr_scheduler.step(epoch + warmup_epochs)` (`:431`), so epoch e>=1 runs
    entirely at `_get_lr(e - 1 + warmup_epochs)`. Scheduler construction
    presets the lr to `warmup_lr_init` (`scheduler/cosine_lr.py:63-65`).

    `_get_lr` semantics reproduced per scheduler (single cycle, t_mul=1,
    cycle_limit=1):
    - cosine (`cosine_lr.py:68-95`, warmup_prefix=True): linear
      warmup_lr_init -> lr over warmup_epochs units, then
      gamma^i * (min_lr + (lr-min_lr)/2 * (1+cos(pi*t_curr/epochs))) on the
      POST-warmup clock; min_lr once the cycle is exhausted.
    - tanh (`tanh_lr.py:64-99`, warmup_prefix=False): warmup ramps to the
      tanh value AT t=warmup_epochs (`t_v = self._get_lr(self.warmup_t)`),
      and the tanh clock `tr = t/epochs` INCLUDES the warmup span.
    - step (`step_lr.py:46-51`): lr * decay_rate**(t // decay_epochs) on the
      raw clock, no min_lr floor.
    """
    spe = max(int(steps_per_epoch), 1)
    warmup_t = int(warmup_epochs)
    t_initial = max(int(epochs), 1)
    # warmup sub-steps that actually fire inside epoch 0: multiples of
    # step_size that are both <= warmup_iterations and < steps-in-epoch-0
    cap = min(warmup_t, (spe - 1) // step_size) if warmup_t > 0 else 0

    def _decay_lr(tf):
        """timm `_get_lr` decay branch at (float) unit clock tf."""
        if sched == "cosine":
            td = tf - warmup_t  # warmup_prefix=True
            i = jnp.floor(td / t_initial)
            t_curr = td - i * t_initial
            gamma = decay_rate ** i
            val = gamma * (min_lr + 0.5 * (lr - min_lr)
                           * (1.0 + jnp.cos(jnp.pi * t_curr / t_initial)))
            return jnp.where(i < 1, val, min_lr)  # cycle_limit=1
        if sched == "tanh":
            lb, ub = -6.0, 4.0
            i = jnp.floor(tf / t_initial)  # warmup_prefix=False: raw clock
            t_curr = tf - i * t_initial
            tr = t_curr / t_initial
            gamma = decay_rate ** i
            val = gamma * min_lr + 0.5 * (lr - min_lr) * gamma * (
                1.0 - jnp.tanh(lb * (1.0 - tr) + ub * tr))
            return jnp.where(i < 1, val, min_lr * decay_rate)
        if sched == "step":
            d = max(int(decay_epochs), 1)
            return lr * decay_rate ** jnp.floor(tf / d)
        raise ValueError(f"unsupported sched '{sched}'")

    if sched == "tanh" and warmup_t > 0:
        # ramp target is the tanh value at t=warmup_t, not the base lr
        warm_target = float(_decay_lr(jnp.asarray(float(warmup_t))))
    else:
        warm_target = lr

    def schedule(step):
        s = jnp.asarray(step, jnp.int32)
        e = s // spe
        t0 = jnp.clip((s - 1) // step_size, 0, cap)
        t = jnp.where(e == 0, t0, e - 1 + warmup_t)
        tf = t.astype(jnp.float32)
        if warmup_t > 0:
            warm = warmup_lr_init + tf * (warm_target - warmup_lr_init) / warmup_t
            return jnp.where(t < warmup_t, warm, _decay_lr(tf))
        return _decay_lr(tf)

    return schedule


def make_lr_schedule(sched: str, lr: float, warmup: int, total: int,
                     min_lr: float, decay_rate: float = 0.1,
                     decay_steps: int = 0) -> optax.Schedule:
    """The reference's timm scheduler factory as pure step schedules
    (`mPLUG/scheduler/scheduler_factory.py:10-90`; only 'cosine' is used by
    the shipped yaml configs). Step-granular where timm is epoch-granular.

    - cosine: warmup-cosine to min_lr (CosineLRScheduler, single cycle).
    - tanh:   lr_min + (lr-lr_min)/2 * (1 - tanh(lb*(1-tr) + ub*tr)) with
      timm's lb=-6, ub=4 defaults (`tanh_lr.py:27-28,94`), linear warmup.
    - step:   lr * decay_rate ** (t // decay_steps) (`step_lr.py:20-42`),
      linear warmup.
    - plateau: metric-driven (host-side state) — not expressible as a pure
      step schedule; unused by every shipped config, so it raises.
    """
    if sched == "cosine":
        return _cosine(lr, warmup, total, min_lr)
    warmup = max(warmup, 1)
    if sched == "tanh":
        lb, ub = -6.0, 4.0
        span = max(total - warmup, 1)

        def tanh_sched(step):
            t = jnp.asarray(step, jnp.float32)
            warm = lr * t / warmup
            tr = jnp.clip((t - warmup) / span, 0.0, 1.0)
            decay = min_lr + 0.5 * (lr - min_lr) * (
                1.0 - jnp.tanh(lb * (1.0 - tr) + ub * tr))
            return jnp.where(t < warmup, warm, decay)

        return tanh_sched
    if sched == "step":
        d = max(decay_steps, 1)

        def step_sched(step):
            t = jnp.asarray(step, jnp.float32)
            warm = lr * t / warmup
            decay = lr * decay_rate ** jnp.floor((t - warmup) / d)
            return jnp.maximum(jnp.where(t < warmup, warm, decay), min_lr)

        return step_sched
    raise ValueError(f"unsupported sched '{sched}' (cosine|tanh|step; "
                     "'plateau' is metric-driven and unused by any shipped "
                     "reference config)")


def two_group_labels(tree) -> PyTree:
    """'visual' for every leaf under visual_encoder (nested param trees AND
    flat '/'-keyed score/head dicts), 'body' otherwise."""
    return _map_with_path(
        tree, lambda parts: "visual" if "visual_encoder" in parts else "body")


def decay_mask(tree) -> PyTree:
    """True where AdamW weight decay applies. The reference's no_decay list
    is ["bias", "LayerNorm.weight"] by SUBSTRING on the torch name
    (optim_factory.py:142-155). Note the substring test misses the CLIP
    ViT's norms — torch names them ln_1/ln_2/ln_pre/ln_post, so
    "…ln_1.weight" does NOT contain "LayerNorm.weight" and the reference
    DECAYS the visual encoder's norm weights. Our modules mirror the torch
    attribute names, so the flax-equivalent rule is: leaf name containing
    'bias', or a 'scale' whose owning module name ends with 'LayerNorm'
    (oracle: tests/test_ref_oracle_optim.py)."""

    def fn(parts):
        if "bias" in parts[-1]:
            return False
        if (parts[-1] == "scale" and len(parts) > 1
                and parts[-2].endswith("LayerNorm")):
            return False
        return True

    return _map_with_path(tree, fn)


def _inner_optimizer(config: "MPlugTrainConfig", schedule) -> optax.GradientTransformation:
    """One optimizer from the reference's timm factory surface
    (`mPLUG/optim/optim_factory.py:56-127`; the shipped yamls use adamW
    only). Torch's coupled L2 (weight_decay folded into the gradient before
    momentum) is reproduced by `add_decayed_weights` BEFORE the transform;
    adamW/lamb use their native decoupled decay. Fused/apex variants are the
    same math (fusion is XLA's job here); adamp/sgdp/rmsproptf are
    oracle-tested re-implementations in train/timm_optim.py; adahessian is
    handled one level up (make_two_group_adamw) — its update input is a
    (grads, hess) pair, not a plain gradient."""
    o = config.opt.lower().split("_")[-1]
    wd = optax.add_decayed_weights(config.weight_decay, mask=decay_mask)
    mom = config.opt_momentum
    from . import timm_optim

    table = {
        "sgd": lambda: optax.chain(wd, optax.sgd(schedule, momentum=mom,
                                                 nesterov=True)),
        "nesterov": lambda: optax.chain(wd, optax.sgd(schedule, momentum=mom,
                                                      nesterov=True)),
        "momentum": lambda: optax.chain(wd, optax.sgd(schedule, momentum=mom,
                                                      nesterov=False)),
        "adam": lambda: optax.chain(wd, optax.adam(schedule)),
        "adamw": lambda: optax.adamw(schedule, weight_decay=config.weight_decay,
                                     mask=decay_mask),
        "fusedadam": lambda: optax.chain(wd, optax.adam(schedule)),
        "fusedadamw": lambda: optax.adamw(
            schedule, weight_decay=config.weight_decay, mask=decay_mask),
        "nadam": lambda: optax.chain(wd, optax.nadam(schedule)),
        "radam": lambda: optax.chain(wd, optax.radam(schedule)),
        "adadelta": lambda: optax.chain(wd, optax.adadelta(schedule)),
        "adafactor": lambda: optax.chain(wd, optax.adafactor(schedule)),
        "rmsprop": lambda: optax.chain(wd, optax.rmsprop(
            schedule, decay=0.9, momentum=mom)),
        "novograd": lambda: optax.chain(wd, optax.novograd(schedule)),
        "fusedlamb": lambda: optax.lamb(schedule,
                                        weight_decay=config.weight_decay,
                                        mask=decay_mask),
        "lamb": lambda: optax.lamb(schedule, weight_decay=config.weight_decay,
                                   mask=decay_mask),
        # the stragglers optax lacks — oracle-tested re-implementations of
        # the vendored timm classes (train/timm_optim.py); factory kwargs
        # per optim_factory.py:95-110. Their projection/shrink decay reads
        # params, so the coupled-L2 prepend does NOT apply (decay is
        # internal, like the torch classes).
        "adamp": lambda: timm_optim.adamp(
            schedule, weight_decay=config.weight_decay, wd_ratio=0.01,
            nesterov=True),
        "sgdp": lambda: timm_optim.sgdp(
            schedule, momentum=mom, nesterov=True,
            weight_decay=config.weight_decay),
        "rmsproptf": lambda: timm_optim.rmsprop_tf(
            schedule, alpha=0.9, momentum=mom,
            weight_decay=config.weight_decay),
    }
    if o not in table:
        # adahessian never reaches here: make_two_group_adamw builds its
        # self-contained pair-input transformation (is_second_order)
        raise ValueError(f"unsupported opt '{config.opt}' "
                         f"(one of {sorted(table)} or adahessian)")
    return table[o]()


def is_second_order(config: "MPlugTrainConfig") -> bool:
    """adahessian needs Hessian-diagonal probes alongside the gradients
    (the torch class's `is_second_order` property, adahessian.py:56-58)."""
    return config.opt.lower().split("_")[-1] == "adahessian"


def make_two_group_adamw(config: MPlugTrainConfig):
    """Dual-LR optimizer: visual-encoder leaves at lr2, everything else lr1,
    with bias/LayerNorm excluded from weight decay
    (optim_factory.create_two_optimizer, mPLUG/optim/optim_factory.py:141-171).
    The inner optimizer is `config.opt` (default adamW, the shipped choice).
    """

    def sched(lr):
        if config.steps_per_epoch > 0:
            return timm_epoch_schedule(
                config.sched, lr, config.warmup_epochs, config.epochs,
                config.min_lr, config.steps_per_epoch,
                decay_rate=config.decay_rate,
                decay_epochs=config.decay_epochs,
                warmup_lr_init=config.warmup_lr_init)
        return make_lr_schedule(
            config.sched, lr, config.warmup_steps, config.total_steps,
            config.min_lr, config.decay_rate, config.decay_steps)

    if is_second_order(config):
        # adahessian's update input is the (grads, hess) PAIR produced by
        # timm_optim.hutchinson in the train step, so it owns its clip/
        # grouping/decay instead of riding the shared chain below
        from .timm_optim import adahessian_two_group

        return adahessian_two_group(
            sched(config.lr1), sched(config.lr2), two_group_labels,
            weight_decay=config.weight_decay,
            max_grad_norm=config.max_grad_norm, decay_mask=decay_mask)

    return optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.multi_transform(
            {"body": _inner_optimizer(config, sched(config.lr1)),
             "visual": _inner_optimizer(config, sched(config.lr2))},
            two_group_labels),
    )


def init_state(model, params: PyTree, config: MPlugTrainConfig,
               rng: jax.Array, masker: Optional[Masker] = None,
               ) -> tuple[MPlugState, optax.GradientTransformation]:
    params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
    scores = thresholds = None
    tx = make_two_group_adamw(config)
    if config.mode == "mask":
        assert masker is not None
        # one compiled program instead of hundreds of eager dispatches
        scores, thresholds = jax.jit(masker.init)(params, rng)
        # scores train through the STE; the LM-head ('predictions') and
        # classifier params stay trainable too (maskers.py:620-626)
        opt_state = tx.init({
            "scores": scores,
            "head": split_head_params(params, config.head_substrings)})
    else:
        opt_state = tx.init(params)
    params_m = (jax.tree_util.tree_map(jnp.copy, params)
                if config.distill else None)
    # twins start as exact copies (reference copy_params at ctor,
    # model_vqa_mplug.py:139-148) — incl. their mask scores/thresholds
    scores_m = (jax.tree_util.tree_map(jnp.copy, scores)
                if config.distill and scores is not None else None)
    thresholds_m = (jax.tree_util.tree_map(jnp.copy, thresholds)
                    if config.distill and thresholds is not None else None)
    return MPlugState(step=jnp.zeros((), jnp.int32), params=params,
                      scores=scores, thresholds=thresholds, params_m=params_m,
                      opt_state=opt_state, rng=rng,
                      scores_m=scores_m, thresholds_m=thresholds_m), tx


def make_train_step(model, config: MPlugTrainConfig,
                    tx: optax.GradientTransformation,
                    masker: Optional[Masker] = None,
                    mesh=None) -> Callable:
    from ..parallel.zero import constrain_opt_state

    def _soft_labels(state: MPlugState, batch):
        """Momentum twins -> soft labels (model_vqa_mplug.py:65-92). In mask
        mode the twins are masked with their OWN EMA'd scores and thresholds
        (state.scores_m/thresholds_m) — the reference EMAs the twins'
        weight_mask params from the live ones at momentum 0.995 and resets
        the twins' thresholds from the twin scores, so the binarized twin
        masks track the live masks with the EMA lag."""
        params_m = state.params_m
        if config.mode == "mask":
            params_m = masker.apply_masks(params_m, state.scores_m,
                                          state.thresholds_m,
                                          momentum_tree=True)
        logits_m = model.apply(
            {"params": params_m}, batch["images"], batch["question_ids"],
            batch["question_mask"], batch["answer_ids"], batch["answer_mask"],
            deterministic=True, method=model.answer_logits)
        return jax.nn.softmax(logits_m[:, :-1].astype(jnp.float32), axis=-1)

    def loss_fn(trainable, state: MPlugState, batch, dropout_rng, soft, alpha):
        if config.mode == "mask":
            # head params ('predictions'/'classifier') ride in the trainable
            # tree so their grads update them directly — the analogue of the
            # reference NOT freezing them (maskers.py:620-626)
            params = merge_head_params(state.params, trainable["head"])
            params = masker.apply_masks(params, trainable["scores"],
                                        state.thresholds)
        else:
            params = trainable
        bias = batch.get("bias") if config.use_bias_reweight else None
        loss = model.apply(
            {"params": params}, batch["images"], batch["question_ids"],
            batch["question_mask"], batch["answer_ids"], batch["answer_mask"],
            batch["weights"], bias=bias, deterministic=False,
            soft_labels=soft, alpha=alpha, rngs={"dropout": dropout_rng})
        return loss

    def train_step(state: MPlugState, batch):
        rng, dropout_rng = jax.random.split(state.rng)
        soft = None
        alpha = 0.0
        if config.distill:
            # EMA the twins BEFORE producing soft labels, like
            # _momentum_update at the top of the distill branch — the
            # twins' mask scores EMA from the live scores too
            kw_m = dict(params_m=momentum_update(
                state.params, state.params_m, config.momentum))
            if config.mode == "mask":
                kw_m["scores_m"] = momentum_update(
                    state.scores, state.scores_m, config.momentum)
            state = state.replace(**kw_m)
            soft = _soft_labels(state, batch)
            alpha = jnp.asarray(config.alpha, jnp.float32)
            if config.alpha_warmup_steps:
                alpha = alpha * jnp.minimum(
                    1.0, state.step.astype(jnp.float32)
                    / config.alpha_warmup_steps)
        if config.mode == "mask":
            trainable = {"scores": state.scores,
                         "head": split_head_params(state.params,
                                                   config.head_substrings)}
        else:
            trainable = state.params
        if is_second_order(config):
            # one extra JVP pass per step: (grads, H@z) together via
            # forward-over-reverse (timm_optim.hutchinson) — the capability
            # the reference's DeepSpeed backward lacks (never sets
            # create_graph, so its own adahessian option gets zero Hessians)
            from .timm_optim import hutchinson

            rng, hess_rng = jax.random.split(rng)
            loss, grads, hess = hutchinson(
                loss_fn, trainable, hess_rng, state, batch, dropout_rng,
                soft, alpha)
            updates, opt_state = tx.update((grads, hess), state.opt_state,
                                           trainable)
        else:
            loss, grads = jax.value_and_grad(loss_fn)(
                trainable, state, batch, dropout_rng, soft, alpha)
            updates, opt_state = tx.update(grads, state.opt_state, trainable)
        if mesh is not None:
            opt_state = constrain_opt_state(opt_state, mesh)  # ZeRO-2 analogue
        new = optax.apply_updates(trainable, updates)
        kw = dict(step=state.step + 1, opt_state=opt_state, rng=rng)
        if config.mode == "mask":
            kw["scores"] = new["scores"]
            kw["params"] = merge_head_params(state.params, new["head"])
        else:
            kw["params"] = new
        return state.replace(**kw), loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_threshold_reset(masker: Masker) -> Callable:
    """Periodic per-module kth-value reset driven every `masker_update_step`
    steps by the caller (`vqa_mplug.py:206-212`). Accepts the current target
    sparsity from the MaskerScheduler (gradual-warmup path) as a TRACED
    scalar — one compile covers the whole moving AGP schedule (compiles
    through the axon tunnel cost minutes; kth_smallest already takes a
    traced k)."""

    def _reset(state: MPlugState, target=None) -> MPlugState:
        kw = dict(thresholds=masker.reset_thresholds(state.scores, target))
        if state.scores_m is not None:
            # the reference reset walks EVERY patched module incl. the `_m`
            # twins (maskers.py:689-711): twin thresholds come from the
            # twins' own EMA'd scores
            kw["thresholds_m"] = masker.reset_thresholds(state.scores_m,
                                                         target)
        return state.replace(**kw)

    @jax.jit
    def _reset_default(state: MPlugState) -> MPlugState:
        return _reset(state)

    @jax.jit
    def _reset_target(state: MPlugState, target: jax.Array) -> MPlugState:
        return _reset(state, target)

    def reset(state: MPlugState, target: Optional[float] = None) -> MPlugState:
        if target is None:
            return _reset_default(state)
        return _reset_target(state, jnp.asarray(target, jnp.float32))

    reset._reset_target = _reset_target  # exposed for compile-count tests
    return reset


def make_generate_step(model, config: MPlugTrainConfig,
                       masker: Optional[Masker] = None,
                       beam_size: int = 5, max_len: int = 12,
                       min_length: int = 1, lp_alpha: float = 0.6,
                       use_cache: bool = True,
                       cache_reorder: str = "onehot") -> Callable:
    """Beam-search answer generation for evaluation
    (`vqa_mplug.py:247-287`; GNMT length penalty + min_length EOS block per
    `predictor.py:61,207-237`).

    `use_cache`: incremental decoding with per-layer self-attention KV
    caches (the reference predictor's `state.cache`) — each step runs the
    decoder on ONE new row instead of recomputing the whole prefix; beam
    reorders reindex the caches. Identical outputs (equivalence-tested);
    chip-measured beam-5 bs 32: 352.9 ex/s vs 269.4 without (+31%,
    benchmarks/bench_generate.py --cache, v5e) — default ON; flag kept so
    the A/B stays measurable."""
    from ..models.mplug.generator import (
        beam_generate,
        init_self_caches,
        precompute_cross_kv,
    )

    @jax.jit
    def generate(state: MPlugState, batch):
        params = state.params
        if config.mode == "mask" and state.scores is not None:
            params = masker.apply_masks(params, state.scores, state.thresholds)

        states, state_mask = model.apply(
            {"params": params}, batch["images"], batch["question_ids"],
            batch["question_mask"], method=model.encode)

        bc = model.config.bert
        # cross-K/V projected ONCE from the UNREPLICATED memory; the decode
        # groups each item's W beam rows over it (memory_groups) so the
        # per-step cross-attend reads the K/V once per item, not per beam
        cross_kv = precompute_cross_kv(
            params["text_decoder"], states, bc.text_decode_layers,
            bc.num_attention_heads, bc.head_size, dtype=bc.dtype)

        def decode(ids, mask, st, st_mask, position=None):
            return model.apply({"params": params}, ids, mask, st, st_mask,
                               cross_kv=cross_kv, position=position,
                               memory_groups=beam_size,
                               method=model.decode_logits)

        decode_step = init_caches = None
        if use_cache:
            init_caches = init_self_caches(
                states.shape[0] * beam_size, bc.text_decode_layers, max_len,
                bc.num_attention_heads, bc.head_size, dtype=bc.dtype)

            def decode_step(ids, st, st_mask, position, caches):
                return model.apply({"params": params}, ids, st, st_mask,
                                   position, caches, cross_kv=cross_kv,
                                   memory_groups=beam_size,
                                   method=model.decode_logits_step)

        cfg = model.config
        return beam_generate(decode, states, state_mask, beam_size=beam_size,
                             max_len=max_len, bos=cfg.bos_token_id,
                             eos=cfg.eos_token_id, pad=cfg.pad_token_id,
                             min_length=min_length, lp_alpha=lp_alpha,
                             group_memory=True, decode_step=decode_step,
                             init_caches=init_caches, reorder=cache_reorder)

    return generate
