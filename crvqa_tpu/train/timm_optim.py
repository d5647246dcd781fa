"""The timm-optimizer stragglers of the reference's factory surface.

Re-designs of the reference's vendored timm implementations that optax has
no equivalent for (`mPLUG/optim/adamp.py`, `sgdp.py`, `rmsprop_tf.py`,
`mPLUG/scheduler/plateau_lr.py`) — each an optax `GradientTransformation`
oracle-tested against the actual reference classes under torch
(tests/test_timm_optim.py). None is used by any shipped config
(`full_model*.yaml` use adamW + cosine); they exist so the factory surface
is complete.

AdamP/SGDP (`Slowing Down the Weight Norm Increase in Momentum-based
Optimizers`, arXiv 2006.08217): the momentum update of a scale-invariant
parameter (detected by a low |cos| between grad and param under channel and
layer views) is projected onto the tangent space of the weight-norm sphere,
and its weight decay is damped by `wd_ratio`. The torch code applies decay
as a multiplicative shrink BEFORE the step; reproduced exactly in the
returned update (new_p = p*(1 - lr*wd*ratio) - step, i.e. update =
-lr*wd*ratio*p - step).

RMSpropTF: TF-semantics RMSprop — square_avg initialized to ONES, eps
inside the sqrt, coupled weight decay, and the LR folded into the momentum
buffer (`lr_in_momentum`, rmsprop_tf.py:125-128).

AdaHessian (arXiv 2006.00719; vendored `mPLUG/optim/adahessian.py`): the
Hutchinson Hessian-diagonal probe z*(H@z) the torch class computes with a
create_graph backward is ONE forward-over-reverse `jax.jvp` of the grad
function here (`hutchinson`) — a capability note: the reference's own
driver can never use its adahessian option (DeepSpeed's backward doesn't
set create_graph, so p.hess stays 0.0 and every denominator collapses to
eps). `adahessian_two_group` owns clip/grouping/decay because its update
input is the (grads, hess) pair, not a plain gradient.

PlateauLR: torch `ReduceLROnPlateau` semantics (patience/threshold/
cooldown/mode) as a HOST-side controller producing an LR scale in [0, 1],
applied through `dynamic_scale()` (a jit-pure transformation holding the
scale in optimizer state, set functionally via `set_dynamic_scale`).
Reference defect worth knowing: `mPLUG/vqa_mplug.py:200-201` calls
`lr_scheduler.step(epoch)` with no metric, so the reference's plateau
option crashes in its own driver (`plateau_lr.py:step` feeds metric=None
into ReduceLROnPlateau); the controller here is the usable design.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax

PyTree = object


def _views(x):
    """(channel view [C, -1], layer view [1, -1]) of a >=2-D parameter
    (adamp.py:_channel_view/_layer_view)."""
    return x.reshape(x.shape[0], -1), x.reshape(1, -1)


def _cosine_max(gv, pv, eps):
    """max over rows of |<g, p>| / (|g| |p|)  (adamp.py:_cosine_similarity
    — norms are eps-ADDED, not clamped)."""
    gn = jnp.linalg.norm(gv, axis=1) + eps
    pn = jnp.linalg.norm(pv, axis=1) + eps
    dot = jnp.abs(jnp.sum(gv * pv, axis=1))
    return jnp.max(dot / gn / pn)


def _projection(p, grad, perturb, delta, wd_ratio, eps):
    """adamp.py:_projection — try the channel view first, then the layer
    view; the FIRST view whose max cosine similarity is below
    delta/sqrt(view_dim) projects `perturb` off the parameter's radial
    direction and damps weight decay. Both branches are computed and
    selected with `where` (identical math, XLA-friendly)."""
    if p.ndim <= 1:
        return perturb, jnp.float32(1.0)
    expand = (-1,) + (1,) * (p.ndim - 1)

    def project(view_idx):
        pv = _views(p)[view_idx]
        p_n = p / (jnp.linalg.norm(pv, axis=1).reshape(expand) + eps)
        comp = _views(p_n * perturb)[view_idx].sum(axis=1).reshape(expand)
        return perturb - p_n * comp

    gch, gla = _views(grad)
    pch, pla = _views(p)
    ch_hit = _cosine_max(gch, pch, eps) < delta / jnp.sqrt(pch.shape[1])
    la_hit = _cosine_max(gla, pla, eps) < delta / jnp.sqrt(pla.shape[1])
    hit_any = jnp.logical_or(ch_hit, la_hit)
    out = jnp.where(ch_hit, project(0), jnp.where(la_hit, project(1),
                                                  perturb))
    wd = jnp.where(hit_any, jnp.float32(wd_ratio), jnp.float32(1.0))
    return out, wd


class AdamPState(NamedTuple):
    count: chex.Array
    exp_avg: PyTree
    exp_avg_sq: PyTree


def adamp(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = False
          ) -> optax.GradientTransformation:
    """`mPLUG/optim/adamp.py:AdamP.step` (:57-107), exactly — incl. the
    shrink-before-step coupled decay and the per-parameter projection."""
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros((), jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("adamp requires params")
        count = state.count + 1
        lr = sched(count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def leaf(g, p, m, v):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            step_size = lr / bc1
            perturb = ((b1 * m + (1 - b1) * g) / denom if nesterov
                       else m / denom)
            perturb, wdr = _projection(p, g, perturb, delta, wd_ratio, eps)
            upd = -step_size * perturb
            if weight_decay > 0:
                upd = upd - lr * weight_decay * wdr * p
            return upd, m, v

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_p = tdef.flatten_up_to(params)
        flat_m = tdef.flatten_up_to(state.exp_avg)
        flat_v = tdef.flatten_up_to(state.exp_avg_sq)
        out = [leaf(g, p, m, v)
               for g, p, m, v in zip(flat_g, flat_p, flat_m, flat_v)]
        ups = tdef.unflatten([o[0] for o in out])
        ms = tdef.unflatten([o[1] for o in out])
        vs = tdef.unflatten([o[2] for o in out])
        return ups, AdamPState(count, ms, vs)

    return optax.GradientTransformation(init, update)


class SGDPState(NamedTuple):
    count: chex.Array
    momentum: PyTree


def sgdp(learning_rate, momentum: float = 0.0, dampening: float = 0.0,
         weight_decay: float = 0.0, nesterov: bool = False,
         eps: float = 1e-8, delta: float = 0.1, wd_ratio: float = 0.1
         ) -> optax.GradientTransformation:
    """`mPLUG/optim/sgdp.py:SGDP.step` (:55-90)."""
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def init(params):
        return SGDPState(jnp.zeros((), jnp.int32),
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("sgdp requires params")
        count = state.count + 1
        lr = sched(count)

        def leaf(g, p, buf):
            buf = momentum * buf + (1 - dampening) * g
            d_p = g + momentum * buf if nesterov else buf
            d_p, wdr = _projection(p, g, d_p, delta, wd_ratio, eps)
            upd = -lr * d_p
            if weight_decay != 0:
                # p.mul_(1 - lr*wd*ratio/(1-momentum)) — sgdp.py:79-80
                upd = upd - lr * weight_decay * wdr / (1 - momentum) * p
            return upd, buf

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_p = tdef.flatten_up_to(params)
        flat_b = tdef.flatten_up_to(state.momentum)
        out = [leaf(g, p, b) for g, p, b in zip(flat_g, flat_p, flat_b)]
        return (tdef.unflatten([o[0] for o in out]),
                SGDPState(count, tdef.unflatten([o[1] for o in out])))

    return optax.GradientTransformation(init, update)


class RMSpropTFState(NamedTuple):
    count: chex.Array
    square_avg: PyTree
    momentum_buffer: Optional[PyTree]
    grad_avg: Optional[PyTree]


def rmsprop_tf(learning_rate, alpha: float = 0.9, eps: float = 1e-10,
               weight_decay: float = 0.0, momentum: float = 0.0,
               centered: bool = False, decoupled_decay: bool = False,
               lr_in_momentum: bool = True) -> optax.GradientTransformation:
    """`mPLUG/optim/rmsprop_tf.py:RMSpropTF.step` (:81-134): ones-init
    square_avg, eps inside sqrt, TF order of ops, lr folded into the
    momentum buffer."""
    sched = (learning_rate if callable(learning_rate)
             else (lambda _: learning_rate))

    def init(params):
        ones = jax.tree_util.tree_map(jnp.ones_like, params)
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return RMSpropTFState(
            jnp.zeros((), jnp.int32), ones,
            zeros if momentum > 0 else None,
            jax.tree_util.tree_map(jnp.zeros_like, params) if centered
            else None)

    def update(grads, state, params=None):
        count = state.count + 1
        lr = sched(count)

        def leaf(g, p, sa, buf, ga):
            if weight_decay != 0:
                if decoupled_decay:
                    pass  # handled on the update below
                else:
                    g = g + weight_decay * p
            sa = sa + (1 - alpha) * (g * g - sa)
            if centered:
                ga = ga + (1 - alpha) * (g - ga)
                avg = jnp.sqrt(sa - ga * ga + eps)
            else:
                avg = jnp.sqrt(sa + eps)
            if momentum > 0:
                if lr_in_momentum:
                    buf = momentum * buf + lr * g / avg
                    upd = -buf
                else:
                    buf = momentum * buf + g / avg
                    upd = -lr * buf
            else:
                upd = -lr * g / avg
            if weight_decay != 0 and decoupled_decay:
                upd = upd - weight_decay * p
            return upd, sa, buf, ga

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat_p = tdef.flatten_up_to(params) if params is not None else flat_g
        flat_sa = tdef.flatten_up_to(state.square_avg)
        flat_b = (tdef.flatten_up_to(state.momentum_buffer)
                  if state.momentum_buffer is not None
                  else [None] * len(flat_g))
        flat_ga = (tdef.flatten_up_to(state.grad_avg)
                   if state.grad_avg is not None else [None] * len(flat_g))
        out = [leaf(g, p, sa, b, ga) for g, p, sa, b, ga
               in zip(flat_g, flat_p, flat_sa, flat_b, flat_ga)]
        return (tdef.unflatten([o[0] for o in out]), RMSpropTFState(
            count, tdef.unflatten([o[1] for o in out]),
            tdef.unflatten([o[2] for o in out])
            if state.momentum_buffer is not None else None,
            tdef.unflatten([o[3] for o in out])
            if state.grad_avg is not None else None))

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------------- adahessian ----

class AdahessianState(NamedTuple):
    count: chex.Array
    exp_avg: PyTree
    exp_hess_sq: PyTree


def rademacher_like(rng, tree):
    """One Rademacher (+-1) probe per leaf (adahessian.py:99's
    torch.randint(0, 2)*2-1 from a dedicated generator; here
    jax.random.rademacher per leaf, deterministic in the seed alone)."""
    leaves, tdef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(rng, len(leaves))
    return tdef.unflatten([
        jax.random.rademacher(k, l.shape, dtype=l.dtype)
        for k, l in zip(keys, leaves)])


def hutchinson(loss_fn, trainable, rng, *args):
    """(loss, grads, hess_diag) with ONE extra JVP pass: forward-over-
    reverse jvp of grad(loss_fn) at a Rademacher probe z gives (grads, H@z)
    together, and z * (H@z) is the Hutchinson diagonal estimate
    (adahessian.py:95-102's autograd.grad(grads, params, grad_outputs=zs) —
    which the torch driver cannot run: DeepSpeed's backward never sets
    create_graph). `args` close over the non-differentiated operands."""
    z = rademacher_like(rng, trainable)
    vg = jax.value_and_grad(loss_fn)
    (loss, grads), (_, hvp) = jax.jvp(
        lambda t: vg(t, *args), (trainable,), (z,))
    hess = jax.tree_util.tree_map(lambda zz, h: zz * h, z, hvp)
    return loss, grads, hess


def adahessian_two_group(sched1, sched2, labels_fn, b1: float = 0.9,
                         b2: float = 0.999, eps: float = 1e-8,
                         weight_decay: float = 0.0, hessian_power: float = 1.0,
                         max_grad_norm: float = 0.0, decay_mask=None
                         ) -> optax.GradientTransformation:
    """`mPLUG/optim/adahessian.py:Adahessian.step` (:106-156) over the
    dual-LR grouping (visual encoder at sched2, body at sched1):

      m_t = b1*m + (1-b1)*g;   v_t = b2*v + (1-b2)*hess^2
      denom = (v_t/(1-b2^t))^(k/2) + eps
      p = p*(1 - lr*wd) - lr/(1-b1^t) * m_t/denom     (AdamW-style shrink)

    Self-contained (grad clip + grouping + decay inside) because the
    Hutchinson diagonal rides alongside the gradients: `update` takes
    `grads` as the PAIR (grads, hess) produced by `hutchinson` — the one
    optimizer on the factory surface whose input is not a plain gradient,
    so it cannot sit behind the shared clip/multi_transform chain.
    `decay_mask(params)` limits the shrink to decayed leaves (the factory's
    filter_bias_and_bn grouping, optim_factory.py:59-64)."""

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdahessianState(jnp.zeros((), jnp.int32), z,
                               jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(pair, state, params=None):
        if params is None:
            raise ValueError("adahessian requires params")
        grads, hess = pair
        if max_grad_norm > 0.0:
            gn = optax.global_norm(grads)
            scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(gn, 1e-12))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        # schedules read the pre-increment count (torch LambdaLR order)
        lrs = {"body": sched1(state.count), "visual": sched2(state.count)}
        labels = labels_fn(params)
        dmask = (decay_mask(params) if decay_mask is not None
                 else jax.tree_util.tree_map(lambda _: True, params))

        def leaf(g, h, p, m, v, lab, dm):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * h * h
            lr = lrs[lab]
            denom = (v / bc2) ** (hessian_power / 2.0) + eps
            upd = -(lr / bc1) * m / denom
            if weight_decay != 0.0:
                upd = jnp.where(dm, upd - lr * weight_decay * p, upd)
            return upd, m, v

        flat_g, tdef = jax.tree_util.tree_flatten(grads)
        flat = [leaf(g, h, p, m, v, lab, dm) for g, h, p, m, v, lab, dm
                in zip(flat_g, tdef.flatten_up_to(hess),
                       tdef.flatten_up_to(params),
                       tdef.flatten_up_to(state.exp_avg),
                       tdef.flatten_up_to(state.exp_hess_sq),
                       tdef.flatten_up_to(labels),
                       tdef.flatten_up_to(dmask))]
        return (tdef.unflatten([f[0] for f in flat]),
                AdahessianState(count,
                                tdef.unflatten([f[1] for f in flat]),
                                tdef.unflatten([f[2] for f in flat])))

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------------- plateau LR ----

class ScaleByDynamicState(NamedTuple):
    scale: chex.Array


def dynamic_scale() -> optax.GradientTransformation:
    """Multiply updates by a scale held in optimizer state (default 1.0);
    the jit-pure carrier for host-driven LR control (plateau). Set it
    functionally with `set_dynamic_scale` — the TPU-native replacement for
    torch's in-place `param_group['lr']` mutation."""

    def init(params):
        del params
        return ScaleByDynamicState(jnp.ones((), jnp.float32))

    def update(grads, state, params=None):
        del params
        return (jax.tree_util.tree_map(lambda g: g * state.scale, grads),
                state)

    return optax.GradientTransformation(init, update)


def set_dynamic_scale(opt_state, value: float):
    """Return opt_state with every ScaleByDynamicState leaf set to value."""

    def walk(s):
        if isinstance(s, ScaleByDynamicState):
            return ScaleByDynamicState(jnp.asarray(value, jnp.float32))
        if isinstance(s, tuple) and type(s) is not tuple:  # NamedTuple
            return type(s)(*(walk(x) for x in s))
        if isinstance(s, tuple):
            return tuple(walk(x) for x in s)
        return s

    return walk(opt_state)


class PlateauLR:
    """torch `ReduceLROnPlateau` decision logic (the engine inside
    `mPLUG/scheduler/plateau_lr.py`) as a host-side controller: feed the
    eval metric once per epoch; read `.scale` (cumulative factor, starts
    1.0) and apply it via set_dynamic_scale. mode='max' is the factory's
    default for eval-metric schedules (scheduler_factory.py:83)."""

    def __init__(self, decay_rate: float = 0.1, patience: int = 10,
                 threshold: float = 1e-4, cooldown: int = 0,
                 mode: str = "max", min_scale: float = 0.0):
        self.factor = decay_rate
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.mode = mode
        self.min_scale = min_scale
        self.best: Optional[float] = None
        self.num_bad = 0
        self.cooldown_left = 0
        self.scale = 1.0

    def _better(self, metric: float) -> bool:
        """torch rel-threshold semantics: max -> a > best*(1+th),
        min -> a < best*(1-th)."""
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Returns the (possibly decayed) cumulative scale. Decision order
        is torch's exactly: best/num_bad update, then cooldown zeroing,
        then the patience check."""
        if self._better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_left > 0:
            self.cooldown_left -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            self.scale = max(self.scale * self.factor, self.min_scale)
            self.cooldown_left = self.cooldown
            self.num_bad = 0
        return self.scale
