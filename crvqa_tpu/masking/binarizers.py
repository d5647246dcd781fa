"""Straight-through binarizers for differentiable mask training.

JAX re-design of the three autograd.Function schemes in the reference
(`masking/maskers_Robust.py:338-482`). Forward binarizes real-valued mask
scores; the gradient passes straight through to the scores
(`_Binarizer1.backward`), optionally gated (scheme 2) or via a Bernoulli
sample (scheme 3).

Implemented with `jax.custom_jvp` carrying a LINEAR tangent rule: JAX
transposes it automatically, so reverse-mode gradients are exactly the old
`custom_vjp` behavior (identity / gated cotangent to scores, zero to the
threshold) while forward-mode (jvp) also works — which second-order
optimizers need (`timm_optim.hutchinson` runs jvp-of-grad through the
masked forward; custom_vjp would refuse with "can't apply forward-mode
autodiff").

Scheme 1 (`MaskedLinear1`, the one used by every shipped pipeline —
`prune_debias_VQA.py:465-467`): hard threshold, identity gradient.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


@jax.custom_jvp
def binarize_ste(scores: jax.Array, threshold: jax.Array) -> jax.Array:
    """scheme 1: 1.0 where scores > threshold else 0.0; identity grad.

    Matches `binarizer_fn1` (`maskers_Robust.py:338-342`): strict `>`
    comparison (ties at the threshold are zeroed), gradient passes through
    unchanged to `scores`, none to `threshold`.
    """
    return (scores > threshold).astype(scores.dtype)


@binarize_ste.defjvp
def _binarize_ste_jvp(primals, tangents):
    scores, threshold = primals
    s_dot, _ = tangents
    return binarize_ste(scores, threshold), s_dot.astype(scores.dtype)


@jax.custom_jvp
def binarize_sign(scores: jax.Array, threshold: jax.Array) -> jax.Array:
    """scheme 2: (sign(scores)+1)/2 with gradient gated to |scores| < 1.

    Matches `binarizer_fn2` / `_Binarizer2` (`maskers_Robust.py:386-404`).
    The reference clamps the stored scores in place; in JAX that side effect
    is realized by `clamp_scores_sign` applied in the optimizer update.
    `threshold` is accepted and ignored for a uniform call signature.
    """
    return (jnp.sign(scores) + 1.0) / 2.0


@binarize_sign.defjvp
def _binarize_sign_jvp(primals, tangents):
    scores, threshold = primals
    s_dot, _ = tangents
    gate = jnp.logical_and(scores < 1.0, scores > -1.0)
    return (binarize_sign(scores, threshold),
            jnp.where(gate, s_dot, 0.0).astype(scores.dtype))


def clamp_scores_sign(scores: jax.Array) -> jax.Array:
    """The functional form of scheme 2's in-place `clamp_(-1, 1)`."""
    return jnp.clip(scores, -1.0, 1.0)


def make_binarize_bernoulli(rng: jax.Array):
    """scheme 3: bernoulli(sigmoid(scores)) forward, identity grad.

    Matches `binarizer_fn3` / `_Binarizer3` (`maskers_Robust.py:436-450`).
    Returns a binarizer closed over an explicit PRNG key (JAX has no global
    RNG state). `threshold` is accepted and ignored.
    """

    @jax.custom_jvp
    def binarize_bernoulli(scores, threshold):
        probs = jax.nn.sigmoid(scores)
        return jax.random.bernoulli(rng, probs).astype(scores.dtype)

    @binarize_bernoulli.defjvp
    def _jvp(primals, tangents):
        scores, threshold = primals
        s_dot, _ = tangents
        return (binarize_bernoulli(scores, threshold),
                s_dot.astype(scores.dtype))

    return binarize_bernoulli


BINARIZERS: dict[str, Callable] = {
    "MaskedLinear1": binarize_ste,
    "MaskedLinear2": binarize_sign,
}


def get_binarizer(name: str, rng: jax.Array | None = None) -> Callable:
    """Resolve a binarizer by the reference's masker-class name."""
    if name == "MaskedLinear3":
        if rng is None:
            raise ValueError("MaskedLinear3 (bernoulli) needs an rng key")
        return make_binarize_bernoulli(rng)
    try:
        return BINARIZERS[name]
    except KeyError:
        raise NotImplementedError(f"unknown binarizer {name!r}") from None
