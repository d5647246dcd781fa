"""STE binarizer unit tests with exact expected outputs (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np

from crvqa_tpu.masking import (
    binarize_ste,
    binarize_sign,
    clamp_scores_sign,
    make_binarize_bernoulli,
)


def test_binarize_ste_forward_strict_gt():
    # matches binarizer_fn1: <= threshold -> 0, > threshold -> 1 (ties zeroed)
    s = jnp.array([-1.0, 0.0, 0.01, 0.0100001, 0.5])
    t = jnp.asarray(0.01)
    out = binarize_ste(s, t)
    np.testing.assert_array_equal(out, [0.0, 0.0, 0.0, 1.0, 1.0])


def test_binarize_ste_gradient_is_identity():
    s = jnp.array([-1.0, 0.0, 0.5, 2.0])
    t = jnp.asarray(0.01)

    def f(scores):
        return jnp.sum(binarize_ste(scores, t) * jnp.array([1.0, 2.0, 3.0, 4.0]))

    g = jax.grad(f)(s)
    # straight-through: gradient of sum(w*B(s)) wrt s is w everywhere
    np.testing.assert_array_equal(g, [1.0, 2.0, 3.0, 4.0])


def test_binarize_ste_no_grad_to_threshold():
    s = jnp.array([0.5, -0.5])
    g = jax.grad(lambda t: jnp.sum(binarize_ste(s, t)))(jnp.asarray(0.0))
    assert g == 0.0


def test_binarize_sign_forward_and_gate():
    s = jnp.array([-2.0, -0.5, 0.5, 2.0])
    out = binarize_sign(s, jnp.asarray(0.0))
    np.testing.assert_array_equal(out, [0.0, 0.0, 1.0, 1.0])
    g = jax.grad(lambda x: jnp.sum(binarize_sign(x, jnp.asarray(0.0)) * 3.0))(s)
    # gradient gated to |s| < 1 (binarizer_fn2 backward)
    np.testing.assert_array_equal(g, [0.0, 3.0, 3.0, 0.0])


def test_clamp_scores_sign():
    np.testing.assert_allclose(
        clamp_scores_sign(jnp.array([-3.0, 0.2, 3.0])), [-1.0, 0.2, 1.0],
        rtol=1e-6,
    )


def test_binarize_bernoulli_stats_and_grad():
    rng = jax.random.PRNGKey(0)
    fn = make_binarize_bernoulli(rng)
    s = jnp.full((10000,), 2.0)  # sigmoid(2) ~ 0.88
    out = fn(s, jnp.asarray(0.0))
    assert 0.85 < float(out.mean()) < 0.91
    g = jax.grad(lambda x: jnp.sum(fn(x, jnp.asarray(0.0))))(s)
    np.testing.assert_array_equal(g, jnp.ones_like(s))


def test_binarizers_under_jit():
    s = jnp.array([0.5, -0.5])
    out = jax.jit(binarize_ste)(s, jnp.asarray(0.0))
    np.testing.assert_array_equal(out, [1.0, 0.0])
