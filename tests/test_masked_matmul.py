"""Pallas masked-matmul kernel correctness (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.ops.masked_matmul import masked_matmul, masked_matmul_reference


@pytest.mark.parametrize("m,k,n", [(256, 256, 256), (300, 130, 520), (8, 768, 64)])
def test_forward_matches_reference(m, k, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n), jnp.float32)
    s = jnp.asarray(rng.rand(k, n), jnp.float32)
    t = jnp.asarray(0.5, jnp.float32)
    got = masked_matmul(x, w, s, t, True)
    want = masked_matmul_reference(x, w, s, t)
    # kernels run the MXU in bf16 (like XLA's default) -> bf16 tolerances
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.05, atol=0.3)


def test_padding_region_contributes_zero():
    # scores pad with 0 > t=0.5 false -> masked; x pad zeros: padded K/N safe
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(100, 100), jnp.float32)
    w = jnp.asarray(rng.randn(100, 100), jnp.float32)
    s = jnp.asarray(rng.rand(100, 100) + 1.0, jnp.float32)  # all kept
    t = jnp.asarray(0.5, jnp.float32)
    got = masked_matmul(x, w, s, t, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x @ w),
                               rtol=0.05, atol=0.3)


def test_backward_ste_gradients():
    rng = np.random.RandomState(2)
    m, k, n = 64, 96, 80
    x = jnp.asarray(rng.randn(m, k), jnp.float32)
    w = jnp.asarray(rng.randn(k, n), jnp.float32)
    s = jnp.asarray(rng.rand(k, n), jnp.float32)
    t = jnp.asarray(0.5, jnp.float32)
    co = jnp.asarray(rng.randn(m, n), jnp.float32)

    def f_kernel(x, s):
        return jnp.sum(masked_matmul(x, w, s, t, True) * co)

    def f_ref(x, s):
        # reference STE: binarize with identity grad
        from crvqa_tpu.masking.binarizers import binarize_ste

        return jnp.sum((x @ (w * binarize_ste(s, t))) * co)

    gx_k, gs_k = jax.grad(f_kernel, argnums=(0, 1))(x, s)
    gx_r, gs_r = jax.grad(f_ref, argnums=(0, 1))(x, s)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=0.05, atol=0.5)
    np.testing.assert_allclose(np.asarray(gs_k), np.asarray(gs_r),
                               rtol=0.05, atol=0.5)


def test_no_grad_to_w_and_threshold():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(32, 32), jnp.float32)
    w = jnp.asarray(rng.randn(32, 32), jnp.float32)
    s = jnp.asarray(rng.rand(32, 32), jnp.float32)
    t = jnp.asarray(0.5, jnp.float32)
    gw = jax.grad(lambda w_: jnp.sum(masked_matmul(x, w_, s, t, True)))(w)
    gt = jax.grad(lambda t_: jnp.sum(masked_matmul(x, w, s, t_, True)))(t)
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gt).max()) == 0.0


def test_bf16_activations():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(128, 128), jnp.bfloat16)
    w = jnp.asarray(rng.randn(128, 128), jnp.float32)
    s = jnp.asarray(rng.rand(128, 128), jnp.float32)
    t = jnp.asarray(0.5, jnp.float32)
    got = masked_matmul(x, w.astype(jnp.bfloat16), s, t, True)
    want = masked_matmul_reference(x.astype(jnp.float32), w, s, t)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=0.05, atol=0.5)


def test_bf16_threshold_boundary_matches_reference():
    """Review finding (r3 pass 3): the kernel cast the fp32 threshold to
    w.dtype, so with bf16 weights a score in (threshold, bf16(threshold)]
    flipped mask membership vs the XLA path. The compare is against fp32
    SCORES and must stay fp32."""
    thr = jnp.float32(0.01)           # bf16 rounds UP to 0.010009765625
    score_edge = jnp.float32(0.0100048)  # > thr but < bf16(thr)
    k = 8
    x = jnp.ones((8, k), jnp.bfloat16)
    w = jnp.ones((k, 128), jnp.bfloat16)
    scores = jnp.full((k, 128), score_edge, jnp.float32)
    ref = masked_matmul_reference(x, w, scores, thr)
    out = masked_matmul(x, w, scores, thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
    assert float(ref[0, 0]) == k  # the edge scores ARE kept
