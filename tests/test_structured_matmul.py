"""Equivalence tests for the structured (head-pruned) matmuls vs the dense
XLA baseline: identical outputs, STE-correct backward for the XLA-compact
variant, zero-copy Pallas variant (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crvqa_tpu.ops.structured_matmul import (
    dense_masked_matmul,
    expand_keep_idx,
    head_compact_matmul,
    head_compact_matmul_pallas,
)

H, HS, K, M = 12, 64, 768, 512


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    w = jnp.asarray(rng.randn(K, H * HS).astype(np.float32) * 0.02)
    head_mask = jnp.asarray(
        np.array([1, 0, 1, 0, 0, 1, 0, 1, 0, 0, 0, 0], bool))
    return x, w, head_mask


def test_compact_matches_dense(data):
    x, w, head_mask = data
    keep = expand_keep_idx(head_mask, int(head_mask.sum()))
    ref = dense_masked_matmul(x, w, head_mask, HS)
    out = head_compact_matmul(x, w, keep, H, HS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # masked head columns are exactly zero
    out3 = np.asarray(out).reshape(M, H, HS)
    assert (out3[:, ~np.asarray(head_mask)] == 0).all()


def test_compact_padded_keep_idx(data):
    """keep_idx padded with duplicates (static count > kept) stays correct."""
    x, w, head_mask = data
    keep = expand_keep_idx(head_mask, 6)  # 4 kept + 2 duplicate pads
    ref = dense_masked_matmul(x, w, head_mask, HS)
    out = head_compact_matmul(x, w, keep, H, HS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_compact_backward_is_dense_ste(data):
    """The custom VJP must give grads through ALL head columns of w (masked
    heads' scores still learn under STE), matching the dense path."""
    x, w, head_mask = data
    keep = expand_keep_idx(head_mask, int(head_mask.sum()))

    def loss_compact(x, w):
        return jnp.sum(head_compact_matmul(x, w, keep, H, HS) ** 2)

    def loss_dense(x, w):
        return jnp.sum(dense_masked_matmul(x, w, head_mask, HS) ** 2)

    gx_c, gw_c = jax.grad(loss_compact, argnums=(0, 1))(x, w)
    gx_d, gw_d = jax.grad(loss_dense, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_d),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-4)


def test_pallas_matches_dense(data):
    x, w, head_mask = data
    keep = expand_keep_idx(head_mask, int(head_mask.sum()))
    ref = dense_masked_matmul(x, w, head_mask, HS)
    out = head_compact_matmul_pallas(x, w.T, keep, H, HS, bm=256, bk=256,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)  # bf16 MXU accumulate


def test_all_masked_head_mask_gives_zero_output():
    """Review finding: expand_keep_idx clamped the kept count to >= 1, so an
    all-masked layer computed one masked head as if kept. The out-of-range
    pad sentinel makes the scatter drop it — output is exactly zero."""
    from crvqa_tpu.ops.structured_matmul import (
        expand_keep_idx,
        head_compact_matmul,
    )

    H_, D_ = 4, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, H_ * D_)).astype(np.float32))
    idx = expand_keep_idx(jnp.zeros((H_,), bool), n_keep=2)
    y = head_compact_matmul(x, w, idx, H_, D_)
    np.testing.assert_array_equal(np.asarray(y), 0.0)
    # and grads through w are zero everywhere (d/dw of w*0)
    g = jax.grad(lambda w: jnp.sum(
        head_compact_matmul(x, w, idx, H_, D_) ** 2))(w)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_pallas_padded_keep_idx_drops_pad_blocks(data):
    """Review finding (r3 pass 3): the Pallas scatter used the CLAMPED
    fetch index, so padded keep_idx rows overwrote head H-1 with an
    unmasked recompute whenever that head was masked. The scatter must use
    the original out-of-range sentinel so mode='drop' drops pad blocks."""
    x, w, head_mask = data
    kept = int(head_mask.sum())
    for n_keep in (kept + 1, kept + 3):  # padded beyond the true kept count
        keep = expand_keep_idx(head_mask, n_keep)
        ref = dense_masked_matmul(x, w, head_mask, HS)
        out = head_compact_matmul_pallas(x, w.T, keep, H, HS, bm=256,
                                         bk=256, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)
