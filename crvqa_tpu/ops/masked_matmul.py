"""Pallas fused masked matmul: y = x @ (w * (scores > threshold)).

The stage-2 hot loop multiplies every frozen weight matrix by a binarized
score matrix before its matmul (`MaskedLinear1.forward`,
maskers_Robust.py:355-379). Under plain XLA the masked weight `w*m` is
materialized to HBM (an extra read+write of every weight per step, forward
and backward). These kernels fuse binarize+mask into the matmul tile loop so
w and scores stream HBM->VMEM exactly once and the mask never hits HBM.

Backward (straight-through estimator):
    dx      = g @ (w * m)^T          (mask recomputed in-tile)
    dscores = (x^T @ g) * w          (STE: d(w*B(s))/ds == w)
    dw      = 0 (frozen), dthreshold = 0

All kernels accumulate in fp32 VMEM scratch over the K grid axis, run the
MXU in bf16 (matching XLA's default matmul precision on TPU), and accept
arbitrary shapes via padding to tile multiples.

MEASURED VERDICT (v5e, M=4096 K=768 N=3072, fwd+bwd, amortized in-jit loop):
XLA reference 0.47 ms vs this kernel 0.98 ms. Fusing binarize into the
matmul re-streams fp32 w+scores (8 B/elem) on every M-tile, while XLA's
one-time `w*m` materialization costs 10 B/elem once and then re-reads 2
B/elem of bf16 per M-tile — at M/BM = 16 tiles XLA's strategy moves ~3x
fewer HBM bytes. The plain XLA path therefore stays the default stage-2
compute path; this kernel is kept as the building block for cases where the
trade flips (small M, or structured masks with skippable tiles). This is the
benchmark SURVEY.md §7 called for under "don't assume".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BM, BN, BK = 256, 256, 256


def _pad_to(x, m, axis):
    pad = (-x.shape[axis]) % m
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _fwd_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = (s_ref[:] > t_ref[0]).astype(w_ref.dtype)
    wm = (w_ref[:] * mask).astype(jnp.bfloat16)
    acc_ref[:] += jnp.dot(x_ref[:].astype(jnp.bfloat16), wm,
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _dx_kernel(g_ref, w_ref, s_ref, t_ref, o_ref, acc_ref):
    n = pl.program_id(2)

    @pl.when(n == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mask = (s_ref[:] > t_ref[0]).astype(w_ref.dtype)
    wm = (w_ref[:] * mask).astype(jnp.bfloat16)  # [BK, BN]
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:].astype(jnp.bfloat16), wm,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BM, BK]

    @pl.when(n == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ds_kernel(x_ref, g_ref, w_ref, o_ref, acc_ref):
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16), g_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BK, BN]

    @pl.when(m == pl.num_programs(2) - 1)
    def _():
        # STE epilogue: multiply by w in-tile (never materialize x^T g in HBM)
        o_ref[:] = (acc_ref[:] * w_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _fwd_call(x, w, scores, threshold, interpret=False):
    m, k = x.shape
    k2, n = w.shape
    xp = _pad_to(_pad_to(x, BM, 0), BK, 1)
    wp = _pad_to(_pad_to(w, BK, 0), BN, 1)
    sp = _pad_to(_pad_to(scores, BK, 0), BN, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]
    # threshold compares against SCORES (fp32), not weights: casting to a
    # bf16 w.dtype would shift the binarization boundary vs the XLA path
    t = jnp.reshape(threshold.astype(scores.dtype), (1,))
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(mp // BM, np_ // BN, kp // BK),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, q: (i, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, q: (q, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, q: (q, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, BN), lambda i, j, q: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((BM, BN), jnp.float32)],
        interpret=interpret,
    )(xp, wp, sp, t)
    return out[:m, :n]


def _dx_call(g, w, scores, threshold, x_dtype, interpret=False):
    m, n = g.shape
    k = w.shape[0]
    gp = _pad_to(_pad_to(g, BM, 0), BN, 1)
    wp = _pad_to(_pad_to(w, BK, 0), BN, 1)
    sp = _pad_to(_pad_to(scores, BK, 0), BN, 1)
    mp, np_ = gp.shape
    kp = wp.shape[0]
    # threshold compares against SCORES (fp32), not weights: casting to a
    # bf16 w.dtype would shift the binarization boundary vs the XLA path
    t = jnp.reshape(threshold.astype(scores.dtype), (1,))
    out = pl.pallas_call(
        _dx_kernel,
        grid=(mp // BM, kp // BK, np_ // BN),
        in_specs=[
            pl.BlockSpec((BM, BN), lambda i, j, q: (i, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, q: (j, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, q: (j, q),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BM, BK), lambda i, j, q: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, kp), x_dtype),
        scratch_shapes=[pltpu.VMEM((BM, BK), jnp.float32)],
        interpret=interpret,
    )(gp, wp, sp, t)
    return out[:m, :k]


def _ds_call(x, g, w, interpret=False):
    m, k = x.shape
    n = g.shape[1]
    xp = _pad_to(_pad_to(x, BM, 0), BK, 1)
    gp = _pad_to(_pad_to(g, BM, 0), BN, 1)
    wp = _pad_to(_pad_to(w, BK, 0), BN, 1)
    mp, kp = xp.shape
    np_ = gp.shape[1]
    out = pl.pallas_call(
        _ds_kernel,
        grid=(kp // BK, np_ // BN, mp // BM),
        in_specs=[
            pl.BlockSpec((BM, BK), lambda i, j, q: (q, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, BN), lambda i, j, q: (q, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BK, BN), lambda i, j, q: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BK, BN), lambda i, j, q: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, np_), w.dtype),
        scratch_shapes=[pltpu.VMEM((BK, BN), jnp.float32)],
        interpret=interpret,
    )(xp, gp, wp)
    return out[:k, :n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def masked_matmul(x, w, scores, threshold, interpret=False):
    """y = x @ (w * (scores > threshold)); grads flow to x and (STE) scores."""
    return _fwd_call(x, w, scores, threshold, interpret)


def _mm_fwd(x, w, scores, threshold, interpret):
    y = _fwd_call(x, w, scores, threshold, interpret)
    return y, (x, w, scores, threshold)


def _mm_bwd(interpret, res, g):
    x, w, scores, threshold = res
    dx = _dx_call(g, w, scores, threshold, x.dtype, interpret)
    ds = _ds_call(x, g.astype(jnp.float32), w, interpret)
    return dx, jnp.zeros_like(w), ds.astype(scores.dtype), \
        jnp.zeros_like(threshold)


masked_matmul.defvjp(_mm_fwd, _mm_bwd)


def masked_matmul_reference(x, w, scores, threshold):
    """XLA reference path (w * binarize materialized) for correctness/bench."""
    mask = (scores > threshold).astype(w.dtype)
    return x @ (w * mask)
