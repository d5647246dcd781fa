"""Fused multi-head attention for short sequences (Pallas TPU).

Why this kernel exists: the stage-2 profile (benchmarks/profile_stage2.py)
showed ~19% of device time in transpose copies around XLA's batched
attention dots — bf16[B,H,D,S] materializations of v (and its gradients)
for the `bhqk,bkhd->bqhd` contraction, ~146 copies x ~100us per train step
at bs 256. All three einsum spellings measured identically
(benchmarks/bench_attention_layout.py: 2994/3002/3008 ex/s — noise), so the
copies are inherent to XLA's batched-dot lowering at these shapes. This
kernel consumes q/k/v in their natural projection layout [B, S, H*D] and
keeps everything in VMEM with a "lane-blocked" formulation (see
_fwd_kernel's docstring): k/v tiled along sublanes with an iota head mask
form block-diagonal operands, so per batch row the whole multi-head
attention is three MXU-shaped 2D dots with NO relayout — fusing scale +
mask bias + fp32 segmented softmax + dropout + the context contraction.

Scope: LXMERT-sized attention — Sq/Sk <= ~128 (14 text tokens / 36 boxes,
`dataset_LXM.py:189,259`), head_size 64, bf16 activations. FLOPs here are
~1% of the model; the win is memory locality, not arithmetic.

Backward (BWD_IMPL, default "stored"): the fwd-for-grad kernel writes the
pre-dropout probability matrix p [B, Sq, H*Sk] f32 as a residual, and the
bwd kernel consumes it — removing the two recompute dots (scores + segmented
denominator) and the exp/max VPU work from the backward. At LXMERT batch
sizes the residual costs ~0.5 GB/step of HBM traffic (~0.6 ms) against
~2/7 of the backward's MXU work; measured end-to-end on v5e
(benchmarks/bench_fused_attention.py --bwd): recompute 3253.8, stored
3422.7 (+5.2%), stored_folddot 3323.5 ex/s. The flash-style recompute
variant ("recompute") stays selectable for the measurement table; both
regenerate the SAME dropout mask from the counter-based hash (a pure
function of coordinates). "stored_folddot" folds the tiled dk/dv block
gradients with one MXU selector dot instead of H sequential sublane adds —
measured slower (the [Sk, H*Sk] selector dot costs more than the adds
save), kept for the record. Primal-only calls (eval) always use the
no-residual forward.

Numerics: scores and softmax in fp32 (matching `MultiHeadAttention`'s fp32
softmax policy); dots accumulate fp32 via preferred_element_type.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Backward implementation: "stored" (default; fwd saves probs residual),
# "recompute" (flash-style, no residual), "stored_folddot" (stored + MXU
# selector-dot block fold). Read at trace time.
BWD_IMPL = "stored"

# Storage dtype of the stored-probs residual. bf16 halves the residual's
# ~0.5 GB/step HBM traffic; the FORWARD context dot already consumes p in
# the activation dtype (bf16), so only the backward's softmax-vjp terms see
# the extra rounding (gradient error bounded by a guard test,
# tests/test_fused_attention.py). Read at trace time; fp32 = exact default.
P_RESIDUAL_DTYPE = jnp.float32


def _keep_mask(shape, rate: float, seed, b, h: int):
    """Bernoulli(1-rate) keep mask from a counter-based hash.

    Each element's bit is a pure function of (seed, batch row, head, i, j) —
    a 2-round xorshift-multiply avalanche over the coordinates. This makes
    the flash-style backward trivially regenerate the forward's mask with no
    reliance on PRNG generation order, and it runs identically in interpret
    mode (pltpu.prng_* are TPU-compiled-only)."""
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    # h may be traced (midseq_attention keys on a program-id-derived head
    # index); for static ints asarray(h)*C == uint32(h*C) mod 2^32 exactly
    key = (seed.astype(jnp.uint32) * jnp.uint32(2654435761)
           + jnp.asarray(b, jnp.uint32) * jnp.uint32(97531)
           + jnp.asarray(h, jnp.uint32) * jnp.uint32(1000003))
    x = i * jnp.uint32(374761393) + j * jnp.uint32(668265263) + key
    x = x ^ (x >> 13)
    x = x * jnp.uint32(1274126177)
    x = x ^ (x >> 16)
    # P(x >= rate * 2^32) = 1 - rate
    threshold = jnp.uint32(min(int(rate * (2 ** 32)), 2 ** 32 - 1))
    return x >= threshold


def _head_lane_mask(rows: int, sk: int, d_model: int, head_size: int,
                    dtype):
    """[rows, d_model] mask with 1 where row-block h == lane-block h.

    Row r of the sublane-tiled k/v copy belongs to head r // sk; lane l
    belongs to head l // head_size. The mask turns the vertical tiling of
    k/v into the block-diagonal operand the lane-blocked dots need."""
    rowh = jax.lax.broadcasted_iota(jnp.int32, (rows, d_model), 0) // sk
    colh = jax.lax.broadcasted_iota(jnp.int32, (rows, d_model), 1) // head_size
    return (rowh == colh).astype(dtype)


def _seg_mask(cols: int, sk: int, dtype):
    """[cols, cols] same-head-block indicator for segmented softmax sums."""
    a = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 0) // sk
    b = jax.lax.broadcasted_iota(jnp.int32, (cols, cols), 1) // sk
    return (a == b).astype(dtype)


# Segmented-sum spelling: True = two thin indicator dots through [.., H]
# ([rows,H] collapse + [H,rows] broadcast-back; ~2*H/rows of the square
# seg-dot's FLOPs), False = one [rows, rows] indicator dot. Measured on v5e
# (benchmarks/bench_fused_attention.py --seg): square 3409.6 vs thin 3351.9
# ex/s — the two sequential <=12-lane dots are LATENCY-bound and lose to
# one pipelined square dot despite ~18x fewer FLOPs; the kernel's dots are
# latency- not FLOP-bound at these shapes. Default: square.
THIN_SEG = False


def _seg_thin(rows: int, sk: int, num_heads: int):
    """([rows, H] collapse, [H, rows] expand) indicator pair for the thin
    segmented-sum spelling."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, num_heads), 0) // sk
    h = jax.lax.broadcasted_iota(jnp.int32, (rows, num_heads), 1)
    collapse = (r == h).astype(jnp.float32)
    h2 = jax.lax.broadcasted_iota(jnp.int32, (num_heads, rows), 0)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (num_heads, rows), 1) // sk
    expand = (h2 == r2).astype(jnp.float32)
    return collapse, expand


def _make_segsum(sk: int, num_heads: int):
    """Returns segsum(x): per-(row, head-block) sums of x [Sq, H*Sk],
    broadcast back to x's shape."""
    rows = num_heads * sk
    if THIN_SEG:
        collapse, expand = _seg_thin(rows, sk, num_heads)

        def segsum(x):
            xh = jax.lax.dot_general(
                x, collapse, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Sq, H]
            return jax.lax.dot_general(
                xh, expand, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Sq, H*Sk]
        return segsum
    seg = _seg_mask(rows, sk, jnp.float32)
    return lambda x: jax.lax.dot_general(
        x, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _tile_rows(t, num_heads: int):
    """[S, d] -> [H*S, d] by vertical (sublane) concatenation."""
    return jnp.concatenate([t] * num_heads, axis=0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *p_out,
                num_heads: int, head_size: int, rate: float, bb: int):
    """Lane-blocked forward: per batch row, THREE MXU-shaped dots and no
    relayout anywhere. With a second output ref (forward-for-grad), the
    pre-dropout probabilities p [Sq, H*Sk] f32 are also written as the
    stored-p backward's residual.

    Let km = tile(k, H) * headmask  ([H*Sk, d_model], block-diagonal: row
    block h keeps only head h's lanes). Then

        s[q, h*Sk+k'] = sum_l q[q, l] * km[h*Sk+k', l]     (contract d_model)

    computes every per-head score with ONE [Sq, d] x [H*Sk, d]^T dot —
    every output entry is a valid (head, key) score, no cross-head garbage.
    Per-block softmax normalizers come from a segmented-sum dot with the
    same-block indicator, and the context dot lands directly in the output
    layout: ctx = p @ vm  ([Sq, H*Sk] x [H*Sk, d_model]).

    History: revision 1 looped (b, h) over [S, head_size] dots — measured
    2427 ex/s vs 3002 XLA (latency-bound, 384 sequential tiny dots per
    program). Revision 2 stacked heads via reshape/transpose — rejected by
    Mosaic ("unsupported shape cast": lane->sublane reshape). This revision
    uses only sublane concats, iota masks, and 2D dots.
    """
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    sk = k_ref.shape[1]
    d_model = num_heads * head_size
    rows = num_heads * sk
    headmask = _head_lane_mask(rows, sk, d_model, head_size, k_ref.dtype)
    segsum = _make_segsum(sk, num_heads)

    def body(b, _):
        qb = q_ref[b]                       # [Sq, d_model]
        km = _tile_rows(k_ref[b], num_heads) * headmask   # [H*Sk, d_model]
        vm = _tile_rows(v_ref[b], num_heads) * headmask
        bias_b = bias_ref[pl.ds(b, 1), :]   # [1, H*Sk]
        s = jax.lax.dot_general(
            qb, km, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [Sq, H*Sk]
        s = s * scale + bias_b
        # per-(row, head-block) softmax: a per-row constant shift is valid
        # for every block, so the global row max stabilizes all blocks
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        # epsilon guards the pathological case where a head's whole block
        # underflows exp (its max sits ~90+ below the global row max): p
        # becomes 0 there instead of 0/0 = NaN (XLA's per-head softmax is
        # finite; realistic LXMERT/mPLUG logits never get near this)
        denom = jnp.maximum(segsum(e), 1e-30)
        p = e / denom
        if p_out:
            p_out[0][b] = p.astype(p_out[0].dtype)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, prog * bb + b, 0)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        ctx = jax.lax.dot_general(
            p.astype(qb.dtype), vm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [Sq, d_model]
        o_ref[b] = ctx.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


# Head-GROUP formulation (VERDICT r4 weak #2's unexplored midpoint between
# rejected rev 1 (per-head 64-lane dots) and shipped rev 3 (768-lane,
# H-fold redundant)): HEAD_GROUP = G heads per dot -> G*64-lane operands,
# H/G sequential dot-triples per batch row, G-fold (instead of H-fold)
# block-diagonal redundancy. G=2 gives exactly full-width 128-lane MXU
# dots with 2x redundancy — 6x less arithmetic than rev 3 at 6x the dot
# count. 0 = disabled (rev-3 full-width path). The grouped backward uses
# the flash-style recompute formulation (no stored-p residual; lane-concat
# of the per-group probs at 72-lane boundaries is what the stored variant
# would need — build it only if the recompute A/B wins). Read at trace
# time; measured via benchmarks/bench_fused_attention.py --hgroup.
HEAD_GROUP = 0


def _fwd_kernel_grouped(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                        *, num_heads: int, head_size: int, rate: float,
                        bb: int, hpg: int):
    """Grouped forward: per batch row, H//hpg sequential groups; group g
    lane-slices q/k/v to its hpg heads ([*, hpg*head_size], 128-lane-aligned
    when hpg*head_size == 128) and runs the rev-3 lane-blocked triple at
    hpg-fold (not H-fold) redundancy. bias arrives group-majored
    [B, n_groups, hpg*Sk]."""
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    sk = k_ref.shape[1]
    gw = hpg * head_size                      # group lane width
    rows = hpg * sk
    n_groups = num_heads // hpg
    headmask = _head_lane_mask(rows, sk, gw, head_size, k_ref.dtype)
    segsum = _make_segsum(sk, hpg)

    def body(b, _):
        qb = q_ref[b]
        kb = k_ref[b]
        vb = v_ref[b]
        ctx_parts = []
        for g in range(n_groups):
            lo, hi = g * gw, (g + 1) * gw
            qg = qb[:, lo:hi]                                 # [Sq, gw]
            km = _tile_rows(kb[:, lo:hi], hpg) * headmask     # [hpg*Sk, gw]
            vm = _tile_rows(vb[:, lo:hi], hpg) * headmask
            bias_g = bias_ref[b][g:g + 1, :]                  # [1, hpg*Sk]
            s = jax.lax.dot_general(
                qg, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # [Sq, hpg*Sk]
            s = s * scale + bias_g
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            denom = jnp.maximum(segsum(e), 1e-30)
            p = e / denom
            if rate > 0.0:
                keep = _keep_mask(p.shape, rate, seed, prog * bb + b, g)
                p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
            ctx_parts.append(jax.lax.dot_general(
                p.astype(qg.dtype), vm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))          # [Sq, gw]
        o_ref[b] = jnp.concatenate(ctx_parts, axis=1).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


def _bwd_kernel_grouped(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                        dq_ref, dk_ref, dv_ref, *,
                        num_heads: int, head_size: int, rate: float,
                        bb: int, hpg: int):
    """Grouped flash-style recompute backward: per group, the rev-3
    recompute five-dot sequence at hpg-block width; dq/dk/dv lane-concat
    their per-group parts back to d_model."""
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    sk = k_ref.shape[1]
    gw = hpg * head_size
    rows = hpg * sk
    n_groups = num_heads // hpg
    headmask = _head_lane_mask(rows, sk, gw, head_size, k_ref.dtype)
    headmask_f = headmask.astype(jnp.float32)
    segsum = _make_segsum(sk, hpg)

    def body(b, _):
        qb = q_ref[b]
        kb = k_ref[b]
        vb = v_ref[b]
        gb = g_ref[b]
        dq_parts, dk_parts, dv_parts = [], [], []
        for g in range(n_groups):
            lo, hi = g * gw, (g + 1) * gw
            qg = qb[:, lo:hi]
            km = _tile_rows(kb[:, lo:hi], hpg) * headmask
            vm = _tile_rows(vb[:, lo:hi], hpg) * headmask
            gg = gb[:, lo:hi]
            bias_g = bias_ref[b][g:g + 1, :]
            s = jax.lax.dot_general(
                qg, km, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_g
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            denom = jnp.maximum(segsum(e), 1e-30)
            p = e / denom
            if rate > 0.0:
                keep = _keep_mask(p.shape, rate, seed, prog * bb + b, g)
                drop = jnp.where(keep, inv_keep, 0.0)
            else:
                drop = 1.0
            p_t = p * drop
            dvm = jax.lax.dot_general(
                p_t.astype(gg.dtype), gg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [hpg*Sk, gw]
            dv_parts.append(_sum_head_blocks(dvm, hpg, sk, headmask_f))
            dp = jax.lax.dot_general(
                gg, vm, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * drop   # [Sq, hpg*Sk]
            blocksum = segsum(dp * p)
            ds = ((dp - blocksum) * p * scale).astype(qg.dtype)
            dq_parts.append(jax.lax.dot_general(
                ds, km, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # [Sq, gw]
            dkm = jax.lax.dot_general(
                ds, qg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [hpg*Sk, gw]
            dk_parts.append(_sum_head_blocks(dkm, hpg, sk, headmask_f))
        dq_ref[b] = jnp.concatenate(dq_parts, axis=1).astype(dq_ref.dtype)
        dk_ref[b] = jnp.concatenate(dk_parts, axis=1).astype(dk_ref.dtype)
        dv_ref[b] = jnp.concatenate(dv_parts, axis=1).astype(dv_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


# Experimental batch-pair formulation (VERDICT r3 #4's "q-stack"): process
# TWO batch rows per dot — q rows stacked on sublanes [2*Sq, d], k/v blocks
# stacked on sublanes [2*H*Sk, d], cross-item scores masked to -1e9 before
# the softmax. Doubles each dot's arithmetic (the cross-item quadrant is
# garbage) but HALVES the number of sequential dots per program — a win iff
# the dots are latency- rather than FLOP-bound (the THIN_SEG measurement
# said they are). Read at trace time; measured via
# benchmarks/bench_fused_attention.py --pair.
#
# MEASURED (v5e, stage-2 bs-256 window): 3565.6 ex/s paired vs 3568.2
# single — a wash (0.999x). The halved issue count buys exactly what the
# doubled per-dot arithmetic costs, i.e. at these operand heights the dots
# already retire near the MXU's issue floor. VERDICT r3 #4's third
# formulation: REJECTED; the profile-pinned speed-of-light (1.349x step
# bound, profile_stage2.py) stands as the documented gap.
Q_PAIR = False


def _pair_bias(sq: int, rows: int):
    """[2*Sq, 2*rows] additive mask: row block r (item r of the pair) keeps
    its own item's key columns, -1e9 elsewhere."""
    ri = jax.lax.broadcasted_iota(jnp.int32, (2 * sq, 2 * rows), 0) // sq
    ci = jax.lax.broadcasted_iota(jnp.int32, (2 * sq, 2 * rows), 1) // rows
    return jnp.where(ri == ci, 0.0, -1e9).astype(jnp.float32)


def _fwd_kernel_pair(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *p_out,
                     num_heads: int, head_size: int, rate: float, bb: int):
    """Batch-pair forward: same three dots as _fwd_kernel at doubled
    operand height, bb//2 sequential iterations instead of bb. The stored-p
    residual is written per ROW as [Sq, 2*H*Sk] (item r's valid columns at
    [r*H*Sk:(r+1)*H*Sk]; the cross quadrant holds exact zeros). The dropout
    counter hash keys on the pair index, so the drawn mask differs from the
    unpaired kernel's (same distribution; fwd/bwd regenerate identically)."""
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    sq = q_ref.shape[1]
    sk = k_ref.shape[1]
    d_model = num_heads * head_size
    rows = num_heads * sk
    headmask = _head_lane_mask(rows, sk, d_model, head_size, k_ref.dtype)
    segsum = _make_segsum(sk, 2 * num_heads)  # 2H blocks of sk
    pairbias = _pair_bias(sq, rows)

    def body(pair, _):
        b0 = 2 * pair
        qb = jnp.concatenate([q_ref[b0], q_ref[b0 + 1]], axis=0)
        km = jnp.concatenate(
            [_tile_rows(k_ref[b0], num_heads) * headmask,
             _tile_rows(k_ref[b0 + 1], num_heads) * headmask], axis=0)
        vm = jnp.concatenate(
            [_tile_rows(v_ref[b0], num_heads) * headmask,
             _tile_rows(v_ref[b0 + 1], num_heads) * headmask], axis=0)
        bias_b = jnp.concatenate([bias_ref[pl.ds(b0, 1), :],
                                  bias_ref[pl.ds(b0 + 1, 1), :]], axis=1)
        s = jax.lax.dot_general(
            qb, km, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2Sq, 2HSk]
        s = s * scale + bias_b + pairbias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)  # cross-item entries underflow to exactly 0
        denom = jnp.maximum(segsum(e), 1e-30)
        p = e / denom
        if p_out:
            p_out[0][b0] = p[:sq].astype(p_out[0].dtype)
            p_out[0][b0 + 1] = p[sq:].astype(p_out[0].dtype)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed,
                              prog * (bb // 2) + pair, 0)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        ctx = jax.lax.dot_general(
            p.astype(qb.dtype), vm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2Sq, d_model]
        o_ref[b0] = ctx[:sq].astype(o_ref.dtype)
        o_ref[b0 + 1] = ctx[sq:].astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb // 2, body, 0)


def _bwd_kernel_stored_pair(seed_ref, q_ref, k_ref, v_ref, p_ref, g_ref,
                            dq_ref, dk_ref, dv_ref, *,
                            num_heads: int, head_size: int, rate: float,
                            bb: int, fold_dot: bool):
    """Stored-p backward, batch-pair formulation: the five dots of
    _bwd_kernel_stored at doubled height over bb//2 iterations. Cross-item
    p entries are exact zeros, so ds is zero there and every gradient
    quadrant lands correctly."""
    del fold_dot  # pair mode uses the sublane-add fold only
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    sq = q_ref.shape[1]
    sk = k_ref.shape[1]
    d_model = num_heads * head_size
    rows = num_heads * sk
    headmask = _head_lane_mask(rows, sk, d_model, head_size, k_ref.dtype)
    headmask_f = headmask.astype(jnp.float32)
    segsum = _make_segsum(sk, 2 * num_heads)

    def fold(dm):
        return _sum_head_blocks(dm, num_heads, sk, headmask_f)

    def body(pair, _):
        b0 = 2 * pair
        qb = jnp.concatenate([q_ref[b0], q_ref[b0 + 1]], axis=0)
        km = jnp.concatenate(
            [_tile_rows(k_ref[b0], num_heads) * headmask,
             _tile_rows(k_ref[b0 + 1], num_heads) * headmask], axis=0)
        vm = jnp.concatenate(
            [_tile_rows(v_ref[b0], num_heads) * headmask,
             _tile_rows(v_ref[b0 + 1], num_heads) * headmask], axis=0)
        gb = jnp.concatenate([g_ref[b0], g_ref[b0 + 1]], axis=0)
        p = jnp.concatenate([p_ref[b0], p_ref[b0 + 1]],
                            axis=0).astype(jnp.float32)   # [2Sq, 2HSk]
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed,
                              prog * (bb // 2) + pair, 0)
            drop = jnp.where(keep, inv_keep, 0.0)
        else:
            drop = 1.0
        p_t = p * drop
        dvm = jax.lax.dot_general(
            p_t.astype(gb.dtype), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2HSk, d_model]
        dv_ref[b0] = fold(dvm[:rows]).astype(dv_ref.dtype)
        dv_ref[b0 + 1] = fold(dvm[rows:]).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gb, vm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * drop    # [2Sq, 2HSk]
        blocksum = segsum(dp * p)
        ds = ((dp - blocksum) * p * scale).astype(qb.dtype)
        dq = jax.lax.dot_general(
            ds, km, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[b0] = dq[:sq].astype(dq_ref.dtype)
        dq_ref[b0 + 1] = dq[sq:].astype(dq_ref.dtype)
        dkm = jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2HSk, d_model]
        dk_ref[b0] = fold(dkm[:rows]).astype(dk_ref.dtype)
        dk_ref[b0 + 1] = fold(dkm[rows:]).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb // 2, body, 0)


def _fold_selector(sk: int, rows: int):
    """[Sk, H*Sk] indicator S[k', h*Sk+k'] = 1: folds the H sublane blocks
    of a (head-masked) tiled gradient with one MXU dot instead of H
    sequential adds."""
    ki = jax.lax.broadcasted_iota(jnp.int32, (sk, rows), 0)
    r = jax.lax.broadcasted_iota(jnp.int32, (sk, rows), 1)
    return (r % sk == ki).astype(jnp.float32)


def _bwd_kernel_stored(seed_ref, q_ref, k_ref, v_ref, p_ref, g_ref,
                       dq_ref, dk_ref, dv_ref, *,
                       num_heads: int, head_size: int, rate: float, bb: int,
                       fold_dot: bool):
    """Stored-p backward: five MXU dots per batch row (no score/denominator
    recompute — p arrives as the forward's residual; the dropout mask is
    regenerated from the counter hash, identical to the forward's)."""
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    sk = k_ref.shape[1]
    d_model = num_heads * head_size
    rows = num_heads * sk
    headmask = _head_lane_mask(rows, sk, d_model, head_size, k_ref.dtype)
    headmask_f = headmask.astype(jnp.float32)
    segsum = _make_segsum(sk, num_heads)
    sel = _fold_selector(sk, rows) if fold_dot else None

    def fold(dm):
        if fold_dot:
            return jax.lax.dot_general(
                sel, dm * headmask_f, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return _sum_head_blocks(dm, num_heads, sk, headmask_f)

    def body(b, _):
        qb = q_ref[b]
        km = _tile_rows(k_ref[b], num_heads) * headmask
        vm = _tile_rows(v_ref[b], num_heads) * headmask
        gb = g_ref[b]
        # pre-dropout probs [Sq, H*Sk]; f32 math regardless of storage dtype
        p = p_ref[b].astype(jnp.float32)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, prog * bb + b, 0)
            drop = jnp.where(keep, inv_keep, 0.0)
        else:
            drop = 1.0
        p_t = p * drop
        dvm = jax.lax.dot_general(
            p_t.astype(gb.dtype), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H*Sk, d_model]
        dv_ref[b] = fold(dvm).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gb, vm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * drop   # [Sq, H*Sk]
        blocksum = segsum(dp * p)
        ds = ((dp - blocksum) * p * scale).astype(qb.dtype)
        dq = jax.lax.dot_general(
            ds, km, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[b] = dq.astype(dq_ref.dtype)
        dkm = jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_ref[b] = fold(dkm).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


def _sum_head_blocks(dm, num_heads: int, sk: int, headmask):
    """[H*Sk, d_model] block-diag gradient -> [Sk, d_model]: sum the H
    sublane blocks (each already zero outside its head's lanes)."""
    dmm = dm * headmask
    out = dmm[0:sk, :]
    for h in range(1, num_heads):
        out = out + dmm[h * sk:(h + 1) * sk, :]
    return out


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                num_heads: int, head_size: int, rate: float, bb: int):
    """Lane-blocked backward (flash-style recompute): five MXU dots per
    batch row; dk/dv fold the tiled-copy gradients back with masked
    sublane-block sums. Off-block entries never exist in this formulation,
    so no gradient masking beyond the head-lane mask is needed."""
    prog = pl.program_id(0)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    sk = k_ref.shape[1]
    d_model = num_heads * head_size
    rows = num_heads * sk
    headmask = _head_lane_mask(rows, sk, d_model, head_size, k_ref.dtype)
    headmask_f = headmask.astype(jnp.float32)
    segsum = _make_segsum(sk, num_heads)

    def body(b, _):
        qb = q_ref[b]
        km = _tile_rows(k_ref[b], num_heads) * headmask
        vm = _tile_rows(v_ref[b], num_heads) * headmask
        gb = g_ref[b]
        bias_b = bias_ref[pl.ds(b, 1), :]
        s = jax.lax.dot_general(
            qb, km, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_b
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.maximum(segsum(e), 1e-30)  # NaN guard, see fwd
        p = e / denom                        # pre-dropout probs [Sq, H*Sk]
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, prog * bb + b, 0)
            drop = jnp.where(keep, inv_keep, 0.0)
        else:
            drop = 1.0
        p_t = p * drop
        # dvm = p_tilde^T @ g  -> fold tiled blocks back to [Sk, d_model]
        dvm = jax.lax.dot_general(
            p_t.astype(gb.dtype), gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H*Sk, d_model]
        dv_ref[b] = _sum_head_blocks(
            dvm, num_heads, sk, headmask_f).astype(dv_ref.dtype)
        # dp = (g @ vm^T) * drop
        dp = jax.lax.dot_general(
            gb, vm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * drop   # [Sq, H*Sk]
        # segmented softmax vjp: ds = (dp - blocksum(dp * p)) * p
        blocksum = segsum(dp * p)
        ds = ((dp - blocksum) * p * scale).astype(qb.dtype)
        dq = jax.lax.dot_general(
            ds, km, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [Sq, d_model]
        dq_ref[b] = dq.astype(dq_ref.dtype)
        # dkm = ds^T @ q -> fold blocks
        dkm = jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [H*Sk, d_model]
        dk_ref[b] = _sum_head_blocks(
            dkm, num_heads, sk, headmask_f).astype(dk_ref.dtype)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


# Per-batch-row in+out block bytes at which bb=16 still fits Mosaic's 16 MB
# scoped-vmem stack. Calibrated from measured compiles of the stored-p bwd:
# LXMERT bf16 seq-36 (449 KB/row -> 7.2 MB io at bb=16) fits; mPLUG fp32
# seq-25 (567 KB/row, Mosaic 16.5M) and VisualBERT bf16 seq-50 (657 KB/row,
# Mosaic 16.99M) both overflow — the fixed intermediates (km/vm/indicator
# matrices) plus buffering roughly double the io share.
_ROW_BYTES_BB16 = 512 * 1024
_MAX_IO_BYTES = 16 * _ROW_BYTES_BB16  # total io budget per block


def _pick_bb(batch: int, bytes_per_row: int):
    """Batch-tile size, or None when no feasible tile exists (the caller
    must then use the XLA attention path). The bwd kernel keeps [bb, S, H*D]
    io tiles plus [H*S, *] intermediates resident; bb=16 is the
    measured-optimal LXMERT tile, halved when the io bytes say the Mosaic
    stack would overflow (_ROW_BYTES_BB16 calibration above); every
    candidate — including the odd-batch full-block fallback — must respect
    the same total io budget.

    Mosaic requires the sublane block dim to be 8-divisible OR equal to the
    array dim, so batches not divisible by 8 (e.g. the b*answers decoder
    batch of an odd init trace) run as ONE full-batch block when small."""
    for bb in (16, 8):
        if batch % bb == 0 and bb * bytes_per_row <= _MAX_IO_BYTES:
            return bb
    if (batch % 8 != 0 and batch <= 32
            and batch * bytes_per_row <= _MAX_IO_BYTES):
        return batch
    return None


def _bwd_row_bytes(sq: int, sk: int, num_heads: int, head_size: int,
                   itemsize: int) -> int:
    """Per-row io bytes of the stored-p backward — the largest kernel
    variant, so feasibility here implies feasibility of the forwards."""
    d = num_heads * head_size
    rows = num_heads * sk
    return (3 * sq * d * itemsize          # q, g, dq
            + 4 * sk * d * itemsize        # k, v, dk, dv
            + sq * rows * 4                # stored probs residual
            + rows * 4)                    # pre-tiled bias


def supported(batch: int, sq: int, sk: int, num_heads: int, head_size: int,
              itemsize: int) -> bool:
    """Dispatch predicate for MultiHeadAttention: True iff BOTH the
    forward-for-grad and the stored backward can find a feasible batch
    tile at these shapes. Callers fall back to the XLA path otherwise
    (e.g. batch 60 = 12 questions x 5 answers: not 8-divisible and too big
    for one block; or fp32 long-seq rows that overflow even bb=8)."""
    return _pick_bb(batch, _bwd_row_bytes(sq, sk, num_heads, head_size,
                                          itemsize)) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: jax.Array, num_heads: int, head_size: int,
                    rate: float, interpret: bool = False) -> jax.Array:
    """softmax(q k^T / sqrt(d) + bias) (dropout) @ v, per head, fused.

    q [B, Sq, H*D] bf16/fp32; k, v [B, Sk, H*D]; bias [B, Sk] fp32 additive
    (0 for valid keys, -10000 for padding — `extend_attention_mask`). The
    dropout seed rides in via `fused_attention_seeded`; this entry uses
    seed 0 (rate 0 in eval paths makes it moot).
    """
    return _fa_primal(q, k, v, bias, num_heads, head_size, rate, interpret,
                      jnp.zeros((1,), jnp.int32))


def _call(kernel, ins, outs, args, seed, num_heads, head_size, rate,
          interpret, **kernel_kw):
    """ins/outs: (seq, width, dtype) per tensor; args align with ins.
    The int32[1] dropout seed rides as the scalar-prefetch operand."""
    batch = args[0].shape[0]
    bytes_per_row = sum(max(s, 1) * w * jnp.dtype(dt).itemsize
                        for s, w, dt in (*ins, *outs))
    bb = _pick_bb(batch, bytes_per_row)
    if bb is None:
        raise ValueError(
            f"fused attention: no feasible batch tile (batch {batch}, "
            f"{bytes_per_row} io B/row) — gate calls with "
            "fused_attention.supported() and use the XLA path instead")
    grid = (batch // bb,)
    # index maps receive (grid idx, scalar-prefetch ref)
    spec = lambda s, w: pl.BlockSpec((bb, s, w) if s else (bb, w),
                                     (lambda i, seed: (i, 0, 0)) if s
                                     else (lambda i, seed: (i, 0)),
                                     memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[spec(s, w) for s, w, _ in ins],
        out_specs=tuple(spec(s, w) for s, w, _ in outs),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((batch, s, w) if s else (batch, w), dt)
        for s, w, dt in outs)
    fn = pl.pallas_call(
        functools.partial(kernel, num_heads=num_heads, head_size=head_size,
                          rate=rate, bb=bb, **kernel_kw),
        grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )
    res = fn(seed, *args)
    return res if isinstance(res, (tuple, list)) else (res,)


def _qkvb(q, k, v, bias, num_heads):
    """Common q/k/v/bias input descriptors; bias arrives [B, Sk] and the
    stacked-head kernels consume it pre-tiled to [B, H*Sk] (lane tiling is
    cheap in XLA, awkward in-kernel)."""
    d = q.shape[2]
    sq, sk = q.shape[1], k.shape[1]
    ins = [(sq, d, q.dtype), (sk, d, k.dtype), (sk, d, v.dtype),
           (0, num_heads * sk, jnp.float32)]
    args = [q, k, v, jnp.tile(bias, (1, num_heads))]
    return ins, args, sq, sk, d


def _pair_ok(batch: int) -> bool:
    """Batch-pair dispatch: Q_PAIR set, stored backward, and a batch whose
    tile is guaranteed even (8-divisible avoids the odd full-block
    fallback)."""
    return Q_PAIR and batch % 8 == 0 and BWD_IMPL != "recompute"


def _hgroup_of(num_heads: int) -> int:
    """Active heads-per-group, or 0 for the full-width rev-3 path."""
    if 0 < HEAD_GROUP < num_heads and num_heads % HEAD_GROUP == 0:
        return HEAD_GROUP
    return 0


def _qkvb_grouped(q, k, v, bias, num_heads: int, hpg: int):
    """Grouped-mode inputs: bias group-majored to [B, n_groups, hpg*Sk]
    (per-group sublane rows — lane slicing the flat [H*Sk] layout at
    non-128 offsets is what this avoids)."""
    d = q.shape[2]
    sq, sk = q.shape[1], k.shape[1]
    n_groups = num_heads // hpg
    ins = [(sq, d, q.dtype), (sk, d, k.dtype), (sk, d, v.dtype),
           (n_groups, hpg * sk, jnp.float32)]
    bg = jnp.broadcast_to(jnp.tile(bias, (1, hpg))[:, None, :],
                          (q.shape[0], n_groups, hpg * sk))
    return ins, [q, k, v, bg], sq, sk, d


def _fa_primal(q, k, v, bias, num_heads, head_size, rate, interpret, seed):
    """No-residual forward — eval / non-differentiated calls."""
    hpg = _hgroup_of(num_heads)
    if hpg:
        ins, args, sq, sk, d = _qkvb_grouped(q, k, v, bias, num_heads, hpg)
        (o,) = _call(_fwd_kernel_grouped, ins, ((sq, d, q.dtype),), args,
                     seed, num_heads, head_size, rate, interpret, hpg=hpg)
        return o
    ins, args, sq, sk, d = _qkvb(q, k, v, bias, num_heads)
    kern = _fwd_kernel_pair if _pair_ok(q.shape[0]) else _fwd_kernel
    (o,) = _call(kern, ins, ((sq, d, q.dtype),), args, seed,
                 num_heads, head_size, rate, interpret)
    return o


def _fa_fwd(q, k, v, bias, num_heads, head_size, rate, interpret, seed):
    """Forward-for-grad: BWD_IMPL selects whether probs are saved."""
    if _hgroup_of(num_heads):
        # grouped mode: recompute-style backward, no residual
        o = _fa_primal(q, k, v, bias, num_heads, head_size, rate, interpret,
                       seed)
        return o, (q, k, v, bias, seed, None)
    ins, args, sq, sk, d = _qkvb(q, k, v, bias, num_heads)
    if BWD_IMPL == "recompute":
        (o,) = _call(_fwd_kernel, ins, ((sq, d, q.dtype),), args, seed,
                     num_heads, head_size, rate, interpret)
        return o, (q, k, v, bias, seed, None)
    if _pair_ok(q.shape[0]):
        # pair residual: [Sq, 2*H*Sk] per row (own item's columns at block
        # r of the pair; cross quadrant exact zeros)
        o, p = _call(_fwd_kernel_pair, ins,
                     ((sq, d, q.dtype),
                      (sq, 2 * num_heads * sk, P_RESIDUAL_DTYPE)),
                     args, seed, num_heads, head_size, rate, interpret)
        return o, (q, k, v, bias, seed, p)
    o, p = _call(_fwd_kernel, ins,
                 ((sq, d, q.dtype), (sq, num_heads * sk, P_RESIDUAL_DTYPE)),
                 args, seed, num_heads, head_size, rate, interpret)
    return o, (q, k, v, bias, seed, p)


def _fa_bwd(num_heads, head_size, rate, interpret, res, g):
    q, k, v, bias, seed, p = res
    hpg = _hgroup_of(num_heads)
    if hpg and p is None:
        ins, args, sq, sk, d = _qkvb_grouped(q, k, v, bias, num_heads, hpg)
        outs = ((sq, d, q.dtype), (sk, d, k.dtype), (sk, d, v.dtype))
        dq, dk, dv = _call(_bwd_kernel_grouped, ins + [(sq, d, q.dtype)],
                           outs, args + [g.astype(q.dtype)], seed,
                           num_heads, head_size, rate, interpret, hpg=hpg)
        return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
                jnp.zeros_like(bias))
    ins, args, sq, sk, d = _qkvb(q, k, v, bias, num_heads)
    g = g.astype(q.dtype)
    outs = ((sq, d, q.dtype), (sk, d, k.dtype), (sk, d, v.dtype))
    if p is None:
        dq, dk, dv = _call(_bwd_kernel, ins + [(sq, d, q.dtype)], outs,
                           args + [g], seed, num_heads, head_size, rate,
                           interpret)
    elif _pair_ok(q.shape[0]):
        ins = ins[:3] + [(sq, 2 * num_heads * sk, p.dtype),
                         (sq, d, q.dtype)]
        dq, dk, dv = _call(_bwd_kernel_stored_pair, ins, outs,
                           args[:3] + [p, g], seed, num_heads, head_size,
                           rate, interpret, fold_dot=False)
    else:
        # stored-p backward never reads the bias
        ins = ins[:3] + [(sq, num_heads * sk, p.dtype),
                         (sq, d, q.dtype)]
        dq, dk, dv = _call(_bwd_kernel_stored, ins, outs,
                           args[:3] + [p, g], seed, num_heads, head_size,
                           rate, interpret,
                           fold_dot=(BWD_IMPL == "stored_folddot"))
    # bias comes from the padding mask — no grad path needed, but custom_vjp
    # requires a float cotangent of the right shape
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias))


fused_attention.defvjp(
    lambda q, k, v, bias, nh, hs, rate, interp: _fa_fwd(
        q, k, v, bias, nh, hs, rate, interp, jnp.zeros((1,), jnp.int32)),
    _fa_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_attention_seeded(q, k, v, bias, seed, num_heads, head_size,
                           rate, interpret=False):
    """fused_attention with an explicit int32[1] dropout seed (train path)."""
    return _fa_primal(q, k, v, bias, num_heads, head_size, rate, interpret,
                      seed)


def _fas_fwd(q, k, v, bias, seed, num_heads, head_size, rate, interpret):
    o, res = _fa_fwd(q, k, v, bias, num_heads, head_size, rate, interpret,
                     seed)
    return o, res


def _fas_bwd(num_heads, head_size, rate, interpret, res, g):
    import numpy as np

    dq, dk, dv, dbias = _fa_bwd(num_heads, head_size, rate, interpret, res, g)
    seed = res[4]
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)  # int primal
    return dq, dk, dv, dbias, dseed


fused_attention_seeded.defvjp(_fas_fwd, _fas_bwd)


def reference_attention(q, k, v, bias, num_heads, head_size, rate=0.0,
                        keep_mask=None):
    """XLA reference (same math as models/layers.MultiHeadAttention) for
    the equivalence tests."""
    b, sq, d = q.shape
    sk = k.shape[1]
    qh = q.reshape(b, sq, num_heads, head_size)
    kh = k.reshape(b, sk, num_heads, head_size)
    vh = v.reshape(b, sk, num_heads, head_size)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh).astype(jnp.float32)
    s = s / (head_size ** 0.5) + bias[:, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    if keep_mask is not None:
        p = jnp.where(keep_mask, p / (1.0 - rate), 0.0)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), vh)
    return ctx.reshape(b, sq, d)
