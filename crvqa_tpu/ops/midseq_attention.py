"""Fused multi-head attention for MID-LENGTH sequences (Pallas TPU).

Companion to `fused_attention.py`, which covers short contexts
(H*S <= 1024: LXMERT's 14/36 tokens, mPLUG's text towers) with lane-blocked
block-diagonal dots. This kernel covers the contexts that fall back to XLA
under that guard — mPLUG's 577-patch image attention:

- the CLIP ViT's 577-token self-attention (`models/mplug/vit.py`, the
  dominant cost of every mPLUG step and of beam eval — the reference runs it
  as plain torch MHA, `mPLUG/models/clip/model.py:ResidualAttentionBlock`),
- the fusion encoder's text->image cross-attention (Sq <= 50, Sk = 577,
  `modeling_mplug.py:445-520`),
- the stride fusion layers' joint self-attention over [image; text]
  (~602 tokens, `modeling_mplug.py:557-568`).

Why not XLA here: at S=577 XLA materializes the [B, H, S, S] probability
tensor in HBM every layer (bs 16: ~16 MB/example/layer fp32, ~2.3 GB per
ViT forward, re-read by the context dot and the backward). This kernel keeps
each head's [Sq, Sk] score/probability matrix in VMEM only.

Formulation: grid (batch, head_groups). Each program loads q/k/v lane slices
of `hg` heads ([S, hg*D] blocks — hg chosen so the lane width is
128-aligned) and runs, per head, a full-row fp32 softmax between two MXU
dots ([Sq,D]x[D,Sk] scores, [Sq,Sk]x[Sk,D] context). No online/streaming
softmax is needed: the whole [Sqp, Skp] score matrix fits VMEM at these
shapes (`supported()` enforces the budget; S ~< 900 square). The backward
recomputes scores/probs flash-style — storing them would re-create exactly
the HBM traffic the kernel exists to remove — and regenerates the dropout
mask from the same counter hash as the forward (a pure function of
(seed, batch row, head, i, j), invariant to grid layout).

Sequence padding: the wrapper pads Sq to a multiple of 16 (bf16 sublane
tile) and Sk to a multiple of 128 (score lanes), padding the key-wise bias
with -1e30 so padded keys get probability ~0; padded query rows produce
garbage that is sliced off, and their zero output-cotangents make every
padded gradient exactly zero.

Numerics: scores and softmax in fp32 (the models' fp32-softmax policy);
dots accumulate fp32 via preferred_element_type. Bias is KEY-wise [B, Sk]
(0 valid / -10000 padding) — same contract as fused_attention; callers with
query-dependent (causal) biases must use the XLA path.

Measured on the v5e chip (benchmarks/bench_mplug.py / bench_generate.py,
numerics gated by benchmarks/midseq_chip_check.py — fwd/bwd rel err vs the
XLA path <= 1.8e-2 bf16, <= 3.2e-4 fp32): mPLUG mask-train 89.6 -> 107.4
ex/s at bs 8 (+20%), 97.9 -> 127.7 at bs 16 (+30%); bs 32, RESOURCE_EXHAUSTED
without the kernel, runs at 134.0 (the removed probability tensor IS the
HBM headroom); beam-5 masked eval 139.3 -> 149.7 ex/s (+7.5%).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_attention import _keep_mask

# Conservative per-program VMEM budget (bytes). Mosaic's scoped-vmem stack
# is ~16 MB; leave headroom for double-buffered io blocks and spills.
_VMEM_BUDGET = 12 * 1024 * 1024

_NEG_INF = -1e30


def _pick_hg(num_heads: int, head_size: int) -> int:
    """Heads per program: smallest divisor of H whose lane width hg*D is
    128-aligned (aligned lane offsets for the q/k/v block slices). Falls
    back to all heads in one program (block == full array width, always a
    legal block shape)."""
    for hg in range(1, num_heads):
        if num_heads % hg == 0 and (hg * head_size) % 128 == 0:
            return hg
    return num_heads


def _pad_to(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _bwd_bytes(sqp: int, skp: int, w: int, itemsize: int) -> int:
    """Backward VMEM estimate: double-buffered io blocks (q, g, dq sized
    [Sqp, w]; k, v, dk, dv sized [Skp, w]) + the per-head fp32 temporaries
    (scores/e, p, dp, ds — 4 [Sqp, Skp] planes live at the peak)."""
    io = (3 * sqp * w + 4 * skp * w) * itemsize + skp * 4
    return 2 * io + 4 * sqp * skp * 4


def supported(batch: int, sq: int, sk: int, num_heads: int, head_size: int,
              itemsize: int) -> bool:
    """Dispatch predicate: True iff the recompute backward (the largest
    variant) fits the VMEM budget at these shapes. Callers fall back to the
    XLA path otherwise (e.g. S >= ~900 square attention)."""
    if batch < 1 or sq < 1 or sk < 1:
        return False
    hg = _pick_hg(num_heads, head_size)
    sqp, skp = _pad_to(sq, 16), _pad_to(sk, 128)
    return _bwd_bytes(sqp, skp, hg * head_size, itemsize) <= _VMEM_BUDGET


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *,
                hg: int, head_size: int, rate: float):
    """Per (batch row, head group): for each of the hg heads, two MXU dots
    around a full-row fp32 softmax, all VMEM-resident."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    qb = q_ref[0]                     # [Sqp, hg*D]
    kb = k_ref[0]                     # [Skp, hg*D]
    vb = v_ref[0]
    bias = bias_ref[0]                # [1, Skp] f32 (-1e30 on padded keys)
    for j in range(hg):
        lo, hi = j * head_size, (j + 1) * head_size
        s = jax.lax.dot_general(
            qb[:, lo:hi], kb[:, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [Sqp, Skp]
        s = s * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, b, g * hg + j)
            p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
        ctx = jax.lax.dot_general(
            p.astype(qb.dtype), vb[:, lo:hi], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [Sqp, D]
        o_ref[0, :, lo:hi] = ctx.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *,
                hg: int, head_size: int, rate: float):
    """Flash-style recompute backward: per head, recompute scores/probs,
    regenerate the dropout mask, then the three gradient dots. Heads are
    independent, so each program owns disjoint lane slices of dq/dk/dv —
    no accumulation across programs."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    seed = seed_ref[0]
    scale = 1.0 / (head_size ** 0.5)
    inv_keep = 1.0 / (1.0 - rate) if rate > 0.0 else 1.0
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    gb = g_ref[0]
    bias = bias_ref[0]
    for j in range(hg):
        lo, hi = j * head_size, (j + 1) * head_size
        qh, kh, vh, gh = (qb[:, lo:hi], kb[:, lo:hi], vb[:, lo:hi],
                          gb[:, lo:hi])
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s * scale + bias
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # pre-dropout [Sqp, Skp]
        if rate > 0.0:
            keep = _keep_mask(p.shape, rate, seed, b, g * hg + j)
            drop = jnp.where(keep, inv_keep, 0.0)
        else:
            drop = 1.0
        p_t = p * drop
        dv = jax.lax.dot_general(
            p_t.astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [Skp, D]
        dv_ref[0, :, lo:hi] = dv.astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * drop  # [Sqp, Skp]
        rowsum = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = ((dp - rowsum) * p * scale).astype(qh.dtype)
        dq = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [Sqp, D]
        dq_ref[0, :, lo:hi] = dq.astype(dq_ref.dtype)
        dk = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [Skp, D]
        dk_ref[0, :, lo:hi] = dk.astype(dk_ref.dtype)


def _pad_inputs(q, k, v, bias):
    """Pad Sq->x16 sublanes, Sk->x128 lanes; bias pad = -1e30 so padded keys
    vanish from every softmax row."""
    sq, sk = q.shape[1], k.shape[1]
    sqp, skp = _pad_to(sq, 16), _pad_to(sk, 128)
    if sqp != sq:
        q = jnp.pad(q, ((0, 0), (0, sqp - sq), (0, 0)))
    if skp != sk:
        k = jnp.pad(k, ((0, 0), (0, skp - sk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, skp - sk), (0, 0)))
    bias = jnp.pad(bias.astype(jnp.float32), ((0, 0), (0, skp - sk)),
                   constant_values=_NEG_INF)
    # [B, 1, Skp]: real-Mosaic block shapes must have their last two dims
    # (8, 128)-divisible or equal to the array dims — a 2-D [B, Skp] bias
    # with a (1, Skp) block is illegal for B > 1 (the sublane block dim 1
    # neither divides 8 nor equals B). The singleton middle axis makes the
    # (1, 1, Skp) block's last two dims (1, Skp) == the array dims.
    return q, k, v, bias[:, None, :], sq, sk


def _call(kernel, q, k, v, bias, seed, num_heads, head_size, rate,
          interpret, extra=(), extra_specs=(), n_outs=1):
    batch = q.shape[0]
    hg = _pick_hg(num_heads, head_size)
    w = hg * head_size
    sqp, skp = q.shape[1], k.shape[1]
    grid = (batch, num_heads // hg)

    def spec(s):
        return pl.BlockSpec((1, s, w), lambda b, g, seed: (b, 0, g),
                            memory_space=pltpu.VMEM)

    bias_spec = pl.BlockSpec((1, 1, skp), lambda b, g, seed: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    out_seq = (sqp,) + (skp, skp) * (n_outs > 1)
    out_dt = (q.dtype,) + (k.dtype, v.dtype) * (n_outs > 1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=[spec(sqp), spec(skp), spec(skp), bias_spec,
                  *extra_specs],
        out_specs=tuple(spec(s) for s in out_seq[:n_outs]),
    )
    out_shape = tuple(
        jax.ShapeDtypeStruct((batch, s, num_heads * head_size), dt)
        for s, dt in zip(out_seq[:n_outs], out_dt[:n_outs]))
    fn = pl.pallas_call(
        functools.partial(kernel, hg=hg, head_size=head_size, rate=rate),
        grid_spec=grid_spec, out_shape=out_shape, interpret=interpret,
    )
    res = fn(seed, q, k, v, bias, *extra)
    return res if isinstance(res, (tuple, list)) else (res,)


def _ms_primal(q, k, v, bias, seed, num_heads, head_size, rate, interpret):
    qp, kp, vp, bp, sq, sk = _pad_inputs(q, k, v, bias)
    (o,) = _call(_fwd_kernel, qp, kp, vp, bp, seed, num_heads, head_size,
                 rate, interpret)
    return o[:, :sq, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def midseq_attention_seeded(q, k, v, bias, seed, num_heads, head_size,
                            rate, interpret=False):
    """softmax(q k^T / sqrt(d) + bias) (dropout) @ v per head, VMEM-fused.

    q [B, Sq, H*D] bf16/fp32; k, v [B, Sk, H*D]; bias [B, Sk] fp32 additive
    (0 valid / -10000 padding — `extend_attention_mask`); seed int32[1]
    drives the counter-hash dropout. Gate calls with `supported()`."""
    return _ms_primal(q, k, v, bias, seed, num_heads, head_size, rate,
                      interpret)


def _ms_fwd(q, k, v, bias, seed, num_heads, head_size, rate, interpret):
    o = _ms_primal(q, k, v, bias, seed, num_heads, head_size, rate,
                   interpret)
    return o, (q, k, v, bias, seed)


def _ms_bwd(num_heads, head_size, rate, interpret, res, g):
    import numpy as np

    q, k, v, bias, seed = res
    qp, kp, vp, bp, sq, sk = _pad_inputs(q, k, v, bias)
    gp = g.astype(q.dtype)
    if qp.shape[1] != sq:
        gp = jnp.pad(gp, ((0, 0), (0, qp.shape[1] - sq), (0, 0)))
    g_spec = (pl.BlockSpec(
        (1, qp.shape[1], _pick_hg(num_heads, head_size) * head_size),
        lambda b, gi, seed: (b, 0, gi), memory_space=pltpu.VMEM),)
    dq, dk, dv = _call(_bwd_kernel, qp, kp, vp, bp, seed, num_heads,
                       head_size, rate, interpret, extra=(gp,),
                       extra_specs=g_spec, n_outs=3)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dq[:, :sq].astype(q.dtype), dk[:, :sk].astype(k.dtype),
            dv[:, :sk].astype(v.dtype), jnp.zeros_like(bias), dseed)


midseq_attention_seeded.defvjp(_ms_fwd, _ms_bwd)
