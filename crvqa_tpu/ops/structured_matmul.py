"""Structured-mask (head-pruned) matmuls: skip whole masked output blocks.

Head masking (`masking/structured.py`, re-designing Binarizer_head at
`prune_debias_VQA.py:633-667`) zeroes whole `head_size`-wide output column
blocks of Q/K/V kernels. Unlike unstructured masks — where the measured
verdict in `ops/masked_matmul.py` favors plain XLA — block sparsity is
skippable compute: with k of H heads masked, the matmul needs only
(H-k)/H of the FLOPs and of the weight HBM traffic.

Two implementations, both returning the full [M, N] output with masked head
columns exactly zero (bit-identical layout to the dense `x @ (w*mask)`):

- `head_compact_matmul` — pure XLA: gather kept head blocks of `w`, one
  dense [M, K] @ [K, kept*hs] matmul, scatter into zeros. The gather
  materializes the kept weight slice once per call.
- `head_compact_matmul_pallas` — zero-copy: `w` is consumed TRANSPOSED
  [N, K] and a PrefetchScalarGridSpec index_map selects kept head blocks
  straight out of HBM (no gathered copy is ever written), computing
  y_c^T = w_kept^T @ x^T tile by tile. A 64-row head block satisfies the
  fp32 sublane constraint (min 8), so head_size >= 8 works natively.

MEASURED VERDICT (v5e, M=9216 K=N=768, 12 heads x 64, 4 kept = 0.7 zero
rate, bf16, in-jit loop with full-reduction carry, tunnel overhead
subtracted — benchmarks/bench_structured.py):

    | impl           | us/matmul | speedup vs dense |
    |----------------|-----------|------------------|
    | xla_dense      | 56.3      | 1.00x            |
    | xla_compact    | 35.6      | 1.58x            |
    | pallas_compact | 80.5      | 0.70x            |

The XLA gather-compact path wins 1.58x: the 3x FLOP cut nets 1.58x wall
after gather/scatter overhead. The Pallas zero-copy kernel LOSES — its
64-row output blocks only half-fill the 128x128 MXU, which costs more than
the gather it avoids. xla_compact is therefore the structured fast path;
the Pallas variant stays as the measured reference point.

For FIXED masks (stage-3 / eval of a finished checkpoint) the better
integration is `masking/compaction.py`, which slices kept heads/neurons out
of the params ONCE on host and runs the unchanged model at the smaller
static shape — no per-call gather at all. The ops here remain the fast path
when the mask is dynamic (mask-training eval, where scores still move).

Gradients: compact forwards cannot carry the straight-through estimator —
masked heads produce zero output but their SCORES still need gradients
(d(w*B(s))/ds == w under STE), which the gather/scatter VJP would silently
drop. `head_compact_matmul` therefore ships a custom VJP that recomputes
the dense masked backward; the Pallas variant is inference/stage-3 only.
Use the dense path for stage-2 training (where scores train); use these
where the mask is FIXED (eval loops, stage-3 fine-tuning forwards).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def expand_keep_idx(head_mask: jax.Array, n_keep: int) -> jax.Array:
    """Indices of kept heads, padded to a static n_keep. `head_mask` is
    bool [H], True = kept. Pad entries beyond the true kept count (and an
    all-masked mask — previously it silently computed one masked head) use
    the out-of-range sentinel H: `jnp.take` clips it (garbage compute) and
    the `mode='drop'` scatter discards it, so the output stays exactly
    `x @ (w * mask)` for every mask incl. all-False."""
    num_heads = head_mask.shape[0]
    idx = jnp.argsort(~head_mask)  # kept first, stable
    n_kept = jnp.sum(head_mask.astype(jnp.int32))
    pos = jnp.minimum(jnp.arange(n_keep), jnp.maximum(n_kept - 1, 0))
    return jnp.where(jnp.arange(n_keep) < n_kept, idx[pos], num_heads)


# ------------------------------------------------------------------ XLA path
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_compact_matmul(x: jax.Array, w: jax.Array, keep_idx: jax.Array,
                        num_heads: int, head_size: int) -> jax.Array:
    """y = x @ (w * head_mask) computing only the kept head columns.

    x [M, K], w [K, N] with N = num_heads*head_size; keep_idx [n_kept] are
    the kept head indices (values dynamic, count static).
    """
    return _compact_fwd(x, w, keep_idx, num_heads, head_size)[0]


def _compact_fwd(x, w, keep_idx, num_heads, head_size):
    m, k = x.shape
    n = w.shape[1]
    w3 = w.reshape(k, num_heads, head_size)
    wk = jnp.take(w3, keep_idx, axis=1).reshape(k, -1)
    yk = jnp.dot(x, wk, preferred_element_type=x.dtype)
    y3 = jnp.zeros((m, num_heads, head_size), x.dtype)
    y3 = y3.at[:, keep_idx].set(yk.reshape(m, -1, head_size), mode="drop")
    return y3.reshape(m, n), (x, w, keep_idx)


def _compact_bwd(num_heads, head_size, res, g):
    """Dense masked backward: d/dw (w * m) = m, so masked head columns get
    exactly zero weight gradient (matching CustomFromMask / the dense
    masked matmul). Score gradients are NOT this op's job — they flow
    through `binarize_head_ste`'s identity STE upstream of the mask."""
    x, w, keep_idx = res
    k, n = w.shape
    mask_h = jnp.zeros((num_heads,), w.dtype).at[keep_idx].set(1.0)
    mask = jnp.repeat(mask_h, head_size)  # [N]
    wm = w * mask[None, :]
    dx = jnp.dot(g, wm.T, preferred_element_type=g.dtype)
    dw = jnp.dot(x.T, g, preferred_element_type=g.dtype) * mask[None, :]
    return dx, dw, None


head_compact_matmul.defvjp(lambda x, w, ki, nh, hs: _compact_fwd(x, w, ki, nh, hs),
                           _compact_bwd)


# --------------------------------------------------------------- Pallas path
def _kernel(keep_ref, wt_ref, xt_ref, o_ref, acc_ref):
    # grid: (kept_head, M tile, K tile); wt block is the keep_ref[h]-th
    # head's [head_size, BK] slice of w^T, selected by the index_map below
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        wt_ref[:].astype(jnp.bfloat16), xt_ref[:].astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def head_compact_matmul_pallas(x: jax.Array, wt: jax.Array,
                               keep_idx: jax.Array, num_heads: int,
                               head_size: int, bm: int = 512,
                               bk: int = 256, interpret: bool = False
                               ) -> jax.Array:
    """Zero-copy block-sparse matmul: y = x @ (w*head_mask) with w given
    TRANSPOSED (wt [N, K]). Only kept head blocks of wt ever leave HBM —
    the PrefetchScalarGridSpec index_map routes grid position -> head block
    using the prefetched keep_idx. Inference-path only (no custom VJP).
    """
    m, k = x.shape
    n = wt.shape[0]
    n_kept = keep_idx.shape[0]
    assert n == num_heads * head_size and wt.shape[1] == k
    assert m % bm == 0 and k % bk == 0, (m, k, bm, bk)
    # expand_keep_idx pads with the out-of-range sentinel H (dropped by the
    # XLA scatter); the index routes a BLOCK fetch, so the FETCH needs a
    # clamped copy (pad blocks recompute the last kept head as garbage) —
    # but the final scatter must use the ORIGINAL sentinel so mode="drop"
    # actually drops those pad blocks instead of overwriting head H-1
    fetch_idx = jnp.minimum(keep_idx, num_heads - 1)

    xt = x.T  # [K, M]
    grid = (n_kept, m // bm, k // bk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            # wt block: the keep_idx[h]-th head rows, k-th K slice
            pl.BlockSpec((head_size, bk),
                         lambda h, i, kk, keep: (keep[h], kk)),
            # xt block: k-th K slice, i-th M slice
            pl.BlockSpec((bk, bm), lambda h, i, kk, keep: (kk, i)),
        ],
        # compact output y_c^T [n_kept*hs, M]: h-th head block, i-th M slice
        out_specs=pl.BlockSpec((head_size, bm),
                               lambda h, i, kk, keep: (h, i)),
        scratch_shapes=[pltpu.VMEM((head_size, bm), jnp.float32)],
    )
    yct = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_kept * head_size, m), x.dtype),
        interpret=interpret,
    )(fetch_idx, wt, xt)
    # scatter the compact heads back into the dense [M, N] layout
    y3 = jnp.zeros((m, num_heads, head_size), x.dtype)
    yc = yct.T.reshape(m, n_kept, head_size)
    return y3.at[:, keep_idx].set(yc, mode="drop").reshape(m, n)


def dense_masked_matmul(x: jax.Array, w: jax.Array, head_mask: jax.Array,
                        head_size: int) -> jax.Array:
    """XLA baseline: materialize w * expand(head_mask) then matmul."""
    mask = jnp.repeat(head_mask.astype(w.dtype), head_size)
    return jnp.dot(x, w * mask[None, :], preferred_element_type=x.dtype)
