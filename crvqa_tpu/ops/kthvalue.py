"""Exact k-th smallest value on device.

The reference computes binarization thresholds with exact CPU
`torch.kthvalue` per weight matrix (`mask_trainer_Robust_VQA.py:467-482`,
`maskers_Robust.py:222-228`). On TPU we use XLA's sort (O(n log n), runs on
the VPU, deterministic); matrices here are <= ~23M elements (the word
embedding) which sorts in single-digit milliseconds — and threshold resets
happen only every `logging_steps`, so this is nowhere near the hot path.

Tie semantics match the reference: the returned value is the exact k-th
smallest element, and callers binarize with a strict `>` comparison.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def kth_smallest(x: jax.Array, k) -> jax.Array:
    """k-th smallest (1-indexed, like torch.kthvalue) of the flattened array.

    `k` may be a Python int or a traced scalar (dynamic index into the sorted
    array — no recompile when the sparsity schedule moves the target).
    """
    flat = jnp.ravel(x)
    sorted_flat = jnp.sort(flat)
    idx = jnp.clip(jnp.asarray(k, jnp.int32) - 1, 0, flat.size - 1)
    return jax.lax.dynamic_index_in_dim(sorted_flat, idx, keepdims=False)


def sparsity_threshold(scores: jax.Array, sparsity) -> jax.Array:
    """Threshold t s.t. binarize(scores > t) has ~`sparsity` zero rate.

    k = int(n * sparsity), clamped to >= 1 exactly as the reference does
    (`mask_trainer_Robust_VQA.py:475-478`).
    """
    n = scores.size
    k = jnp.maximum(jnp.asarray(n * sparsity, jnp.int32), 1)
    return kth_smallest(scores, k)
