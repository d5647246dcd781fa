"""Physical head / FFN compaction for structurally-pruned checkpoints.

TPU-native re-design of the reference's stage-3 structured path
(`run_vqa_stage3.py:307-324`: `prune_with_mask` loads a [L, H] head-mask
`.npy` / [L, I] FFN-mask `.npy` and calls HF `model.prune_heads` /
`model.prune_ffns`, which physically slice the pruned heads out of the
q/k/v projections — kernel columns AND bias entries — plus the matching
input rows of the attention output dense; `modeling_bert.py:677-693`,
`modeling_utils.py:2113` `prune_linear_layer`).

Instead of masking whole head columns at run time (dense FLOPs spent on
zeros — see the measured table in `ops/structured_matmul.py`), this module
rewrites the checkpoint ONCE on host:

- heads:  q/k/v kernels [D, H*hs] -> [D, n_keep*hs] (kept blocks gathered),
  q/k/v biases sliced the same way, attention-output kernel rows
  [H*hs, D] -> [n_keep*hs, D].
- ffn:    intermediate kernel columns + bias [D, I] -> [D, n_keep],
  FFN-output kernel rows [I, D] -> [n_keep, D].

The unchanged flax model then runs with a smaller static head count /
intermediate size (`LxmertConfig.lang_num_heads` /
`lang_intermediate_size`) — the structured-sparsity FLOP and HBM savings
are realized by *shape*, not by skipping inside a kernel.

Per-layer kept counts differ (the reference's `Binarizer_head` masks the
globally lowest-scoring heads across all layers,
`prune_debias_VQA.py:633-650`), but XLA needs one static shape: layers are
padded to a single uniform kept count with all-zero q/k/v slices.  A zero
v-projection yields exactly zero context for the padded head (softmax
probs times a zero value vector), and a zero FFN column yields gelu(0)*0
rows, so padding is numerically exact, and the pad target can be rounded
up for MXU lane alignment.

Compaction runs on host numpy at load time (masks are concrete), so there
is nothing to trace — the result is an ordinary params pytree.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from flax import traverse_util


def _kept_indices(mask_row: np.ndarray, n_keep: int) -> np.ndarray:
    """Indices of kept units, in order; -1 marks zero-padding slots."""
    idx = np.nonzero(np.asarray(mask_row) != 0)[0]
    out = np.full((n_keep,), -1, dtype=np.int64)
    out[: idx.size] = idx
    return out


def _pad_count(counts, multiple: int) -> int:
    n = max(int(max(counts)), 1)
    return int(-(-n // multiple) * multiple)


def _gather_pad(arr: np.ndarray, idx: np.ndarray, axis: int) -> np.ndarray:
    """Take `idx` slices along `axis`; -1 slots become zeros."""
    taken = np.take(arr, np.maximum(idx, 0), axis=axis)
    shape = [1] * taken.ndim
    shape[axis] = idx.size
    valid = (idx >= 0).reshape(shape)
    return (taken * valid).astype(arr.dtype)


def compact_lang_heads(params, head_mask: np.ndarray, head_size: int,
                       pad_to_multiple: int = 2,
                       layer_prefix: str = "layer_"):
    """Slice kept heads out of the language-branch self-attentions.

    `head_mask` is [L, H] (1 = keep), the `run_vqa_stage3.py:307-318`
    `.npy` contract.  Returns (new_params, n_keep) where `n_keep` is the
    uniform padded kept-head count to use as `LxmertConfig.lang_num_heads`.
    `pad_to_multiple=2` keeps n_keep*64 a multiple of 128 (MXU tile width)
    at the canonical head_size.
    """
    head_mask = np.asarray(head_mask)
    n_layers, num_heads = head_mask.shape
    n_keep = _pad_count(head_mask.sum(axis=1), pad_to_multiple)
    n_keep = min(n_keep, num_heads)

    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for layer in range(n_layers):
        idx = _kept_indices(head_mask[layer], n_keep)
        hs_idx = (np.maximum(idx, 0)[:, None] * head_size
                  + np.arange(head_size)[None, :]).reshape(-1)
        hs_idx = np.where(np.repeat(idx, head_size) >= 0, hs_idx, -1)
        for path, leaf in flat.items():
            if f"{layer_prefix}{layer}" not in path or "attention" not in path:
                continue
            name = "/".join(path)
            w = np.asarray(leaf)
            if any(p in name for p in ("self/query", "self/key", "self/value")):
                axis = w.ndim - 1  # kernel [D, H*hs] cols; bias [H*hs]
                out[path] = _gather_pad(w, hs_idx, axis)
            elif "attention/output/dense/kernel" in name:
                out[path] = _gather_pad(w, hs_idx, 0)  # input rows
    return traverse_util.unflatten_dict(out), n_keep


def compact_lang_ffns(params, ffn_mask: np.ndarray,
                      pad_to_multiple: int = 128,
                      layer_prefix: str = "layer_"):
    """Slice kept FFN neurons out of the language-branch MLPs.

    `ffn_mask` is [L, intermediate_size] (1 = keep), the
    `prune_with_mask(..., 'ffn')` contract (`run_vqa_stage3.py:307-324`,
    `Binarizer_ffn` threshold STE at `prune_debias_VQA.py:654-667`).
    Returns (new_params, kept_intermediate_size).
    """
    ffn_mask = np.asarray(ffn_mask)
    n_layers, inter = ffn_mask.shape
    n_keep = min(_pad_count(ffn_mask.sum(axis=1), pad_to_multiple), inter)

    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for layer in range(n_layers):
        idx = _kept_indices(ffn_mask[layer], n_keep)
        for path, leaf in flat.items():
            if f"{layer_prefix}{layer}" not in path:
                continue
            name = "/".join(path)
            w = np.asarray(leaf)
            if "intermediate/dense" in name:
                out[path] = _gather_pad(w, idx, w.ndim - 1)
            elif name.endswith(f"{layer_prefix}{layer}/output/dense/kernel"):
                # the FFN output (layer_i/output), NOT attention/output —
                # excluded above by the endswith anchor
                out[path] = _gather_pad(w, idx, 0)
    return traverse_util.unflatten_dict(out), n_keep


def head_mask_from_scores(head_scores: np.ndarray, num_to_mask: int) -> np.ndarray:
    """[L, H] scores -> [L, H] 0/1 mask zeroing the globally lowest
    `num_to_mask` heads (`binarizer_fn_head`, prune_debias_VQA.py:642-650)."""
    scores = np.asarray(head_scores)
    flat = scores.reshape(-1)
    order = np.argsort(flat, kind="stable")
    mask = np.ones_like(flat)
    mask[order[:num_to_mask]] = 0.0
    return mask.reshape(scores.shape)


def expand_head_mask_dense(head_mask_row: np.ndarray, head_size: int,
                           in_dim: int) -> np.ndarray:
    """[H] -> [in_dim, H*hs] dense kernel mask (test / audit helper)."""
    cols = np.repeat(np.asarray(head_mask_row), head_size)
    return np.broadcast_to(cols[None, :], (in_dim, cols.size))


def apply_dense_head_mask(params, head_mask: np.ndarray, head_size: int,
                          layer_prefix: str = "layer_"):
    """Reference-semantics dense analogue of `compact_lang_heads`: zero the
    pruned heads' q/k/v kernel columns AND bias entries in place (what HF
    `prune_linear_layer` removes).  Used by the equivalence tests and by
    `see_weight_rate`-style audits of structured checkpoints."""
    head_mask = np.asarray(head_mask)
    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for layer in range(head_mask.shape[0]):
        cols = np.repeat(head_mask[layer], head_size)
        for path, leaf in flat.items():
            name = "/".join(path)
            if (f"{layer_prefix}{layer}/" not in name
                    or not any(p in name for p in
                               ("self/query", "self/key", "self/value"))):
                continue
            w = np.asarray(leaf)
            out[path] = (w * cols.astype(w.dtype)
                         if w.ndim == 1 else w * cols[None, :].astype(w.dtype))
    return traverse_util.unflatten_dict(out)


def apply_dense_ffn_mask(params, ffn_mask: np.ndarray,
                         layer_prefix: str = "layer_"):
    """Dense analogue of `compact_lang_ffns`: zero pruned neurons' columns
    in intermediate/dense kernel+bias (gelu(0)*0-row == removed neuron)."""
    ffn_mask = np.asarray(ffn_mask)
    flat = traverse_util.flatten_dict(params)
    out = dict(flat)
    for layer in range(ffn_mask.shape[0]):
        m = ffn_mask[layer]
        for path, leaf in flat.items():
            name = "/".join(path)
            if f"{layer_prefix}{layer}/" not in name or "intermediate/dense" not in name:
                continue
            w = np.asarray(leaf)
            out[path] = (w * m.astype(w.dtype)
                         if w.ndim == 1 else w * m[None, :].astype(w.dtype))
    return traverse_util.unflatten_dict(out)
