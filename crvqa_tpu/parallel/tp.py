"""Tensor-parallel param sharding over the `model` mesh axis.

The reference has no TP (largest model ~350M params, SURVEY.md §2.8); this
module provides the optional headroom the TPU build reserves: Megatron-style
column/row partitioning expressed purely as `jax.sharding` placements — the
attention q/k/v and FFN-up kernels split their OUTPUT dim (heads /
intermediate) over `model`, the attention-output and FFN-down kernels split
their INPUT dim, and XLA's SPMD partitioner inserts the all-reduces over ICI.
Mask scores shard exactly like the kernels they gate (the binarize+multiply
stays local); per-module thresholds replicate.

No model code changes: placements on the param/score leaves are the whole
mechanism, which is the point of the jax.sharding design.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

# column-parallel: output dim sharded (kernel (in, out) -> P(None, 'model'))
_COL_MODULES = ("query", "key", "value", "intermediate", "lang_inter",
                "visn_inter", "mlp_c_fc")
# row-parallel: input dim sharded (kernel (in, out) -> P('model', None))
_ROW_PARENTS = ("output", "lang_output", "visn_output", "mlp_c_proj")


def param_partition_spec(path: tuple[str, ...], leaf) -> P:
    """Partition rule for a transformer param leaf by its flax path."""
    shape = getattr(leaf, "shape", ())
    if len(shape) != 2:
        # biases of column-parallel layers shard with the output dim
        if len(shape) == 1 and any(m in path for m in _COL_MODULES) \
                and path[-1] == "bias":
            return P("model")
        return P()
    if path[-1] not in ("kernel",):
        return P()  # embeddings / weight-norm v stay replicated
    if any(m in path for m in _COL_MODULES):
        return P(None, "model")
    # 'output'-parented dense = the row-parallel projection back to hidden
    if len(path) >= 3 and path[-2] == "dense" and path[-3] in _ROW_PARENTS:
        return P("model", None)
    if any(m == path[-2] for m in _ROW_PARENTS):
        return P("model", None)
    return P()


def _divisible(spec: P, shape, mesh: Mesh) -> P:
    """Drop shardings that don't divide the dim (tiny test configs)."""
    out = []
    for i, axis in enumerate(spec):
        if axis is None:
            out.append(None)
            continue
        size = mesh.shape[axis]
        out.append(axis if i < len(shape) and shape[i] % size == 0 else None)
    return P(*out)


def shard_params_tp(params: PyTree, mesh: Mesh) -> PyTree:
    """Place a param tree with TP shardings over `mesh` ('model' axis)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        spec = _divisible(param_partition_spec(path, leaf),
                          getattr(leaf, "shape", ()), mesh)
        out[path] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)


def shard_scores_tp(scores: dict, specs: Sequence, mesh: Mesh) -> dict:
    """Shard mask scores like their kernels (spec.path identifies the leaf)."""
    by_key = {s.key: s for s in specs}
    out = {}
    for key, leaf in scores.items():
        spec = _divisible(param_partition_spec(by_key[key].path, leaf),
                          leaf.shape, mesh)
        out[key] = jax.device_put(leaf, NamedSharding(mesh, spec))
    return out
