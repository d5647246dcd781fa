"""ZeRO-style optimizer-state sharding over the data axis.

TPU-native analogue of DeepSpeed ZeRO-2 (`mPLUG/configs/ds_config.json:5-8`):
instead of partitioning gradients across ranks with NCCL, we annotate the
Adam moment pytrees with a `data`-axis sharding constraint; XLA keeps them
resident sharded and inserts the reduce-scatter / all-gather pattern over ICI
during the update. Params stay replicated (the models here are <= 350M).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PyTree = Any

_MIN_SHARD_ELEMS = 2 ** 14  # don't bother sharding small leaves


def zero_spec(leaf, data_size: int) -> P:
    """Pick a PartitionSpec sharding the first data_size-divisible dim."""
    shape = getattr(leaf, "shape", ())
    if np.prod(shape, dtype=np.int64) < _MIN_SHARD_ELEMS:
        return P()
    for i, d in enumerate(shape):
        if d % data_size == 0 and d >= data_size:
            spec = [None] * len(shape)
            spec[i] = "data"
            return P(*spec)
    return P()


def shard_opt_state(opt_state: PyTree, mesh: Mesh) -> PyTree:
    """Device-put optimizer state with ZeRO sharding (call once at init)."""
    data_size = mesh.shape["data"]

    def put(leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, zero_spec(leaf, data_size)))

    return jax.tree_util.tree_map(put, opt_state)


def constrain_opt_state(opt_state: PyTree, mesh: Mesh) -> PyTree:
    """Apply the same sharding as a constraint inside a jitted step so the
    updated state stays sharded."""
    data_size = mesh.shape["data"]

    def constrain(leaf):
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, zero_spec(leaf, data_size)))

    return jax.tree_util.tree_map(constrain, opt_state)
