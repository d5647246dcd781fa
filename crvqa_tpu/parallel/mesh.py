"""Device mesh and sharding utilities.

The reference scales via torch DataParallel / DDP / DeepSpeed ZeRO-2
(`mask_trainer_Robust_VQA.py:547-557`, `mPLUG/configs/ds_config.json`). The
TPU-native equivalent is a `jax.sharding.Mesh` with a `data` axis (pure DP —
the models here are <=350M params so params are replicated by default) plus an
optional `model` axis for tensor-parallel headroom. XLA inserts the psum /
all-gather collectives over ICI.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh layout. data * model must equal the device count used."""

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = self.model
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def make_mesh(
    config: MeshConfig = MeshConfig(), devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def is_main_process() -> bool:
    """True on the process that owns artifact writes (exports, checkpoints,
    logs) — the analogue of the reference's rank gating
    (`prune_debias_VQA.py:714-719`, `mPLUG/utils.py:217-229`)."""
    return jax.process_index() == 0


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Build the global on-device batch, sharded over `data` on the leading
    dim (scalars replicated).

    Multi-process contract (the analogue of the reference's per-rank
    `DistributedSampler`, `mask_trainer_Robust_VQA.py:303-307`): under
    `jax.process_count() > 1` every process passes its process-LOCAL slice of
    the batch — same leaf structure, same local shapes on every process — and
    the returned arrays are global with leading dim `local_batch *
    process_count`, assembled via `jax.make_array_from_process_local_data`
    (no cross-host data movement; each host's shard stays on its devices).
    Scalars must be identical on every process. Single-process, this is a
    plain device_put, and the "local" batch IS the global batch.
    """
    sharding = batch_sharding(mesh)
    replicated = replicated_sharding(mesh)
    multiprocess = jax.process_count() > 1

    def _put(x):
        if multiprocess:
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                replicated if x.ndim == 0 else sharding, x)
        x = jnp.asarray(x)
        return jax.device_put(x, replicated if x.ndim == 0 else sharding)

    return jax.tree_util.tree_map(_put, batch)


def host_all_gather(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly sharded) global array fully to host on EVERY process.

    TPU-native analogue of the reference's `distributed_concat` eval gather
    (`mask_trainer_Robust_VQA.py:1247-1257`). Single-process (or any fully
    addressable array) this is just a host transfer; across processes the
    non-addressable shards are exchanged with
    `multihost_utils.process_allgather`, so every process sees the same
    assembled array (all processes must call this together — it is a
    collective in the multi-process case).
    """
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def host_all_gather_local(x) -> np.ndarray:
    """Concatenate process-LOCAL host arrays across processes along the
    leading axis, in process-index order — the same row order `shard_batch`
    gives the global device batch (mesh devices are laid out process-major),
    so host-side fields (qids, labels, valid) stay row-aligned with gathered
    device outputs. Single-process: identity. Collective: all processes must
    call together."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def process_local_slice(batch: Any) -> Any:
    """Slice a GLOBAL host batch to this process's contiguous row block — the
    loader-side half of the multi-process contract. Batch sizes in this
    framework always mean the GLOBAL batch: every process materialises (or
    can deterministically re-derive) the same global batch, feeds rows
    ``[p*B/P, (p+1)*B/P)`` through `shard_batch`, and
    `jax.make_array_from_process_local_data` reassembles the global array
    with block p on process p's devices (mesh device order is
    process-major). The analogue of the reference's per-rank
    `DistributedSampler` (`mask_trainer_Robust_VQA.py:303-307`) — contiguous
    blocks rather than strided rows, so gathered outputs stay in global row
    order. Scalars and non-array leaves pass through. Single-process:
    identity. Leading dims must divide by process_count (the collators pad
    to fixed batch sizes, so this holds whenever B % P == 0)."""
    pc = jax.process_count()
    if pc == 1:
        return batch
    pi = jax.process_index()

    def _slice(x):
        arr = np.asarray(x)
        if arr.ndim == 0:
            return x
        if arr.shape[0] % pc:
            raise ValueError(
                f"global batch dim {arr.shape[0]} not divisible by "
                f"process_count {pc}")
        local = arr.shape[0] // pc
        return arr[pi * local:(pi + 1) * local]

    return jax.tree_util.tree_map(_slice, batch)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) process-group initialization.

    TPU-native analogue of `utils.init_distributed_mode` / NCCL env wiring
    (`mPLUG/utils.py:238`, SURVEY.md §5.8): on TPU pods
    `jax.distributed.initialize` discovers peers from the environment; args
    are only needed off-TPU. After this, `make_mesh` over `jax.devices()`
    spans all hosts and XLA routes collectives over ICI/DCN automatically.
    No-op when already initialized or single-process.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError):
        if coordinator_address is not None:
            raise  # an EXPLICIT multihost request must not silently degrade
        pass  # already initialized or single-process auto-detect context
