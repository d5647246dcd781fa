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


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch with its leading dim sharded over `data`."""
    sharding = batch_sharding(mesh)

    def _put(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def host_all_gather(x: jax.Array) -> np.ndarray:
    """Fetch a (possibly sharded) array fully to host.

    TPU-native analogue of the reference's `distributed_concat` eval gather
    (`mask_trainer_Robust_VQA.py:1247-1257`): with jax.sharding the array is
    already globally addressable, so this is just a host transfer.
    """
    return np.asarray(jax.device_get(x))


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
        pass  # already initialized or single-process context
