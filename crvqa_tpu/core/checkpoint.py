"""Native checkpoint / resume.

The reference's failure-recovery story is whole-model pickles + optional
optimizer/scheduler reload (`mask_trainer_Robust_VQA.py:526-536`, SURVEY.md
§5.3-5.4). Here every stage state is a pytree, so checkpointing is a msgpack
dump of (state, metadata) via flax.serialization — deterministic, torch-free,
and resumable mid-epoch (the step counter lives in the state).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
from flax import serialization

PyTree = Any


def _gather_leaf(x):
    """Host copy of a leaf; process-sharded leaves (e.g. ZeRO-sharded
    optimizer state spanning hosts) are assembled collectively — the ONE
    gather implementation lives in `parallel.mesh.host_all_gather`."""
    if isinstance(x, jax.Array):
        from ..parallel.mesh import host_all_gather

        return host_all_gather(x)
    return jax.device_get(x)


def save_checkpoint(path: str, state: PyTree, metadata: Optional[dict] = None
                    ) -> None:
    """Atomic msgpack dump of a state pytree.

    Multi-process contract (the torch `save_on_master` analogue,
    `mPLUG/utils.py:196-214`): EVERY process must call this together — leaves
    that span processes are gathered collectively — and only process 0
    touches the filesystem.
    """
    host_state = jax.tree_util.tree_map(_gather_leaf, state)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    payload = serialization.to_bytes(host_state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)  # atomic: a preempted write never corrupts the ckpt
    if metadata is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path: str, target: PyTree) -> PyTree:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def load_metadata(path: str) -> Optional[dict]:
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """`_sorted_checkpoints` analogue (mask_trainer_Robust_VQA.py:1022-1038)."""
    if not os.path.isdir(directory):
        return None
    cands = []
    for name in os.listdir(directory):
        if name.startswith(prefix) and not name.endswith(".json") \
                and not name.endswith(".tmp"):
            suffix = name[len(prefix):]
            if suffix.isdigit():
                cands.append((int(suffix), os.path.join(directory, name)))
    return max(cands)[1] if cands else None


def rotate_checkpoints(directory: str, keep: int, prefix: str = "ckpt_") -> None:
    """`_rotate_checkpoints` retention (mask_trainer_Robust_VQA.py:1040-1052).

    `keep <= 0` means NO rotation (unlimited retention) — the reference
    returns early when save_total_limit is None or <= 0. Process-0-gated
    (only process 0 wrote the files)."""
    if keep <= 0 or not os.path.isdir(directory) or jax.process_index() != 0:
        return
    cands = sorted(
        (int(n[len(prefix):]), os.path.join(directory, n))
        for n in os.listdir(directory)
        if n.startswith(prefix) and n[len(prefix):].isdigit()
    )
    for _, path in cands[:-keep]:
        os.remove(path)
        if os.path.exists(path + ".meta.json"):
            os.remove(path + ".meta.json")
