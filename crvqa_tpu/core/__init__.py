from .checkpoint import (
    save_checkpoint,
    load_checkpoint,
    load_metadata,
    latest_checkpoint,
    rotate_checkpoints,
)
from . import torch_compat

__all__ = [
    "save_checkpoint", "load_checkpoint", "load_metadata",
    "latest_checkpoint", "rotate_checkpoints", "torch_compat",
]
