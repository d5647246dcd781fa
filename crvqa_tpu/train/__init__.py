from . import stage1, stage2, evaluation
from .common import (
    TrainMetrics,
    batch_score,
    linear_warmup_schedule,
    make_adam,
    make_adamw,
    model_inputs,
)

__all__ = [
    "stage1", "stage2", "evaluation",
    "TrainMetrics", "batch_score", "linear_warmup_schedule",
    "make_adam", "make_adamw", "model_inputs",
]
