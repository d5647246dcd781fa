"""Tracing / profiling hooks.

The reference's observability is `tpu_metrics_debug` torch_xla counters
(`mask_trainer_Robust_VQA.py:775-777`) and an unused HF memory tracer
(SURVEY.md §5.1). TPU-native replacement: `jax.profiler` xplane traces
viewable in TensorBoard/XProf, plus a lightweight step timer.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed steps (no-op when
    logdir is None)."""
    if logdir is None:
        yield
        return
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock per-step timing with warmup exclusion; JSON-line report."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self, batch_size: Optional[int] = None) -> dict:
        if not self._times:
            return {"steps": 0}
        mean = sum(self._times) / len(self._times)
        out = {
            "steps": len(self._times),
            "mean_step_ms": round(mean * 1000, 3),
            "min_step_ms": round(min(self._times) * 1000, 3),
        }
        if batch_size:
            out["examples_per_sec"] = round(batch_size / mean, 2)
        return out


class MetricsWriter:
    """JSONL metrics sink — the torch-free stand-in for the reference's
    TensorBoard SummaryWriter / wandb hooks
    (`mask_trainer_Robust_VQA.py:51-82, 273-276, 785-799`). One JSON object
    per line; any TB/wandb frontend can tail it.

    `tensorboard_dir` mirrors every float metric into a real TensorBoard
    event file (scalars only — the surface the reference uses), via the
    dependency-free emitter in utils/tb_events.py.

    Process-0-gated: on other processes every method is a no-op, so drivers
    call it unconditionally (the reference's rank-gated logging,
    `prune_debias_VQA.py:714-719`)."""

    def __init__(self, output_dir: str, name: str = "metrics.jsonl",
                 tensorboard_dir: Optional[str] = None,
                 wandb_project: Optional[str] = None):
        self._fh = None
        self._tb = None
        self._wandb = None
        if jax.process_index() != 0:
            return
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, name)
        self._fh = open(self.path, "a")
        if tensorboard_dir:
            from .tb_events import TBEventWriter

            self._tb = TBEventWriter(tensorboard_dir)
        if wandb_project:
            # optional, like the reference's is_wandb_available() gate
            # (mask_trainer_Robust_VQA.py:68-82): absent wandb degrades to
            # the JSONL/TB sinks with a one-line notice
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project,
                                         dir=output_dir, resume="allow")
            except Exception as e:  # ImportError or offline init failure
                print(f"# wandb disabled ({type(e).__name__}: {e})")

    def write(self, step: int, **metrics) -> None:
        if self._fh is None:
            return
        payload = {"step": int(step)}
        for k, v in metrics.items():
            try:
                payload[k] = float(v)
            except (TypeError, ValueError):
                payload[k] = v
        self._fh.write(json.dumps(payload) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in payload.items():
                if k != "step" and isinstance(v, float):
                    self._tb.add_scalar(k, v, payload["step"])
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.log({k: v for k, v in payload.items() if k != "step"},
                            step=payload["step"])

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._wandb is not None:
            self._wandb.finish()
            self._wandb = None
