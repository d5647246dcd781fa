"""Windowed metric smoothing + logging.

Re-design of `mPLUG/utils.py:SmoothedValue/MetricLogger` (:11-165). The
reference synchronizes medians across ranks with torch.distributed
all_reduce; under jax.sharding metrics are computed on globally-sharded
arrays so every host already sees the global value — `synchronize` is a
no-op kept for API parity.
"""
from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Iterable, Iterator


class SmoothedValue:
    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1) -> None:
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        # torch.median returns the LOWER median on even-length windows
        # (mPLUG/utils.py:43-45) — index (n-1)//2, not n//2
        d = sorted(self.deque)
        return d[(len(d) - 1) // 2] if d else 0.0

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / len(self.deque) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(median=self.median, avg=self.avg,
                               global_avg=self.global_avg, value=self.value)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs) -> None:
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def synchronize_between_processes(self) -> None:
        pass  # global under jax.sharding; see module docstring

    def __str__(self) -> str:
        return self.delimiter.join(f"{k}: {v}" for k, v in self.meters.items())

    def log_every(self, iterable: Iterable, print_freq: int,
                  header: str = "") -> Iterator:
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        for i, obj in enumerate(iterable):
            t0 = time.time()
            yield obj
            iter_time.update(time.time() - t0)
            if i % print_freq == 0:
                print(f"{header} [{i}] {self} time: {iter_time}", flush=True)
        total = time.time() - start
        print(f"{header} Total time: {total:.1f}s", flush=True)
