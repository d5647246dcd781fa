"""Input-pipeline overlap: serial vs prefetched host batch prep.

Simulates the mPLUG real-data loop shape on CPU: a producer doing real
RandAugment work per batch (data/augment.py on synthetic images — the
actual host cost of `iterate_batches(augment=True)`) feeding a consumer
that models a fixed device-step latency. Serial = prep then step;
prefetched = data/prefetch.py producer thread. The ratio shows how much of
the host prep the prefetcher hides behind the step; on the real chip the
step is the jitted train dispatch and the same overlap applies.

Usage: python benchmarks/bench_prefetch.py  (CPU; ~1 min)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _augmented_batches(n_batches: int, batch: int, res: int, seed: int):
    from PIL import Image

    from crvqa_tpu.data.augment import train_transform

    rng = np.random.default_rng(seed)
    imgs = [Image.fromarray(
        rng.integers(0, 256, size=(res, res, 3)).astype(np.uint8))
        for _ in range(batch)]
    for i in range(n_batches):
        out = np.stack([train_transform(im, rng, res) for im in imgs])
        yield {"images": out, "i": np.array([i])}


def run(n_batches: int = 12, batch: int = 16, res: int = 224,
        step_ms: float = 60.0):
    from crvqa_tpu.data.prefetch import prefetch_batches

    def consume(it):
        t0 = time.perf_counter()
        for _ in it:
            time.sleep(step_ms / 1e3)  # stand-in for the device step
        return time.perf_counter() - t0

    # warmup numpy paths
    for _ in _augmented_batches(1, batch, res, 0):
        pass
    serial = consume(_augmented_batches(n_batches, batch, res, 1))
    overlapped = consume(prefetch_batches(
        _augmented_batches(n_batches, batch, res, 1), depth=2,
        to_device=False))
    return serial, overlapped


def main():
    serial, overlapped = run()
    r = {"serial_s": round(serial, 2), "prefetched_s": round(overlapped, 2),
         "speedup": round(serial / overlapped, 3)}
    print(f"# {r}", file=sys.stderr)
    print(json.dumps(r))


if __name__ == "__main__":
    main()
