"""Background batch prefetching — the input-pipeline overlap the reference
gets from `torch.utils.data.DataLoader(num_workers=...)`.

The reference drivers run worker-process loaders (`mPLUG/vqa_mplug.py:422`
`num_workers=[12,8,8]`, `prune_debias_VQA.py` DataLoader(workers)); our
batch iterators (`data/vqacp.py:iterate_batches`,
`data/mplug_data.py:iterate_batches`) otherwise run inline with the train
loop, serializing host work (image decode + RandAugment for mPLUG, feature
gather for LXMERT) with device steps. `prefetch_batches` moves that host
work onto a producer thread with a bounded ready queue, and optionally
starts the host->device transfer early (`jax.device_put` from the producer,
so the jitted step's dispatch does not block on the copy — through the axon
tunnel that copy is milliseconds, not microseconds).

One producer thread (not a pool): batch ORDER is part of the training
contract (shuffles are seeded; trajectories are replayed in tests), and the
numpy-heavy prep releases the GIL, so a single producer already overlaps
fully with the consumer's dispatch-and-fetch cycle.

device_put policy: float leaves only (images/masks/weights — the bulk of
the bytes). Integer/bool leaves stay host numpy: qid/valid are consumed
host-side by the eval loops and int64 qids must not ride through jax's
x64-disabled int32 conversion.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

import numpy as np

_END = object()


def _put_floats(batch: dict) -> dict:
    import jax

    out = {}
    for k, v in batch.items():
        # floats = the bulk of every batch; 'images' may instead be uint8
        # under the device-normalize path (same bulk role, 4x fewer bytes).
        # qid/valid/token ints stay host numpy (host-consumed; int64 qids
        # must not ride the x64-disabled int32 conversion).
        if isinstance(v, np.ndarray) and (
                v.dtype in (np.float32, np.float16)
                or v.dtype.name == "bfloat16"  # --transfer_dtype cast leaves
                or (k == "images" and v.dtype == np.uint8)):
            out[k] = jax.device_put(v)
        else:
            out[k] = v
    return out


def prefetch_batches(src: Iterable[dict], depth: int = 2,
                     to_device: bool = True) -> Iterator[dict]:
    """Yield batches from `src`, prepared `depth` ahead on a producer
    thread. Exceptions in `src` re-raise at the consumer's next pull; an
    early-exiting consumer (break / preemption) shuts the producer down in
    close()/GC without draining the source. depth<=0 returns `src`
    unchanged (the --prefetch_batches 0 escape hatch)."""
    if depth <= 0:
        yield from src
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put_until_stop(item) -> bool:
        """Blocking put that also watches the consumer's stop flag; False
        once the consumer has gone away."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for batch in src:
                item = (_put_floats(batch) if to_device else batch, None)
                if not put_until_stop(item):
                    return
            tail = (_END, None)
        except BaseException as e:  # re-raised at the consumer
            tail = (_END, e)
        put_until_stop(tail)

    t = threading.Thread(target=produce, daemon=True, name="batch-prefetch")
    t.start()
    try:
        while True:
            batch, err = q.get()
            if batch is _END:
                if err is not None:
                    raise err
                return
            yield batch
    finally:
        stop.set()
        t.join(timeout=5.0)
