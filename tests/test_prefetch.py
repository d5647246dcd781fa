"""Background batch prefetcher (data/prefetch.py): order preservation,
exception propagation, early-exit shutdown, the device_put float policy,
and the driver wiring (cli/common.wrap_prefetch)."""
import threading
import time

import numpy as np
import pytest

from crvqa_tpu.data.prefetch import prefetch_batches


def _batches(n, fail_at=None):
    for i in range(n):
        if fail_at is not None and i == fail_at:
            raise RuntimeError(f"boom at {i}")
        yield {"i": np.full((2,), i, np.int32),
               "x": np.full((2, 3), float(i), np.float32)}


def test_order_and_values_preserved():
    got = list(prefetch_batches(_batches(17), depth=3, to_device=False))
    assert len(got) == 17
    for i, b in enumerate(got):
        assert b["i"][0] == i
        np.testing.assert_array_equal(np.asarray(b["x"]),
                                      np.full((2, 3), float(i), np.float32))


def test_exception_propagates():
    it = prefetch_batches(_batches(10, fail_at=4), depth=2, to_device=False)
    got = [next(it) for _ in range(4)]
    assert [int(b["i"][0]) for b in got] == [0, 1, 2, 3]
    with pytest.raises(RuntimeError, match="boom at 4"):
        next(it)


def test_early_exit_stops_producer():
    n_threads = threading.active_count()
    slow_consumed = []

    def src():
        for i in range(1000):
            slow_consumed.append(i)
            yield {"i": np.array([i])}

    for b in prefetch_batches(src(), depth=2, to_device=False):
        if int(b["i"][0]) == 3:
            break
    deadline = time.time() + 5.0
    while threading.active_count() > n_threads and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= n_threads
    # the producer ran at most a few batches ahead, not the whole source
    assert len(slow_consumed) < 20


def test_depth_zero_is_passthrough():
    src = _batches(3)
    got = list(prefetch_batches(src, depth=0, to_device=False))
    assert len(got) == 3


def test_device_put_floats_only():
    import jax

    (b,) = list(prefetch_batches(_batches(1), depth=1, to_device=True))
    assert isinstance(b["x"], jax.Array)
    assert isinstance(b["i"], np.ndarray)  # ints stay host-side (qid/valid)
    assert b["i"].dtype == np.int32


def test_prefetch_cli_run_identical_to_serial(tmp_path):
    """End-to-end driver invariant: prefetching changes machinery, never
    results — two stage-1 synthetic runs, --prefetch_batches 2 (default)
    vs 0, byte-identical predictions."""
    import json

    from crvqa_tpu.cli import run_vqa_stage1

    outs = {}
    for depth in (2, 0):
        out = tmp_path / f"d{depth}"
        run_vqa_stage1.main([
            "--output_dir", str(out), "--tiny", "--synthetic", "32",
            "--train_batch_size", "8", "--eval_batch_size", "8",
            "--num_train_epochs", "1", "--prefetch_batches", str(depth),
            "--do_train", "--do_predict", "--seed", "0",
        ])
        outs[depth] = json.load(open(out / "test.json"))
    assert outs[2] == outs[0]


def test_wrap_prefetch_driver_wiring():
    import argparse

    from crvqa_tpu.cli.common import wrap_prefetch

    args = argparse.Namespace(prefetch_batches=2)

    def batches_fn(epoch):
        return _batches(4 + epoch)

    wrapped = wrap_prefetch(batches_fn, args)
    assert len(list(wrapped(0))) == 4
    assert len(list(wrapped(1))) == 5  # re-callable per epoch
    args0 = argparse.Namespace(prefetch_batches=0)
    assert wrap_prefetch(batches_fn, args0) is batches_fn
