"""Native mmap feature store: batch-assembly throughput (host side).

The reference loads the whole `vqa_img_feature_trainval.pickle` into RAM
per process (`dataset_LXM.py:176-179`) and assembles batches in Python via
`TrimCollator`. `native/feature_store.cpp` packs features into a binary
file, mmaps it, and gathers batch rows with threaded memcpy. This measures
batch assembly at the stage-2 shape (bs 256, 36 boxes x 2048 feats fp32 =
75 MB per batch) against a numpy fancy-index baseline over the same data —
host-side only, no chip.

Usage: python benchmarks/bench_feature_store.py
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_IMAGES = 2000
BATCH = 256
ITERS = 50


def main() -> None:
    from crvqa_tpu.native import FeatureStore, build_feature_store, ensure_built

    ensure_built()
    rng = np.random.RandomState(0)
    feats_all = rng.randn(N_IMAGES, 36, 2048).astype(np.float32)
    pos_all = rng.rand(N_IMAGES, 36, 4).astype(np.float32)
    features = {str(i): {"feats": feats_all[i], "sp_feats": pos_all[i]}
                for i in range(N_IMAGES)}
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "feats.bin")
        t0 = time.perf_counter()
        build_feature_store(path, features)
        build_s = time.perf_counter() - t0
        fs = FeatureStore(path)
        batches = [rng.randint(0, N_IMAGES, BATCH).astype(np.int64)
                   for _ in range(ITERS)]

        fs.gather_rows(batches[0])  # touch pages
        t0 = time.perf_counter()
        for rows in batches:
            f, p = fs.gather_rows(rows)
        native_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        for rows in batches:
            f = feats_all[rows]
            p = pos_all[rows]
        numpy_s = time.perf_counter() - t0

    bytes_per_batch = BATCH * 36 * (2048 + 4) * 4
    res = {
        "native_batches_per_s": round(ITERS / native_s, 1),
        "numpy_batches_per_s": round(ITERS / numpy_s, 1),
        "native_gb_per_s": round(bytes_per_batch * ITERS / native_s / 1e9, 2),
        "build_s": round(build_s, 2),
        "threads": fs.threads,
    }
    print(f"# {res}", file=sys.stderr)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
