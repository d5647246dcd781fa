"""Measure the fused attention kernel end-to-end in the stage-2 step.

Baseline is the XLA einsum path (bench_window.py w32 config, ~3000 ex/s);
the fused kernel (ops/fused_attention.py) targets the ~19% of device time
the profile attributed to attention transpose copies.

Usage: python benchmarks/bench_fused_attention.py   (real chip)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")


def run(fused: bool, window: int = 32, windows: int = 4,
        bwd_impl: str = "stored", thin_seg: bool = False,
        q_pair: bool = False, head_group: int = 0) -> float:
    from crvqa_tpu.models import layers
    from crvqa_tpu.ops import fused_attention as fa

    layers.FUSED_ATTENTION = fused
    fa.BWD_IMPL = bwd_impl
    fa.THIN_SEG = thin_seg
    fa.Q_PAIR = q_pair
    fa.HEAD_GROUP = head_group
    from bench_window import build

    compiled, state, stacked, bs = build(window)
    state, losses, _ = compiled(state, stacked)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(windows):
        state, losses, _ = compiled(state, stacked)
        _ = float(losses[-1])
    dt = time.perf_counter() - t0
    return bs * window * windows / dt


def main() -> None:
    results = {}
    if "--seg" in sys.argv:
        # segmented-sum spelling sweep (fused kernel, stored backward)
        for thin in (False, True):
            key = "thin_seg" if thin else "square_seg"
            results[key] = round(run(True, thin_seg=thin), 1)
            print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    elif "--pair" in sys.argv:
        # batch-pair formulation A/B (VERDICT r3 #4's q-stack): two batch
        # rows per dot, half the sequential dots, double the arithmetic
        for pair in (False, True):
            key = "pair" if pair else "single"
            results[key] = round(run(True, q_pair=pair), 1)
            print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    elif "--hgroup" in sys.argv:
        # head-group (128-lane) packing A/B (VERDICT r4 weak #2): shipped
        # rev-3 stored, rev-3 recompute (the grouped path's bwd style), and
        # G=2 grouped — decomposes formulation effect from residual effect
        for key, kw in (("rev3_stored", {}),
                        ("rev3_recompute", {"bwd_impl": "recompute"}),
                        ("hgroup2", {"head_group": 2}),
                        ("hgroup4", {"head_group": 4})):
            results[key] = round(run(True, **kw), 1)
            print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    elif "--bwd" in sys.argv:
        # backward-implementation sweep (all through the fused kernel)
        for impl in ("recompute", "stored", "stored_folddot"):
            results[impl] = round(run(True, bwd_impl=impl), 1)
            print(f"# {impl}: {results[impl]} ex/s", file=sys.stderr)
    else:
        for fused in (False, True):
            key = "fused" if fused else "xla"
            results[key] = round(run(fused), 1)
            print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
