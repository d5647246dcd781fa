"""Measure the attention einsum-layout variants end-to-end on the chip.

The stage-2 profile (profile_stage2.py) showed ~19% of device time in
transpose copies around the attention dots. The three ATTN_LAYOUT spellings
in models/layers.py are mathematically identical but steer XLA's layout
assignment differently; this measures full train-step throughput for each.

Usage: python benchmarks/bench_attention_layout.py   (real chip; two fresh
compiles — the default is already cached)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")


def run(layout: str, window: int = 32, windows: int = 4) -> float:
    from crvqa_tpu.models import layers

    layers.ATTN_LAYOUT = layout
    from bench_window import build  # same builder as the window experiment

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
    for layout in ("bqhd", "bhqd", "bqhk"):
        results[layout] = round(run(layout), 1)
        print(f"# {layout}: {results[layout]} ex/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
