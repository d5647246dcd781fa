"""Measure joint bidirectional cross-attention end-to-end in the stage-2 step.

layers.JOINT_CROSS_ATTENTION batches the two shared-weight directions of
LxmertXLayer's `visual_attention` (modeling_lxmert.py:947-958) into one
q/k/v + output projection over the [lang; visn] concat — same math/params,
half the dispatches at double the rows. This measures it against the
two-call baseline, both with the fused attention kernel on (the bench.py
headline config).

Usage: python benchmarks/bench_joint_cross.py   (real chip)
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


def run(joint: bool, window: int = 32, windows: int = 4) -> float:
    from crvqa_tpu.models import layers

    layers.FUSED_ATTENTION = True
    layers.JOINT_CROSS_ATTENTION = joint
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
    for joint in (False, True):
        key = "joint" if joint else "two_call"
        results[key] = round(run(joint), 1)
        print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
