"""Measured XLA-vs-kernel table for the STRUCTURED (head-pruned) masked
matmul — the case `ops/masked_matmul.py`'s verdict left open (its
unstructured measurement favored XLA; block sparsity changes the trade).

Shapes: LXMERT attention projections at bench batch size — M = 256 x 36
visual tokens (the large stream), K = N = 768, 12 heads x 64. Head mask at
the canonical 0.7 zero rate keeps 4 of 12 heads.

Contenders (forward path, mask fixed — the eval/stage-3 regime):
  dense   : x @ (w * expand(head_mask))             (XLA baseline)
  compact : gather kept heads -> [K, 256] matmul -> scatter   (XLA)
  pallas  : zero-copy block gather via PrefetchScalarGridSpec index_map
            (kept w^T blocks stream HBM->VMEM directly)

Run: python benchmarks/bench_structured.py  (real chip; ~1 min)
Prints one JSON line per contender + a copyable markdown table to stderr.
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

H, HS, K, N = 12, 64, 768, 768
M = 256 * 36  # batch 256 x 36 visual boxes
KEPT = 4      # 0.7 zero rate over heads (ceil semantics: 4/12 kept)
REPS = 400    # in-jit fori_loop reps per timed call (amortizes the ~25 ms
              # axon-tunnel dispatch+fence round trip to ~60 us/rep)
CALLS = 5
SMOKE = bool(int(os.environ.get("BENCH_SMOKE", "0")))  # CPU dry-run mode
if SMOKE:
    M, REPS, CALLS = 1024, 2, 1


def _timed(fn, *args) -> float:
    """Median seconds per rep; each call fences with a value fetch."""
    out = fn(*args)
    _ = float(jnp.sum(out))  # compile + warmup fence
    times = []
    for _ in range(CALLS):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out))
        times.append((time.perf_counter() - t0) / REPS)
    return float(np.median(times))


def _loop(body):
    """Amortize dispatch: run `body` REPS times inside one jit, carrying a
    dependency so XLA cannot elide iterations."""

    @jax.jit
    def run(x, *rest):
        def step(i, acc):
            y = body(x + (acc * 1e-12).astype(x.dtype), *rest)
            # full-tensor reduction: every output element feeds the carry,
            # so XLA cannot slice the matmul down to one row x column
            return jnp.sum(y).astype(jnp.float32)

        acc = jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))
        return acc

    return run


def main() -> None:
    from crvqa_tpu.ops.structured_matmul import (
        dense_masked_matmul,
        expand_keep_idx,
        head_compact_matmul,
        head_compact_matmul_pallas,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, K).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02, jnp.bfloat16)
    wt = jnp.asarray(np.ascontiguousarray(np.asarray(w).T))
    mask_np = np.zeros(H, bool)
    mask_np[rng.choice(H, KEPT, replace=False)] = True
    head_mask = jnp.asarray(mask_np)
    keep = expand_keep_idx(head_mask, KEPT)

    dense = _loop(lambda x: dense_masked_matmul(x, w, head_mask, HS))
    compact = _loop(lambda x: head_compact_matmul(x, w, keep, H, HS))
    pallas = _loop(functools.partial(
        head_compact_matmul_pallas, wt=wt, keep_idx=keep, num_heads=H,
        head_size=HS, bm=512, bk=256, interpret=SMOKE))
    # loop-harness overhead (x perturbation + carry), subtracted from all
    noop = _loop(lambda x: x[:8, :128])

    overhead = _timed(noop, x)
    flops_dense = 2.0 * M * K * N
    flops_kept = 2.0 * M * K * KEPT * HS
    rows = []
    for name, fn, fl in (("xla_dense", dense, flops_dense),
                         ("xla_compact", compact, flops_kept),
                         ("pallas_compact", pallas, flops_kept)):
        sec = max(_timed(fn, x) - overhead, 1e-9)
        rows.append({"impl": name, "us_per_matmul": round(sec * 1e6, 2),
                     "effective_tflops": round(fl / sec / 1e12, 2)})
        print(json.dumps(rows[-1]))
    print(json.dumps({"impl": "loop_overhead_us", "value":
                      round(overhead * 1e6, 2)}))
    base = rows[0]["us_per_matmul"]
    print("\n| impl | us/matmul (overhead-corrected) | speedup vs dense |",
          file=sys.stderr)
    print("|---|---|---|", file=sys.stderr)
    for r in rows:
        print(f"| {r['impl']} | {r['us_per_matmul']} | "
              f"{base / r['us_per_matmul']:.2f}x |", file=sys.stderr)


if __name__ == "__main__":
    main()
