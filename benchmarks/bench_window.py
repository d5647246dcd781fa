"""Dispatch-overhead experiment: scan-window size x loss-fetch policy.

The headline bench (bench.py) drives `window` steps per dispatch and fetches
the window's last loss synchronously (the axon tunnel ignores
block_until_ready, so a value fetch is the only fence). That fence
serializes [dispatch -> compute -> host round-trip] per window; the host
round-trip through the tunnel is pure overhead that a real training loop
(which logs metrics asynchronously every logging_steps) does not pay.

Two levers, measured here on the bf16-backbone stage-2 config:
- window:  steps per dispatch (8 = bench.py default, vs 32).
- lag-1 fetch: dispatch window i+1 BEFORE fetching window i's loss, so the
  round-trip overlaps the next window's compute. Still a true fence over the
  whole timed region (the final fetch waits for the last window).

Usage: python benchmarks/bench_window.py   (real chip, ~compile-bound)
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


def build(window: int):
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    batch_size = 256
    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    batch_np = synthetic_batch(
        batch_size=batch_size, vocab_size=config.vocab_size,
        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
        pos_dim=config.visual_pos_dim)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k != "valid"}
    params = model.init(
        jax.random.PRNGKey(0), input_ids=batch["input_ids"][:2],
        visual_feats=batch["visual_feats"][:2],
        visual_pos=batch["visual_pos"][:2])["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    masker = Masker.create(
        specs, ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
        controlled_init="magnitude")
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10_000,
                              hidden_size=config.hidden_size,
                              backbone_dtype="bfloat16",
                              # match the bench.py headline config (r3)
                              moment_dtype=os.environ.get(
                                  "BENCH_MOMENT_DTYPE", "bfloat16"))
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    multi = stage2.make_multi_step(model, masker, tx, cfg, window)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)
    compiled = multi.lower(state, stacked).compile()
    return compiled, state, stacked, batch_size


def run(window: int, lag1: bool, total_steps: int = 64) -> float:
    compiled, state, stacked, bs = build(window)
    windows = max(total_steps // window, 2)
    state, losses, _ = compiled(state, stacked)  # warmup
    _ = float(losses[-1])

    t0 = time.perf_counter()
    if lag1:
        pending = None
        for _ in range(windows):
            state, losses, _ = compiled(state, stacked)
            if pending is not None:
                _ = float(pending[-1])
            pending = losses
        _ = float(pending[-1])
    else:
        for _ in range(windows):
            state, losses, _ = compiled(state, stacked)
            _ = float(losses[-1])
    dt = time.perf_counter() - t0
    return bs * window * windows / dt


def main() -> None:
    results = {}
    for window in (8, 32):
        for lag1 in (False, True):
            key = f"w{window}_{'lag1' if lag1 else 'sync'}"
            results[key] = round(run(window, lag1), 1)
            print(f"# {key}: {results[key]} ex/s", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
