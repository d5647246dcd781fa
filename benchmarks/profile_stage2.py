"""Capture + summarize a device-op profile of the stage-2 train step.

Runs one multi-step window under `jax.profiler` with a perfetto trace and
aggregates device-track event durations by op category, printing a ranked
table — the op-level breakdown that tells us where the non-MXU time goes
(the r1 trace showed "no single hotspot"; this quantifies the spread).

Usage: python benchmarks/profile_stage2.py  (real chip; one cached compile)
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

LOGDIR = "/tmp/crvqa_profile"


def build(window: int = 32):
    from crvqa_tpu.models import layers as _layers

    _layers.FUSED_ATTENTION = os.environ.get("PROFILE_FUSED", "1") == "1"
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    batch_np = synthetic_batch(
        batch_size=256, vocab_size=config.vocab_size, ans_num=config.ans_num,
        feat_dim=config.visual_feat_dim, pos_dim=config.visual_pos_dim)
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
                              backbone_dtype="bfloat16")
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    multi = stage2.make_multi_step(model, masker, tx, cfg, window)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)
    return multi.lower(state, stacked).compile(), state, stacked


CATEGORIES = [
    ("matmul", re.compile(r"dot|conv|matmul", re.I)),
    ("attention_softmax", re.compile(r"softmax|exp|reduce.*max", re.I)),
    ("rng_dropout", re.compile(r"rng|random|threefry|bit", re.I)),
    ("elementwise_fusion", re.compile(r"fusion|multiply|add|select|compare", re.I)),
    ("copy_transpose", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("allreduce", re.compile(r"all-reduce|reduce-scatter|all-gather", re.I)),
]


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def main() -> None:
    compiled, state, stacked = build()
    state, losses, _ = compiled(state, stacked)  # warmup / compile
    _ = float(losses[-1])

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    state, losses, _ = compiled(state, stacked)
    _ = float(losses[-1])
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(
        os.path.join(LOGDIR, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print(json.dumps({"error": "no perfetto trace emitted"}))
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    events = trace.get("traceEvents", [])
    # device tracks: pid names containing 'TPU'/'device'; fall back to all
    # complete ('X') events with args.device_id or tid-based heuristics
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items()
                   if re.search(r"tpu|device|/device:", n, re.I)}
    by_name = collections.Counter()
    by_cat = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        by_name[name] += dur
        by_cat[categorize(name)] += dur
        total += dur

    print(f"# device tracks: {sorted(pid_names[p] for p in device_pids)}",
          file=sys.stderr)
    print(f"# total device-event time: {total/1e3:.1f} ms", file=sys.stderr)
    for cat, dur in by_cat.most_common():
        print(f"# {cat:22s} {dur/1e3:9.2f} ms  {100*dur/max(total,1e-9):5.1f}%",
              file=sys.stderr)
    print("# --- top 25 ops ---", file=sys.stderr)
    for name, dur in by_name.most_common(25):
        print(f"# {dur/1e3:9.2f} ms  {name[:110]}", file=sys.stderr)
    print(json.dumps({
        "total_ms": round(total / 1e3, 1),
        "by_category_ms": {k: round(v / 1e3, 2) for k, v in by_cat.items()},
    }))


if __name__ == "__main__":
    main()
