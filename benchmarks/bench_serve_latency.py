"""Serving-path latency on the real chip: the numbers behind serve_vqa.

Measures the LXMERT stage-2-subnetwork eval forward (the program
`serve_vqa.run_batch` dispatches — pruned dense weights, full-size model,
bf16) at serving batch sizes 1 / 8 / 32 / 256: per-batch device latency
p50 and the implied examples/sec. This is the latency story the training
benches don't cover — bench.py measures training throughput, this measures
what a request waits on the device.

Timing fences with a value fetch (CLAUDE.md: block_until_ready does not
reliably fence through the axon tunnel).

Usage: timeout 1800 python benchmarks/bench_serve_latency.py   (real chip)
Prints one JSON line per batch size.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def run(batch_size: int, iters: int = 30) -> dict:
    from crvqa_tpu.cli.common import lxmert_uniform_masker
    from crvqa_tpu.data.synthetic import synthetic_batch
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA

    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=batch_size, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, input_ids=jnp.asarray(b["input_ids"]),
                        visual_feats=jnp.asarray(b["visual_feats"]),
                        visual_pos=jnp.asarray(b["visual_pos"]))["params"]

    # a 0.7-zero-rate subnetwork exactly as serve_vqa loads one (the mask
    # multiplies into the weights ONCE at load; serving latency is the
    # dense forward of the pruned weights) — the SAME shared masker builder
    # serve_vqa uses, so the bench measures the served subnetwork contract
    masker = lxmert_uniform_masker(config, 0.7)
    scores, thresholds = jax.jit(masker.init)(params, rng)
    masks = jax.jit(masker.binary_masks)(scores, thresholds)
    params = jax.jit(masker.prune_params)(params, masks)

    @jax.jit
    def forward(params, input_ids, visual_feats, visual_pos):
        logits, _ = model.apply(
            {"params": params}, input_ids=input_ids,
            visual_feats=visual_feats, visual_pos=visual_pos,
            attention_mask=jnp.ones_like(input_ids, jnp.float32),
            deterministic=True)
        return logits

    ids = jnp.asarray(b["input_ids"])
    feats = jnp.asarray(b["visual_feats"])
    pos = jnp.asarray(b["visual_pos"])
    out = forward(params, ids, feats, pos)
    _ = float(out[0, 0])  # compile + fence

    lat = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = forward(params, ids, feats, pos)
        _ = float(out[0, 0])  # value-fetch fence
        lat.append(1000 * (time.perf_counter() - t0))
    lat = np.asarray(lat)
    return {
        "metric": "serve_vqa_forward_latency",
        "batch_size": batch_size,
        "p50_ms": round(float(np.percentile(lat, 50)), 3),
        "p95_ms": round(float(np.percentile(lat, 95)), 3),
        "examples_per_sec": round(
            batch_size / (float(np.percentile(lat, 50)) / 1000), 1),
        "device_kind": jax.devices()[0].device_kind,
    }


def main() -> None:
    for bs in (1, 8, 32, 256):
        r = run(bs)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
