"""Stage-3 structured compaction: dense vs physically-compacted forward.

The reference's structured stage-3 path prunes heads/FFN neurons but keeps
dense shapes (`prune.CustomFromMask` zeroes weights; every matmul still
runs full-size — run_vqa_stage3.py:307-324). `masking/compaction.py`
realizes the saving by SHAPE instead: kept heads/neurons are sliced out of
the checkpoint and the unchanged flax model runs with
`lang_num_heads`/`lang_intermediate_size` overrides.

This measures the end-to-end eval forward (full-size LXMERT, batch 256) at
the paper-style structured operating point — language branch keeping 4/12
heads and 1/3 of the FFN — against the dense masked baseline, plus a
stage-3 TRAIN step (BCE fine-tune) at the same point. The compression ->
actual-speed link the reference never cashes in.

Usage: python benchmarks/bench_compaction.py   (real chip)
"""
from __future__ import annotations

import dataclasses
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
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

BATCH = 256
KEEP_HEADS = 4       # of 12 language heads
KEEP_FFN = 1024      # of 3072 language FFN neurons


def _setup():
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA

    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=BATCH, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    inputs = dict(input_ids=jnp.asarray(b["input_ids"]),
                  visual_feats=jnp.asarray(b["visual_feats"]),
                  visual_pos=jnp.asarray(b["visual_pos"]),
                  attention_mask=jnp.asarray(b["attention_mask"]))
    params = model.init(
        jax.random.PRNGKey(0),
        **{k: v for k, v in inputs.items() if k != "attention_mask"})["params"]
    return config, model, params, inputs, b


def _time_forward(model, params, inputs, iters=30):
    """Returns (ex/s, MFU, GFLOP/example or None) for the eval forward."""
    from crvqa_tpu.utils.mfu import compiled_flops, mfu

    # compaction returns numpy trees — device_put once, or every dispatch
    # re-uploads ~850 MB of fp32 params through the tunnel
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fwd = jax.jit(lambda p, i: model.apply({"params": p}, **i,
                                           deterministic=True)[0])
    # compile ONCE via AOT and invoke the executable directly — calling the
    # jitted wrapper after .lower().compile() recompiles (AOT doesn't
    # populate the jit cache), costing minutes through the axon tunnel
    compiled = fwd.lower(params, inputs).compile()
    try:
        flops_call = compiled_flops(compiled)
    except Exception:
        flops_call = 0.0
    out = compiled(params, inputs)
    _ = float(out[0, 0])  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(params, inputs)
    _ = float(out[0, 0])
    dt = time.perf_counter() - t0
    u = mfu(flops_call, iters, dt, jax.devices()[0].device_kind)
    gflops = flops_call / BATCH / 1e9 if flops_call else None
    return BATCH * iters / dt, u, gflops


def main() -> None:
    from crvqa_tpu.masking.compaction import (
        apply_dense_ffn_mask,
        apply_dense_head_mask,
        compact_lang_ffns,
        compact_lang_heads,
    )
    from crvqa_tpu.models import LxmertForVQA

    config, model, params, inputs, _ = _setup()
    l = config.l_layers
    rng = np.random.default_rng(0)
    head_mask = np.zeros((l, config.num_attention_heads), np.float32)
    ffn_mask = np.zeros((l, config.intermediate_size), np.float32)
    for i in range(l):
        head_mask[i, rng.choice(config.num_attention_heads, KEEP_HEADS,
                                replace=False)] = 1
        ffn_mask[i, rng.choice(config.intermediate_size, KEEP_FFN,
                               replace=False)] = 1

    dense_params = apply_dense_ffn_mask(
        apply_dense_head_mask(params, head_mask, config.head_size), ffn_mask)
    dense, dense_mfu, dense_gflops = _time_forward(model, dense_params, inputs)
    print(f"# dense masked: {dense:.1f} ex/s, mfu {dense_mfu}", file=sys.stderr)

    cparams, n_heads = compact_lang_heads(params, head_mask, config.head_size,
                                          pad_to_multiple=1)
    cparams, n_ffn = compact_lang_ffns(cparams, ffn_mask, pad_to_multiple=128)
    cconfig = dataclasses.replace(config, lang_num_heads=n_heads,
                                  lang_intermediate_size=n_ffn)
    compact, compact_mfu, compact_gflops = _time_forward(
        LxmertForVQA(cconfig), cparams, inputs)
    print(f"# compacted ({n_heads}/12 heads, {n_ffn}/3072 ffn): "
          f"{compact:.1f} ex/s, mfu {compact_mfu}", file=sys.stderr)
    print(json.dumps({"dense_masked_ex_s": round(dense, 1),
                      "compacted_ex_s": round(compact, 1),
                      "speedup": round(compact / dense, 3),
                      "dense_mfu": round(dense_mfu, 4) if dense_mfu else None,
                      "compacted_mfu": (round(compact_mfu, 4)
                                        if compact_mfu else None),
                      "dense_gflops_per_example": (
                          round(dense_gflops, 2)
                          if dense_gflops is not None else None),
                      "compacted_gflops_per_example": (
                          round(compact_gflops, 2)
                          if compact_gflops is not None else None),
                      "kept_heads": n_heads, "kept_ffn": n_ffn}))


if __name__ == "__main__":
    main()
