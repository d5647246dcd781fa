"""LXMERT stage-1 dense fine-tune and stage-3 pruned fine-tune throughput.

The two canonical dense-train recipes the reference ships alongside stage-2
(`bash_files/Stage1/run_vqa_stage1.sh`, `Stage3/run_vqa_stage3.sh`: bs 64,
lr 5e-5, 20 epochs): full-size LXMERT, LMH loss (the paper's headline
lmh-lmh pipeline), every parameter trainable (stage 1) or the stage-2 binary
mask applied as a constant multiplier so pruned weights stay zero (stage 3,
the `prune.CustomFromMask` analogue). Multi-step scan windows amortize the
per-step host round trip exactly like bench.py's stage-2 headline.

Prints one JSON line with ex/s + MFU for both stages.

Usage: python benchmarks/bench_stage1.py   (real chip)
       python benchmarks/bench_stage1.py --bs 256   (throughput-optimal bs)
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

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")


def run(stage: str, batch_size: int = 64, window: int = 32,
        windows: int = 4, moment_dtype: str = "float32",
        accum: int = 1) -> dict:
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import (Masker, ModalSparsity, lxmert_mask_specs,
                                   magnitude_masks)
    from crvqa_tpu.models import layers
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage1
    from crvqa_tpu.utils.mfu import lowered_flops, mfu

    layers.FUSED_ATTENTION = True
    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=batch_size, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(
        jax.random.PRNGKey(0), input_ids=batch["input_ids"][:2],
        visual_feats=batch["visual_feats"][:2],
        visual_pos=batch["visual_pos"][:2])["params"]
    masker = None
    masks = None
    if stage == "stage3":
        masker = Masker.create(
            lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers),
            ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
            controlled_init="magnitude")
        masks = jax.jit(lambda p: magnitude_masks(
            p, list(masker.specs), masker.zerorate_dict))(params)
        params = masker.prune_params(params, masks)
    cfg = stage1.Stage1Config(ft_type="lmh", total_steps=100_000,
                              hidden_size=config.hidden_size,
                              moment_dtype=moment_dtype,
                              grad_accum_steps=accum)
    state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1),
                                  masks=masks)

    # FLOPs from the ACCUM-1 step: XLA cost analysis counts a lax.scan
    # body once, so the microbatch loop under-reports by 1/accum; the
    # accum-1 program is the same arithmetic total (same fwd/bwd work +
    # one update) counted correctly
    cfg_flops = (dataclasses.replace(cfg, grad_accum_steps=1)
                 if accum > 1 else cfg)
    single = stage1.make_train_step(model, cfg_flops, tx, masker=masker)
    flops_step = lowered_flops(single, state, batch)

    multi = stage1.make_multi_step(model, cfg, tx, window, masker=masker)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)
    compiled = multi.lower(state, stacked).compile()
    state, losses, _ = compiled(state, stacked)  # warmup
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(windows):
        state, losses, _ = compiled(state, stacked)
        _ = float(losses[-1])  # fence (tunnel ignores block_until_ready)
    dt = time.perf_counter() - t0
    u = mfu(flops_step * window, windows, dt, jax.devices()[0].device_kind)
    return {"ex_s": round(batch_size * window * windows / dt, 2),
            "mfu": round(u, 4) if u is not None else None,
            "gflops_per_example": (round(flops_step / batch_size / 1e9, 2)
                                   if flops_step else None),
            "batch_size": batch_size}


def main() -> None:
    bs = 64
    if "--bs" in sys.argv:
        bs = int(sys.argv[sys.argv.index("--bs") + 1])
    md = "float32"
    if "--mdtype" in sys.argv:
        md = sys.argv[sys.argv.index("--mdtype") + 1]
    accum = 1
    if "--accum" in sys.argv:
        accum = int(sys.argv[sys.argv.index("--accum") + 1])
    out = {"moment_dtype": md, "accum": accum}
    for stage in ("stage1", "stage3"):
        out[stage] = run(stage, batch_size=bs, moment_dtype=md, accum=accum)
        print(f"# {stage}: {out[stage]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
