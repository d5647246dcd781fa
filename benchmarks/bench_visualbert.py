"""VisualBERT stage-2 mask-train throughput on the real chip.

The VisualBERT twin of bench.py's headline: single-stream 12-layer BERT
over [text; visual] at uniform 0.7 sparsity with the LMH loss and `cls`
head (the `prune_debias_VQA_visualBERT.py` configuration, bs 256) — fused
attention on (the 50-token single stream qualifies: H*S = 600), bf16
activations, multi-step scan windows.

Usage: python benchmarks/bench_visualbert.py   (real chip)
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


def run(window: int = 32, windows: int = 4) -> dict:
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, visualbert_mask_specs
    from crvqa_tpu.models import layers
    from crvqa_tpu.models.visualbert import VisualBertConfig, VisualBertForVQA
    from crvqa_tpu.train import stage2
    from crvqa_tpu.utils.mfu import lowered_flops, mfu

    layers.FUSED_ATTENTION = True
    batch_size = 256
    config = VisualBertConfig(dtype=jnp.bfloat16)
    model = VisualBertForVQA(config)
    b = synthetic_batch(batch_size=batch_size, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_embedding_dim,
                        style="visualbert")
    batch = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(
        jax.random.PRNGKey(0), input_ids=batch["input_ids"][:2],
        visual_embeds=batch["visual_embeds"][:2])["params"]
    masker = Masker.create(visualbert_mask_specs(config.num_hidden_layers),
                           ModalSparsity.uniform(0.7),
                           controlled_init="magnitude")
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10_000,
                              hidden_size=config.hidden_size,
                              classifier_key="cls",
                              backbone_dtype="bfloat16")
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))
    # single-step FLOPs: cost analysis counts a scan body once (bench.py
    # docstring), so the window executable under-reports by 1/window
    single = stage2.make_train_step(model, masker, tx, cfg)
    flops_step = lowered_flops(single, state, batch)
    multi = stage2.make_multi_step(model, masker, tx, cfg, window)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)
    compiled = multi.lower(state, stacked).compile()
    state, losses, _ = compiled(state, stacked)
    _ = float(losses[-1])
    t0 = time.perf_counter()
    for _ in range(windows):
        state, losses, _ = compiled(state, stacked)
        _ = float(losses[-1])
    dt = time.perf_counter() - t0
    u = mfu(flops_step * window, windows, dt, jax.devices()[0].device_kind)
    return {"ex_s": round(batch_size * window * windows / dt, 2),
            "mfu": round(u, 4) if u is not None else None,
            "gflops_per_example": (round(flops_step / batch_size / 1e9, 2)
                                   if flops_step else None)}


def main() -> None:
    r = run()
    print(f"# visualbert stage-2: {r}", file=sys.stderr)
    print(json.dumps({"visualbert_stage2": r}))


if __name__ == "__main__":
    main()
