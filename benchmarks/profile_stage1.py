"""Capture + summarize a device-op profile of the STAGE-1 dense train step
at the canonical recipe shape (bs 64, `bash_files/Stage1/run_vqa_stage1.sh`).

VERDICT r4 weak #1: stage-1/3 at bs 64 measures ~31% MFU vs 44-47% for the
big-batch surfaces, with only prose ("operand-shape-bound") attached. This
is the `profile_stage2.py` analogue for the dense step: HLO-metadata-joined
buckets plus a speed-of-light block with TWO floors —

  - matmul floor: attention dots repriced at the FFN matmuls' measured
    FLOP/s (same method as stage-2's pin);
  - optimizer floor: the dense Adam update is ~zero FLOPs but moves
    7 fp32 words per parameter per step (m/v/param/grad reads + m/v/param
    writes) REGARDLESS of batch size — at bs 64 that fixed HBM cost is the
    structural difference vs stage-2-at-256. The floor prices the
    adam_update bucket at the chip's HBM bandwidth.

Usage: PROFILE_STAGE=stage1 PROFILE_BS=64 python benchmarks/profile_stage1.py
       (real chip; one cached compile)
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

from profile_stage2 import (  # noqa: E402
    LOGDIR,
    _stage2_bucket_flops,
    build_hlo_map,
    categorize as _categorize_s2,
    summarize_trace,
)


def categorize(name: str, op: str) -> str:
    """Stage-1's dense Adam lowers as `multiply_add_fusion.*` ops under the
    optimizer's `closed_call/add` jaxpr path (the stage-2 rule keys on the
    masked-update's `divide_add` names and misses them — first chip capture
    put 216 ms of Adam in model_other). Under moment_dtype=bfloat16 the
    torch_adam variant anchors on its m/v astype casts instead:
    `fusion.*` at a bare `closed_call/convert_element_type` path (second
    chip capture put its 103 ms in model_other the same way)."""
    if name.startswith("multiply_add_fusion") and "closed_call/add" in op:
        return "adam_update"
    if (name.startswith("fusion")
            and op.endswith("closed_call/convert_element_type")):
        return "adam_update"
    return _categorize_s2(name, op)

# v5e HBM bandwidth (same source as utils/mfu.py peak_flops pinning)
HBM_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0}


def build(window: int, batch: int, stage: str, accum: int):
    """bench_stage1's construction (single source of truth for the dense
    recipe) compiled as a scan window."""
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import (Masker, ModalSparsity, lxmert_mask_specs,
                                   magnitude_masks)
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA, layers
    from crvqa_tpu.train import stage1

    layers.FUSED_ATTENTION = os.environ.get("PROFILE_FUSED", "1") == "1"
    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    b = synthetic_batch(batch_size=batch, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    batch_j = {k: jnp.asarray(v) for k, v in b.items() if k != "valid"}
    params = model.init(
        jax.random.PRNGKey(0), input_ids=batch_j["input_ids"][:2],
        visual_feats=batch_j["visual_feats"][:2],
        visual_pos=batch_j["visual_pos"][:2])["params"]
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
                              grad_accum_steps=accum,
                              moment_dtype=os.environ.get(
                                  "PROFILE_MDTYPE", "float32"))
    state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(1),
                                  masks=masks)
    multi = stage1.make_multi_step(model, cfg, tx, window, masker=masker)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch_j)
    compiled = multi.lower(state, stacked).compile()
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return compiled, state, stacked, n_params


def speed_of_light_stage1(summary: dict, window: int, batch: int,
                          n_params: int,
                          moment_dtype: str = "float32") -> dict:
    """Two-floor pin: attention repriced at FFN efficiency + Adam repriced
    at HBM bandwidth. Everything else is model matmuls (the stage-2 profile
    conclusion carries: same model, denser update).

    The Adam byte model follows the moment dtype (fp32: read m,v,p,g +
    write m,v,p = 28 B/param; bf16 moments: m/v words are 2 B = 20). The
    model is an ESTIMATE, not a true bound — XLA fuses the grad read into
    the update, so the measured bucket can run under it; sol therefore
    never prices a bucket above its own measurement (min(model, measured))."""
    cats = summary["by_category_ms"]
    att_ms = sum(v for k, v in cats.items() if k.startswith("pallas_attn"))
    ffn_ms = sum(v for k, v in cats.items() if k.startswith("ffn"))
    adam_ms = cats.get("adam_update", 0.0)
    total_ms = summary["total_ms"]
    if ffn_ms <= 0:
        return {"error": "missing ffn bucket", "by": cats}
    att_fl, ffn_fl = _stage2_bucket_flops(batch)
    att_fl *= window
    ffn_fl *= window
    eff_ffn = ffn_fl / (ffn_ms / 1e3)
    sol_att_ms = att_fl / eff_ffn * 1e3
    kind = jax.devices()[0].device_kind
    bw = next((v for k, v in HBM_GBPS.items() if k in kind), 819.0)
    word = 2 if moment_dtype == "bfloat16" else 4
    # read m, v (moment dtype) + param, grad (fp32); write m, v, param
    adam_bytes = (4 * word + 3 * 4) * n_params * window
    sol_adam_ms = adam_bytes / (bw * 1e9) * 1e3
    eff_adam_ms = min(sol_adam_ms, adam_ms) if adam_ms > 0 else sol_adam_ms
    sol_total = total_ms - att_ms + sol_att_ms - adam_ms + eff_adam_ms
    return {
        "attention_ms": round(att_ms, 2),
        "ffn_ms": round(ffn_ms, 2),
        "ffn_measured_tflops": round(eff_ffn / 1e12, 2),
        "adam_ms": round(adam_ms, 2),
        "adam_pct_of_step": round(100 * adam_ms / max(total_ms, 1e-9), 1),
        "moment_dtype": moment_dtype,
        "sol_adam_ms": round(sol_adam_ms, 2),
        "eff_adam_ms": round(eff_adam_ms, 2),
        "adam_bw_utilization": round(
            (adam_bytes / (adam_ms / 1e3)) / (bw * 1e9), 3)
        if adam_ms > 0 else None,
        "sol_attention_ms": round(sol_att_ms, 3),
        "sol_total_ms": round(sol_total, 1),
        "sol_step_speedup": round(total_ms / sol_total, 4),
        "n_params": n_params,
    }


def main() -> None:
    window = int(os.environ.get("PROFILE_WINDOW", "32"))
    batch = int(os.environ.get("PROFILE_BS", "64"))
    stage = os.environ.get("PROFILE_STAGE", "stage1")
    accum = int(os.environ.get("PROFILE_ACCUM", "1"))
    compiled, state, stacked, n_params = build(window, batch, stage, accum)
    hlo_map = build_hlo_map(compiled)
    state, losses, _ = compiled(state, stacked)  # warmup / compile
    _ = float(losses[-1])

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    state, losses, _ = compiled(state, stacked)
    _ = float(losses[-1])
    jax.profiler.stop_trace()

    summary = summarize_trace(LOGDIR, hlo_map, categorize)
    summary["config"] = {"stage": stage, "batch": batch, "window": window,
                         "accum": accum}
    if "by_category_ms" in summary:
        summary["speed_of_light"] = speed_of_light_stage1(
            summary, window, batch, n_params,
            moment_dtype=os.environ.get("PROFILE_MDTYPE", "float32"))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
