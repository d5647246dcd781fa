"""Device-op profile of the mPLUG mask-train step (post-midseq bottleneck).

Same HLO-metadata-joined method as profile_stage2.py (which exposed the
real stage-2 split), pointed at the `bench_mplug.run` configuration: full
ViT-B/16 @ 384^2 + 6/6/12 BERT towers, mask mode, dual-LR AdamW. Buckets
split by tower (visual_encoder / text_encoder / fusion_encoder /
text_decoder) and by op family (attention kernels vs FFN vs projections)
so the next optimization target is attributable.

Usage: python benchmarks/profile_mplug.py [bs] [--no-midseq]
       (real chip; one cached compile)
"""
from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

from profile_stage2 import build_hlo_map, summarize_trace

LOGDIR = "/tmp/crvqa_profile_mplug"


def categorize(name: str, op: str) -> str:
    if name.startswith(("copy-start", "copy-done")):
        return "dma_copy"
    fb = "bwd" if "transpose(jvp" in op else "fwd"
    if "custom-call" in name:
        return f"pallas_attn_{fb}"
    tower = "other"
    for t in ("visual_encoder", "text_encoder", "fusion_encoder",
              "text_decoder"):
        if t in op:
            tower = {"visual_encoder": "vit", "text_encoder": "tenc",
                     "fusion_encoder": "fus", "text_decoder": "dec"}[t]
            break
    if tower == "other":
        if "adam" in op or ("closed_call/add" in op and "divide" in name):
            return "adam_update"
        if op:
            return "model_other"
        return "unattributed"
    if re.search(r"(mlp_c_fc|mlp_c_proj|intermediate|/output/dense)", op):
        return f"{tower}_ffn_{fb}"
    if re.search(r"(attn_in_proj|attn_out_proj|query|key|value|att)", op):
        return f"{tower}_attnproj_{fb}"
    if "conv" in op:
        return f"{tower}_conv_{fb}"
    return f"{tower}_other_{fb}"


def speed_of_light(summary: dict, config, total_flops_traced: float,
                   batch: int, steps: int) -> dict:
    """Pin the mPLUG step-time bound the same way profile_stage2 pins
    stage-2's: the post-grouping profile's floor claim is "the ViT FFN
    matmuls run near peak" — make that a number. Reference efficiency =
    the vit_ffn buckets' analytic TRUE FLOPs over their measured time;
    the bound is the whole step's cost-analysis FLOPs retiring at that
    rate. Implied MFU ceiling = eff_ref / peak (device-kind bf16 spec)."""
    from crvqa_tpu.utils.mfu import peak_flops

    cats = summary["by_category_ms"]
    vit_ffn_ms = sum(v for k, v in cats.items() if k.startswith("vit_ffn"))
    total_ms = summary["total_ms"]
    if vit_ffn_ms <= 0:
        return {"error": "no vit_ffn bucket in trace"}
    v = config.vit
    tokens = v.num_patches + 1  # +cls
    mlp = 4 * v.width  # CLIP MLP expansion (vit.py c_fc: width -> 4*width)
    ffn_fwd = v.layers * 2 * 2 * batch * tokens * v.width * mlp
    ffn_flops = 3 * ffn_fwd * steps  # bwd of a dot = two dots
    eff = ffn_flops / (vit_ffn_ms / 1e3)
    sol_total_ms = total_flops_traced / eff * 1e3
    import jax as _jax
    peak = peak_flops(_jax.devices()[0].device_kind)
    return {
        "vit_ffn_ms": round(vit_ffn_ms, 2),
        "vit_ffn_true_gflops_per_step": round(ffn_flops / steps / 1e9, 2),
        "vit_ffn_measured_tflops": round(eff / 1e12, 2),
        "sol_total_ms": round(sol_total_ms, 1),
        "sol_step_speedup": round(total_ms / sol_total_ms, 4),
        "implied_mfu_ceiling": round(eff / peak, 4),
    }


def main() -> None:
    import bench_mplug
    from crvqa_tpu.train import mplug_train

    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 16)
    midseq = "--no-midseq" not in sys.argv

    config, model, masker, cfg, state, tx = bench_mplug.build_masked_mplug(
        midseq=midseq)
    jb = bench_mplug._batch(config, bs)
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)

    compiled = step.lower(state, jb).compile()
    hlo_map = build_hlo_map(compiled)
    state, loss = compiled(state, jb)  # warmup
    _ = float(loss)

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    for _ in range(4):
        state, loss = compiled(state, jb)
    _ = float(loss)
    jax.profiler.stop_trace()

    out = summarize_trace(LOGDIR, hlo_map, categorize)
    out.update(batch_size=bs, midseq=midseq, steps_traced=4)
    if "by_category_ms" in out:
        from crvqa_tpu.utils.mfu import compiled_flops
        out["speed_of_light"] = speed_of_light(
            out, config, compiled_flops(compiled) * 4, bs, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
