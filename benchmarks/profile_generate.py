"""Device-op profile of the mPLUG beam-5 generate call (post-KV-cache).

Same HLO-metadata-joined method as profile_stage2/profile_mplug, pointed at
the `bench_generate.run` configuration (masked full-size mPLUG, beam 5,
max_len 12, cross-K/V + self-attention KV caches, grouped memory). The KV
cache took beam eval 269.4 -> 352.9 ex/s at MFU 0.27 — this profiler
attributes the remaining time: encode (ViT/text/fusion towers) vs the
decode loop's per-step buckets (LM head, cached self-attention, grouped
cross-attention, cache reindex gathers, beam bookkeeping) so the next
lever — or the "eval is encode-bound, done" verdict — is a measured number.

Usage: python benchmarks/profile_generate.py [bs] [--no-cache] [--rank]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from profile_stage2 import build_hlo_map, summarize_trace

LOGDIR = "/tmp/crvqa_profile_generate"


def categorize(name: str, op: str) -> str:
    if name.startswith(("copy-start", "copy-done")):
        return "dma_copy"
    # top-k/sort BEFORE the custom-call rule: top_k lowers to a custom-call
    # too, and was mislabeling 15.5 ms of beam top-k as pallas_attn in the
    # 2026-08-20 06:34 trace
    if re.search(r"(top_k|sort)", op):
        return "beam_bookkeeping"
    if "custom-call" in name:
        return "pallas_attn"
    # encode towers (outside the decode while-loop)
    for t, tag in (("visual_encoder", "enc_vit"), ("text_encoder", "enc_text"),
                   ("fusion_encoder", "enc_fusion")):
        if t in op:
            return tag
    if "text_decoder" in op:
        if re.search(r"(attend|cls|predictions|decoder_lm)", op) or \
                "vocab" in op:
            return "dec_lm_head"
        if "crossattention" in op or "cross_kv" in op:
            return "dec_cross_attn"
        if re.search(r"(attention|query|key|value)", op):
            return "dec_self_attn"
        if re.search(r"(intermediate|/output/dense)", op):
            return "dec_ffn"
        return "dec_other"
    if re.search(r"(beam|top_k|sort|gather|dynamic-update|dynamic_update)",
                 op + name):
        return "beam_bookkeeping"
    if op:
        return "model_other"
    return "unattributed"


def main() -> None:
    import bench_generate
    import bench_mplug
    from crvqa_tpu.train import mplug_train

    bs = next((int(a) for a in sys.argv[1:] if a.isdigit()), 32)
    use_cache = "--no-cache" not in sys.argv

    config, model, masker, cfg, state, _ = bench_mplug.build_masked_mplug(
        midseq=True)
    jb = bench_mplug._batch(config, bs)
    gen = mplug_train.make_generate_step(model, cfg, masker=masker,
                                         beam_size=5, max_len=12,
                                         use_cache=use_cache)
    compiled = gen.lower(state, jb).compile()
    hlo_map = build_hlo_map(compiled)
    ids, _ = compiled(state, jb)  # warmup
    _ = np.asarray(ids)

    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    for _ in range(4):
        ids, _ = compiled(state, jb)
    _ = np.asarray(ids)
    jax.profiler.stop_trace()

    out = summarize_trace(LOGDIR, hlo_map, categorize)
    out.update(batch_size=bs, use_cache=use_cache, calls_traced=4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
