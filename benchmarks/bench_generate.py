"""mPLUG beam-search evaluation throughput on the real chip.

The eval side of the mPLUG pipeline (`vqa_mplug.py:247-287` in the
reference): encode image+question, then beam-5 generate the answer through
the 12-layer decoder with the cross-K/V of the static encoder memory
projected once per batch (models/mplug/generator.py). Masked eval (mask
mode, uniform 0.5) — the configuration whose wall time dominates the
reference's periodic evaluations.

Usage: python benchmarks/bench_generate.py   (real chip)
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

from bench_mplug import _batch, build_masked_mplug  # noqa: E402


def _gen_flops(model, masker, cfg, state, jb, compiled_gen,
               max_len: int) -> float:
    """True FLOPs per generate call, loop-corrected.

    XLA's cost analysis counts a `lax.fori_loop` body ONCE regardless of trip
    count (bench.py docstring, verified on-chip), and beam_generate's decode
    loop runs max_len-1 times. Split the call as prefix (encode + masker
    apply + cross-K/V projection, once per call) + decode body:
      F_total_ca = F_prefix + F_body          (body counted once)
      F_true     = F_prefix + (max_len-1) * F_body
    F_prefix comes from a jitted prefix-only function built from the same
    model.apply calls make_generate_step issues.
    """
    from crvqa_tpu.models.mplug.generator import precompute_cross_kv
    from crvqa_tpu.utils.mfu import compiled_flops, lowered_flops

    @jax.jit
    def prefix(state, batch):
        params = state.params
        if cfg.mode == "mask" and state.scores is not None:
            params = masker.apply_masks(params, state.scores,
                                        state.thresholds)
        states, state_mask = model.apply(
            {"params": params}, batch["images"], batch["question_ids"],
            batch["question_mask"], method=model.encode)
        bc = model.config.bert
        kv = precompute_cross_kv(params["text_decoder"], states,
                                 bc.text_decode_layers,
                                 bc.num_attention_heads, bc.head_size,
                                 dtype=bc.dtype)
        return states, state_mask, kv

    f_total_ca = compiled_flops(compiled_gen)
    f_prefix = lowered_flops(prefix, state, jb)
    if not f_total_ca or not f_prefix:
        return 0.0
    f_body = max(f_total_ca - f_prefix, 0.0)
    return f_prefix + (max_len - 1) * f_body


def run(batch_size: int = 32, beam_size: int = 5, max_len: int = 12,
        iters: int = 8, midseq: bool = False, use_cache: bool = False,
        cache_reorder: str = "onehot", bf16_lm_head: bool = False,
        fence_each: bool = False) -> dict:
    from crvqa_tpu.train import mplug_train
    from crvqa_tpu.utils.mfu import mfu

    # midseq: fuse the 577-patch ViT/fusion attention too — beam eval is
    # encode-dominated, so this is where the midseq kernel should pay most
    config, model, masker, cfg, state, _ = build_masked_mplug(
        midseq=midseq, bf16_lm_head=bf16_lm_head)
    jb = _batch(config, batch_size)
    gen = mplug_train.make_generate_step(model, cfg, masker=masker,
                                         beam_size=beam_size, max_len=max_len,
                                         use_cache=use_cache,
                                         cache_reorder=cache_reorder)
    # AOT-compile once and invoke the executable directly: lowered_flops on
    # the jitted fn would compile a SECOND time on the first call (the AOT
    # compile does not populate the jit cache), doubling tunnel startup
    compiled = gen.lower(state, jb).compile()
    flops_call = _gen_flops(model, masker, cfg, state, jb, compiled, max_len)
    ids, scores = compiled(state, jb)  # warmup
    _ = np.asarray(ids)
    t0 = time.perf_counter()
    # fence_each: fetch every iteration's ids — the iterations here are
    # INDEPENDENT (state is not chained like the train benches), so the
    # end-fence number is honest ONLY if the axon queue executes enqueued
    # programs FIFO before serving the last fetch. The per-iter fence is
    # the skeptical control (r5: the product CLI measured ~20x slower on
    # the same workload; one of the two numbers is lying)
    for _ in range(iters):
        ids, scores = compiled(state, jb)
        if fence_each:
            _ = np.asarray(ids)
    _ = np.asarray(ids)  # fence
    dt = time.perf_counter() - t0
    u = mfu(flops_call, iters, dt, jax.devices()[0].device_kind)
    return {"ex_s": round(batch_size * iters / dt, 2),
            "mfu": round(u, 4) if u is not None else None,
            "gflops_per_example": (round(flops_call / batch_size / 1e9, 2)
                                   if flops_call else None),
            "gflops_per_generated_token": (
                round(flops_call / batch_size / (max_len - 1) / 1e9, 2)
                if flops_call else None)}


def run_rank(batch_size: int = 32, n_answers: int = 3129, ans_len: int = 8,
             k: int = 10, iters: int = 8, midseq: bool = False) -> dict:
    """Closed-vocabulary rank eval (`--eval_method rank`): first-token
    shortlist over the full answer list + chain-rule re-rank of the top k
    (rank_answers_topk; the reference's `rank_answer`,
    model_vqa_mplug.py:188-245). n_answers=3129 = the real VQA answer-list
    size; k=10 = the CLI default. No loops in the rank path, so the cost
    analysis is exact per call."""
    from crvqa_tpu.utils.mfu import compiled_flops, mfu

    config, model, masker, cfg, state, _ = build_masked_mplug(midseq=midseq)
    jb = _batch(config, batch_size)
    c = config.bert
    rng = np.random.RandomState(7)
    alist_ids = jnp.asarray(
        rng.randint(1, c.vocab_size, (n_answers, ans_len)), jnp.int32)
    alist_mask = jnp.ones((n_answers, ans_len), jnp.float32)

    @jax.jit
    def rank(state, batch):
        p = masker.apply_masks(state.params, state.scores, state.thresholds)
        return model.apply({"params": p}, batch["images"],
                           batch["question_ids"], batch["question_mask"],
                           alist_ids, alist_mask, k=k,
                           method=model.rank_answers_topk)

    compiled = rank.lower(state, jb).compile()  # one AOT compile (see run())
    flops_call = compiled_flops(compiled)
    ids, probs = compiled(state, jb)  # warmup
    _ = np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(iters):
        ids, probs = compiled(state, jb)
    _ = np.asarray(ids)  # fence
    dt = time.perf_counter() - t0
    u = mfu(flops_call, iters, dt, jax.devices()[0].device_kind)
    return {"ex_s": round(batch_size * iters / dt, 2),
            "mfu": round(u, 4) if u is not None else None,
            "gflops_per_example": (round(flops_call / batch_size / 1e9, 2)
                                   if flops_call else None)}


def main() -> None:
    midseq = "--midseq" in sys.argv
    use_cache = "--cache" in sys.argv
    if "--rank" in sys.argv:
        r = run_rank(midseq=midseq)
        print(f"# rank-k10 masked eval: {r}", file=sys.stderr)
        print(json.dumps({"mplug_rank_eval": r, "midseq": midseq}))
        return
    reorder = "gather" if "--reorder-gather" in sys.argv else "onehot"
    bf16_head = "--bf16-head" in sys.argv
    fence_each = "--fence-each" in sys.argv
    r = run(midseq=midseq, use_cache=use_cache, cache_reorder=reorder,
            bf16_lm_head=bf16_head, fence_each=fence_each)
    print(f"# beam-5 masked eval: {r}", file=sys.stderr)
    print(json.dumps({"mplug_beam5_eval": r, "midseq": midseq,
                      "self_kv_cache": use_cache, "cache_reorder": reorder,
                      "bf16_lm_head": bf16_head, "fence_each": fence_each}))


if __name__ == "__main__":
    main()
