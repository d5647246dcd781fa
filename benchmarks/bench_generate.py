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


def run(batch_size: int = 32, beam_size: int = 5, max_len: int = 12,
        iters: int = 8, midseq: bool = False) -> float:
    from crvqa_tpu.train import mplug_train

    # midseq: fuse the 577-patch ViT/fusion attention too — beam eval is
    # encode-dominated, so this is where the midseq kernel should pay most
    config, model, masker, cfg, state, _ = build_masked_mplug(midseq=midseq)
    jb = _batch(config, batch_size)
    gen = mplug_train.make_generate_step(model, cfg, masker=masker,
                                         beam_size=beam_size, max_len=max_len)
    ids, scores = gen(state, jb)  # compile + warmup
    _ = np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(iters):
        ids, scores = gen(state, jb)
    _ = np.asarray(ids)  # fence
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def run_rank(batch_size: int = 32, n_answers: int = 3129, ans_len: int = 8,
             k: int = 10, iters: int = 8, midseq: bool = False) -> float:
    """Closed-vocabulary rank eval (`--eval_method rank`): first-token
    shortlist over the full answer list + chain-rule re-rank of the top k
    (rank_answers_topk; the reference's `rank_answer`,
    model_vqa_mplug.py:188-245). n_answers=3129 = the real VQA answer-list
    size; k=10 = the CLI default."""
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

    ids, probs = rank(state, jb)  # compile + warmup
    _ = np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(iters):
        ids, probs = rank(state, jb)
    _ = np.asarray(ids)  # fence
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main() -> None:
    midseq = "--midseq" in sys.argv
    if "--rank" in sys.argv:
        ex_s = run_rank(midseq=midseq)
        print(f"# rank-k10 masked eval: {ex_s:.1f} ex/s", file=sys.stderr)
        print(json.dumps({"mplug_rank_eval_ex_s": round(ex_s, 1),
                          "midseq": midseq}))
        return
    ex_s = run(midseq=midseq)
    print(f"# beam-5 masked eval: {ex_s:.1f} ex/s", file=sys.stderr)
    print(json.dumps({"mplug_beam5_eval_ex_s": round(ex_s, 1),
                      "midseq": midseq}))


if __name__ == "__main__":
    main()
