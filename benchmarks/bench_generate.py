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

from bench_mplug import _batch  # noqa: E402  (same synthetic contract)


def run(batch_size: int = 32, beam_size: int = 5, max_len: int = 12,
        iters: int = 8, midseq: bool = False) -> float:
    from crvqa_tpu.masking import Masker, ModalSparsity
    from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
    from crvqa_tpu.models import layers
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig
    from crvqa_tpu.models.mplug.bert import MPlugBertConfig
    from crvqa_tpu.models.mplug.vit import ViTConfig
    from crvqa_tpu.train import mplug_train

    layers.FUSED_ATTENTION = True
    # midseq: fuse the 577-patch ViT/fusion attention too — beam eval is
    # encode-dominated, so this is where the midseq kernel should pay most
    layers.MIDSEQ_ATTENTION = midseq
    config = MPlugConfig(bert=MPlugBertConfig(dtype=jnp.bfloat16),
                         vit=ViTConfig(dtype=jnp.bfloat16))
    model = MPlug(config)
    jb = _batch(config, batch_size)
    params = model.init(
        jax.random.PRNGKey(0), jb["images"][:1], jb["question_ids"][:1],
        jb["question_mask"][:1], jb["answer_ids"][:1], jb["answer_mask"][:1],
        jb["weights"][:1])["params"]
    c = config.bert
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers, text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers, decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer)
    masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                           controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode="mask", total_steps=100)
    state, _ = mplug_train.init_state(model, params, cfg,
                                      jax.random.PRNGKey(1), masker=masker)
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


def main() -> None:
    midseq = "--midseq" in sys.argv
    ex_s = run(midseq=midseq)
    print(f"# beam-5 masked eval: {ex_s:.1f} ex/s", file=sys.stderr)
    print(json.dumps({"mplug_beam5_eval_ex_s": round(ex_s, 1),
                      "midseq": midseq}))


if __name__ == "__main__":
    main()
