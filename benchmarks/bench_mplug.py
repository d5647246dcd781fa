"""mPLUG mask-train step throughput on the real chip.

Full-size mPLUG (CLIP ViT-B-16 @ 384^2 -> 577 patches, BERT 6 enc / 6
fusion / 12 decoder layers) in mask-training mode — the configuration of
`mPLUG/scripts/vqa_full+mask_debias.sh` (reference trains it on 4 GPUs with
DeepSpeed ZeRO-2 bf16). Synthetic batch, LM loss with (1-bias) reweighting,
scores + LM head trainable, dual-LR AdamW — the shipped
`cli/vqa_mplug.py --training_type mask` step exactly.

Prints one JSON line {batch_size: ex_per_sec} over a small batch sweep.

Usage: python benchmarks/bench_mplug.py   (real chip; compiles are minutes)
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
jax.config.update("jax_default_prng_impl", "unsafe_rbg")


def _batch(config, b, a=5, ql=25, al=8, seed=0):
    rng = np.random.RandomState(seed)
    v = config.bert.vocab_size
    res = config.vit.image_res
    return {
        "images": jnp.asarray(rng.randn(b, res, res, 3).astype(np.float32)),
        "question_ids": jnp.asarray(
            rng.randint(1, v, (b, ql)).astype(np.int32)),
        "question_mask": jnp.ones((b, ql), jnp.float32),
        "answer_ids": jnp.asarray(
            rng.randint(1, v, (b, a, al)).astype(np.int32)),
        "answer_mask": jnp.ones((b, a, al), jnp.float32),
        "weights": jnp.asarray(
            np.full((b, a), 1.0 / a, np.float32)),
        "bias": jnp.asarray(rng.rand(b, a).astype(np.float32) * 0.5),
    }


def build_masked_mplug(dtype="bfloat16", remat: bool = False,
                       midseq: bool = False, total_steps: int = 10_000,
                       mode: str = "mask", bf16_lm_head: bool = False):
    """Full-size mPLUG benchmark construction — the ONE definition of the
    measured configuration (the cli/vqa_mplug.py setup: mask mode = uniform
    0.5 magnitude_soft masking; full mode = dense dual-LR finetune; fused
    text attention, optional midseq image attention), shared by bench_mplug
    / bench_generate / profile_mplug so they can never drift apart.

    Returns (config, model, masker, cfg, state, tx); masker is None in
    full mode."""
    from crvqa_tpu.masking import Masker, ModalSparsity
    from crvqa_tpu.masking.mplug_specs import mplug_mask_specs
    from crvqa_tpu.models import layers
    from crvqa_tpu.models.mplug import MPlug, MPlugConfig
    from crvqa_tpu.models.mplug.bert import MPlugBertConfig
    from crvqa_tpu.models.mplug.vit import ViTConfig
    from crvqa_tpu.train import mplug_train

    layers.FUSED_ATTENTION = True  # text towers fuse; 577-patch xattn -> XLA
    # midseq: the mid-sequence kernel takes the 577-patch contexts too
    # (ViT self-attention + fusion cross/joint attention,
    # ops/midseq_attention.py) instead of the XLA fallback
    layers.MIDSEQ_ATTENTION = midseq
    dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    # the cli/vqa_mplug.py full-size config (reference runs DeepSpeed bf16
    # with partition_activations; --remat is its analogue here)
    config = MPlugConfig(
        bert=MPlugBertConfig(
            dtype=dt, use_remat=remat,
            lm_head_dtype=jnp.bfloat16 if bf16_lm_head else None),
        vit=ViTConfig(dtype=dt, use_remat=remat))
    model = MPlug(config)
    probe = _batch(config, 1)
    params = model.init(
        jax.random.PRNGKey(0), probe["images"], probe["question_ids"],
        probe["question_mask"], probe["answer_ids"], probe["answer_mask"],
        probe["weights"])["params"]
    masker = None
    if mode == "mask":
        c = config.bert
        specs = mplug_mask_specs(
            vit_layers=config.vit.layers,
            text_encoder_layers=c.text_encoder_layers,
            fusion_layers=c.fusion_layers,
            decoder_layers=c.text_decode_layers,
            stride_layer=c.stride_layer)
        masker = Masker.create(specs, ModalSparsity.uniform(0.5),
                               controlled_init="magnitude_soft")
    cfg = mplug_train.MPlugTrainConfig(mode=mode, total_steps=total_steps)
    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(1), masker=masker)
    return config, model, masker, cfg, state, tx


def run(batch_size: int, steps: int = 8, dtype="bfloat16",
        remat: bool = False, midseq: bool = False,
        mode: str = "mask") -> dict:
    from crvqa_tpu.train import mplug_train
    from crvqa_tpu.utils.mfu import compiled_flops, mfu

    config, model, masker, cfg, state, tx = build_masked_mplug(
        dtype=dtype, remat=remat, midseq=midseq, mode=mode)
    jb = _batch(config, batch_size)
    step = mplug_train.make_train_step(model, cfg, tx, masker=masker)
    compiled = step.lower(state, jb).compile()
    flops_step = compiled_flops(compiled)
    state, loss = compiled(state, jb)  # warmup
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = compiled(state, jb)
    _ = float(loss)  # fence (axon tunnel ignores block_until_ready)
    dt = time.perf_counter() - t0
    u = mfu(flops_step, steps, dt, jax.devices()[0].device_kind)
    return {"ex_s": round(batch_size * steps / dt, 2),
            "mfu": round(u, 4) if u is not None else None,
            "gflops_per_example": (round(flops_step / batch_size / 1e9, 2)
                                   if flops_step else None)}


def main() -> None:
    dtype = "float32" if "--fp32" in sys.argv else "bfloat16"
    remat = "--remat" in sys.argv
    midseq = "--midseq" in sys.argv
    mode = "full" if "--full" in sys.argv else "mask"
    results = {"dtype": dtype, "remat": remat, "midseq": midseq,
               "mode": mode}
    # midseq kills the [B,H,S,S] HBM probability tensor, so the no-remat
    # sweep extends further before OOM (bs 32 fits where it didn't; probe 64)
    sizes = (32, 64) if remat else ((8, 16, 32, 64) if midseq else (8, 16, 32))
    for bs in sizes:
        try:
            results[str(bs)] = run(bs, dtype=dtype, remat=remat,
                                   midseq=midseq, mode=mode)
            print(f"# bs {bs}: {results[str(bs)]}", file=sys.stderr)
        except Exception as e:  # OOM at the top of the sweep is information
            results[str(bs)] = f"failed: {type(e).__name__}"
            print(f"# bs {bs}: {e}", file=sys.stderr)
            break
    print(json.dumps(results))


if __name__ == "__main__":
    main()
