"""Benchmark: stage-2 mask-training throughput on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric is the BASELINE.md north star — LXMERT stage-2 (masked forward +
LMH loss + backward to scores/classifier + AdamW update) examples/sec/chip at
the canonical batch size 256 (`bash_files/Stage2/run_mask_train_stage2.sh`).

Timing is synchronous: every timed step fetches the scalar loss to host, so
the measurement includes a device->host round trip per step (the axon tunnel
on this machine does not honor block_until_ready, so a value fetch is the
only reliable fence). The number is therefore a conservative end-to-end
figure, not just device time.

vs_baseline divides by 1000 examples/sec — an estimate of the PyTorch
reference's stage-2 throughput on its single-GPU setup (the repo publishes no
throughput numbers; 1000 ex/s ≈ 4 it/s at bs 256 for a ~210M-param
masked-forward model on a V100-class card). >1.0 means faster than the
reference estimate.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REFERENCE_EXAMPLES_PER_SEC = 1000.0


def main() -> None:
    from crvqa_tpu.data import synthetic_batch
    from crvqa_tpu.masking import Masker, ModalSparsity, lxmert_mask_specs
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA
    from crvqa_tpu.train import stage2

    batch_size = 256
    # full-size LXMERT; bf16 activations on TPU, fp32 params/softmax/logits
    config = LxmertConfig(dtype=jnp.bfloat16)
    model = LxmertForVQA(config)
    batch_np = synthetic_batch(
        batch_size=batch_size, vocab_size=config.vocab_size,
        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
        pos_dim=config.visual_pos_dim,
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items() if k != "valid"}

    params = model.init(
        jax.random.PRNGKey(0),
        input_ids=batch["input_ids"][:2],
        visual_feats=batch["visual_feats"][:2],
        visual_pos=batch["visual_pos"][:2],
    )["params"]
    specs = lxmert_mask_specs(config.l_layers, config.r_layers, config.x_layers)
    masker = Masker.create(
        specs, ModalSparsity.from_compression(0.3, 0.3, 0.3, 0.7),
        controlled_init="magnitude",
    )
    cfg = stage2.Stage2Config(masker_type="lmh", total_steps=10_000,
                              hidden_size=config.hidden_size)
    state, tx = stage2.init_state(model, masker, params, cfg, jax.random.PRNGKey(1))

    # Multi-step on-device scan: one dispatch drives `window` steps, so the
    # per-step host round trip vanishes (train/stage2.make_multi_step).
    window = 8
    multi = stage2.make_multi_step(model, masker, tx, cfg, window)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)

    # compile + warmup; the float() forces real completion through the tunnel
    state, losses, _ = multi(state, stacked)
    _ = float(losses[-1])

    windows = 4
    t0 = time.perf_counter()
    for _ in range(windows):
        state, losses, _ = multi(state, stacked)
        _ = float(losses[-1])  # synchronous fence (see module docstring)
    dt = time.perf_counter() - t0

    examples_per_sec = batch_size * window * windows / dt
    print(json.dumps({
        "metric": "lxmert_stage2_mask_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec, 2),
        "unit": "examples/sec",
        "vs_baseline": round(examples_per_sec / REFERENCE_EXAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
