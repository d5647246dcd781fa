"""Benchmark: stage-2 mask-training throughput + MFU on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.

The metric is the BASELINE.md north star — LXMERT stage-2 (masked forward +
LMH loss + backward to scores/classifier + AdamW update) examples/sec/chip at
the canonical batch size 256 (`bash_files/Stage2/run_mask_train_stage2.sh`).

Two configurations are measured and the faster one is the headline:
- fp32 backbone (reference-exact storage)
- bf16 backbone (Stage2Config.backbone_dtype='bfloat16' — halves the
  masked-apply HBM reads; the compute path is bf16 either way)

MFU comes from the XLA-compiled executable's own cost analysis (flops per
multi-step window) divided by measured wall time and the chip's peak bf16
FLOP/s (by device_kind).

Timing is synchronous: every timed window fetches a scalar loss to host (the
axon tunnel on this machine does not honor block_until_ready, so a value
fetch is the only reliable fence). The number is a conservative end-to-end
figure, not just device time.

vs_baseline divides by 1000 examples/sec — an estimate of the PyTorch
reference's stage-2 throughput on its single-GPU setup (the repo publishes no
throughput numbers). The estimate is deliberately GENEROUS to the reference
and its derivation is PINNED BY MEASUREMENT, not back-of-envelope: the
compiled single-step executable's own cost analysis (measured at runtime,
emitted as `flops_per_example` in the JSON; 25.8 GFLOP/example on v5e at r3)
caps a V100's 15.7 TFLOP/s fp32 peak at `15.7e12 / flops_per_example`
≈ 608 ex/s at 100% utilization (emitted as `ref_v100_roofline`; the shipped
configs run fp32 — apex fp16 is off), and a realistic 35% utilization lands
near 213 ex/s. 1000 ex/s ≈ a fp16 V100 run at ~26% MFU or an A100-class
card. >1.0 therefore understates the real speedup.

Window size (steps per on-device scan dispatch) is measured on-chip:
2906 ex/s at window 8, 3002 at 32 (+3.3%), and with the fused kernel
3416 at 32 vs 3446 at 64 (+0.9%); 128 exceeds HBM (the stacked window
batch). Overlapping the loss fetch with the next dispatch (lag-1)
measured as noise (+-0.5%), so the simple synchronous fence stays
(benchmarks/bench_window.py). Default: 64.
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
# Dropout RNG: threefry2x32 costs ~13% of the step (measured 2508 -> 2842
# ex/s); unsafe_rbg uses the TPU's RngBitGenerator. Fine for dropout; the
# CLIs default to threefry for reproducibility with --prng_impl to opt in.
jax.config.update("jax_default_prng_impl", "unsafe_rbg")

from crvqa_tpu.utils.mfu import compiled_flops as _window_flops  # noqa: E402
from crvqa_tpu.utils.mfu import peak_flops  # noqa: E402

REFERENCE_EXAMPLES_PER_SEC = 1000.0


def measure(backbone_dtype: str, window: int = 64, windows: int = 4,
            p_residual: str = "float32", moment_dtype: str = "float32") -> dict:
    # Fused short-seq attention kernel: measured 3260 vs 2997 ex/s (+8.8%)
    # on v5e (benchmarks/bench_fused_attention.py) — the profile's ~19%
    # attention-transpose-copy time collapses into VMEM-resident dots.
    # Backward uses the stored-probs residual (ops/fused_attention.BWD_IMPL
    # default "stored"): 3422.7 vs 3253.8 ex/s recompute (+5.2%, --bwd sweep).
    from crvqa_tpu.models import layers as _layers
    from crvqa_tpu.ops import fused_attention as _fa

    _layers.FUSED_ATTENTION = True
    _fa.P_RESIDUAL_DTYPE = (jnp.bfloat16 if p_residual == "bfloat16"
                            else jnp.float32)
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
                              hidden_size=config.hidden_size,
                              backbone_dtype=backbone_dtype,
                              moment_dtype=moment_dtype)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(1))

    # FLOPs from the compiled SINGLE step: cost analysis counts a lax.scan
    # body once regardless of trip count (verified on-chip against a known
    # matmul), so the multi-step window under-reports by 1/window. The
    # single-step executable is the same math, counted correctly.
    single = stage2.make_train_step(model, masker, tx, cfg)
    flops_step = _window_flops(single.lower(state, batch).compile())

    # Multi-step on-device scan: one dispatch drives `window` steps, so the
    # per-step host round trip vanishes (train/stage2.make_multi_step).
    multi = stage2.make_multi_step(model, masker, tx, cfg, window)
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (window,) + x.shape), batch)

    compiled = multi.lower(state, stacked).compile()  # multi is already jit'd
    flops = flops_step * window

    # warmup; the float() forces real completion through the tunnel
    state, losses, _ = compiled(state, stacked)
    _ = float(losses[-1])

    t0 = time.perf_counter()
    for _ in range(windows):
        state, losses, _ = compiled(state, stacked)
        _ = float(losses[-1])  # synchronous fence (see module docstring)
    dt = time.perf_counter() - t0

    examples_per_sec = batch_size * window * windows / dt
    peak = peak_flops(jax.devices()[0].device_kind)
    mfu = (flops * windows / dt) / peak if flops else None
    return {
        "backbone_dtype": backbone_dtype,
        "p_residual": p_residual,
        "moment_dtype": moment_dtype,
        "examples_per_sec": examples_per_sec,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "flops_per_window": flops,
        # measured per-example cost — the pinned input to the reference-GPU
        # roofline derivation (module docstring)
        "flops_per_example": flops_step / batch_size if flops_step else None,
        "device_kind": jax.devices()[0].device_kind,
    }


def probe_backend(timeout_s: int = 240) -> None:
    """Fail fast if the axon tunnel is down (observed r3: backend init can
    hang for many minutes and then raise UNAVAILABLE — better to exit with a
    clear error than burn the driver's bench window)."""
    import subprocess

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
    except subprocess.TimeoutExpired:
        _emit_unavailable(f"TPU backend init timed out after {timeout_s}s "
                          "— axon tunnel down (CLAUDE.md quirks)")
    except subprocess.CalledProcessError as e:
        _emit_unavailable("TPU backend init failed: "
                          + e.stderr.decode(errors="replace")[-300:])


_LAST_PATH = "/root/repo/.bench_last.json"


def _emit_unavailable(reason: str) -> None:
    """Still print ONE parseable JSON line so the driver's bench record
    shows WHY there is no fresh number (value null — never a stale value in
    the value field). last_measured carries the most recent on-chip result
    for context: read from the record the last successful run wrote, with
    the round-3 measurement (STATUS.md perf section) as the fallback."""
    print(f"bench.py: {reason}", file=sys.stderr)
    try:
        with open(_LAST_PATH) as f:
            last = json.load(f)
    except (OSError, ValueError):
        last = {"value": 3585.7, "mfu": 0.467,
                "when": "round 3 (STATUS.md perf section)",
                "config": "bf16 backbone + bf16 Adam moments, "
                          "window 64, bs 256"}
    print(json.dumps({
        "metric": "lxmert_stage2_mask_train_examples_per_sec_per_chip",
        "value": None, "unit": "examples/sec", "vs_baseline": None,
        "error": reason.splitlines()[0],
        "last_measured": last,
    }))
    sys.exit(2)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="measure the bf16-residual / bf16-moment ladder "
                         "instead of the two headline configs")
    args, _ = ap.parse_known_args()
    probe_backend()
    if args.sweep:
        for r in [
            measure("bfloat16"),
            measure("bfloat16", p_residual="bfloat16"),
            measure("bfloat16", p_residual="bfloat16",
                    moment_dtype="bfloat16"),
        ]:
            print(f"# {r}", file=sys.stderr)
            print(json.dumps(r))
        return
    # headline config: bf16 backbone (dtype-adaptive gelu) + bf16 Adam
    # moments — the measured r3 winners (STATUS.md perf section; moments
    # +2.8%, guarded by test_bf16_adam_moments_guard). The bf16 stored-probs
    # residual measured as noise (3582.6 vs 3581.3 ex/s), so the headline
    # keeps the exact fp32 residual.
    results = [measure("bfloat16", moment_dtype="bfloat16"),
               measure("float32")]
    for r in results:
        print(f"# {r}", file=sys.stderr)
    best = max(results, key=lambda r: r["examples_per_sec"])
    other = min(results, key=lambda r: r["examples_per_sec"])
    fpe = best.get("flops_per_example")
    record = {
        "metric": "lxmert_stage2_mask_train_examples_per_sec_per_chip",
        "value": round(best["examples_per_sec"], 2),
        "unit": "examples/sec",
        "vs_baseline": round(best["examples_per_sec"]
                             / REFERENCE_EXAMPLES_PER_SEC, 3),
        "mfu": best["mfu"],
        "flops_per_example": round(fpe / 1e9, 3) if fpe else None,  # GFLOP
        # measured-FLOPs V100-fp32 roofline for the reference (docstring);
        # the 1000 ex/s vs_baseline denominator stays ABOVE this cap
        "ref_v100_roofline": round(15.7e12 / fpe, 1) if fpe else None,
        "backbone_dtype": best["backbone_dtype"],
        "alt": {"backbone_dtype": other["backbone_dtype"],
                "examples_per_sec": round(other["examples_per_sec"], 2),
                "mfu": other["mfu"]},
        "device_kind": best["device_kind"],
    }
    print(json.dumps(record))
    try:  # feeds _emit_unavailable's last_measured on a later outage
        with open(_LAST_PATH, "w") as f:
            json.dump({**record, "measured_at": time.strftime("%F %T")}, f)
    except OSError:
        pass


if __name__ == "__main__":
    main()
