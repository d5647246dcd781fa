#!/usr/bin/env bash
# Round-5 chip session 3: the stage-1 optimizer-floor levers the r5
# profile pinned (BENCHMARKS.md "Stage-1 speed-of-light"):
#   1. bench_stage1 fp32 re-baseline (cache-warm control)
#   2. bench_stage1 --mdtype bfloat16   (halve Adam m/v HBM traffic)
#   3. bench_stage1 --accum 4           (one dense update per 4 microbatches)
# Strictly sequential — ONE TPU process at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
log="benchmarks/tunnel_session_${ts}.log"
run() {
  echo "=== $* ($(date +%T)) ===" | tee -a "$log"
  timeout 3600 "$@" >>"$log" 2>&1
  echo "--- rc=$? ($(date +%T)) ---" | tee -a "$log"
}
echo "log: $log"
if ! timeout 120 python -c "import jax; print(jax.devices())" >>"$log" 2>&1; then
  echo "tunnel down (probe timed out)" | tee -a "$log"
  exit 2
fi
run python benchmarks/bench_stage1.py
run python benchmarks/bench_stage1.py --mdtype bfloat16
run python benchmarks/bench_stage1.py --accum 4

# instrumented eval re-run: session 2 measured 18.5 ex/s through the
# product CLI vs ~350 on the same workload via bench_generate — the
# per-phase clocks (eval_load/shard/dispatch/flush_s) pin where the
# ~1.7 s/batch goes. Grid: device_normalize (uint8 transfer, 4x fewer
# bytes) x pipeline depth.
for dn in true false; do
  for d in 0 2; do
    run python -m crvqa_tpu.cli.vqa_mplug \
      --output_dir /tmp/r5_evalab2_${dn}_$d --synthetic 2560 \
      --synthetic_shapes 25,8,5 --eval_batch_size 32 \
      --mode mask --do_predict --eval_pipeline_depth "$d" \
      --device_normalize "$dn" \
      --dtype bfloat16 --fused_attention true --midseq_attention true \
      --prng_impl unsafe_rbg --seed 0
  done
done

# product-surface parity at the EXACT bench.py headline config (bf16
# backbone + bf16 Adam moments): session-2's parity run lacked
# --moment_dtype (the flag landed after it launched)
run python -m crvqa_tpu.cli.prune_debias_vqa \
  --output_dir /tmp/r5_parity_s2b --synthetic 67072 --synthetic_pool 8 \
  --do_train --train_batch_size 256 --num_train_epochs 1 \
  --backbone_dtype bfloat16 --moment_dtype bfloat16 \
  --fused_attention true --prng_impl unsafe_rbg \
  --steps_per_dispatch 64 --logging_steps 64 --save_steps 128 \
  --warmup_steps 0 --seed 0
echo "session complete: $log"
