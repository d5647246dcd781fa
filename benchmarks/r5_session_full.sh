#!/usr/bin/env bash
# Round-5 full chip session — every measurement VERDICT r4 asked for:
#   1. head-group (128-lane) attention packing A/B   (weak #2 / next #4)
#   2. profile_stage1 re-capture, fixed adam buckets  (weak #1 / next #3)
#   3. pipelined beam-eval depth 0/1/2 A/B through the PRODUCT CLI,
#      bench_generate-matched shapes                  (weak #3 / next #6)
#   4. product-surface parity: prune_debias_vqa CLI ~260 steps, default
#      cadence + prefetch + checkpoint saves          (weak #5 / next #7)
#   5. product-surface parity: vqa_mplug mask-train ~200 steps (next #7)
#   6. bench_generate re-baseline after the cache-reorder precision fix
#   7. bench.py headline
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

run python benchmarks/bench_fused_attention.py --hgroup

run env PROFILE_BS=64 PROFILE_WINDOW=32 python benchmarks/profile_stage1.py

for d in 0 1 2; do
  run python -m crvqa_tpu.cli.vqa_mplug \
    --output_dir /tmp/r5_evalab_$d --synthetic 2560 \
    --synthetic_shapes 25,8,5 --eval_batch_size 32 \
    --mode mask --do_predict --eval_pipeline_depth "$d" \
    --dtype bfloat16 --fused_attention true --midseq_attention true \
    --prng_impl unsafe_rbg --seed 0
done

run python -m crvqa_tpu.cli.prune_debias_vqa \
  --output_dir /tmp/r5_parity_s2 --synthetic 67072 --synthetic_pool 8 \
  --do_train --train_batch_size 256 --num_train_epochs 1 \
  --backbone_dtype bfloat16 --fused_attention true --prng_impl unsafe_rbg \
  --steps_per_dispatch 64 --logging_steps 64 --save_steps 128 \
  --warmup_steps 0 --seed 0

run python -m crvqa_tpu.cli.vqa_mplug \
  --output_dir /tmp/r5_parity_mplug --synthetic 6400 \
  --synthetic_shapes 25,8,5 --mode mask --do_train \
  --train_batch_size 32 --num_train_epochs 1 \
  --dtype bfloat16 --fused_attention true --midseq_attention true \
  --prng_impl unsafe_rbg --logging_steps 20 --save_steps 100 --seed 0

run python benchmarks/bench_generate.py --midseq --cache

run python bench.py

echo "session complete: $log"
