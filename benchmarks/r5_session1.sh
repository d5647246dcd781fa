#!/usr/bin/env bash
# Round-5 chip session 1 (VERDICT r4 #3, #4, #7):
#   1. profile_stage1 at the canonical bs 64 — bucketed profile + two-floor
#      speed-of-light pin (matmul + Adam HBM)
#   2. head-group (128-lane) attention packing A/B on the stage-2 window
#   3. product-surface parity: the ACTUAL prune_debias_vqa CLI for ~200
#      steps on synthetic data (prefetch + checkpointing + logging on),
#      steady-state ex_s from its own interval logs vs the bench harness
# Strictly sequential — ONE TPU process at a time (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
log="benchmarks/tunnel_session_${ts}.log"
run() {
  echo "=== $* ($(date +%T)) ===" | tee -a "$log"
  timeout 3600 "$@" >>"$log" 2>&1
  echo "--- rc=$? ---" | tee -a "$log"
}
echo "log: $log"
if ! timeout 120 python -c "import jax; print(jax.devices())" >>"$log" 2>&1; then
  echo "tunnel down (probe timed out)" | tee -a "$log"
  exit 2
fi
run env PROFILE_BS=64 PROFILE_WINDOW=32 python benchmarks/profile_stage1.py
run python benchmarks/bench_fused_attention.py --hgroup
run python -m crvqa_tpu.cli.prune_debias_vqa \
  --output_dir /tmp/r5_parity --synthetic 51200 \
  --Masker_type lmh --zero_rate 0.7 \
  --Lang_comp 0.3 --Vis_comp 0.3 --Fus_comp 0.3 \
  --train_batch_size 256 --eval_batch_size 256 \
  --num_train_epochs 1 --logging_steps 20 --save_steps 100 \
  --steps_per_dispatch 8 --do_train --seed 0
run python -m crvqa_tpu.cli.prune_debias_vqa \
  --output_dir /tmp/r5_parity_w1 --synthetic 25600 \
  --Masker_type lmh --zero_rate 0.7 \
  --Lang_comp 0.3 --Vis_comp 0.3 --Fus_comp 0.3 \
  --train_batch_size 256 --eval_batch_size 256 \
  --num_train_epochs 1 --logging_steps 20 --save_steps 100 \
  --steps_per_dispatch 1 --do_train --seed 0
echo "session complete: $log"
