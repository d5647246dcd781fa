#!/usr/bin/env bash
# Round-5 chip session 2 (VERDICT r4 #3 re-capture, #6 measurement):
#   1. profile_stage1 re-run with the fixed adam_update bucketing (the
#      first capture put 216 ms of Adam fusions in model_other)
#   2. pipelined beam-eval A/B through the PRODUCT CLI: vqa_mplug
#      --do_predict on synthetic data at bs 32, --eval_pipeline_depth 0
#      (serial reference-shaped loop) vs 1 (dispatch-ahead) vs 2
#   3. bench_generate re-baseline after the cache-reorder precision fix
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
for d in 0 1 2; do
  run python -m crvqa_tpu.cli.vqa_mplug \
    --output_dir /tmp/r5_evalab_$d --synthetic 640 --eval_batch_size 32 \
    --mode full --do_predict --eval_pipeline_depth "$d" \
    --midseq_attention true --seed 0
done
run python benchmarks/bench_generate.py --midseq --cache
echo "session complete: $log"
