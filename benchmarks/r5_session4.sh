#!/usr/bin/env bash
# Round-5 chip session 4: fill the two remaining r5 cells —
#   1. rank-eval re-baseline (bench_generate --rank --midseq)
#   2. profile_stage1 under bf16 Adam moments (PROFILE_MDTYPE): the
#      adam_update bucket should shrink ~40% vs the fp32 pin
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
timeout 180 python -c "import jax; print(jax.devices())" >>"$log" 2>&1 || { echo down; exit 2; }
run python benchmarks/bench_generate.py --rank --midseq
run env PROFILE_BS=64 PROFILE_WINDOW=32 PROFILE_MDTYPE=bfloat16 python benchmarks/profile_stage1.py
echo "session complete: $log"
