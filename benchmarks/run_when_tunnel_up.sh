#!/usr/bin/env bash
# One-shot on-chip measurement session for when the axon tunnel comes back.
# Runs strictly sequentially (ONE TPU process at a time — CLAUDE.md) with
# per-step timeouts, logging to benchmarks/tunnel_session_<ts>.log.
# Order: cheap probe -> midseq kernel compile+numerics gate -> midseq A/B
# benches -> headline bench.py (refreshes .bench_last.json).
set -u
cd "$(dirname "$0")/.."
ts=$(date +%Y%m%d_%H%M%S)
log="benchmarks/tunnel_session_${ts}.log"
run() {
  echo "=== $* ($(date +%T)) ===" | tee -a "$log"
  "$@" >>"$log" 2>&1
  echo "--- rc=$? ---" | tee -a "$log"
}
echo "log: $log"
if ! timeout 120 python -c "import jax; print(jax.devices())" >>"$log" 2>&1; then
  echo "tunnel still down (probe timed out)" | tee -a "$log"
  exit 2
fi
run timeout 1800 python benchmarks/midseq_chip_check.py
# A/B: mPLUG mask-train step and beam-5 eval, midseq off/on
run timeout 3600 python benchmarks/bench_mplug.py
run timeout 3600 python benchmarks/bench_mplug.py --midseq
run timeout 3600 python benchmarks/bench_generate.py
run timeout 3600 python benchmarks/bench_generate.py --midseq
run timeout 1800 python benchmarks/bench_serve_latency.py
# headline (also persists .bench_last.json for outage records)
run timeout 3600 python bench.py
echo "session complete: $log"
