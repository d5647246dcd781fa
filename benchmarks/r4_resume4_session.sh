#!/usr/bin/env bash
# Fourth resume of the r4 MFU sweep: the 05:39 session recorded beam-5
# (+KV cache) MFU 0.262 and rank-eval MFU 0.372, and was cut off as
# profile_generate started. Remaining: the compaction bench with its new
# MFU reporting (wall-clock sensitive -> first), the decode-loop profile,
# and the never-chip-run profile_mplug speed-of-light pin (both profiles
# aggregate device-op time, contention-insensitive). Strictly sequential —
# ONE TPU process at a time (CLAUDE.md).
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
run python benchmarks/bench_compaction.py
run python benchmarks/profile_generate.py 32
run python benchmarks/profile_mplug.py 64
echo "session complete: $log"
