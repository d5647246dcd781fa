#!/usr/bin/env bash
# Third resume of the r4 MFU sweep: the 05:05 session recorded the
# bench_mplug MFU sweep (incl. the new bs-64 row) and was cut off right
# after bench_generate --midseq --cache started compiling. Remaining:
# beam-5 (+KV cache) MFU, rank-eval MFU, decode-loop profile, and the
# compaction bench with its new MFU reporting. Strictly sequential — ONE
# TPU process at a time (CLAUDE.md).
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
run python benchmarks/bench_generate.py --midseq --cache
run python benchmarks/bench_generate.py --rank --midseq
run python benchmarks/profile_generate.py 32
run python benchmarks/bench_compaction.py
echo "session complete: $log"
