#!/usr/bin/env bash
# Second resume of the r4 MFU sweep: the 22:17 session recorded
# bench_visualbert and was cut off inside bench_mplug. Remaining surfaces:
# mPLUG mask-train MFU, beam-5 (+KV cache) MFU, rank-eval MFU, and the
# decode-loop profile. Strictly sequential — ONE TPU process at a time
# (CLAUDE.md).
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
run python benchmarks/bench_mplug.py --midseq
run python benchmarks/bench_generate.py --midseq --cache
run python benchmarks/bench_generate.py --rank --midseq
run python benchmarks/profile_generate.py 32
echo "session complete: $log"
