#!/usr/bin/env bash
# Resume of r4_mfu_session.sh after the 21:03 cutoff: the remaining MFU
# surfaces plus the new decode-loop profiler. Strictly sequential — ONE TPU
# process at a time (CLAUDE.md).
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
run python benchmarks/bench_visualbert.py
run python benchmarks/bench_mplug.py --midseq
run python benchmarks/bench_generate.py --midseq --cache
run python benchmarks/bench_generate.py --rank --midseq
run python benchmarks/profile_generate.py 32
echo "session complete: $log"
