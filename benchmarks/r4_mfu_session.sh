#!/usr/bin/env bash
# Round-4 MFU sweep: put a utilization number on every benched surface
# (VERDICT r3 weak #1/#2). Strictly sequential — ONE TPU process at a time
# (CLAUDE.md). Logs to benchmarks/tunnel_session_<ts>.log.
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
run python benchmarks/bench_stage1.py            # stage-1 + stage-3 dense rows, bs 64
run python benchmarks/bench_stage1.py --bs 256   # throughput-optimal alt
run python benchmarks/bench_visualbert.py        # now with MFU
run python benchmarks/bench_mplug.py --midseq    # mask-train MFU
run python benchmarks/bench_generate.py --midseq --cache   # beam-5 + KV cache MFU
run python benchmarks/bench_generate.py --rank --midseq    # rank eval MFU
echo "session complete: $log"
