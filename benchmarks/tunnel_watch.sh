#!/usr/bin/env bash
# Watch for the axon TPU tunnel to come back, then run the scripted
# measurement session (benchmarks/run_when_tunnel_up.sh) exactly once.
# Probes every 15 min; each probe is a short-lived jax.devices() call
# (CLAUDE.md: one TPU process at a time — do not start other TPU work
# while this watcher is live).
set -u
cd "$(dirname "$0")/.."
echo "watch pid $$ start $(date +%T)"
while true; do
  if timeout 120 python -c "import jax; print(jax.devices())" >/dev/null 2>&1; then
    echo "tunnel UP at $(date +%T) — running measurement session"
    bash benchmarks/run_when_tunnel_up.sh
    echo "session done rc=$? at $(date +%T)"
    exit 0
  fi
  echo "tunnel down at $(date +%T); sleeping 15 min"
  sleep 900
done
