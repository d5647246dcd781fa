#!/usr/bin/env bash
# Round-5 chip session 3 (consolidated — session 2 was cut short to fix
# the product eval loop). Order = most diagnostic first:
#   1. bench_generate end-fence re-baseline + --fence-each control: the
#      harness's iterations are INDEPENDENT; if the axon queue doesn't
#      execute unobserved programs FIFO, the end-fence number is inflated
#      and the product CLI's ~20 ex/s was the truth all along
#   2. instrumented product eval grid: device_normalize x pipeline depth
#   3. stage-1 optimizer-floor levers: bf16 Adam moments, accum 4
#   4. product-surface parity runs (stage-2 LXMERT at the full headline
#      config incl. bf16 moments + bf16 feature transfer; mPLUG mask)
#   5. bench.py headline
# Strictly sequential — ONE TPU process at a time (CLAUDE.md).
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
ok=0
for i in 1 2 3; do
  if timeout 180 python -c "import jax; print(jax.devices())" >>"$log" 2>&1; then
    ok=1; break
  fi
  echo "probe $i failed (device busy/aborted?) — retrying in 60s" | tee -a "$log"
  sleep 60
done
[ "$ok" = 1 ] || { echo "tunnel down" | tee -a "$log"; exit 2; }

run python benchmarks/bench_generate.py --midseq --cache
run python benchmarks/bench_generate.py --midseq --cache --fence-each

for dn in true false; do
  for d in 0 2; do
    run python -m crvqa_tpu.cli.vqa_mplug \
      --output_dir /tmp/r5_evalab2_${dn}_$d --synthetic 2560 \
      --synthetic_shapes 25,8,5 --eval_batch_size 32 \
      --mode mask --do_predict --eval_pipeline_depth "$d" \
      --device_normalize "$dn" \
      --dtype bfloat16 --fused_attention true --midseq_attention true \
      --prng_impl unsafe_rbg --seed 0
  done
done

run python benchmarks/bench_stage1.py
run python benchmarks/bench_stage1.py --mdtype bfloat16
run python benchmarks/bench_stage1.py --accum 4

run python -m crvqa_tpu.cli.prune_debias_vqa \
  --output_dir /tmp/r5_parity_s2b --synthetic 67072 --synthetic_pool 8 \
  --do_train --train_batch_size 256 --num_train_epochs 1 \
  --backbone_dtype bfloat16 --moment_dtype bfloat16 \
  --fused_attention true --prng_impl unsafe_rbg \
  --steps_per_dispatch 64 --logging_steps 64 --save_steps 128 \
  --warmup_steps 0 --seed 0

run python -m crvqa_tpu.cli.vqa_mplug \
  --output_dir /tmp/r5_parity_mplug --synthetic 6400 \
  --synthetic_shapes 25,8,5 --mode mask --do_train \
  --train_batch_size 32 --num_train_epochs 1 \
  --dtype bfloat16 --fused_attention true --midseq_attention true \
  --prng_impl unsafe_rbg --logging_steps 20 --save_steps 100 --seed 0

run python bench.py
echo "session complete: $log"
