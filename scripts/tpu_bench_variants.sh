#!/bin/bash
# Capture bench.py throughput for tuning variants on the real TPU.
# Waits for tunnel health, then takes ONE bench run per healthy probe
# (the axon tunnel dies unpredictably under sustained load) and appends
# the JSON line + variant tag to TPU_BENCH_VARIANTS.jsonl.
cd /root/repo
OUT=TPU_BENCH_VARIANTS.jsonl
# variant format: tag,PRESET,DTYPE,STRIDE
# (the round-1 *_bw beam-window variants are gone with the knob — see
# DESIGN.md "Beam windows post-mortem"; r2 fast-preset rows come from
# scripts/r2_tpu_final.py instead.)
# tiny_f32 first: it is exactly what the driver's end-of-round `python
# bench.py` runs, so its number predicts the recorded headline.
VARIANTS=(
  "tiny_f32_r2,tiny,float32,1"
  "tiny_bf16_r2,tiny,bfloat16,1"
  "gmapping_bf16_r2,gmapping,bfloat16,1"
  "viny_f32_r2,viny,float32,1"
)
for i in $(seq 1 400); do
  if ! timeout 60 python -c "
import jax, numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]) == 64.0
" >/dev/null 2>&1; then
    sleep 120
    continue
  fi
  ran=0
  for v in "${VARIANTS[@]}"; do
    IFS=, read -r tag preset dtype stride <<<"$v"
    grep -q "\"tag\": \"$tag\"" "$OUT" 2>/dev/null && continue
    echo "[variants] $tag"
    line=$(SLAM_BENCH_NO_PROBE=1 SLAM_BENCH_PRESET=$preset \
           SLAM_BENCH_DTYPE=$dtype SLAM_BENCH_STRIDE=$stride \
           timeout 420 python bench.py 2>/dev/null | tail -1)
    if [ -n "$line" ]; then
      echo "${line%\}}, \"tag\": \"$tag\", \"ts\": $(date +%s)}" >>"$OUT"
    else
      echo "[variants] $tag failed"
    fi
    ran=1
    break
  done
  [ "$ran" = "0" ] && { echo "[variants] complete"; exit 0; }
  sleep 20
done
