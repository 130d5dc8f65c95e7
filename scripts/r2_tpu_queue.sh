#!/bin/bash
# Drain the round-2 TPU measurement queue across tunnel flaps: probe health,
# run ONE queue item per healthy probe, append progress to r2_tpu_queue.log.
cd /root/repo
LOG=r2_tpu_queue.log
DONE=r2_tpu_done
mkdir -p "$DONE"

healthy() {
  timeout 70 python -c "
import jax, numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]) == 64.0
" >/dev/null 2>&1
}

run_item() {  # name, command...
  local name=$1; shift
  [ -f "$DONE/$name" ] && return 0
  echo "[queue] $(date +%H:%M:%S) running $name" >>"$LOG"
  if timeout 540 "$@" >>"$LOG" 2>&1; then
    touch "$DONE/$name"
    echo "[queue] $name OK" >>"$LOG"
  else
    echo "[queue] $name FAILED rc=$?" >>"$LOG"
    return 1
  fi
}

for i in $(seq 1 200); do
  all_done=1
  for n in speed_Ar4 speed_As2 speed_Cbf quality_A quality_B sol bench_tiny; do
    [ -f "$DONE/$n" ] || all_done=0
  done
  [ "$all_done" = 1 ] && { echo "[queue] all done" >>"$LOG"; exit 0; }
  if ! healthy; then
    sleep 180
    continue
  fi
  run_item speed_Ar4 env WHICH=speed PRESETS=A_r4 python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item speed_As2 env WHICH=speed PRESETS=A_s2 python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item speed_Cbf env WHICH=speed PRESETS=C_bf python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item quality_A env WHICH=quality PRESETS=A_odom python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item quality_B env WHICH=quality PRESETS=B_improved python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item sol env WHICH=sol python scripts/r2_tpu_final.py || { sleep 60; continue; }
  healthy || continue
  run_item bench_tiny env SLAM_BENCH_NO_PROBE=1 python bench.py || { sleep 60; continue; }
done
echo "[queue] loop budget exhausted" >>"$LOG"
