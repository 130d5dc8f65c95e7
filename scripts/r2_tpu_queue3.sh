#!/bin/bash
# Third round-2 TPU queue: final fast-preset operating point (one-hot
# match+insert windows, f32 scoring) — speed, quality, and the bench.py
# gmapping headline row.
cd /root/repo
LOG=r2_tpu_queue3.log
DONE=r2_tpu_done
mkdir -p "$DONE"

healthy() {
  timeout 70 python -c "
import jax, numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]) == 64.0
" >/dev/null 2>&1
}

run_item() {
  local name=$1; shift
  [ -f "$DONE/$name" ] && return 0
  echo "[queue3] $(date +%H:%M:%S) running $name" >>"$LOG"
  if timeout 540 "$@" >>"$LOG" 2>&1; then
    touch "$DONE/$name"
    echo "[queue3] $name OK" >>"$LOG"
  else
    echo "[queue3] $name FAILED rc=$?" >>"$LOG"
    return 1
  fi
}

for i in $(seq 1 200); do
  all_done=1
  for n in final_speed final_quality final_bench; do
    [ -f "$DONE/$n" ] || all_done=0
  done
  [ "$all_done" = 1 ] && { echo "[queue3] all done" >>"$LOG"; exit 0; }
  if ! healthy; then
    sleep 180
    continue
  fi
  run_item final_speed env MODE=speed ABL=oo_f32,oo_r6_f32,oo_r8_f32 python scripts/r2_quality_ablate.py || { sleep 60; continue; }
  healthy || continue
  run_item final_quality env MODE=quality ABL=oo_f32,oo_r6_f32 python scripts/r2_quality_ablate.py || { sleep 60; continue; }
  healthy || continue
  run_item final_bench env SLAM_BENCH_NO_PROBE=1 SLAM_BENCH_PRESET=gmapping python bench.py || { sleep 60; continue; }
done
echo "[queue3] loop budget exhausted" >>"$LOG"
