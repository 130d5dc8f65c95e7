#!/bin/bash
# Second round-2 TPU queue: RBPF step decomposition + fast-preset quality
# ablation. Same discipline as r2_tpu_queue.sh: probe health, one item per
# healthy probe, survive tunnel flaps.
cd /root/repo
LOG=r2_tpu_queue2.log
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
  echo "[queue2] $(date +%H:%M:%S) running $name" >>"$LOG"
  if timeout 540 "$@" >>"$LOG" 2>&1; then
    touch "$DONE/$name"
    echo "[queue2] $name OK" >>"$LOG"
  else
    echo "[queue2] $name FAILED rc=$?" >>"$LOG"
    return 1
  fi
}

for i in $(seq 1 200); do
  all_done=1
  for n in parts abl_speed abl_quality_a abl_quality_b; do
    [ -f "$DONE/$n" ] || all_done=0
  done
  [ "$all_done" = 1 ] && { echo "[queue2] all done" >>"$LOG"; exit 0; }
  if ! healthy; then
    sleep 180
    continue
  fi
  run_item parts python scripts/r2_parts2.py || { sleep 60; continue; }
  healthy || continue
  run_item abl_speed env MODE=speed python scripts/r2_quality_ablate.py || { sleep 60; continue; }
  healthy || continue
  run_item abl_quality_a env MODE=quality ABL=fast,f32,r8 python scripts/r2_quality_ablate.py || { sleep 60; continue; }
  healthy || continue
  run_item abl_quality_b env MODE=quality ABL=r1ref,cap15win,onehot python scripts/r2_quality_ablate.py || { sleep 60; continue; }
done
echo "[queue2] loop budget exhausted" >>"$LOG"
