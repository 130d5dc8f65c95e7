#!/bin/bash
# Incremental TPU measurement loop: waits for the tunnel to be healthy,
# then takes measurements one per process (each under timeout). Appends to
# TPU_MEASURES.jsonl; skips measurements already captured.
cd /root/repo
MEASURES="score_matmul score_gather score_pallas tiny_seq insert_matmul insert_scatter mc_match viny_seq gmapping_seq m3rsm gn_solve"
for i in $(seq 1 200); do
  # health probe
  if ! timeout 60 python -c "
import jax, numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))[0,0]) == 64.0
" >/dev/null 2>&1; then
    sleep 120
    continue
  fi
  for m in $MEASURES; do
    if grep -q "\"name\": \"$m\"" TPU_MEASURES.jsonl 2>/dev/null; then
      continue
    fi
    echo "[capture] $m"
    timeout 420 python scripts/tpu_measure_one.py "$m" || echo "[capture] $m failed"
    break   # one measurement per health check
  done
  # all done?
  done_all=1
  for m in $MEASURES; do
    grep -q "\"name\": \"$m\"" TPU_MEASURES.jsonl 2>/dev/null || done_all=0
  done
  [ "$done_all" = "1" ] && { echo "[capture] complete"; exit 0; }
  sleep 20
done
