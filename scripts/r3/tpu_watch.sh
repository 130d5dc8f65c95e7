#!/bin/bash
# Poll the TPU tunnel; write /tmp/tpu_up when a small matmul completes.
rm -f /tmp/tpu_up
while true; do
  if timeout 90 python -c "
import jax, numpy as np, jax.numpy as jnp
x = np.asarray(jnp.ones((64,64))@jnp.ones((64,64)))
assert x[0,0]==64.0
" >/dev/null 2>&1; then
    date > /tmp/tpu_up
    echo "TPU UP at $(date)"
    exit 0
  fi
  echo "TPU down at $(date)"
  sleep 60
done
