"""One-line chip-health reference: a fixed device-resident matmul loop.

The axon chip's delivered throughput varies >2x across hours; every speed
capture batch is tagged with this reference so slow-window captures are
recognizable (r2's SOL capture assumed a healthy chip). Appends to
TPU_MEASURES.jsonl as name=chip_health/matmul2k.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

    @jax.jit
    def loop(c):
        def body(x, _):
            return jnp.tanh(x @ a), None
        out, _ = jax.lax.scan(body, c, None, length=16)
        return out[0, 0]

    x0 = jnp.ones((2048, 2048), jnp.bfloat16)
    float(np.asarray(loop(x0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(x0)))
        ts.append((time.perf_counter() - t0) / 16)
    ms = float(np.median(ts)) * 1e3
    tflops = 2 * 2048**3 / (ms / 1e3) / 1e12
    row = {"name": "chip_health/matmul2k", "ms": round(ms, 4),
           "tflops": round(tflops, 1), "ts": time.time(),
           "backend": jax.default_backend()}
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
