"""One-line chip-health reference: slope-timed fixed matmul chain.

Round-3 discovery: the naive version (one fetch per 16-iteration loop)
reported 1.6-10 "TFLOPs" during windows when the chip itself was fine —
the TUNNEL'S FETCH LATENCY had grown from ~30 ms to hundreds of ms and
dominated the measurement. The slope between a 16- and 64-iteration chain
cancels the fetch floor and measures actual device throughput (213 TFLOPs
bf16 in the same window the naive probe called "9.5").

Appends to TPU_MEASURES.jsonl as name=chip_health/matmul2k (device
throughput) + fetch_ms (the tunnel latency, reported separately — both
matter: fetch latency bounds per-segment/host-sync costs).
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (2048, 2048), jnp.bfloat16)

    def make(n):
        @jax.jit
        def loop(c):
            def body(x, _):
                return jnp.tanh(x @ a), None
            out, _ = jax.lax.scan(body, c, None, length=n)
            return out[0, 0]
        return loop

    x0 = jnp.ones((2048, 2048), jnp.bfloat16)

    def run(n, iters=3):
        f = make(n)
        float(np.asarray(f(x0)))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f(x0)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t16, t64 = run(16), run(64)
    if t64 > t16:
        ms = (t64 - t16) / 48 * 1e3
        tflops = 2 * 2048**3 / (ms / 1e3) / 1e12
    else:
        ms, tflops = 0.0, 0.0  # jitter: unmeasurable window
    fetch_ms = max(t16 * 1e3 - 16 * ms, 0.0)

    # HBM bandwidth probe (the dimension that actually throttles the SLAM
    # kernels — score/insert are memory-bound; a co-tenant can starve HBM
    # while the MXU peak stays intact): slope-timed big-array saxpy.
    big = jnp.ones((64, 1024, 1024), jnp.float32)  # 256 MB

    def mkbw(n):
        @jax.jit
        def loop(c):
            def body(x, _):
                return x * 0.999 + 0.001, None  # read + write 256 MB
            out, _ = jax.lax.scan(body, c, None, length=n)
            return out[0, 0, 0]
        return loop

    f4, f16b = mkbw(4), mkbw(16)
    float(np.asarray(f4(big))); float(np.asarray(f16b(big)))

    def runbw(f, iters=3):
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f(big)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    b4, b16 = runbw(f4), runbw(f16b)
    if b16 > b4:
        per = (b16 - b4) / 12
        gbps = 2 * big.nbytes / per / 1e9
    else:
        gbps = 0.0
    row = {"name": "chip_health/matmul2k", "ms": round(ms, 4),
           "tflops": round(tflops, 1), "fetch_ms": round(fetch_ms, 1),
           "hbm_gbps": round(gbps, 1),
           "ts": time.time(), "backend": jax.default_backend()}
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
