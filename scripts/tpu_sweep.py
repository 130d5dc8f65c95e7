"""One-off TPU sweep of impl knobs at bench shapes (run on the real chip).

Times score_poses (gather/matmul x f32/bf16, reducers) and insert_scan
(scatter/matmul x dda/polar) at the headline-bench shapes, plus the full
tiny slam_step. Appends rows to TPU_MEASURES.jsonl.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from slam_constructor_tpu.models import engine as eng
from slam_constructor_tpu.models import tiny
from slam_constructor_tpu.ops import cells, grid, raycast, scoring
from slam_constructor_tpu.utils import datagen, profiling

MAP = 256
BEAMS = 360
CAND = 64


INNER = 64  # iterations fused inside one dispatch (axon tunnel RTT ~50ms)


def timed_inner(make_body, carry, iters: int = 5) -> float:
    """Time INNER dependent iterations of body inside ONE jitted dispatch;
    return per-iteration milliseconds with the dispatch floor subtracted
    via a 1-iteration control."""
    import numpy as np

    def run(n):
        f = jax.jit(
            lambda c: jax.lax.fori_loop(0, n, lambda i, c: make_body(c), c)
        )
        out = f(carry)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x).ravel()[:1], out
        )  # host-fetch barrier
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(carry)
            jax.tree_util.tree_map(lambda x: np.asarray(x).ravel()[:1], out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_n, t_1 = run(INNER), run(1)
    return max(t_n - t_1, 1e-9) / (INNER - 1) * 1e3


def log(row):
    row["ts"] = time.time()
    row["backend"] = jax.default_backend()
    print(json.dumps(row), flush=True)
    with open("TPU_MEASURES.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(BEAMS)
    pose = jnp.array([0.0, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, MAP, MAP, 0.1)
    gm = raycast.insert_scan(gm, model, pose, scan, raycast.BeamConfig())
    view = scoring.MapView.of(gm, model)
    key = jax.random.PRNGKey(0)
    cand = pose[None, :] + 0.05 * jax.random.normal(key, (CAND, 3))

    # --- scoring sweep ---
    for reducer in ("overlap", "mean", "obstacle", "max"):
        for impl in ("gather", "matmul"):
            for dtype in ("float32", "bfloat16"):
                if impl == "gather" and dtype == "bfloat16":
                    continue
                if reducer == "max" and impl == "matmul":
                    continue
                cfg = scoring.ScoringConfig(
                    reducer=reducer, window=1, impl=impl, dtype=dtype
                )

                def body(c, _cfg=cfg):
                    probs = scoring.score_poses(view, scan, c, _cfg)
                    return c + 1e-12 * probs[:, None]

                try:
                    ms = timed_inner(body, cand)
                except Exception as e:  # noqa: BLE001
                    print(f"FAIL {reducer}/{impl}/{dtype}: {e}")
                    continue
                log({"name": f"score@{reducer}/{impl}/{dtype}",
                     "ms": round(ms, 4), "cand": CAND, "beams": BEAMS})

    # --- insert sweep ---
    for scatter_impl in ("scatter", "matmul"):
        for free_impl in ("dda", "polar"):
            bc = raycast.BeamConfig(scatter_impl=scatter_impl, free_impl=free_impl)

            def body(g, _bc=bc):
                return raycast.insert_scan(g, model, pose, scan, _bc)

            try:
                ms = timed_inner(body, gm)
            except Exception as e:  # noqa: BLE001
                print(f"FAIL insert {scatter_impl}/{free_impl}: {e}")
                continue
            log({"name": f"insert@{scatter_impl}/{free_impl}", "ms": round(ms, 4)})

    # --- full tiny step ---
    cfg = tiny.tiny_config(map_size=MAP, mc_batch=CAND, mc_rounds=12)
    st = eng.init_state(cfg)
    odom = jnp.array([0.05, 0.0, 0.01], jnp.float32)
    step = jax.jit(lambda s, sc, od: eng.slam_step(cfg, s, sc, od))
    ms = profiling.timed(step, st, scan, odom, iters=30) * 1e3
    log({"name": "tiny_step", "ms": round(ms, 4)})


if __name__ == "__main__":
    main()
