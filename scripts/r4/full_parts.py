"""Round-4 full-pipeline cost breakdown on chip (wall-clock ablations).

Variants over the bench's 2-lap 512-scan sequence (same data/keys):
  base        — bench.py full preset (segment 128)
  seg256      — segment 256 (half the per-segment dispatch+sync overhead)
  no_close    — optimize_every_loops=10^9 (detection runs, bursts never)
  no_detect   — loop_radius=0 (detection compute still dispatched, no
                candidates pass the gate)
  no_graph    — keyframe_distance=10^9 (pure segmented tracking)
Rows -> TPU_MEASURES.jsonl name=full_parts/<case>.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from slam_constructor_tpu.models import full, posegraph as pglib, tiny as tinylib
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"full_parts/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def make_engine(kf_distance=0.7, opt_every=8, loop_radius=2.0):
    return full.FullSlamEngine(
        full.FullConfig(
            tracking=tinylib.tiny_config(map_size=256),
            graph=pglib.PoseGraphConfig(
                keyframe_distance=kf_distance, min_index_gap=8,
                max_candidates=4, local_map_size=120,
                loop_radius=loop_radius,
            ),
            optimize_every_loops=opt_every,
        ),
        n_beams=360,
    )


def run_case(name, scans, odom, seg=128, **kw):
    e = make_engine(**kw)
    e.run(scans, odom, segment=seg)  # warmup (module-level caches)
    e2 = make_engine(**kw)
    t0 = time.perf_counter()
    e2.run(scans, odom, segment=seg)
    np.asarray(e2.state.pose)
    dt = time.perf_counter() - t0
    n = int(odom.shape[0])
    emit(name, {"scans_per_sec": round(n / dt, 1), "dt_s": round(dt, 3),
                "keyframes": int(e2.graph.n_kf), "loops": e2.total_loops,
                "segment": seg})
    return n / dt


def main():
    n = int(os.environ.get("N_SCANS", 512))
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=2 * 27.2 / n)
    reps = (n + lap.shape[0] - 1) // lap.shape[0]
    poses = jnp.tile(lap, (reps, 1))[:n]
    bearings = datagen.default_bearings(360)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0),
        odom_noise_xy=0.01, odom_noise_theta=0.005,
    )
    cases = os.environ.get(
        "CASES", "base,seg256,no_close,no_detect,no_graph").split(",")
    if "base" in cases:
        run_case("base", scans, odom)
    if "seg256" in cases:
        run_case("seg256", scans, odom, seg=256)
    if "no_close" in cases:
        run_case("no_close", scans, odom, opt_every=10**9)
    if "no_detect" in cases:
        run_case("no_detect", scans, odom, loop_radius=0.0)
    if "no_graph" in cases:
        run_case("no_graph", scans, odom, kf_distance=1e9)


if __name__ == "__main__":
    main()
