"""r5: loop-DETECTION matcher A/B inside the shipped full preset — BF grid
(shipped default) vs M3RSM branch-and-bound (the knob r4 built and tested
but never measured on chip; r4 verdict Next #4).

full_parts/no_detect said detection costs ~20% of the full pipeline
(204.5 vs 256.7 scans/s); the M3RSM candidate replaces each candidate's
7^3=343-pose BF grid with the level-synchronous bounded frontier. Speed:
same-window interleaved bench shapes. Quality: 5-seed 2-lap (gm_multiseed
convention) for the winner before any default flip.

Rows -> TPU_MEASURES detect_ab/* (speed) and TPU_BENCH_VARIANTS
full_ms_detect_* (quality).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from slam_constructor_tpu.models import full, posegraph as pglib, tiny
from slam_constructor_tpu.ops import m3rsm as m3rsmlib, scoring as scoringlib
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]


def emit_measure(name, extra):
    row = {"name": f"detect_ab/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def emit_variant(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def graph_cfg(kind):
    common = dict(keyframe_distance=0.7, min_index_gap=8, max_candidates=4,
                  local_map_size=120)
    if kind == "bf":
        return pglib.PoseGraphConfig(**common)
    # M3RSM over the 120^2 local map: window=0 full-plane (120 is not
    # 2^levels-aligned; the pyramid pads per level, which is exact), BF
    # envelope-matched half-extents, stride-2 scoring like the BF default
    return pglib.PoseGraphConfig(
        **common, loop_matcher_kind="m3rsm",
        loop_matcher=m3rsmlib.M3RSMConfig(
            levels=4, half_x=0.6, half_y=0.6, half_theta=0.3, n_theta=7,
            refine_iterations=4,
            scoring=scoringlib.ScoringConfig(reducer="overlap", stride=2),
        ),
    )


def mk(kind):
    return full.FullSlamEngine(
        full.FullConfig(tracking=tiny.tiny_config(map_size=256),
                        graph=graph_cfg(kind), optimize_every_loops=8),
        n_beams=360)


def speed():
    n = 512
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=2 * 27.2 / n)
    reps = (n + lap.shape[0] - 1) // lap.shape[0]
    p2 = jnp.tile(lap, (reps, 1))[:n]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, p2, datagen.default_bearings(360),
        jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
    for rep in range(int(os.environ.get("REPS", 2))):
        for kind in ("bf", "m3rsm"):
            e = mk(kind); e.run(scans, odom, segment=512)
            e2 = mk(kind)
            t0 = time.perf_counter()
            e2.run(scans, odom, segment=512)
            np.asarray(e2.state.pose)
            emit_measure(f"{kind}_{rep}", {
                "scans_per_sec": round(n / (time.perf_counter() - t0), 1),
                "loops": e2.total_loops,
            })


def quality():
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    posesq = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(360)
    n = posesq.shape[0]
    for kind in ("bf", "m3rsm"):
        ates, loops = [], []
        for seed in SEEDS:
            scans, odom, gt = datagen.synth_sequence(
                occ, origin, scale, posesq, bearings,
                jax.random.PRNGKey(seed),
                odom_noise_xy=0.01, odom_noise_theta=0.005)
            e = full.FullSlamEngine(
                full.FullConfig(tracking=tiny.tiny_config(map_size=256),
                                graph=graph_cfg(kind),
                                optimize_every_loops=1),
                n_beams=360)
            e.state = e.state.replace(pose=gt[0])
            traj = e.run(scans, odom, segment=n)
            ates.append(round(float(
                evaluate.ate(traj, gt[: traj.shape[0]], align=False)), 4))
            loops.append(int(e.total_loops))
        emit_variant({
            "metric": "full_ate_multiseed",
            "tag": f"full_ms_detect_{kind}",
            "seeds": SEEDS,
            "ate_mean": round(float(np.mean(ates)), 4),
            "ate_max": round(float(np.max(ates)), 4),
            "ate_all": ates, "loops": loops,
            "backend": "device:" + jax.default_backend(),
            "ts": int(time.time()),
        })


if __name__ == "__main__":
    if os.environ.get("MODE", "both") in ("both", "speed"):
        speed()
    if os.environ.get("MODE", "both") in ("both", "quality"):
        quality()
