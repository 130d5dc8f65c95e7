"""r5: phase-timed engine run — where do 3 wall seconds go when the
device program is 988 ms and the tunnel event is ~30 ms?

Times every host-side phase of ONE warm run_segments_fused call
(segment = whole sequence): odometry fetch, capacity bookkeeping, the
dispatch call (async — returns as soon as the program is enqueued),
the drain fetch (waits for compute), corrected_trajectory build, and a
final pose fetch. Rows -> TPU_MEASURES seg_phase/*.
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
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_phase/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


n = 512
occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=2 * 27.2 / n)
reps = (n + lap.shape[0] - 1) // lap.shape[0]
p2 = jnp.tile(lap, (reps, 1))[:n]
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, p2, datagen.default_bearings(360),
    jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
cfg_t = tiny.tiny_config(map_size=256)


def mk(kf):
    g = pglib.PoseGraphConfig(keyframe_distance=kf, min_index_gap=8,
                              max_candidates=4, local_map_size=120)
    return full.FullSlamEngine(
        full.FullConfig(tracking=cfg_t, graph=g, optimize_every_loops=8),
        n_beams=360)


def phase_run(kf, tag):
    e = mk(kf)
    e.run(scans, odom, segment=512)  # warmup/compile
    e2 = mk(kf)
    t = {}
    t0 = time.perf_counter()

    od_all = np.asarray(odom)
    t["od_fetch"] = time.perf_counter()

    g = e2.cfg.graph
    od_np = od_all
    seg_dist = float(np.linalg.norm(od_np[:, :2], axis=1).sum()
                     + g.keyframe_angle_weight * np.abs(od_np[:, 2]).sum())
    kf_bound = min(n, int(2.0 * seg_dist / g.keyframe_distance) + 8)
    e2._ensure_capacity(kf_bound)
    t["capacity"] = time.perf_counter()

    (e2.state, e2._last_kf_dev, e2._anchor_pose_dev, e2.graph, gp, packed
     ) = full._segment_fused_fn(
        e2.cfg.tracking, e2.cfg.graph, e2.cfg.densify_rounds,
        e2.cfg.optimize_every_loops, n, e2.cfg.kf_batch,
        e2.cfg.burst_reexpress,
        e2.state, e2._last_kf_dev, e2._anchor_pose_dev, e2.graph,
        jnp.int32(0), scans, odom, np.int32(0))
    t["dispatch"] = time.perf_counter()

    allp = np.asarray(packed)
    t["drain_fetch"] = time.perf_counter()

    e2.trajectory.extend(allp[:n, :3])
    e2._anchors.extend((int(allp[i, 4]), allp[i, 5:8]) for i in range(n))
    t["host_fold"] = time.perf_counter()

    traj = e2.corrected_trajectory()
    t["traj_build"] = time.perf_counter()

    np.asarray(traj)
    t["traj_fetch"] = time.perf_counter()

    out = {"total_s": round(t["traj_fetch"] - t0, 3)}
    prev = t0
    for k, v in t.items():
        out[k + "_ms"] = round((v - prev) * 1e3, 1)
        prev = v
    out["loops"] = int(allp[n, 0])
    emit(tag, out)


for rep in range(int(os.environ.get("REPS", 2))):
    phase_run(1e9, f"nograph_{rep}")
    phase_run(0.7, f"full_{rep}")
