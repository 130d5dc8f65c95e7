"""Same-window A/B: run_segments (unfused, ~7 dispatches+2 syncs/segment)
vs run_segments_fused (1 dispatch + 1 fetch/segment) on the bench's 2-lap
512-scan sequence. Rows -> TPU_MEASURES.jsonl name=full_ab/<case>."""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from slam_constructor_tpu.models import full, posegraph as pglib, tiny as tinylib
from slam_constructor_tpu.utils import datagen

def emit(name, extra):
    row = {"name": f"full_ab/{name}", "ts": time.time(), "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")

def make():
    return full.FullSlamEngine(
        full.FullConfig(
            tracking=tinylib.tiny_config(map_size=256),
            graph=pglib.PoseGraphConfig(keyframe_distance=0.7, min_index_gap=8,
                                        max_candidates=4, local_map_size=120),
            optimize_every_loops=8),
        n_beams=360)

n = 512
occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=2*27.2/n)
reps = (n + lap.shape[0]-1)//lap.shape[0]
poses = jnp.tile(lap, (reps,1))[:n]
bearings = datagen.default_bearings(360)
scans, odom, gt = datagen.synth_sequence(occ, origin, scale, poses, bearings,
    jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)

for rep in range(2):  # interleave to see window drift
    for name in ("fused", "unfused"):
        e = make()
        runner = e.run_segments_fused if name == "fused" else e.run_segments
        runner(scans, odom, segment=128)  # warm (module caches shared)
        e2 = make()
        runner2 = e2.run_segments_fused if name == "fused" else e2.run_segments
        t0 = time.perf_counter()
        runner2(scans, odom, segment=128)
        np.asarray(e2.state.pose)
        dt = time.perf_counter() - t0
        emit(f"{name}_{rep}", {"scans_per_sec": round(n/dt, 1),
                               "loops": e2.total_loops, "kf": int(e2.graph.n_kf)})
