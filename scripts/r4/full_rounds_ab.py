"""r4: full pipeline with reduced-eval tracking (tiny_rounds finding:
r6b64 tracking runs 1035 vs 556 scans/s at +0.002 ATE; the pose graph
should absorb the tracker's small drift increase). Quality 3 seeds +
same-window interleaved speed. Rows -> TPU_MEASURES full_rounds/*."""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from slam_constructor_tpu.models import full, posegraph as pglib, tiny
from slam_constructor_tpu.utils import datagen, evaluate

def emit(name, extra):
    row = {"name": f"full_rounds/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")

GRAPH = pglib.PoseGraphConfig(keyframe_distance=0.7, min_index_gap=8,
                              max_candidates=4, local_map_size=120)
CASES = {
    "r12b64": dict(mc_rounds=12, mc_batch=64),
    "r8b64": dict(mc_rounds=8, mc_batch=64),
    "r6b64": dict(mc_rounds=6, mc_batch=64),
}

def make(kw, opt_every=8):
    return full.FullSlamEngine(
        full.FullConfig(tracking=tiny.tiny_config(map_size=256, **kw),
                        graph=GRAPH, optimize_every_loops=opt_every),
        n_beams=360)

occ, origin, scale = datagen.cecum_world()

# quality: 2-lap, 3 seeds, 360 beams (opt_every=1 like the quality bench)
lap = datagen.rectangle_trajectory(step=0.3)
posesq = jnp.tile(lap, (2, 1))
for name, kw in CASES.items():
    ates, loops = [], []
    for seed in (42, 7, 19):
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, posesq, datagen.default_bearings(360),
            jax.random.PRNGKey(seed), odom_noise_xy=0.02,
            odom_noise_theta=0.012)
        e = make(kw, opt_every=1)
        e.state = e.state.replace(pose=gt[0])
        traj = e.run(scans, odom, segment=64)
        ates.append(round(float(evaluate.ate(traj, gt[:traj.shape[0]],
                                             align=False)), 4))
        loops.append(e.total_loops)
    emit(f"ate_{name}", {"ates": ates, "mean": round(sum(ates)/3, 4),
                         "loops": loops})

# speed: bench shapes, interleaved
n = 512
lap2 = datagen.rectangle_trajectory(step=2 * 27.2 / n)
reps = (n + lap2.shape[0] - 1) // lap2.shape[0]
p2 = jnp.tile(lap2, (reps, 1))[:n]
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, p2, datagen.default_bearings(360),
    jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
for rep in range(2):
    for name, kw in CASES.items():
        e = make(kw)
        e.run(scans, odom, segment=128)
        e2 = make(kw)
        t0 = time.perf_counter()
        e2.run(scans, odom, segment=128)
        np.asarray(e2.state.pose)
        dt = time.perf_counter() - t0
        emit(f"speed_{name}_{rep}", {"scans_per_sec": round(n / dt, 1),
                                     "loops": e2.total_loops})
