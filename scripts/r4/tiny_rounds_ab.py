"""r4: is the single-hypothesis tracker latency-bound on its 12 serial MC
rounds? Quality (3 seeds, 2-lap, 360 beams) + same-window speed for
rounds x batch at constant(ish) eval budget:
  r12b64 (default, 768 evals) | r6b128 (768) | r8b96 (768) | r6b64 (384)
Rows -> TPU_MEASURES.jsonl name=tiny_rounds/<case>."""
import json, os, sys, time
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
import jax, jax.numpy as jnp, numpy as np
from slam_constructor_tpu.models import engine as eng, tiny
from slam_constructor_tpu.utils import datagen, evaluate

def emit(name, extra):
    row = {"name": f"tiny_rounds/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")

occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=0.3)
poses = jnp.tile(lap, (2, 1))
bearings = datagen.default_bearings(360)

CASES = {
    "r12b64": dict(mc_rounds=12, mc_batch=64),
    "r8b96": dict(mc_rounds=8, mc_batch=96),
    "r6b128": dict(mc_rounds=6, mc_batch=128),
    "r6b64": dict(mc_rounds=6, mc_batch=64),
}

# quality: 3 seeds each
for name, kw in CASES.items():
    ates = []
    for seed in (42, 7, 19):
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, poses, bearings, jax.random.PRNGKey(seed),
            odom_noise_xy=0.02, odom_noise_theta=0.012)
        cfg = tiny.tiny_config(map_size=256, **kw)
        st = eng.init_state(cfg, key=jax.random.PRNGKey(seed + 1))
        st = st.replace(pose=gt[0])
        st, traj, _ = eng.run_sequence(cfg, st, scans, odom)
        ates.append(round(float(evaluate.ate(traj, gt, align=False)), 4))
    emit(f"ate_{name}", {"ates": ates, "mean": round(sum(ates)/3, 4)})

# speed: interleaved wall benches (512-scan device-resident), 2 reps
n = 512
lap2 = datagen.rectangle_trajectory(step=9.6 / n * 2)
reps = (n + lap2.shape[0] - 1) // lap2.shape[0]
p2 = jnp.tile(lap2, (reps, 1))[:n]
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, p2, bearings, jax.random.PRNGKey(0),
    odom_noise_xy=0.01, odom_noise_theta=0.005)
for rep in range(2):
    for name, kw in CASES.items():
        cfg = tiny.tiny_config(map_size=256, **kw)
        st = eng.init_state(cfg)
        st0 = jax.tree.map(lambda a: a.copy(), st)
        out = eng.run_sequence(cfg, st, scans, odom)
        np.asarray(out[1])
        t0 = time.perf_counter()
        out = eng.run_sequence(cfg, st0, scans, odom)
        np.asarray(out[1])
        dt = time.perf_counter() - t0
        emit(f"speed_{name}_{rep}", {"scans_per_sec": round(n / dt, 1)})
