"""Multi-seed 2-lap quality for the round-3 candidate operating points.

The 2-lap winner-ATE bench is fp-knife-edge sensitive (CLAUDE.md): the
same config measured 0.108 (r2) and 0.196 (r3) after a numerics-only
change. Single-seed ATE therefore can't rank candidates — run S seeds
(different odom-noise realizations AND different filter keys) and report
mean/max/min. Rows -> TPU_BENCH_VARIANTS.jsonl tag gmapping_ms_<name>.
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import gm_op_point  # noqa: E402
from slam_constructor_tpu.models import gmapping  # noqa: E402
from slam_constructor_tpu.utils import datagen, evaluate  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]


def emit(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    vs = gm_op_point.variants()
    which = os.environ.get("ABL", "base,mw128,mw128_r4_s2,imp_g8").split(",")
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    poses = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(int(os.environ.get("BEAMS", 120)))
    for name in which:
        cfg = vs[name]
        onls, wins, wmeans = [], [], []
        for seed in SEEDS:
            scans, odom, gt = datagen.synth_sequence(
                occ, origin, scale, poses, bearings, jax.random.PRNGKey(seed),
                odom_noise_xy=0.02, odom_noise_theta=0.012)
            st = gmapping.init_state(cfg, jax.random.PRNGKey(seed + 1)).replace(
                poses=jnp.broadcast_to(gt[0], (cfg.n_particles, 3)))
            stf, traj, _, all_poses, anc = gmapping.run_sequence(
                cfg, st, scans, odom)
            onls.append(float(evaluate.ate(traj, gt, align=False)))
            win = gmapping.winner_trajectory(
                all_poses, anc, gmapping.best_particle(stf))
            wins.append(float(evaluate.ate(win, gt, align=False)))
            wm = gmapping.weighted_mean_trajectory(
                all_poses, anc, stf.log_weights)
            wmeans.append(float(evaluate.ate(wm, gt, align=False)))
        emit({"metric": "gmapping_ate_multiseed",
              "tag": f"gmapping_ms_{name}" + ("" if os.environ.get("BEAMS", "120") == "120" else f"_b{os.environ['BEAMS']}"),
              "seeds": SEEDS,
              "winner_ate_mean": round(float(np.mean(wins)), 4),
              "winner_ate_max": round(float(np.max(wins)), 4),
              "winner_ate_all": [round(w, 4) for w in wins],
              "wmean_ate_mean": round(float(np.mean(wmeans)), 4),
              "wmean_ate_max": round(float(np.max(wmeans)), 4),
              "wmean_ate_all": [round(w, 4) for w in wmeans],
              "online_ate_mean": round(float(np.mean(onls)), 4),
              "backend": "device:" + jax.default_backend(),
              "ts": int(time.time())})


if __name__ == "__main__":
    main()
