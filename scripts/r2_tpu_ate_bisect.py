"""Round-2 experiment: which TPU 'auto' impl choice degrades default
gmapping ATE (2.49 m on TPU vs 0.156 m on CPU)? Toggle score impl /
scatter impl / free impl / reducer one at a time."""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, raycast, scoring
from slam_constructor_tpu.utils import datagen, evaluate

if os.environ.get("CPU"):
    jax.config.update("jax_platforms", "cpu")

occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=0.3)
poses = jnp.tile(lap, (2, 1))
bearings = datagen.default_bearings(120)
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
    odom_noise_xy=0.02, odom_noise_theta=0.012,
)
n = int(odom.shape[0])


def run(tag, score_impl="auto", scatter_impl="auto", free_impl="dda",
        reducer="obstacle", window=1):
    sc = scoring.ScoringConfig(reducer=reducer, window=window, impl=score_impl)
    cfg = gmapping.GMappingConfig(
        n_particles=30, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6, scoring=sc),
        beam=raycast.BeamConfig(scatter_impl=scatter_impl, free_impl=free_impl),
    )
    e = gmapping.GMappingEngine(cfg)
    e.state = e.state.replace(poses=jnp.broadcast_to(gt[0], (30, 3)))
    traj, _ = e.run(scans, odom)
    np.asarray(traj)
    ate = float(evaluate.ate(traj, gt, align=False))
    print(json.dumps({"tag": tag, "ate_m": round(ate, 4)}), flush=True)


which = os.environ.get("ONLY", "").split(",")
cases = {
    "auto": dict(),
    "score_gather": dict(score_impl="gather"),
    "scatter_exact": dict(scatter_impl="scatter"),
    "free_polar": dict(free_impl="polar"),
    "overlap": dict(reducer="overlap"),
}
for tag, kw in cases.items():
    if which != [""] and tag not in which:
        continue
    run(tag, **kw)
