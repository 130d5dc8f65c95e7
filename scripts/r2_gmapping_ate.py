import dataclasses
"""Round-2 experiment: ATE of the optimized gmapping config vs default on
the 2-lap cecum bench (same data as bench_ate.py)."""
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

sc_fast = scoring.ScoringConfig(reducer="overlap", window=1, dtype="bfloat16")
variants = {
    "default_p30": gmapping.GMappingConfig(
        n_particles=30, map_height=256, map_width=256),
    "opt_p30": gmapping.GMappingConfig(
        n_particles=30, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
            scoring=sc_fast),
        match_window=96, insert_window=96,
        beam=raycast.BeamConfig(max_range=4.0)),
    "opt_p30_mr55": gmapping.GMappingConfig(
        n_particles=30, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
            scoring=sc_fast),
        match_window=128, insert_window=128,
        beam=raycast.BeamConfig(max_range=5.5)),
}
variants["imp_p30"] = gmapping.GMappingConfig(
    n_particles=30, map_height=256, map_width=256,
    matcher_cfg=matchers.MonteCarloConfig(
        sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
        scoring=sc_fast),
    match_window=96, insert_window=96,
    beam=raycast.BeamConfig(max_range=4.0),
    proposal="improved")
variants["imp_p30_obs"] = dataclasses.replace(
    variants["imp_p30"],
    matcher_cfg=dataclasses.replace(
        variants["imp_p30"].matcher_cfg,
        scoring=dataclasses.replace(sc_fast, reducer="obstacle")))
variants["imp_p30_full"] = gmapping.GMappingConfig(
    n_particles=30, map_height=256, map_width=256, proposal="improved")

only = os.environ.get("ONLY")
for tag, cfg in variants.items():
    if only and tag not in only.split(","):
        continue
    e = gmapping.GMappingEngine(cfg)
    p = cfg.n_particles
    e.state = e.state.replace(poses=jnp.broadcast_to(gt[0], (p, 3)))
    t0 = time.perf_counter()
    traj, _ = e.run(scans, odom)
    np.asarray(traj)
    dt = time.perf_counter() - t0
    ate = float(evaluate.ate(traj, gt, align=False))
    rpe_t, rpe_r = evaluate.rpe(traj, gt)
    print(json.dumps({
        "tag": tag, "ate_m": round(ate, 4), "rpe_t_m": round(float(rpe_t), 4),
        "scans_per_sec": round(n / dt, 1), "vs_baseline": round(n / dt / 40, 2),
    }), flush=True)
