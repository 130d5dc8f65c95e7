"""Round-2 experiment (CPU): does the RBPF with the improved proposal beat
single-hypothesis tracking under elevated odometry noise, and at which
noise level is the gap reliable across seeds?"""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import engine as eng, gmapping, tiny
from slam_constructor_tpu.ops import matchers, scoring
from slam_constructor_tpu.utils import datagen, evaluate

NOISE = [float(x) for x in os.environ.get("NOISE", "0.02,0.05,0.08").split(",")]
SEEDS = [int(x) for x in os.environ.get("SEEDS", "0,1,2").split(",")]
P = int(os.environ.get("P", 16))

occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=0.3)
bearings = datagen.default_bearings(90)

sc = scoring.ScoringConfig(reducer="overlap", window=1)
mc = matchers.MonteCarloConfig(sigma_xy=0.1, sigma_theta=0.06, batch=24,
                               rounds=8, scoring=sc)

for noise in NOISE:
    for seed in SEEDS:
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, jnp.tile(lap, (2, 1)), bearings, jax.random.PRNGKey(seed),
            odom_noise_xy=noise, odom_noise_theta=noise * 0.6,
        )
        # single-hypothesis: same matcher budget per scan as one particle
        cfg1 = tiny.tiny_config(map_size=192)
        import dataclasses
        cfg1 = dataclasses.replace(cfg1, matcher_cfg=mc)
        e1 = eng.Engine(cfg1)
        e1.state = e1.state.replace(pose=gt[0])
        traj1, _ = e1.run(scans, odom)
        ate1 = float(evaluate.ate(traj1, gt, align=False))

        cfgp = gmapping.GMappingConfig(
            n_particles=P, map_height=192, map_width=192,
            matcher_cfg=mc, proposal=os.environ.get("PROPOSAL", "odom"),
            noise_xy=noise, noise_theta=noise * 0.6,
            resample_threshold=float(os.environ.get("RT", 0.8)),
            weight_gamma=float(os.environ.get("GAMMA", 16.0)),
        )
        stp = gmapping.init_state(cfgp, jax.random.PRNGKey(seed + 100))
        stp = stp.replace(poses=jnp.broadcast_to(gt[0], (P, 3)))
        stf, trajp, _, all_poses, anc = gmapping.run_sequence(cfgp, stp, scans, odom)
        atep = float(evaluate.ate(trajp, gt, align=False))
        win = gmapping.winner_trajectory(all_poses, anc, gmapping.best_particle(stf))
        wate = float(evaluate.ate(win, gt, align=False))
        print(json.dumps({"noise": noise, "seed": seed,
                          "tiny_ate": round(ate1, 3),
                          "rbpf_online": round(atep, 3),
                          "rbpf_winner": round(wate, 3)}), flush=True)
