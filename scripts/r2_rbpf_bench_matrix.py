"""Round-2 experiment: RBPF config matrix on the bench_ate 2-lap sequence
(CPU), reporting online (per-step best particle) and genealogy-winner ATE."""
import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, scoring
from slam_constructor_tpu.utils import datagen, evaluate

occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=0.3)
poses = jnp.tile(lap, (2, 1))
bearings = datagen.default_bearings(120)
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
    odom_noise_xy=0.02, odom_noise_theta=0.012,
)

sc = scoring.ScoringConfig(reducer="overlap", window=1)


def run(tag, **kw):
    kw.setdefault("n_particles", 16)
    kw.setdefault("map_height", 256)
    kw.setdefault("map_width", 256)
    cfg = gmapping.GMappingConfig(**kw)
    p = cfg.n_particles
    st = gmapping.init_state(cfg).replace(poses=jnp.broadcast_to(gt[0], (p, 3)))
    stf, traj, neffs, all_poses, anc = gmapping.run_sequence(cfg, st, scans, odom)
    online = float(evaluate.ate(traj, gt, align=False))
    win = gmapping.winner_trajectory(all_poses, anc, gmapping.best_particle(stf))
    wate = float(evaluate.ate(win, gt, align=False))
    print(json.dumps({"tag": tag, "online_ate": round(online, 3),
                      "winner_ate": round(wate, 3),
                      "mean_neff": round(float(np.asarray(neffs).mean()), 1)}),
          flush=True)


mc_strong = matchers.MonteCarloConfig(sigma_xy=0.08, sigma_theta=0.04,
                                      batch=24, rounds=8, scoring=sc)
sc_obs = scoring.ScoringConfig(reducer="obstacle", window=1)
mc_obs_strong = matchers.MonteCarloConfig(sigma_xy=0.08, sigma_theta=0.04,
                                          batch=24, rounds=8, scoring=sc_obs)
mc_base = matchers.MonteCarloConfig(sigma_xy=0.08, sigma_theta=0.04,
                                    batch=16, rounds=6, scoring=sc)

CASES = {
    "default_p16": dict(),
    "ovl_p16": dict(matcher_cfg=mc_base),
    "ovl_strong_p16": dict(matcher_cfg=mc_strong),
    "imp_t05_g8": dict(matcher_cfg=mc_base, proposal="improved",
                       resample_threshold=0.5, weight_gamma=8.0),
    "imp_t05_g16": dict(matcher_cfg=mc_base, proposal="improved",
                        resample_threshold=0.5, weight_gamma=16.0),
    "imp_t08_g16": dict(matcher_cfg=mc_base, proposal="improved",
                        resample_threshold=0.8, weight_gamma=16.0),
    "imp_strong_t05_g16": dict(matcher_cfg=mc_strong, proposal="improved",
                               resample_threshold=0.5, weight_gamma=16.0),
    "obs_strong_p16": dict(matcher_cfg=mc_obs_strong),
    "ovl_strong_p24": dict(matcher_cfg=mc_strong, n_particles=24),
    "imp_strong_t08_g16_p24": dict(matcher_cfg=mc_strong, proposal="improved",
                                   resample_threshold=0.8, weight_gamma=16.0,
                                   n_particles=24),
}
only = os.environ.get("ONLY")
for tag, kw in CASES.items():
    if only and tag not in only.split(","):
        continue
    run(tag, **kw)
