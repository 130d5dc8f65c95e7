"""Round-2 experiment: RBPF concentration tuning (resample threshold,
weight gamma, proposal) on the 2-lap TPU-data bench."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, raycast, scoring
from slam_constructor_tpu.ops.scan import LaserScan
from slam_constructor_tpu.utils import evaluate

if os.environ.get("CPU"):
    jax.config.update("jax_platforms", "cpu")

d = np.load('/tmp/tpu_data.npz')
scans = LaserScan(ranges=jnp.asarray(d['ranges']), bearings=jnp.asarray(d['bearings']),
                  valid=jnp.asarray(d['valid']))
odom, gt = jnp.asarray(d['odom']), jnp.asarray(d['gt'])
sc_fast = scoring.ScoringConfig(reducer="overlap", window=1, dtype="bfloat16")


def run(tag, proposal, thresh, gamma, extra=None):
    kw = dict(
        n_particles=30, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
            scoring=sc_fast),
        match_window=96, insert_window=96,
        beam=raycast.BeamConfig(max_range=4.0),
        proposal=proposal, resample_threshold=thresh, weight_gamma=gamma,
    )
    kw.update(extra or {})
    cfg = gmapping.GMappingConfig(**kw)
    st = gmapping.init_state(cfg).replace(poses=jnp.broadcast_to(gt[0], (30, 3)))
    _, traj, neffs, _, _ = gmapping.run_sequence(cfg, st, scans, odom)
    traj = np.asarray(traj)
    err = np.hypot(*(traj[:, :2] - np.asarray(gt[:, :2])).T)
    print(json.dumps({
        "tag": tag, "ate": round(float(evaluate.ate(jnp.asarray(traj), gt, align=False)), 3),
        "p95_err": round(float(np.percentile(err, 95)), 3),
        "max_err": round(float(err.max()), 3),
        "mean_neff": round(float(np.asarray(neffs).mean()), 1),
    }), flush=True)


CASES = {
    "odom_t05_g8":  ("odom", 0.5, 8.0, None),
    "odom_t08_g8":  ("odom", 0.8, 8.0, None),
    "odom_t08_g16": ("odom", 0.8, 16.0, None),
    "odom_t095_g16": ("odom", 0.95, 16.0, None),
    "imp_t08_g8":   ("improved", 0.8, 8.0, None),
    "imp_t08_g16":  ("improved", 0.8, 16.0, None),
    "imp_t095_g16": ("improved", 0.95, 16.0, None),
    "imp_t095_g8": ("improved", 0.95, 8.0, None),
    # usable-range / window effect at fixed good resampling
    "imp_t08_g16_mr55": ("improved", 0.8, 16.0, dict(
        match_window=128, insert_window=128,
        beam=raycast.BeamConfig(max_range=5.5))),
    "imp_t095_g16_mr55": ("improved", 0.95, 16.0, dict(
        match_window=128, insert_window=128,
        beam=raycast.BeamConfig(max_range=5.5))),
    "odom_t08_g16_mr55": ("odom", 0.8, 16.0, dict(
        match_window=128, insert_window=128,
        beam=raycast.BeamConfig(max_range=5.5))),
    "imp_t095_g16_mrfull": ("improved", 0.95, 16.0, dict(
        match_window=0, insert_window=0,
        beam=raycast.BeamConfig(max_range=15.0))),
}
only = os.environ.get("ONLY")
for tag, (pr, th, g, ex) in CASES.items():
    if only and tag not in only.split(","):
        continue
    run(tag, pr, th, g, ex)
