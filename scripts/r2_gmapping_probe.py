"""Round-2 experiment: where does the GMapping RBPF step spend its time,
and what do window/bf16/stride knobs buy on the real chip?

Writes JSON lines to stdout; run under timeout.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, scoring
from slam_constructor_tpu.utils import datagen

N_SCANS = int(os.environ.get("N_SCANS", 128))
N_BEAMS = 360
MAP = 256


def sync(x):
    jax.block_until_ready(x)
    np.asarray(x)


def make_data():
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / N_SCANS * 2)
    reps = (N_SCANS + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:N_SCANS]
    bearings = datagen.default_bearings(N_BEAMS)
    return datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0),
        odom_noise_xy=0.01, odom_noise_theta=0.005,
    )


def bench(tag, cfg, scans, odom):
    state = gmapping.init_state(cfg)
    state0 = jax.tree.map(lambda a: a.copy(), state)
    t0 = time.perf_counter()
    out = gmapping.run_sequence(cfg, state, scans, odom)
    sync(out[1])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = gmapping.run_sequence(cfg, state0, scans, odom)
    sync(out[1])
    dt = time.perf_counter() - t0
    sps = N_SCANS / dt
    print(json.dumps({
        "tag": tag, "scans_per_sec": round(sps, 1),
        "vs_baseline": round(sps / 40.0, 2), "compile_s": round(compile_s, 1),
        "ms_per_scan": round(1e3 * dt / N_SCANS, 2),
    }), flush=True)
    return out


def main():
    scans, odom, gt = make_data()
    variants = os.environ.get("VARIANTS", "base,w128,w128_bf16,w96_bf16").split(",")
    for tag in variants:
        window = 0
        dtype = "float32"
        stride = 1
        rounds, batch = 6, 16
        if tag.startswith("w"):
            parts = tag.split("_")
            window = int(parts[0][1:])
            if "bf16" in parts:
                dtype = "bfloat16"
            if "s2" in parts:
                stride = 2
        elif "bf16" in tag:
            dtype = "bfloat16"
        if "r3b32" in tag:
            rounds, batch = 3, 32
        sc = scoring.ScoringConfig(reducer="overlap", window=1, dtype=dtype, stride=stride)
        cfg = gmapping.GMappingConfig(
            n_particles=30, map_height=MAP, map_width=MAP,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=batch, rounds=rounds,
                scoring=sc,
            ),
            match_window=window,
        )
        out = bench(tag, cfg, scans, odom)
        # quick quality check: final-pose error vs ground truth
        traj = np.asarray(out[1])
        err = np.hypot(*(traj[:, :2] - np.asarray(gt)[:, :2]).T)
        print(json.dumps({"tag": tag, "mean_xy_err_m": round(float(err.mean()), 4),
                          "max_xy_err_m": round(float(err.max()), 4)}), flush=True)


if __name__ == "__main__":
    main()
