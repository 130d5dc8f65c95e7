"""Headline benchmark: SLAM throughput (scans/sec) on real hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N/40}

Baseline semantics: the reference (single-core C++ ROS node) publishes no
scans/sec figure but runs real-time against rosbag playback at sensor rate
(~40 Hz, BASELINE.md). vs_baseline therefore reports multiples of 40
scans/s; the binding target is >= 10x (vs_baseline >= 10).

Workload (tinySLAM preset, BASELINE config[0] shape): 360-beam scans, 256^2
map at 0.1 m/cell, Monte-Carlo matcher (64 candidates x 12 rounds => 768
score evaluations/scan) + full map insertion per scan, whole sequence
device-resident via lax.scan. Synthetic cecum-corridor data (datasets are
unreachable offline — SURVEY.md §6).

Env knobs: SLAM_BENCH_SCANS (default 256), SLAM_BENCH_BEAMS (360),
SLAM_BENCH_MAP (256), SLAM_BENCH_PRESET (tiny|viny|gmapping).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    n_scans = int(os.environ.get("SLAM_BENCH_SCANS", 256))
    n_beams = int(os.environ.get("SLAM_BENCH_BEAMS", 360))
    map_size = int(os.environ.get("SLAM_BENCH_MAP", 256))
    preset = os.environ.get("SLAM_BENCH_PRESET", "tiny")

    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.models import gmapping, tiny, viny
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / n_scans * 2)
    # tile the loop to n_scans steps
    reps = (n_scans + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:n_scans]
    bearings = datagen.default_bearings(n_beams)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0),
        odom_noise_xy=0.01, odom_noise_theta=0.005,
    )

    if preset == "gmapping":
        cfg = gmapping.GMappingConfig(
            n_particles=30, map_height=map_size, map_width=map_size
        )
        state = gmapping.init_state(cfg)
        run = lambda s: gmapping.run_sequence(cfg, s, scans, odom)
        metric = "gmapping_scans_per_sec"
    else:
        mk = viny.viny_config if preset == "viny" else tiny.tiny_config
        cfg = mk(map_size=map_size)
        state = eng.init_state(cfg)
        run = lambda s: eng.run_sequence(cfg, s, scans, odom)
        metric = f"{preset}_scans_per_sec"

    import numpy as np

    def sync(x):
        # axon PJRT's block_until_ready returns before execution completes;
        # a host fetch is the only reliable completion barrier
        jax.block_until_ready(x)
        np.asarray(x)

    # warmup/compile (run_sequence donates state; keep a pristine copy)
    state0 = jax.tree.map(lambda a: a.copy(), state)
    out = run(state)
    sync(out[1])

    t0 = time.perf_counter()
    out = run(state0)
    sync(out[1])
    dt = time.perf_counter() - t0

    sps = n_scans / dt
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sps, 2),
                "unit": "scans/s",
                "vs_baseline": round(sps / 40.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
