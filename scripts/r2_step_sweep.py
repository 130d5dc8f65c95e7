"""Round-2 experiment: full RBPF step cost with the optimization knobs."""
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
from slam_constructor_tpu.utils import datagen

T = 32
P = int(os.environ.get("P", 30))


def timeit(tag, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = f(*args)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / T
    sps = 1.0 / dt
    print(json.dumps({"part": tag, "ms_per_iter": round(dt * 1e3, 3),
                      "scans_per_sec": round(sps, 1),
                      "vs_baseline": round(sps / 40.0, 2)}), flush=True)


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)

    def make_loop(cfg):
        state = gmapping.init_state(cfg)
        state = state.replace(poses=jnp.broadcast_to(pose0, (P, 3)) + 0.0)

        @jax.jit
        def loop(st):
            def body(s, key_t):
                s2, _ = gmapping.gmapping_step(cfg, s, scan, jnp.zeros(3))
                return s2, None
            keys = jax.random.split(jax.random.PRNGKey(2), T)
            s, _ = jax.lax.scan(body, st, keys)
            return s.poses.sum()
        return loop, state

    sc_base = scoring.ScoringConfig(reducer="overlap", window=1)
    sc_fast = scoring.ScoringConfig(reducer="overlap", window=1, dtype="bfloat16")
    variants = {
        "base": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6,
                scoring=sc_base)),
        "opt": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6,
                scoring=sc_fast),
            match_window=96, insert_window=128,
            beam=raycast.BeamConfig(max_range=5.5)),
        "opt_r4b22": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=22, rounds=4,
                scoring=sc_fast),
            match_window=96, insert_window=128,
            beam=raycast.BeamConfig(max_range=5.5)),
        "opt_r5b16": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
                scoring=sc_fast),
            match_window=96, insert_window=128,
            beam=raycast.BeamConfig(max_range=5.5)),
        "opt_iw96": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6,
                scoring=sc_fast),
            match_window=96, insert_window=96,
            beam=raycast.BeamConfig(max_range=4.0)),
        "opt_r5b16_iw96": gmapping.GMappingConfig(
            n_particles=P, map_height=256, map_width=256,
            matcher_cfg=matchers.MonteCarloConfig(
                sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
                scoring=sc_fast),
            match_window=96, insert_window=96,
            beam=raycast.BeamConfig(max_range=4.0)),
    }
    only = os.environ.get("ONLY")
    for tag, cfg in variants.items():
        if only and tag not in only.split(","):
            continue
        loop, state = make_loop(cfg)
        timeit(tag, loop, state)


if __name__ == "__main__":
    main()
