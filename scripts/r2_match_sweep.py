"""Round-2 experiment: RBPF per-step match cost sweep (device-resident)."""
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
P = 30


def timeit(tag, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = f(*args)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / T
    print(json.dumps({"part": tag, "ms_per_iter": round(dt * 1e3, 3)}), flush=True)


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    cfg0 = gmapping.GMappingConfig(n_particles=P, map_height=256, map_width=256)
    state = gmapping.init_state(cfg0)
    priors0 = jnp.broadcast_to(pose0, (P, 3)) + 0.0

    def make_loop(window, dtype, rounds, batch, reducer, stride):
        sc = scoring.ScoringConfig(reducer=reducer, window=1, dtype=dtype,
                                   stride=stride)
        mc = matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=batch, rounds=rounds,
            scoring=sc)

        @jax.jit
        def loop(gm, priors):
            def body(pr, key_t):
                keys = jax.random.split(key_t, P)
                def one(gm_p, prior_p, key_p):
                    view = scoring.MapView.of(gm_p, cfg0.cell_model)
                    if window:
                        view = scoring.window_view(view, prior_p[:2], window)
                    res = matchers.monte_carlo_match(
                        view, scan, prior_p, key_p, mc, None)
                    return res.pose, res.prob
                poses, probs = jax.vmap(one)(gm, pr, keys)
                return poses * 0.999 + pr * 0.001, probs.sum()
            keys = jax.random.split(jax.random.PRNGKey(0), T)
            pr, s = jax.lax.scan(body, priors, keys)
            return s.sum() + pr.sum()
        return loop

    grids = [
        ("w0_f32_r6b16_ovl", 0, "float32", 6, 16, "overlap", 1),
        ("w128_f32_r6b16_ovl", 128, "float32", 6, 16, "overlap", 1),
        ("w96_bf16_r6b16_ovl", 96, "bfloat16", 6, 16, "overlap", 1),
        ("w64_bf16_r6b16_ovl", 64, "bfloat16", 6, 16, "overlap", 1),
        ("w96_bf16_r3b32_ovl", 96, "bfloat16", 3, 32, "overlap", 1),
        ("w96_bf16_r6b16_obs", 96, "bfloat16", 6, 16, "obstacle", 1),
        ("w96_bf16_r6b16_ovl_s2", 96, "bfloat16", 6, 16, "overlap", 2),
        ("w96_f32_r6b16_ovl", 96, "float32", 6, 16, "overlap", 1),
    ]
    for tag, w, d, r, b, red, s in grids:
        timeit(tag, make_loop(w, d, r, b, red, s), state.gm, priors0)


if __name__ == "__main__":
    main()
