"""Round-2 experiment: per-component timing of the GMapping RBPF step.

Methodology: each component is iterated T times inside ONE jitted
lax.scan (device-resident, outputs feeding inputs so nothing is dead-code
eliminated), and only a scalar leaves the device — the axon tunnel's
per-call/transfer latency (~30 ms) would otherwise swamp the measurement.
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
from slam_constructor_tpu.ops import matchers, raycast, resample, scoring
from slam_constructor_tpu.utils import datagen

T = int(os.environ.get("T", 32))


def timeit(tag, f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    float(np.asarray(out))
    dt = (time.perf_counter() - t0) / T
    print(json.dumps({"part": tag, "ms_per_iter": round(dt * 1e3, 3)}), flush=True)
    return dt


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)

    window = int(os.environ.get("WINDOW", 0))
    sc = scoring.ScoringConfig(reducer="overlap", window=1)
    cfg = gmapping.GMappingConfig(
        n_particles=30, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6, scoring=sc,
        ),
        match_window=window,
    )
    state = gmapping.init_state(cfg)
    p = cfg.n_particles
    priors0 = jnp.broadcast_to(pose0, (p, 3)) + 0.0
    _, match_fn = matchers.MATCHERS[cfg.matcher]

    @jax.jit
    def loop_match(gm, priors):
        def body(pr, key_t):
            keys = jax.random.split(key_t, p)
            def one(gm_p, prior_p, key_p):
                view = scoring.MapView.of(gm_p, cfg.cell_model)
                if cfg.match_window:
                    view = scoring.window_view(view, prior_p[:2], cfg.match_window)
                res = match_fn(view, scan, prior_p, key_p, cfg.matcher_cfg, None)
                return res.pose, res.prob
            poses, probs = jax.vmap(one)(gm, pr, keys)
            return poses * 0.999 + pr * 0.001, probs.sum()
        keys = jax.random.split(jax.random.PRNGKey(0), T)
        pr, s = jax.lax.scan(body, priors, keys)
        return s.sum() + pr.sum()

    @jax.jit
    def loop_insert(gm, poses):
        def body(g, _):
            g = jax.vmap(
                lambda gp, q: raycast.insert_scan(gp, cfg.cell_model, q, scan, cfg.beam)
            )(g, poses)
            return g, None
        g, _ = jax.lax.scan(body, gm, None, length=T)
        return g.cells.sum()

    @jax.jit
    def loop_resample(gm, logw):
        def body(carry, key_t):
            g, lw = carry
            idx, lw, _ = resample.maybe_resample(key_t, lw * 0.99 - 0.01, 1.1)
            g = jax.tree.map(lambda a: a[idx], g)
            return (g, lw), None
        keys = jax.random.split(jax.random.PRNGKey(1), T)
        (g, lw), _ = jax.lax.scan(body, (gm, logw), keys)
        return g.cells.sum() + lw.sum()

    @jax.jit
    def loop_step(st):
        def body(s, key_t):
            s2, _ = gmapping.gmapping_step(cfg, s, scan, jnp.zeros(3))
            return s2, None
        keys = jax.random.split(jax.random.PRNGKey(2), T)
        s, _ = jax.lax.scan(body, st, keys)
        return s.poses.sum()

    @jax.jit
    def loop_polar(gm, poses):
        def body(acc, _):
            pl = jax.vmap(
                lambda g, q: raycast._polar_free_plane(
                    256, 256, g.origin, g.scale, q, scan, cfg.beam)
            )(gm, poses)
            return acc + pl.sum() * 1e-6, None
        a, _ = jax.lax.scan(body, jnp.float32(0), None, length=T)
        return a

    @jax.jit
    def loop_endpoint(gm, poses):
        from slam_constructor_tpu.ops import grid as gridlib
        def body(acc, _):
            def one(g, q):
                angles = q[2] + scan.bearings
                dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
                endpoints = q[:2] + scan.ranges[:, None] * dirs
                eidx = gridlib.world_to_cell(g, endpoints)
                ones = jnp.ones(eidx.shape[:1])
                return raycast._flat_scatter_add(
                    (256, 256), eidx[..., 0], eidx[..., 1], ones, scan.valid,
                    cfg.beam.scatter_impl)
            pl = jax.vmap(one)(gm, poses)
            return acc + pl.sum() * 1e-6, None
        a, _ = jax.lax.scan(body, jnp.float32(0), None, length=T)
        return a

    @jax.jit
    def loop_cellfold(gm):
        from slam_constructor_tpu.ops import grid as gridlib
        def body(g, _):
            w = jnp.ones((p, 256, 256)) * 0.01
            s = jnp.ones((p, 256, 256)) * 0.005
            g = jax.vmap(lambda gp, wp, sp: gridlib.apply_observations(
                gp, cfg.cell_model, wp, sp))(g, w, s)
            return g, None
        g, _ = jax.lax.scan(body, gm, None, length=T)
        return g.cells.sum()

    timeit("full_step", loop_step, state)
    timeit("match(6r)", loop_match, state.gm, priors0)
    timeit("insert", loop_insert, state.gm, priors0)
    timeit("insert/polar_free", loop_polar, state.gm, priors0)
    timeit("insert/endpoint_scatter", loop_endpoint, state.gm, priors0)
    timeit("insert/cell_fold", loop_cellfold, state.gm)
    timeit("resample_gather", loop_resample, state.gm, state.log_weights)


if __name__ == "__main__":
    main()
