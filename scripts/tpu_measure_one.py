"""Capture ONE small TPU measurement and append it to TPU_MEASURES.jsonl.

The axon tunnel dies unpredictably (sometimes under sustained load), so
measurements are taken one-per-process, smallest first, each guarded by the
caller's `timeout`. Usage: python scripts/tpu_measure_one.py <name>

Names: score_gather score_matmul score_pallas insert_scatter insert_matmul
       mc_match m3rsm gn_solve tiny_seq viny_seq gmapping_seq
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def timeit(f, *args, n=10):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    name = sys.argv[1]
    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.models import gmapping, tiny, viny
    from slam_constructor_tpu.ops import (
        cells, grid, m3rsm, matchers, raycast, scoring,
    )
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    p0 = jnp.array([0.0, -1.6, 0.0])
    s = raycast.cast_rays(occ, origin, scale, p0, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 256, 256, 0.1)
    beam_cfg = raycast.BeamConfig(wall_blur=True)
    gm = raycast.insert_scan(gm, model, p0, s, beam_cfg)
    view = scoring.MapView.of(gm, model)
    cand = jnp.broadcast_to(p0, (64, 3))

    t = None
    if name.startswith("score_"):
        impl = name.split("_", 1)[1]
        sc = scoring.ScoringConfig(reducer="overlap", impl=impl)
        t = timeit(
            jax.jit(lambda v, s_, c: scoring.score_poses(v, s_, c, sc)),
            view, s, cand,
        )
    elif name.startswith("insert_"):
        impl = name.split("_", 1)[1]
        cfgb = raycast.BeamConfig(wall_blur=True, scatter_impl=impl)
        t = timeit(
            jax.jit(lambda g, p, s_: raycast.insert_scan(g, model, p, s_, cfgb)),
            gm, p0, s,
        )
    elif name == "mc_match":
        mc = matchers.MonteCarloConfig(
            batch=64, rounds=12, scoring=scoring.ScoringConfig(reducer="overlap")
        )
        t = timeit(
            jax.jit(lambda v, s_, p, k: matchers.monte_carlo_match(v, s_, p, k, mc)),
            view, s, p0, jax.random.PRNGKey(0), n=5,
        )
    elif name == "m3rsm":
        m3c = m3rsm.M3RSMConfig(half_x=0.6, half_y=0.6, half_theta=0.2,
                                n_theta=9, levels=4, beam_width=128)
        t = timeit(
            jax.jit(lambda v, s_, p: m3rsm.m3rsm_match(v, s_, p, None, m3c)),
            view, s, p0, n=3,
        )
    elif name == "m3rsm_many":
        # amortized per-request cost: 8 requests in ONE dispatch (standalone
        # calls are dominated by the axon tunnel's per-call latency)
        m3c = m3rsm.M3RSMConfig(half_x=0.6, half_y=0.6, half_theta=0.2,
                                n_theta=9, levels=4, beam_width=128)
        scans8 = jax.tree.map(lambda a: jnp.broadcast_to(a, (8, *a.shape)), s)
        poses8 = jnp.broadcast_to(p0, (8, 3))
        t = timeit(
            jax.jit(lambda v, ss, pp: m3rsm.m3rsm_match_many(v, ss, pp, m3c)),
            view, scans8, poses8, n=3,
        ) / 8.0
    elif name == "gn_scan":
        # amortized GN solve: 10 optimize calls chained in one dispatch
        from slam_constructor_tpu.models import posegraph as pg

        cfgp = pg.PoseGraphConfig(max_keyframes=128, max_edges=512,
                                  gn_iterations=10)
        st = pg.init_state(cfgp, 60)
        for i in range(20):
            st = pg.add_keyframe(
                cfgp, st, jnp.array([0.5 * i, 0.0, 0.0]),
                jax.tree.map(lambda a: a[:60] if a.ndim else a, s),
            )

        def ten(x):
            return jax.lax.fori_loop(0, 10, lambda _, y: pg.optimize(cfgp, y), x)

        t = timeit(jax.jit(ten), st, n=3) / 10.0
    elif name == "gn_solve":
        from slam_constructor_tpu.models import posegraph as pg

        cfgp = pg.PoseGraphConfig(max_keyframes=128, max_edges=512,
                                  gn_iterations=10)
        st = pg.init_state(cfgp, 60)
        for i in range(20):
            st = pg.add_keyframe(
                cfgp, st, jnp.array([0.5 * i, 0.0, 0.0]),
                jax.tree.map(lambda a: a[:60] if a.ndim else a, s),
            )
        t = timeit(jax.jit(lambda x: pg.optimize(cfgp, x)), st, n=5)
    elif "_seq" in name:
        n_scans = 128
        lap = datagen.rectangle_trajectory(step=0.3)
        reps = (n_scans + lap.shape[0] - 1) // lap.shape[0]
        poses = jnp.tile(lap, (reps, 1))[:n_scans]
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, poses, bearings, jax.random.PRNGKey(0)
        )
        if name.startswith("gmapping_seq"):
            # variants after '@': stride2, grad, cow, rounds0, s2bf16
            variant = name.split("@", 1)[1] if "@" in name else ""
            kw: dict = {}
            if variant == "stride2":
                kw["matcher_cfg"] = matchers.MonteCarloConfig(
                    sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6,
                    scoring=scoring.ScoringConfig(stride=2),
                )
            elif variant == "s2bf16":
                kw["matcher_cfg"] = matchers.MonteCarloConfig(
                    sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=6,
                    scoring=scoring.ScoringConfig(stride=2, dtype="bfloat16"),
                )
            elif variant == "rounds0":
                kw["matcher_cfg"] = matchers.MonteCarloConfig(
                    sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=1,
                )
            elif variant == "grad":
                kw["matcher"] = "gradient"
                kw["matcher_cfg"] = matchers.MATCHERS["gradient"][0]()
            elif variant == "cow":
                kw["map_storage"] = "cow"
            elif variant == "p8":
                kw["n_particles"] = 8
            elif variant == "sf1":
                kw["beam"] = raycast.BeamConfig(step_fraction=1.0)
            elif variant == "scatter":
                kw["beam"] = raycast.BeamConfig(scatter_impl="scatter")
            elif variant == "mr8":
                kw["beam"] = raycast.BeamConfig(max_range=8.0)
            elif variant == "polar":
                kw["beam"] = raycast.BeamConfig(free_impl="polar")
            kw = {"n_particles": 30, "map_height": 256, "map_width": 256, **kw}
            cfg = gmapping.GMappingConfig(**kw)
            st = gmapping.init_state(cfg)
            st0 = jax.tree.map(lambda a: a.copy(), st)
            sync(gmapping.run_sequence(cfg, st, scans, odom)[1])
            t0 = time.perf_counter()
            sync(gmapping.run_sequence(cfg, st0, scans, odom)[1])
            t = (time.perf_counter() - t0) / n_scans
        else:
            import dataclasses

            base = name.split("@", 1)[0]
            mk = tiny.tiny_config if base == "tiny_seq" else viny.viny_config
            cfg = mk(map_size=256)
            if name.endswith("@polar"):
                cfg = dataclasses.replace(
                    cfg, beam=dataclasses.replace(cfg.beam, free_impl="polar")
                )
            st = eng.init_state(cfg)
            st0 = jax.tree.map(lambda a: a.copy(), st)
            sync(eng.run_sequence(cfg, st, scans, odom)[1])
            t0 = time.perf_counter()
            sync(eng.run_sequence(cfg, st0, scans, odom)[1])
            t = (time.perf_counter() - t0) / n_scans
    else:
        raise SystemExit(f"unknown measurement {name}")

    row = {
        "name": name,
        "ms": round(t * 1e3, 3),
        "backend": jax.default_backend(),
        "ts": time.time(),
    }
    if "_seq" in name:
        row["scans_per_sec"] = round(1.0 / t, 1)
        row["vs_40hz"] = round(1.0 / t / 40.0, 1)
    with open(os.path.join(os.path.dirname(__file__), "..", "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
