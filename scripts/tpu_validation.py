"""One-shot TPU validation + performance capture.

Run when the TPU is healthy: times every hot kernel (gather vs matmul vs
pallas scoring, scatter vs matmul insertion, matcher, GN solve), runs each
preset's sequence throughput, and writes a JSON report to
TPU_VALIDATION.json. Uses host-fetch sync throughout (axon quirk).

Usage: timeout 900 python scripts/tpu_validation.py [--quick]
"""

from __future__ import annotations

import json
import os
import sys
import time

# repo root on sys.path (NOT via PYTHONPATH, which disturbs the axon
# jax_plugins namespace discovery on this machine)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    for leaf in jax.tree.leaves(x):
        np.asarray(leaf)


def timeit(f, *args, n=20):
    out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    quick = "--quick" in sys.argv
    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.models import gmapping, tiny, viny
    from slam_constructor_tpu.ops import (
        cells, grid, m3rsm, matchers, raycast, relocalize, scoring,
    )
    from slam_constructor_tpu.utils import datagen, profiling

    report = {"backend": jax.default_backend(),
              "device": str(jax.devices()[0])}

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

    kernels = {}
    for impl in ("gather", "matmul", "pallas"):
        try:
            sc = scoring.ScoringConfig(reducer="overlap", impl=impl)
            t = timeit(
                jax.jit(lambda v, s_, c: scoring.score_poses(v, s_, c, sc)),
                view, s, cand, n=10 if quick else 30,
            )
            kernels[f"score64_overlap_{impl}_ms"] = round(t * 1e3, 3)
        except Exception as e:
            kernels[f"score64_overlap_{impl}_ms"] = f"error: {e}"[:120]
    for impl in ("scatter", "matmul"):
        cfgb = raycast.BeamConfig(wall_blur=True, scatter_impl=impl)
        t = timeit(
            jax.jit(lambda g, p, s_: raycast.insert_scan(g, model, p, s_, cfgb)),
            gm, p0, s, n=10 if quick else 30,
        )
        kernels[f"insert_{impl}_ms"] = round(t * 1e3, 3)

    mc = matchers.MonteCarloConfig(
        batch=64, rounds=12,
        scoring=scoring.ScoringConfig(reducer="overlap"),
    )
    t = timeit(
        jax.jit(lambda v, s_, p, k: matchers.monte_carlo_match(v, s_, p, k, mc)),
        view, s, p0, jax.random.PRNGKey(0), n=5,
    )
    kernels["mc_match_64x12_ms"] = round(t * 1e3, 3)

    m3c = m3rsm.M3RSMConfig(half_x=0.6, half_y=0.6, half_theta=0.2,
                            n_theta=9, levels=4, beam_width=128)
    t = timeit(
        jax.jit(lambda v, s_, p: m3rsm.m3rsm_match(v, s_, p, None, m3c)),
        view, s, p0, n=3,
    )
    kernels["m3rsm_ms"] = round(t * 1e3, 3)

    rl = relocalize.RelocalizeConfig(n_theta=16)
    t = timeit(
        jax.jit(lambda v, s_: relocalize.relocalize(v, s_, rl)), view, s, n=3
    )
    kernels["relocalize_16theta_ms"] = round(t * 1e3, 3)
    report["kernels"] = kernels

    # preset throughput (whole-sequence device-resident)
    n_scans = 64 if quick else 256
    lap = datagen.rectangle_trajectory(step=0.3)
    reps = (n_scans + lap.shape[0] - 1) // lap.shape[0]
    poses = jnp.tile(lap, (reps, 1))[:n_scans]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0)
    )
    presets = {}
    for name, mk in [("tiny", tiny.tiny_config), ("viny", viny.viny_config)]:
        cfg = mk(map_size=256)
        st = eng.init_state(cfg)
        st0 = jax.tree.map(lambda a: a.copy(), st)
        out = eng.run_sequence(cfg, st, scans, odom)
        sync(out[1])
        t0 = time.perf_counter()
        out = eng.run_sequence(cfg, st0, scans, odom)
        sync(out[1])
        dt = time.perf_counter() - t0
        from slam_constructor_tpu.utils import evaluate

        presets[name] = {
            "scans_per_sec": round(n_scans / dt, 1),
            "vs_40hz_baseline": round(n_scans / dt / 40.0, 1),
        }
    gcfg = gmapping.GMappingConfig(n_particles=30, map_height=256, map_width=256)
    gst = gmapping.init_state(gcfg)
    gst0 = jax.tree.map(lambda a: a.copy(), gst)
    out = gmapping.run_sequence(gcfg, gst, scans, odom)
    sync(out[1])
    t0 = time.perf_counter()
    out = gmapping.run_sequence(gcfg, gst0, scans, odom)
    sync(out[1])
    dt = time.perf_counter() - t0
    presets["gmapping30"] = {"scans_per_sec": round(n_scans / dt, 1)}
    report["presets"] = presets

    with open("TPU_VALIDATION.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
