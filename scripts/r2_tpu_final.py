"""Round-2 final TPU measurement queue (run when the chip is responsive):

1. RBPF step throughput for the candidate fast presets (A: odom, B:
   improved proposal) at bench shapes -> scans/s rows appended to
   TPU_BENCH_VARIANTS.jsonl (tag gmapping_fast_*).
2. 2-lap quality (online + genealogy-winner ATE) for the same presets.
3. Per-kernel speed-of-light capture -> SOL_r02.json (BASELINE "reported
   vs speed-of-light" artifact).
4. Headline bench rows for tiny/viny via bench.py env knobs are run by the
   driver; this script covers the gmapping row.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, raycast, scoring
from slam_constructor_tpu.utils import datagen, evaluate

N_SCANS = 256
P = 30
T = 32

sc_fast = scoring.ScoringConfig(reducer="overlap", window=1, dtype="bfloat16")


def preset(name):
    base = dict(
        n_particles=P, map_height=256, map_width=256,
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
            scoring=sc_fast),
        match_window=96, insert_window=96,
        beam=raycast.BeamConfig(max_range=4.0),
    )
    if name == "A_odom":
        return gmapping.GMappingConfig(**base)
    if name == "B_improved":
        return gmapping.GMappingConfig(
            **base, proposal="improved", resample_threshold=0.8,
            weight_gamma=16.0)
    if name == "A_r4":
        base2 = dict(base)
        base2["matcher_cfg"] = matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=20, rounds=4,
            scoring=sc_fast)
        return gmapping.GMappingConfig(**base2)
    if name == "A_s2":
        base2 = dict(base)
        base2["matcher_cfg"] = matchers.MonteCarloConfig(
            sigma_xy=0.08, sigma_theta=0.04, batch=16, rounds=5,
            scoring=scoring.ScoringConfig(reducer="overlap", window=1,
                                          dtype="bfloat16", stride=2))
        return gmapping.GMappingConfig(**base2)
    if name == "C_bf":
        # one-shot dense search: no serial matcher rounds at all — a single
        # [125*R, H] MXU dispatch per particle replaces the 5-round chain
        base2 = dict(base)
        base2["matcher"] = "brute_force"
        base2["matcher_cfg"] = matchers.BruteForceConfig(
            half_x=0.16, half_y=0.16, half_theta=0.08, n_x=5, n_y=5,
            n_theta=5, chunk=125, scoring=sc_fast)
        return gmapping.GMappingConfig(
            **base2, proposal="improved", resample_threshold=0.8,
            weight_gamma=16.0)
    raise KeyError(name)


def emit(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def speed(tag, cfg, scan):
    st0 = gmapping.init_state(cfg)

    @jax.jit
    def loop(st):
        def body(s, key_t):
            s2, _ = gmapping.gmapping_step(cfg, s, scan, jnp.zeros(3))
            return s2, None
        s, _ = jax.lax.scan(body, st, jax.random.split(jax.random.PRNGKey(2), T))
        return s.poses.sum()

    out = loop(st0)
    float(np.asarray(out))
    t0 = time.perf_counter()
    float(np.asarray(loop(st0)))
    dt = (time.perf_counter() - t0) / T
    sps = 1.0 / dt
    emit({"metric": "gmapping_scans_per_sec", "value": round(sps, 1),
          "unit": "scans/s", "vs_baseline": round(sps / 40.0, 2),
          "backend": "device:tpu", "tag": tag, "ts": int(time.time())})
    return sps


def quality(tag, cfg):
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    poses = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(120)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
        odom_noise_xy=0.02, odom_noise_theta=0.012)
    st = gmapping.init_state(cfg).replace(
        poses=jnp.broadcast_to(gt[0], (cfg.n_particles, 3)))
    stf, traj, _, all_poses, anc = gmapping.run_sequence(cfg, st, scans, odom)
    online = float(evaluate.ate(traj, gt, align=False))
    win = gmapping.winner_trajectory(all_poses, anc, gmapping.best_particle(stf))
    wate = float(evaluate.ate(win, gt, align=False))
    emit({"metric": "gmapping_ate_2lap", "online_ate_m": round(online, 4),
          "winner_ate_m": round(wate, 4), "backend": "device:tpu",
          "tag": tag, "ts": int(time.time())})


def sol_capture():
    """Per-kernel {ms, SOL fraction, bound} on the real chip -> SOL_r02.json."""
    from slam_constructor_tpu.models import engine as eng
    from slam_constructor_tpu.models import tiny
    from slam_constructor_tpu.ops import m3rsm
    from slam_constructor_tpu.utils import profiling

    cfg = tiny.tiny_config()
    state = eng.init_state(cfg)
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    s0 = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    gm = raycast.insert_scan(state.gm, cfg.cell_model, pose0, s0, cfg.beam)
    view = scoring.MapView.of(gm, cfg.cell_model)
    h, w = view.occ.shape
    r = s0.n_beams
    k = 64
    cand = jnp.broadcast_to(pose0, (k, 3))
    reports = []

    def timed_loop(f, *args, iters=3, inner=32):
        # run f INNER times inside one jitted lax.scan (device-resident;
        # the axon tunnel's ~30 ms per-dispatch latency would swamp a
        # per-call measurement) and fetch one scalar
        def body(c, _):
            out = f(*args)
            return c + jax.tree.leaves(out)[0].ravel()[0] * 1e-12, None
        g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=inner)[0])
        float(np.asarray(g(jnp.float32(0))))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(g(jnp.float32(0))))
            ts.append((time.perf_counter() - t0) / inner)
        return float(np.median(ts))

    for impl in ("matmul", "gather"):
        sc = scoring.ScoringConfig(reducer="overlap", impl=impl)
        t = timed_loop(lambda: scoring.score_poses(view, s0, cand, sc))
        n = k * r
        flops = 2.0 * n * h * w
        bytes_acc = 4.0 * (n * h + n * w + h * w + n * w)
        reports.append(profiling.sol_report(f"score_{impl}", t, flops, bytes_acc))
    sc = scoring.ScoringConfig(reducer="overlap", impl="pallas")
    try:
        t = timed_loop(lambda: scoring.score_poses(view, s0, cand, sc))
        reports.append(profiling.sol_report(
            "score_pallas", t, 2.0 * k * r * h * w, 4.0 * (k * r * (h + w) + h * w)))
    except Exception as e:
        reports.append({"kernel": "score_pallas", "error": str(e)[:80]})

    t = timed_loop(lambda: raycast.insert_scan(gm, cfg.cell_model, pose0, s0, cfg.beam))
    n_samples = r * cfg.beam.n_free_samples(gm.scale)
    reports.append(profiling.sol_report(
        "insert_scan", t, 2.0 * n_samples * (h + w),
        4.0 * (2 * h * w + n_samples * 4)))

    pyr = m3rsm.build_pyramid(view, 4, 0.5)
    mc = m3rsm.M3RSMConfig(levels=4, n_theta=9, beam_width=128,
                           refine_iterations=0)
    t = timed_loop(lambda: m3rsm.m3rsm_match(view, s0, pose0, None, mc,
                                             pyramid=pyr).prob)
    reports.append({"kernel": "m3rsm_match_cached", "measured_ms": t * 1e3})

    from slam_constructor_tpu.models import posegraph as pg
    import tests.test_posegraph as tpg
    st_g, _ = tpg._circle_graph(n=24, drift=0.05, seed=3)
    t = timed_loop(lambda: pg.optimize(tpg.CFG, st_g).kf_poses)
    reports.append({"kernel": "gn_optimize_24kf", "measured_ms": t * 1e3})

    out = {"round": 2, "backend": jax.default_backend(),
           "ts": int(time.time()), "kernels": reports}
    with open(os.path.join(REPO, "SOL_r02.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"sol_file": "SOL_r02.json",
                      "n_kernels": len(reports)}), flush=True)


def main():
    which = os.environ.get("WHICH", "speed,quality,sol").split(",")
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    if "speed" in which:
        for name in os.environ.get(
            "PRESETS", "A_odom,B_improved,C_bf").split(","):
            speed(f"gmapping_fast_{name}", preset(name), scan)
    if "quality" in which:
        for name in os.environ.get(
            "PRESETS", "A_odom,B_improved,C_bf").split(","):
            quality(f"gmapping_fast_{name}", preset(name))
    if "sol" in which:
        sol_capture()


if __name__ == "__main__":
    main()
