"""Round-4 speed-of-light capture -> SOL_r04.json.

Round-2 post-mortem: SOL_r02's timed_loop fetched one scalar per 32 inner
iterations through the axon tunnel — a ~30 ms fetch / 32 = ~0.9 ms ADDITIVE
ARTIFACT on every row (the r3 insert breakdown measured every sub-part,
including a 360-point scatter and an elementwise fold, at the same
~0.8-1.0 ms). The "insert at 0.27% SOL" headline was therefore mostly
harness, not kernel: the chained-carry + floor-subtracted harness
(scripts/tpu_sweep.timed_inner) measured the same insert at 0.0298 ms.

This capture uses the floor-subtracted methodology for every kernel:
time N dependent inner iterations and 1 iteration in the same jitted form,
report (t_N - t_1)/(N - 1). Chained carries keep iterations dependent so
XLA cannot hoist the body. Also records the chip-health reference — the
chip's delivered throughput varies >2x across hours, so every capture
carries its own context.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import engine as eng, gmapping, tiny
from slam_constructor_tpu.ops import grid as gridlib, m3rsm, raycast, scoring
from slam_constructor_tpu.utils import datagen, profiling

INNER_LO = int(os.environ.get("SOL_INNER_LO", 64))
INNER_HI = int(os.environ.get("SOL_INNER_HI", 256))


def timed_chain(make_body, carry, iters=5):
    """Per-iteration ms via the slope between two inner-loop sizes.

    (t_HI - t_LO) / (HI - LO): both runs carry the same dispatch+fetch
    floor, and the difference is (HI-LO) iterations of pure device work —
    a bigger signal than the N-vs-1 subtraction, which on a jittery chip
    produced negative deltas (bogus 0.0 ms rows in the first r3 capture).
    Returns None when the window is too jittery to measure (flagged in
    the report rather than faked)."""

    def run(n):
        f = jax.jit(
            lambda c: jax.lax.fori_loop(0, n, lambda i, c_: make_body(c_), c)
        )
        out = f(carry)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            out = f(carry)
            jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = run(INNER_LO), run(INNER_HI)
    if t_hi <= t_lo:
        return None
    return (t_hi - t_lo) / (INNER_HI - INNER_LO) * 1e3


def chip_health():
    a = jax.random.normal(jax.random.PRNGKey(0), (2048, 2048), jnp.bfloat16)
    ms = timed_chain(lambda x: jnp.tanh(x @ a), jnp.ones((2048, 2048), jnp.bfloat16))
    if ms is None:
        return {"kernel": "chip_health_matmul2k", "error": "jitter"}
    return {"kernel": "chip_health_matmul2k", "measured_ms": round(ms, 4),
            "tflops_bf16": round(2 * 2048**3 / (ms / 1e3) / 1e12, 1)}


def main():
    cfg = tiny.tiny_config()
    model = cfg.cell_model
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    s0 = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    gm = gridlib.make_grid_map(model, 256, 256, 0.1)
    gm = raycast.insert_scan(gm, model, pose0, s0, cfg.beam)
    view = scoring.MapView.of(gm, model)
    h, w = view.occ.shape
    r = s0.n_beams
    k = 64
    reports = [chip_health()]

    # --- scoring: candidates chained through the carry (dependent iters)
    for impl in ("matmul", "gather", "pallas"):
        sc = scoring.ScoringConfig(reducer="overlap", impl=impl)

        def body(cand, _sc=sc):
            probs = scoring.score_poses(view, s0, cand, _sc)
            return cand + 1e-12 * probs[:, None]

        try:
            ms = timed_chain(body, jnp.broadcast_to(pose0, (k, 3)) * 1.0)
            if ms is None:
                reports.append({"kernel": f"score_{impl}",
                                "error": "window too jittery"})
                continue
            n = k * r
            flops = 2.0 * n * h * w
            bytes_acc = 4.0 * (n * h + n * w + h * w + n * w)
            reports.append(
                profiling.sol_report(f"score_{impl}", ms / 1e3, flops, bytes_acc)
            )
        except Exception as e:
            reports.append({"kernel": f"score_{impl}", "error": str(e)[:80]})

    # --- insert: gm chained through the carry AND the pose derived from
    # it — a constant pose lets XLA hoist the whole rasterization out of
    # the loop (caught in the first r3 capture: insert "beat" its SOL)
    import dataclasses as _dc
    for name, bc in (
        ("insert_tiny_blur", cfg.beam),
        ("insert_tiny_blur_polar", _dc.replace(cfg.beam, free_impl="polar")),
        ("insert_tiny_blur_pallas",
         _dc.replace(cfg.beam, free_impl="polar_pallas")),
        ("insert_noblur", raycast.BeamConfig(
            occupancy_estimator="const", hole_width=0.3, free_impl="polar")),
        ("insert_noblur_pallas", raycast.BeamConfig(
            occupancy_estimator="const", hole_width=0.3,
            free_impl="polar_pallas")),
    ):
        def insert_body(g, _bc=bc):
            p_dep = pose0 + 1e-12 * g.cells.ravel()[0]
            return raycast.insert_scan(g, model, p_dep, s0, _bc)

        ms = timed_chain(insert_body, gm)
        if ms is None:
            reports.append({"kernel": name, "error": "window too jittery"})
            continue
        n_samples = r * cfg.beam.n_free_samples(gm.scale)
        reports.append(
            profiling.sol_report(
                name, ms / 1e3, 2.0 * n_samples * (h + w),
                4.0 * (2 * h * w + n_samples * 4),
            )
        )

    # --- m3rsm (cached pyramid): full-map vs prior-centered window
    pyr = m3rsm.build_pyramid(view, 4, 0.5)
    for name, win in (("m3rsm_cached_full", 0), ("m3rsm_cached_win128", 128)):
        mc = m3rsm.M3RSMConfig(levels=4, n_theta=9, beam_width=128,
                               refine_iterations=0, window=win)

        def body(p, _mc=mc):
            res = m3rsm.m3rsm_match(view, s0, p, None, _mc, pyramid=pyr)
            return p + 1e-12 * res.prob

        ms = timed_chain(body, pose0)
        reports.append(
            {"kernel": name, "measured_ms": round(ms, 4)}
            if ms is not None else {"kernel": name, "error": "jitter"}
        )

    # --- full RBPF fast step (the headline preset's per-scan device cost)
    gcfg = gmapping.fast_config(n_particles=30, map_size=256, usable_range=6.0)
    st0 = gmapping.init_state(gcfg)
    ms = timed_chain(
        lambda st: gmapping.gmapping_step(gcfg, st, s0, jnp.zeros(3))[0], st0
    )
    reports.append(
        {"kernel": "gmapping_fast_step", "measured_ms": round(ms, 4),
         "implied_scans_per_sec": round(1e3 / ms, 1)}
        if ms is not None else
        {"kernel": "gmapping_fast_step", "error": "jitter"}
    )

    # --- pose-graph GN
    from slam_constructor_tpu.models import posegraph as pg
    import tests.test_posegraph as tpg

    st_g, _ = tpg._circle_graph(n=24, drift=0.05, seed=3)
    ms = timed_chain(
        lambda s: s.replace(kf_poses=pg.optimize(tpg.CFG, s).kf_poses), st_g
    )
    reports.append(
        {"kernel": "gn_optimize_24kf", "measured_ms": round(ms, 4)}
        if ms is not None else {"kernel": "gn_optimize_24kf", "error": "jitter"}
    )

    out = {"round": 4, "backend": jax.default_backend(),
           "inner": [INNER_LO, INNER_HI],
           "methodology": "chained-carry fori_loop; per-iter ms = slope "
                          "(t_hi - t_lo)/(hi - lo) so the dispatch+fetch "
                          "floor cancels; jittery windows flagged",
           "ts": int(time.time()), "kernels": reports}
    with open(os.path.join(REPO, "SOL_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["kernels"], indent=1), flush=True)


if __name__ == "__main__":
    main()
