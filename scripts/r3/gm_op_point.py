"""Round-3 GMapping operating-point hunt (VERDICT r2, task 1 + 6).

Goal: ONE preset clearing BOTH binding bars — >=10x (>=400 scans/s) AND
2-lap winner ATE <= 0.11 m. Start: gmapping_abl_oo_r6_f32 (388.4 scans/s =
9.71x, winner ATE 0.1081). Knobs from the verdict: 128-snap asymmetric
match/insert windows, MC batch=20/rounds=4, scoring stride=2, resample
cadence. Also task 6: tune the improved proposal at fast shapes or kill it.

Usage: ABL=base,mw128,... MODE=speed,quality python scripts/r3/gm_op_point.py
Rows append to TPU_BENCH_VARIANTS.jsonl with tag gmapping_r3_<name>.
"""
import dataclasses
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import r2_tpu_final as fin  # noqa: E402
from slam_constructor_tpu.models import gmapping  # noqa: E402
from slam_constructor_tpu.ops import matchers, raycast, scoring  # noqa: E402
from slam_constructor_tpu.utils import datagen  # noqa: E402


def _mc(batch, rounds, stride=1):
    return matchers.MonteCarloConfig(
        sigma_xy=0.08, sigma_theta=0.04, batch=batch, rounds=rounds,
        scoring=scoring.ScoringConfig(
            reducer="overlap", window=1, dtype="float32", stride=stride),
    )


def variants():
    # the round-2 near-miss: usable range 6 m, one-hot windows, f32
    # (stride pinned to 1 — "base" predates the stride-2 default)
    base = gmapping.fast_config(
        n_particles=30, map_size=256, usable_range=6.0, stride=1)
    out = {"base": base}
    # asymmetric windows: the insert window must cover the usable reach to
    # stay exact (160 at r6); the MATCH window only bounds the scored
    # footprint — 128 keeps candidates' overlap dominant and snaps to the
    # MXU-friendlier size (the verdict's "128-snap" suggestion)
    out["mw128"] = dataclasses.replace(base, match_window=128)
    out["mw128_r4"] = dataclasses.replace(
        base, match_window=128, matcher_cfg=_mc(20, 4))
    out["mw128_s2"] = dataclasses.replace(
        base, match_window=128, matcher_cfg=_mc(16, 5, stride=2))
    out["mw128_r4_s2"] = dataclasses.replace(
        base, match_window=128, matcher_cfg=_mc(20, 4, stride=2))
    # resample cadence: resample only when Neff collapses harder
    out["mw128_rs03"] = dataclasses.replace(
        base, match_window=128, resample_threshold=0.3)
    # usable range 5 m: windows snap to 144 (between r4's broken 0.35 ATE
    # and r6's good 0.108)
    out["r5"] = gmapping.fast_config(
        n_particles=30, map_size=256, usable_range=5.0)
    # --- task 6: the improved proposal at fast shapes -------------------
    impA = dataclasses.replace(
        base, match_window=128, proposal="improved")
    # round-2 shipped gamma=16/thr=0.8 measured 2x WORSE than odom; probe a
    # gentler weight sharpening and the default resample threshold
    out["imp_g4"] = dataclasses.replace(impA, weight_gamma=4.0,
                                        resample_threshold=0.5)
    out["imp_g8"] = dataclasses.replace(impA, weight_gamma=8.0,
                                        resample_threshold=0.5)
    out["imp_g8_rad"] = dataclasses.replace(
        impA, weight_gamma=8.0, resample_threshold=0.5,
        proposal_radius_xy=0.1, proposal_radius_theta=0.05)
    # --- hill-climbing refine after the MC mode (new RBPF refine knob):
    # 6 evals x iters on the windowed view; monotone so quality never drops
    hc = matchers.HillClimbingConfig(
        step_xy=0.05, step_theta=0.02, iterations=4,
        scoring=scoring.ScoringConfig(
            reducer="overlap", window=1, dtype="float32"),
    )
    out["mw128_hc"] = dataclasses.replace(
        base, match_window=128, refine_matcher="hill_climbing", refine_cfg=hc)
    out["mw128_r4_hc"] = dataclasses.replace(
        base, match_window=128, matcher_cfg=_mc(20, 4),
        refine_matcher="hill_climbing", refine_cfg=hc)
    out["imp_g8_hc"] = dataclasses.replace(
        impA, weight_gamma=8.0, resample_threshold=0.5,
        refine_matcher="hill_climbing", refine_cfg=hc)
    # --- robust-quality probes on top of base (multiseed showed the 128
    # match window diverges on 2/5 seeds; base's 160 windows are sound)
    out["base_hc"] = dataclasses.replace(
        base, refine_matcher="hill_climbing", refine_cfg=hc)
    out["base_imp"] = dataclasses.replace(
        base, proposal="improved", weight_gamma=8.0, resample_threshold=0.5)
    out["base_s2"] = dataclasses.replace(base, matcher_cfg=_mc(16, 5, stride=2))
    out["base_r6"] = dataclasses.replace(base, matcher_cfg=_mc(16, 6))
    out["base_imp_hc"] = dataclasses.replace(
        base, proposal="improved", weight_gamma=8.0, resample_threshold=0.5,
        refine_matcher="hill_climbing", refine_cfg=hc)
    # reference GMapping minimumScore gate: failed matches keep the
    # odometry prior instead of dragging the particle
    out["base_g55"] = dataclasses.replace(base, min_match_prob=0.55)
    out["base_g65"] = dataclasses.replace(base, min_match_prob=0.65)
    out["base_s2_g55"] = dataclasses.replace(
        base, matcher_cfg=_mc(16, 5, stride=2), min_match_prob=0.55)
    # quality levers not yet multiseeded: usable range 8 (r2 single-seed
    # said 0.38 — knife-edge suspect), lazier resampling, more particles,
    # wider proposal spread
    out["r8"] = gmapping.fast_config(
        n_particles=30, map_size=256, usable_range=8.0, stride=1)
    # spend part of stride-2's +41% headroom on search quality
    out["s2_b20"] = dataclasses.replace(base, matcher_cfg=_mc(20, 5, stride=2))
    out["s2_b24"] = dataclasses.replace(base, matcher_cfg=_mc(24, 5, stride=2))
    # --- r4: fewer SERIAL annealing rounds at constant eval budget. The
    # RBPF wall sits ~320 scans/s across every r4 chip window (388-926
    # GB/s probes) — latency-bound on the 5 sequential MC rounds, not
    # bandwidth-bound; a round costs ~1/5 of the match whatever the
    # window. Candidates keep ~100 evals with the SHIPPED sigma .06/.03:
    ship_mc = lambda b, r: matchers.MonteCarloConfig(
        sigma_xy=0.06, sigma_theta=0.03, batch=b, rounds=r,
        scoring=scoring.ScoringConfig(
            reducer="overlap", window=1, dtype="float32", stride=2))
    out["ship"] = dataclasses.replace(base, matcher_cfg=ship_mc(20, 5))
    out["ship_r4b24"] = dataclasses.replace(base, matcher_cfg=ship_mc(24, 4))
    out["ship_r3b32"] = dataclasses.replace(base, matcher_cfg=ship_mc(32, 3))
    out["s2_g12"] = dataclasses.replace(
        base, matcher_cfg=_mc(16, 5, stride=2), weight_gamma=12.0)
    out["s2_sig06"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(
            _mc(16, 5, stride=2), sigma_xy=0.06, sigma_theta=0.03))
    out["s2_sig05"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(
            _mc(16, 5, stride=2), sigma_xy=0.05, sigma_theta=0.025))
    out["s2_sig07"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(
            _mc(16, 5, stride=2), sigma_xy=0.07, sigma_theta=0.035))
    out["ship"] = gmapping.fast_config(n_particles=30, map_size=256)
    ship = out["ship"]
    out["ship_r4"] = dataclasses.replace(
        ship, matcher_cfg=dataclasses.replace(ship.matcher_cfg, rounds=4))
    out["ship_b16"] = dataclasses.replace(
        ship, matcher_cfg=dataclasses.replace(ship.matcher_cfg, batch=16))
    out["s2_sig06_b20"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(
            _mc(20, 5, stride=2), sigma_xy=0.06, sigma_theta=0.03))
    out["base_rs03"] = dataclasses.replace(base, resample_threshold=0.3)
    out["base_n40"] = dataclasses.replace(base, n_particles=40)
    out["base_nz15"] = dataclasses.replace(
        base, noise_xy=0.045, noise_theta=0.022)
    return out


def main():
    vs = variants()
    which = os.environ.get("ABL", ",".join(vs)).split(",")
    mode = os.environ.get("MODE", "speed,quality").split(",")
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    for name in which:
        cfg = vs[name]
        if "speed" in mode:
            fin.speed(f"gmapping_r3_{name}", cfg, scan)
        if "quality" in mode:
            fin.quality(f"gmapping_r3_{name}", cfg)


if __name__ == "__main__":
    main()
