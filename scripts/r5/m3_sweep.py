"""r5: viny_m3rsm operating-point sweep — recover >=10x WITH the quality
fix. The r5 quality fix (range 6 + overlap + stride 2) measures 346
scans/s (viny_speed/m3_r5fix) vs the broken-but-fast old config's 400-410;
window area scales as (2*(reach+6+16) aligned 16)^2. CPU seed checks say
range 5 / n_theta 7 / beam_width 96 all hold 0.070 ATE; this sweep
measures their chip speed, then 5-seed quality for every candidate that
clears 400 scans/s. Rows -> TPU_MEASURES m3_sweep/* and
TPU_BENCH_VARIANTS viny_ms_m3sw_*.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from slam_constructor_tpu.models import engine as eng, viny
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]
# distinguishes capture generations (e.g. SUFFIX=dda after the r5
# free_impl fix) so re-runs never shadow committed rows
SUFFIX = os.environ.get("SUFFIX", "")


def emit_measure(name, extra):
    row = {"name": f"m3_sweep/{name}{('_' + SUFFIX) if SUFFIX else ''}",
           "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def emit_variant(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def _with_refine(cfg, n):
    import dataclasses

    return dataclasses.replace(
        cfg, matcher_cfg=dataclasses.replace(cfg.matcher_cfg,
                                             refine_iterations=n))


def variants():
    if os.environ.get("STAGE") == "3":
        # stage 3: how narrow can the frontier go? (bw64 was quality-
        # bitwise-identical to bw96 — the beam never prunes the winner
        # at these shapes)
        base = dict(map_size=256, usable_range=5.0)
        return {
            "r5_bw64": viny.viny_m3rsm_config(**base, beam_width=64),
            "r5_bw48": viny.viny_m3rsm_config(**base, beam_width=48),
            "r5_bw32": viny.viny_m3rsm_config(**base, beam_width=32),
        }
    if os.environ.get("STAGE") == "2":
        # second stage around the stage-1 winner (r5_bw96: range 5 +
        # beam_width 96, clean 5-seed at both noises, ~400-410 scans/s):
        # one lever each on frontier width, scoring stride, refine depth
        base = dict(map_size=256, usable_range=5.0)
        return {
            "r5_bw96": viny.viny_m3rsm_config(**base, beam_width=96),
            "r5_bw64": viny.viny_m3rsm_config(**base, beam_width=64),
            "r5_bw96_s3": viny.viny_m3rsm_config(
                **base, beam_width=96, stride=3),
            "r5_bw96_ref6": _with_refine(
                viny.viny_m3rsm_config(**base, beam_width=96), 6),
            "r5_nt7_bw64": viny.viny_m3rsm_config(
                **base, n_theta=7, beam_width=64),
        }
    return {
        "r6": viny.viny_m3rsm_config(map_size=256),
        "r5": viny.viny_m3rsm_config(map_size=256, usable_range=5.0),
        "r5_bw96": viny.viny_m3rsm_config(
            map_size=256, usable_range=5.0, beam_width=96),
        "r6_bw96": viny.viny_m3rsm_config(map_size=256, beam_width=96),
        "r6_nt7": viny.viny_m3rsm_config(map_size=256, n_theta=7),
        "r5_nt7_bw96": viny.viny_m3rsm_config(
            map_size=256, usable_range=5.0, n_theta=7, beam_width=96),
    }


def speed(v):
    n = 512
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / n * 2)
    reps = (n + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:n]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, datagen.default_bearings(360),
        jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
    rates = {}
    for rep in range(int(os.environ.get("REPS", 2))):
        for name, cfg in v.items():
            st = eng.init_state(cfg)
            out = eng.run_sequence(cfg, st, scans, odom)
            np.asarray(out[1])
            st2 = eng.init_state(cfg)
            t0 = time.perf_counter()
            out = eng.run_sequence(cfg, st2, scans, odom)
            np.asarray(out[1])
            r = round(n / (time.perf_counter() - t0), 1)
            rates.setdefault(name, []).append(r)
            emit_measure(f"{name}_{rep}", {"scans_per_sec": r})
    return {k: max(rs) for k, rs in rates.items()}


def quality(v, names):
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    posesq = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(360)
    for name in names:
        cfg = v[name]
        for nk, noise in (
            ("bn", dict(odom_noise_xy=0.01, odom_noise_theta=0.005)),
            ("qn", dict(odom_noise_xy=0.02, odom_noise_theta=0.012)),
        ):
            ates = []
            for seed in SEEDS:
                scans, odom, gt = datagen.synth_sequence(
                    occ, origin, scale, posesq, bearings,
                    jax.random.PRNGKey(seed), **noise)
                st = eng.init_state(cfg)
                st = st.replace(pose=gt[0])
                _, traj, _ = eng.run_sequence(cfg, st, scans, odom)
                ates.append(
                    round(float(evaluate.ate(traj, gt, align=False)), 4))
            emit_variant({
                "metric": "viny_ate_multiseed",
                "tag": "viny_ms_m3sw_"
                + name
                + (("_" + SUFFIX) if SUFFIX else "")
                + f"_{nk}",
                "seeds": SEEDS,
                "ate_mean": round(float(np.mean(ates)), 4),
                "ate_max": round(float(np.max(ates)), 4),
                "ate_all": ates,
                "backend": "device:" + jax.default_backend(),
                "ts": int(time.time()),
            })


if __name__ == "__main__":
    v = variants()
    best = speed(v)
    # 5-seed-gate every candidate at or near the bar (>= 390)
    names = [k for k, r in best.items() if r >= 390] or ["r5_bw96"]
    print("quality-gating:", names, flush=True)
    quality(v, names)
