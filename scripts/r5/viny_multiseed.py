"""r5: 5-seed quality gate + same-window speed for viny margin levers.

Round-4 verdict Weak #8: viny/viny_m3rsm clear their >=10x bar by only
2-3% — one bad co-tenant window away from reading 8x. The cheapest
levers, mirroring the tiny_rounds finding (the tracker is eval-work
bound): fewer Monte-Carlo rounds (ship r16b64), matcher beam stride, and
for viny_m3rsm fewer hill-climb refine iterations. Every candidate is
gated on 5-seed 2-lap ATE before any default flip.

Rows -> TPU_BENCH_VARIANTS viny_ms_* (quality) and TPU_MEASURES
viny_speed/* (same-window interleaved speed at bench shapes).
"""
import dataclasses
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
from slam_constructor_tpu.ops import scoring as scoringlib
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]
BEAMS = int(os.environ.get("BEAMS", 360))


def emit_variant(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def emit_measure(name, extra):
    row = {"name": f"viny_speed/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def variants():
    v = {
        # 'ship' = current viny_config() defaults. Tag history: rows with
        # ts <= 1787334151 predate the r5 stride-2 default ('ship' was
        # stride 1 there, 's2' was the stride-2 candidate).
        "ship": viny.viny_config(map_size=256),
        "s1": viny.viny_config(map_size=256, stride=1),
        "r10b64": viny.viny_config(map_size=256, mc_rounds=10),
        "r8b64": viny.viny_config(map_size=256, mc_rounds=8),
        "r10b96": viny.viny_config(map_size=256, mc_rounds=10, mc_batch=96),
        # NOTE tag history: rows tagged m3_ship/m3_refine4/m3_s2 with ts
        # <= 1787334207 are the r2-r4 defaults (range 4 / obstacle /
        # stride 1) which FAILED this bench at ATE 3.8-3.9 — the r5
        # quality fix (range 6 / overlap / stride 2) ships as the new
        # viny_m3rsm_config default, captured as m3_r5fix.
        "m3_r5fix": viny.viny_m3rsm_config(map_size=256),
        "m3_old_r4": viny.viny_m3rsm_config(
            map_size=256, usable_range=4.0, stride=1, reducer="obstacle"),
    }
    return v


def quality(v, which):
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    posesq = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(BEAMS)
    for name in which:
        cfg = v[name]
        for nk, noise in (("bn", dict(odom_noise_xy=0.01, odom_noise_theta=0.005)),
                          ("qn", dict(odom_noise_xy=0.02, odom_noise_theta=0.012))):
            ates = []
            for seed in SEEDS:
                scans, odom, gt = datagen.synth_sequence(
                    occ, origin, scale, posesq, bearings,
                    jax.random.PRNGKey(seed), **noise)
                st = eng.init_state(cfg)
                st = st.replace(pose=gt[0])
                out = eng.run_sequence(cfg, st, scans, odom)
                traj = out[1]
                ates.append(
                    round(float(evaluate.ate(traj, gt, align=False)), 4))
            emit_variant({
                "metric": "viny_ate_multiseed",
                "tag": f"viny_ms_{name}_{nk}"
                       + ("" if BEAMS == 360 else f"_b{BEAMS}"),
                "seeds": SEEDS,
                "ate_mean": round(float(np.mean(ates)), 4),
                "ate_max": round(float(np.max(ates)), 4),
                "ate_all": ates,
                "backend": "device:" + jax.default_backend(),
                "ts": int(time.time()),
            })


def speed(v, which):
    n = 512
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / n * 2)
    reps = (n + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:n]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, datagen.default_bearings(BEAMS),
        jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
    for rep in range(int(os.environ.get("REPS", 2))):
        for name in which:
            cfg = v[name]
            st = eng.init_state(cfg)
            out = eng.run_sequence(cfg, st, scans, odom)
            np.asarray(out[1])
            st2 = eng.init_state(cfg)
            t0 = time.perf_counter()
            out = eng.run_sequence(cfg, st2, scans, odom)
            np.asarray(out[1])
            emit_measure(f"{name}_{rep}", {
                "scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


if __name__ == "__main__":
    v = variants()
    which = os.environ.get("CASES", ",".join(v)).split(",")
    if os.environ.get("MODE", "both") in ("both", "speed"):
        speed(v, which)
    if os.environ.get("MODE", "both") in ("both", "quality"):
        quality(v, which)
