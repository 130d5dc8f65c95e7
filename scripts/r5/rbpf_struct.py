"""r5: STRUCTURAL attack on the RBPF ~320 scans/s latency floor.

Round-4 root cause (committed rbpf_wall/* rows): the fast RBPF step is
chip-state INSENSITIVE (281-322 scans/s across 388-926 GB/s windows) —
latency-bound on the 5 SERIAL Monte-Carlo annealing rounds, not
bandwidth-bound. Depth cuts (fewer rounds at same batch) failed 5-seed
quality. This harness tries the r4-verdict structural alternatives, every
one a candidate-count-preserving RESHAPE of the search into fewer serial
stages:

  ship      mc rounds=5 batch=20 (the shipped fast point, control)
  mc_r2b50  2 serial rounds x 50 candidates (same 100 evals)
  mc_r1b100 1 round x 100 candidates (pure single-dispatch MC)
  bf343     ONE dense 7x7x7 brute-force grid sized to the annealing
            envelope (+-3 sigma = 0.18 m / 0.09 rad; SURVEY 2.4 calls BF
            "embarrassingly parallel, ideal TPU shape")
  bf343_mc1 bf343 + one 20-candidate MC polish round (sub-cell recovery,
            2 serial stages total)
  bf975     13x13x2r dense grid at 0.03 m sub-cell steps (no polish)

Speed: bench shapes (512 scans, 360 beams, map 256), device-resident
run_sequence, interleaved reps. Quality: 5-seed 2-lap winner ATE at 360
beams (gm_multiseed convention; ship bar = 0.106/0.119 mean/max).
Rows -> TPU_MEASURES rbpf_struct/* and TPU_BENCH_VARIANTS
gmapping_ms_struct_*.
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

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers as matcherslib
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]
BEAMS = int(os.environ.get("BEAMS", 360))


def emit_measure(name, extra):
    row = {"name": f"rbpf_struct/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def emit_variant(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def _fs(stride=2):
    return gmapping._fast_scoring(stride)


def variants():
    base = gmapping.fast_config(n_particles=30, map_size=256, stride=2)
    mc = base.matcher_cfg
    v = {"ship": base}
    v["mc_r2b50"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(mc, rounds=2, batch=50))
    v["mc_r1b100"] = dataclasses.replace(
        base, matcher_cfg=dataclasses.replace(mc, rounds=1, batch=100))
    bf = matcherslib.BruteForceConfig(
        half_x=0.18, half_y=0.18, half_theta=0.09, n_x=7, n_y=7, n_theta=7,
        scoring=_fs(2))
    v["bf343"] = dataclasses.replace(base, matcher="brute_force",
                                     matcher_cfg=bf)
    v["bf343_mc1"] = dataclasses.replace(
        base, matcher="brute_force", matcher_cfg=bf,
        refine_matcher="monte_carlo",
        refine_cfg=dataclasses.replace(
            mc, rounds=1, batch=20, sigma_xy=0.03, sigma_theta=0.015))
    v["bf975"] = dataclasses.replace(
        base, matcher="brute_force",
        matcher_cfg=matcherslib.BruteForceConfig(
            half_x=0.18, half_y=0.18, half_theta=0.09, n_x=13, n_y=13,
            n_theta=5, scoring=_fs(2)))
    # particle-count axis (r5 follow-up): the floor is compute ∝
    # particles, and p16 is the README QUALITY preset's count — the one
    # cut never tried while depth cuts all failed the gate
    for p in (24, 20, 16):
        v[f"p{p}"] = gmapping.fast_config(
            n_particles=p, map_size=256, stride=2)
    return v


def speed(v):
    n = 512
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=9.6 / n * 2)
    reps = (n + lap.shape[0] - 1) // lap.shape[0]
    poses = jnp.tile(lap, (reps, 1))[:n]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, datagen.default_bearings(BEAMS),
        jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
    which = os.environ.get("CASES", ",".join(v)).split(",")
    for rep in range(int(os.environ.get("REPS", 2))):
        for name in which:
            cfg = v[name]
            st = gmapping.init_state(cfg, jax.random.PRNGKey(1))
            out = gmapping.run_sequence(cfg, st, scans, odom)
            np.asarray(out[1])
            st2 = gmapping.init_state(cfg, jax.random.PRNGKey(1))
            t0 = time.perf_counter()
            out = gmapping.run_sequence(cfg, st2, scans, odom)
            np.asarray(out[1])
            emit_measure(f"{name}_{rep}", {
                "scans_per_sec": round(n / (time.perf_counter() - t0), 1)})

        # multi-sequence batched wall (r4 verdict Next #3 fallback made an
        # artifact): if per-sequence latency is floor-bound on serial
        # annealing, the chip's spare FLOPs serve ADDITIONAL sequences at
        # the same wall time — the official deployment scale-out claim.
        for nseq in (2, 4):
            cfg = v["ship"]
            seqs = []
            for s in range(nseq):
                sc, od, _ = datagen.synth_sequence(
                    occ, origin, scale, poses, datagen.default_bearings(BEAMS),
                    jax.random.PRNGKey(s),
                    odom_noise_xy=0.01, odom_noise_theta=0.005)
                seqs.append((sc, od))
            scans_b = jax.tree.map(lambda *xs: jnp.stack(xs), *[s for s, _ in seqs])
            odom_b = jnp.stack([o for _, o in seqs])

            def init_b():
                sts = [gmapping.init_state(cfg, jax.random.PRNGKey(100 + s))
                       for s in range(nseq)]
                return jax.tree.map(lambda *xs: jnp.stack(xs), *sts)

            run_b = jax.jit(jax.vmap(
                lambda s_, sc_, od_: gmapping.run_sequence(cfg, s_, sc_, od_)))
            out = run_b(init_b(), scans_b, odom_b)
            np.asarray(out[1])
            stb = init_b()
            t0 = time.perf_counter()
            out = run_b(stb, scans_b, odom_b)
            np.asarray(out[1])
            dt = time.perf_counter() - t0
            emit_measure(f"ship_x{nseq}seq_{rep}", {
                "scans_per_sec_total": round(nseq * n / dt, 1),
                "scans_per_sec_per_seq": round(n / dt, 1),
                "n_seq": nseq})


def quality(v):
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    poses = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(BEAMS)
    which = os.environ.get("CASES", ",".join(v)).split(",")
    for name in which:
        cfg = v[name]
        wins = []
        for seed in SEEDS:
            scans, odom, gt = datagen.synth_sequence(
                occ, origin, scale, poses, bearings, jax.random.PRNGKey(seed),
                odom_noise_xy=0.02, odom_noise_theta=0.012)
            st = gmapping.init_state(cfg, jax.random.PRNGKey(seed + 1)).replace(
                poses=jnp.broadcast_to(gt[0], (cfg.n_particles, 3)))
            stf, traj, _, all_poses, anc = gmapping.run_sequence(
                cfg, st, scans, odom)
            win = gmapping.winner_trajectory(
                all_poses, anc, gmapping.best_particle(stf))
            wins.append(round(float(evaluate.ate(win, gt, align=False)), 4))
        emit_variant({
            "metric": "gmapping_ate_multiseed",
            "tag": f"gmapping_ms_struct_{name}_b{BEAMS}",
            "seeds": SEEDS,
            "winner_ate_mean": round(float(np.mean(wins)), 4),
            "winner_ate_max": round(float(np.max(wins)), 4),
            "winner_ate_all": wins,
            "backend": "device:" + jax.default_backend(),
            "ts": int(time.time()),
        })


if __name__ == "__main__":
    v = variants()
    if os.environ.get("MODE", "both") in ("both", "speed"):
        speed(v)
    if os.environ.get("MODE", "both") in ("both", "quality"):
        quality(v)
