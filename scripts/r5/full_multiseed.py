"""r5: multiseed (5-seed) quality for the FULL pipeline — the committed
artifact behind every README/bench full-pipeline quality claim.

Round-4 verdict (Missing #4, Weak #1/#2): the README's "ATE 0.0705-0.0709"
and bench.py's "full_fast is quality-neutral" claims had NO committed row,
while the only committed 3-seed artifact (full_rounds/ate_r12b64, odom
noise 0.02/0.012) read 0.099-0.162. This harness runs the repo's
gm_multiseed convention (5 seeds, mean/max/all) over the full-pipeline
operating points AND both noise conventions, so the discrepancy is either
reconciled (it is the noise level) or the README claim retracted.

Cases (CASES env csv to subset):
  default_s64_qn  tiny r12b64 tracker, segment 64,  noise 0.02/0.012
                  -> reconciles full_rounds/ate_r12b64
  default_s64_bn  same tracker, segment 64,         noise 0.01/0.005
                  -> the README 0.0705-0.0709 claim's noise level
  default_sall_bn same tracker, whole-sequence segment (bench default)
  fast_sall_bn    tiny.fast_config stride-2 tracker (the full_fast 9.2x
                  row's config), whole-sequence segment
  fast_s64_qn     fast tracker under the harder quality-noise convention

Rows -> TPU_BENCH_VARIANTS.jsonl, tag full_ms_<case>.
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

from slam_constructor_tpu.models import full, posegraph as pglib, tiny
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]
BEAMS = int(os.environ.get("BEAMS", 360))
# capture-generation tag suffix (e.g. SUFFIX=gfix for the r5 loop-info/
# Huber calibration fix) so re-runs never shadow committed rows
SUFFIX = os.environ.get("SUFFIX", "")

GRAPH = pglib.PoseGraphConfig(
    keyframe_distance=0.7, min_index_gap=8, max_candidates=4,
    local_map_size=120,
)

BENCH_NOISE = dict(odom_noise_xy=0.01, odom_noise_theta=0.005)
QUALITY_NOISE = dict(odom_noise_xy=0.02, odom_noise_theta=0.012)

CASES = {
    # name: (tracker factory, segment ('all' = whole sequence), noise[,
    #        FullConfig overrides])
    "default_s64_qn": (lambda: tiny.tiny_config(map_size=256), 64, QUALITY_NOISE),
    "default_s64_bn": (lambda: tiny.tiny_config(map_size=256), 64, BENCH_NOISE),
    "default_sall_bn": (lambda: tiny.tiny_config(map_size=256), "all", BENCH_NOISE),
    "default_sall_qn": (lambda: tiny.tiny_config(map_size=256), "all", QUALITY_NOISE),
    "fast_sall_qn": (
        lambda: tiny.fast_config(map_size=256, stride=2), "all", QUALITY_NOISE),
    "fast_sall_bn": (
        lambda: tiny.fast_config(map_size=256, stride=2), "all", BENCH_NOISE),
    "fast_s64_qn": (
        lambda: tiny.fast_config(map_size=256, stride=2), 64, QUALITY_NOISE),
    # r5 follow-up: the tiny_fast-gated eval cut (mc_rounds 6) inside the
    # full pipeline — tracking is ~90% of the fused program (seg_chain),
    # so halving tracker evals is the last big single-chip lever
    "fastr6_sall_bn": (
        lambda: tiny.fast_config(map_size=256, stride=2, mc_rounds=6),
        "all", BENCH_NOISE),
    "fastr6_sall_qn": (
        lambda: tiny.fast_config(map_size=256, stride=2, mc_rounds=6),
        "all", QUALITY_NOISE),
    "fastr8_sall_qn": (
        lambda: tiny.fast_config(map_size=256, stride=2, mc_rounds=8),
        "all", QUALITY_NOISE),
    # A/B of the r4-advisor post-burst pose re-expression (see
    # FullConfig.burst_reexpress): reex on = the cases above
    "reex_off_s64_qn": (
        lambda: tiny.tiny_config(map_size=256), 64, QUALITY_NOISE,
        dict(burst_reexpress=False)),
    "reex_off_sall_bn": (
        lambda: tiny.tiny_config(map_size=256), "all", BENCH_NOISE,
        dict(burst_reexpress=False)),
}


def emit(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    which = os.environ.get("CASES", ",".join(CASES)).split(",")
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    posesq = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(BEAMS)
    n = posesq.shape[0]
    for name in which:
        case = CASES[name]
        mk_tracking, seg, noise = case[:3]
        overrides = case[3] if len(case) > 3 else {}
        segment = n if seg == "all" else seg
        ates, loops = [], []
        for seed in SEEDS:
            scans, odom, gt = datagen.synth_sequence(
                occ, origin, scale, posesq, bearings,
                jax.random.PRNGKey(seed), **noise)
            e = full.FullSlamEngine(
                full.FullConfig(
                    tracking=mk_tracking(), graph=GRAPH,
                    optimize_every_loops=1, **overrides,
                ),
                n_beams=BEAMS,
            )
            e.state = e.state.replace(pose=gt[0])
            traj = e.run(scans, odom, segment=segment)
            ates.append(
                round(float(evaluate.ate(traj, gt[: traj.shape[0]],
                                         align=False)), 4)
            )
            loops.append(int(e.total_loops))
        emit({
            "metric": "full_ate_multiseed",
            "tag": f"full_ms_{name}"
            + (("_" + SUFFIX) if SUFFIX else "")
            + ("" if BEAMS == 360 else f"_b{BEAMS}"),
            "seeds": SEEDS,
            "ate_mean": round(float(np.mean(ates)), 4),
            "ate_max": round(float(np.max(ates)), 4),
            "ate_all": ates,
            "loops": loops,
            "noise": [noise["odom_noise_xy"], noise["odom_noise_theta"]],
            "segment": segment,
            "backend": "device:" + jax.default_backend(),
            "ts": int(time.time()),
        })


if __name__ == "__main__":
    main()
