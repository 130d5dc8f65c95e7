"""r5: 5-seed quality gate for tiny's reduced-eval operating point.

Round-4 finding (tiny_rounds/*): r6b64 tracking runs 1035 scans/s on chip
vs the shipped r12b64's 539 at +0.002 mean ATE over 3 seeds — "the
cheapest large number in the repo" (r4 verdict Next #7). Single-seed (and
3-seed) ATE cannot rank configs on the fp-knife-edge 2-lap bench
(CLAUDE.md), so this is the 5-seed validation; if r6b64 holds within the
ship config's band, it ships as the tiny_fast official operating point.

Rows -> TPU_BENCH_VARIANTS.jsonl, tag tiny_ms_<case>.
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

from slam_constructor_tpu.models import engine as eng, tiny
from slam_constructor_tpu.utils import datagen, evaluate

SEEDS = [int(s) for s in os.environ.get("SEEDS", "42,7,19,101,202").split(",")]
BEAMS = int(os.environ.get("BEAMS", 360))

CASES = {
    "r12b64": dict(mc_rounds=12, mc_batch=64),
    "r8b64": dict(mc_rounds=8, mc_batch=64),
    "r6b64": dict(mc_rounds=6, mc_batch=64),
    # same eval count as r6b64, single wider round costs 1 launch less
    "r4b96": dict(mc_rounds=4, mc_batch=96),
}

NOISES = {
    "bn": dict(odom_noise_xy=0.01, odom_noise_theta=0.005),
    "qn": dict(odom_noise_xy=0.02, odom_noise_theta=0.012),
}


def emit(row):
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_BENCH_VARIANTS.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    which = os.environ.get("CASES", ",".join(CASES)).split(",")
    noises = os.environ.get("NOISES", "bn,qn").split(",")
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    posesq = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(BEAMS)
    for name in which:
        cfg = tiny.tiny_config(map_size=256, **CASES[name])
        for nk in noises:
            ates = []
            for seed in SEEDS:
                scans, odom, gt = datagen.synth_sequence(
                    occ, origin, scale, posesq, bearings,
                    jax.random.PRNGKey(seed), **NOISES[nk])
                st = eng.init_state(cfg)
                st = st.replace(pose=gt[0])
                _, traj, _probs = eng.run_sequence(cfg, st, scans, odom)
                ates.append(
                    round(float(evaluate.ate(traj, gt, align=False)), 4)
                )
            emit({
                "metric": "tiny_ate_multiseed",
                "tag": f"tiny_ms_{name}_{nk}"
                       + ("" if BEAMS == 360 else f"_b{BEAMS}"),
                "seeds": SEEDS,
                "ate_mean": round(float(np.mean(ates)), 4),
                "ate_max": round(float(np.max(ates)), 4),
                "ate_all": ates,
                "backend": "device:" + jax.default_backend(),
                "ts": int(time.time()),
            })


if __name__ == "__main__":
    main()
