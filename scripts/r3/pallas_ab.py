"""A/B the Pallas VMEM scorer vs the XLA one-hot matmul path on the hot
presets (SOL_r03: score_pallas 0.080 ms ~= 100% of the memory roofline vs
score_matmul 0.152 ms = 57% — a potential ~1.9x on scoring-bound steps).

Measures device-resident per-step ms (slope methodology) for:
- gmapping fast step, scoring impl matmul vs pallas
- tiny slam_step, impl matmul vs pallas
Also asserts score equivalence (max |diff|) at the bench shapes.
Rows -> TPU_MEASURES.jsonl name=pallas_ab/<case>.
"""
import dataclasses
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
from slam_constructor_tpu.ops import raycast, scoring
from slam_constructor_tpu.utils import datagen

sys.path.insert(0, os.path.join(REPO, "scripts", "r3"))
from sol_capture import timed_chain  # noqa: E402


def emit(name, ms, extra=None):
    row = {"name": f"pallas_ab/{name}",
           "ms": None if ms is None else round(ms, 4),
           "ts": time.time(), "backend": jax.default_backend()}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    s0 = raycast.cast_rays(occ, origin, scale, pose0, bearings)

    # equivalence at bench shapes (fast scoring = overlap/window=1/f32)
    cfg_t = tiny.tiny_config()
    st_t = eng.init_state(cfg_t)
    gm = raycast.insert_scan(st_t.gm, cfg_t.cell_model, pose0, s0, cfg_t.beam)
    view = scoring.MapView.of(gm, cfg_t.cell_model)
    cand = jnp.broadcast_to(pose0, (64, 3)) + 0.01
    pm = scoring.score_poses(view, s0, cand,
                             scoring.ScoringConfig(reducer="overlap", impl="matmul"))
    pp = scoring.score_poses(view, s0, cand,
                             scoring.ScoringConfig(reducer="overlap", impl="pallas"))
    diff = float(np.abs(np.asarray(pm) - np.asarray(pp)).max())
    emit("score_equiv_maxdiff", None, {"maxdiff": diff})

    # gmapping fast step A/B
    for impl in ("matmul", "pallas"):
        gcfg = gmapping.fast_config(n_particles=30, map_size=256)
        sc = dataclasses.replace(gcfg.matcher_cfg.scoring, impl=impl)
        gcfg = dataclasses.replace(
            gcfg, matcher_cfg=dataclasses.replace(gcfg.matcher_cfg, scoring=sc))
        st0 = gmapping.init_state(gcfg)
        ms = timed_chain(
            lambda st, _c=gcfg: gmapping.gmapping_step(_c, st, s0, jnp.zeros(3))[0],
            st0,
        )
        emit(f"gmapping_fast_step_{impl}", ms,
             {"implied_scans_per_sec": None if ms is None else round(1e3 / ms, 1)})

    # tiny step A/B
    for impl in ("matmul", "pallas"):
        tcfg = tiny.tiny_config(
            scoring_cfg=scoring.ScoringConfig(
                reducer="overlap", window=1, impl=impl))
        st0 = eng.init_state(tcfg)

        def body(st, _c=tcfg):
            return eng.slam_step(_c, st, s0, jnp.zeros(3))

        ms = timed_chain(body, st0)
        emit(f"tiny_step_{impl}", ms,
             {"implied_scans_per_sec": None if ms is None else round(1e3 / ms, 1)})


if __name__ == "__main__":
    main()
