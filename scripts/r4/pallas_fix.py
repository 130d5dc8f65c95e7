"""Round-4 Pallas root-cause validation (VERDICT r3 task 2).

Hypothesis: the r3 sequential-tracking collapse was OPERAND bf16
truncation — the kernel's dot_general set preferred_element_type (the
accumulator) but not precision (the operand passes), so the MXU ran the
selection-weights x plane contraction in bf16 (~1e-3 per-point bias; the
one-shot probe's max |diff| 6.7e-4 was bf16-scale, not fp32-scale).

This script, on chip:
1. score equivalence max |diff| pallas-vs-matmul at bench shapes
   (expect ~1e-7 after the precision pin, was 6.7e-4);
2. SEQUENTIAL tiny tracking over the 2-lap bench with each impl:
   per-step max |pose divergence| + final ATE (the r3 failure mode);
3. slope-timed per-step ms for both impls (is the ~1.7x still there
   with precision=HIGHEST?).

Rows -> TPU_MEASURES.jsonl name=pallas_fix/<case>.
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from slam_constructor_tpu.models import engine as eng, tiny
from slam_constructor_tpu.ops import raycast, scoring
from slam_constructor_tpu.utils import datagen, evaluate


def emit(name, extra):
    row = {"name": f"pallas_fix/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def impl_cfg(impl):
    return dataclasses.replace(
        tiny.tiny_config(map_size=256),
        matcher_cfg=dataclasses.replace(
            tiny.tiny_config().matcher_cfg,
            scoring=scoring.ScoringConfig(reducer="overlap", impl=impl),
        ),
    )


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    s0 = raycast.cast_rays(occ, origin, scale, pose0, bearings)

    # 1. one-shot equivalence at bench shapes
    cfg_t = tiny.tiny_config()
    st_t = eng.init_state(cfg_t)
    gm = raycast.insert_scan(st_t.gm, cfg_t.cell_model, pose0, s0, cfg_t.beam)
    view = scoring.MapView.of(gm, cfg_t.cell_model)
    key = jax.random.PRNGKey(0)
    cand = pose0[None, :] + jax.random.normal(key, (64, 3)) * jnp.array([0.1, 0.1, 0.05])
    pm = scoring.score_poses(view, s0, cand,
                             scoring.ScoringConfig(reducer="overlap", impl="matmul"))
    pp = scoring.score_poses(view, s0, cand,
                             scoring.ScoringConfig(reducer="overlap", impl="pallas"))
    diff = float(np.abs(np.asarray(pm) - np.asarray(pp)).max())
    emit("score_equiv_maxdiff", {"maxdiff": diff})

    # 2. sequential tracking, both impls, same keys (the r3 failure mode)
    n = 256
    lap = datagen.rectangle_trajectory(step=2 * 27.2 / n)
    reps = (n + lap.shape[0] - 1) // lap.shape[0]
    poses = jnp.tile(lap, (reps, 1))[:n]
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
        odom_noise_xy=0.02, odom_noise_theta=0.012,
    )
    trajs = {}
    for impl in ("matmul", "pallas"):
        cfg = impl_cfg(impl)
        st = eng.init_state(cfg, key=jax.random.PRNGKey(1))
        st = st.replace(pose=gt[0])
        st, traj, probs = eng.run_sequence(cfg, st, scans, odom)
        traj = np.asarray(traj)
        ate = float(evaluate.ate(jnp.asarray(traj), gt[:n], align=False))
        trajs[impl] = traj
        emit(f"seq_ate_{impl}", {"ate_m": round(ate, 4), "scans": n})
    dmax = float(np.abs(trajs["matmul"] - trajs["pallas"]).max())
    emit("seq_traj_maxdiff", {"maxdiff": round(dmax, 6)})

    # 3. slope-timed step cost (pose derived from carry — no hoisting)
    import importlib
    sys.path.insert(0, os.path.join(REPO, "scripts", "r3"))
    from sol_capture import timed_chain
    for impl in ("matmul", "pallas"):
        cfg = impl_cfg(impl)
        st = eng.init_state(cfg, key=jax.random.PRNGKey(1))
        st = st.replace(pose=gt[0])

        def chain(k_iters, cfg=cfg, st=st):
            def body(carry, i):
                s = carry
                s = eng.slam_step(cfg, s, jax.tree.map(lambda a: a[i % n], scans),
                                  odom[i % n])
                return s, None
            f = jax.jit(lambda s: jax.lax.scan(
                body, s, jnp.arange(k_iters))[0].pose.sum())
            f(st)  # compile
            t0 = time.perf_counter()
            np.asarray(f(st))
            return (time.perf_counter() - t0)
        t_small = chain(8)
        t_big = chain(40)
        ms = (t_big - t_small) / 32 * 1e3
        emit(f"step_ms_{impl}", {"ms": round(ms, 4),
                                 "scans_per_sec": round(1e3 / ms, 1)})


if __name__ == "__main__":
    main()
