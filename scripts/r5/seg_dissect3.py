"""r5: third dissection round — isolate WHAT makes (A) a jitted tracking
scan 20% slower than the donated run_sequence and (B) a trivial 64-iter
fori_loop appended to it cost ~0.6 s.

Probes:
  t0            jit(scan slam_step), no donation      (dissect2 baseline)
  t0_donate     same + donate state                   (donation = A?)
  runseq        eng.run_sequence (donated, control)
  k0_i{1,8,64,256}  t0_donate + fori_loop of i TRIVIAL iterations
                (dynamic_slice + pass-through carry): linear in i =>
                per-iteration cost; flat => fixed program overhead
  k0_small_i64  64 trivial iterations, carry = scalar only (no
                state/graph in the loop carry)
Rows -> TPU_MEASURES seg_dissect3/*.
"""
import json
import os
import sys
import time
from functools import partial

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

from slam_constructor_tpu.models import engine as eng, posegraph as pglib, tiny
from slam_constructor_tpu.models.engine import slam_step
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_dissect3/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


n = 512
occ, origin, scale = datagen.cecum_world()
lap = datagen.rectangle_trajectory(step=2 * 27.2 / n)
reps = (n + lap.shape[0] - 1) // lap.shape[0]
p2 = jnp.tile(lap, (reps, 1))[:n]
scans, odom, gt = datagen.synth_sequence(
    occ, origin, scale, p2, datagen.default_bearings(360),
    jax.random.PRNGKey(0), odom_noise_xy=0.01, odom_noise_theta=0.005)
cfg_t = tiny.tiny_config(map_size=256)
GCFG = pglib.PoseGraphConfig(keyframe_distance=1e9, min_index_gap=8,
                             max_candidates=4, local_map_size=120)


def track(state):
    def body(st, inp):
        scan, od = inp
        st = slam_step(cfg_t, st, scan, od)
        return st, st.pose
    return jax.lax.scan(body, state, (scans, odom))


f_t0 = jax.jit(track)
f_t0d = jax.jit(track, donate_argnums=0)


def mk_k0(iters, small):
    def f(state, graph):
        state, poses = track(state)
        kf_idx = jnp.zeros((max(iters * 8, 8),), jnp.int32)

        if small:
            def body(bi, pend):
                idx_b = jax.lax.dynamic_slice(kf_idx, (bi * 8,), (8,))
                return pend + idx_b[0] * 0
            pend = jax.lax.fori_loop(0, iters, body, jnp.int32(0))
            return state, poses, pend
        else:
            def body(bi, carry):
                g, pend, st, ps = carry
                idx_b = jax.lax.dynamic_slice(kf_idx, (bi * 8,), (8,))
                return g, pend + idx_b[0] * 0, st, ps
            graph, pend, state, _ = jax.lax.fori_loop(
                0, iters, body, (graph, jnp.int32(0), state, poses))
            return state, poses, graph, pend

    return jax.jit(f, donate_argnums=(0, 1))


def timed(fn, mk_args, tag):
    args = mk_args()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)
    args = mk_args()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)
    emit(tag, {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


def run_runseq(tag):
    st = eng.init_state(cfg_t)
    out = eng.run_sequence(cfg_t, st, scans, odom)
    np.asarray(out[1])
    st0 = eng.init_state(cfg_t)
    t0 = time.perf_counter()
    out = eng.run_sequence(cfg_t, st0, scans, odom)
    np.asarray(out[1])
    emit(tag, {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


REPS = int(os.environ.get("REPS", 2))
for rep in range(REPS):
    run_runseq(f"runseq_{rep}")
    timed(f_t0, lambda: (eng.init_state(cfg_t),), f"t0_{rep}")
    timed(f_t0d, lambda: (eng.init_state(cfg_t),), f"t0_donate_{rep}")
    for iters in (1, 8, 64, 256):
        timed(mk_k0(iters, False),
              lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360)),
              f"k0_i{iters}_{rep}")
    timed(mk_k0(64, True),
          lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360)),
          f"k0_small_i64_{rep}")
