"""r5: fourth dissection — test the candidate FIXES.

Findings so far: (A) jit(scan) closing over the 512-scan sequence runs
~450 vs run_sequence's ~550 (scans as closure CONSTANTS vs arguments);
(B) appending ANY second device loop whose carry contains the big
state/graph pytrees costs ~0.4 s FIXED (k0_i1 == k0_i256 ~300), while a
scalar-carry loop is free (k0_small ~430). Mechanism unknown (axon
tunnel?); the engineering fix candidates:

  t0_args     track with scans/odom as jit ARGUMENTS (A-fix)
  kscan       t0_args + lax.scan (not fori_loop) over 64 dummy batches,
              big carry — does scan lower better than fori?
  kdyn0       t0_args + fori_loop with TRACED trip count (0 at runtime),
              big carry — do zero executed iterations avoid the tax?
  kdyn0_small t0_args + traced-count loop, scalar carry, state/graph
              closed over and indexed via ... (control)
Rows -> TPU_MEASURES seg_dissect4/*.
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

from slam_constructor_tpu.models import engine as eng, posegraph as pglib, tiny
from slam_constructor_tpu.models.engine import slam_step
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_dissect4/{name}", "ts": time.time(),
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


def track_args(state, sc, od):
    def body(st, inp):
        s_, o_ = inp
        st = slam_step(cfg_t, st, s_, o_)
        return st, st.pose
    return jax.lax.scan(body, state, (sc, od))


f_t0_args = jax.jit(track_args, donate_argnums=0)


@jax.jit
def f_kscan(state, graph, sc, od):
    state, poses = track_args(state, sc, od)
    kf_idx = jnp.zeros((512,), jnp.int32)

    def body(carry, bi):
        g, pend, st, ps = carry
        idx_b = jax.lax.dynamic_slice(kf_idx, (bi * 8,), (8,))
        return (g, pend + idx_b[0] * 0, st, ps), None

    (graph, pend, state, _), _ = jax.lax.scan(
        body, (graph, jnp.int32(0), state, poses), jnp.arange(64))
    return state, poses, graph, pend


@jax.jit
def f_kdyn0(state, graph, sc, od):
    state, poses = track_args(state, sc, od)
    kf_idx = jnp.zeros((512,), jnp.int32)
    n_real = jnp.int32(0)  # device scalar: zero real batches

    def body(bi, carry):
        g, pend, st, ps = carry
        idx_b = jax.lax.dynamic_slice(kf_idx, (bi * 8,), (8,))
        return g, pend + idx_b[0] * 0, st, ps

    graph, pend, state, _ = jax.lax.fori_loop(
        0, n_real, body, (graph, jnp.int32(0), state, poses))
    return state, poses, graph, pend


@jax.jit
def f_kdyn64(state, graph, sc, od):
    state, poses = track_args(state, sc, od)
    kf_idx = jnp.zeros((512,), jnp.int32)
    n_real = jnp.int32(64) + jnp.int32(poses[0, 0] * 0)  # traced 64

    def body(bi, carry):
        g, pend, st, ps = carry
        idx_b = jax.lax.dynamic_slice(kf_idx, (bi * 8,), (8,))
        return g, pend + idx_b[0] * 0, st, ps

    graph, pend, state, _ = jax.lax.fori_loop(
        0, n_real, body, (graph, jnp.int32(0), state, poses))
    return state, poses, graph, pend


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
    timed(f_t0_args, lambda: (eng.init_state(cfg_t), scans, odom),
          f"t0_args_{rep}")
    timed(f_kscan,
          lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360),
                   scans, odom), f"kscan_{rep}")
    timed(f_kdyn0,
          lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360),
                   scans, odom), f"kdyn0_{rep}")
    timed(f_kdyn64,
          lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360),
                   scans, odom), f"kdyn64_{rep}")
