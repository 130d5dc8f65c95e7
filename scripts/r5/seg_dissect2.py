"""r5: finer dissection of the fused-segment tax (seg_dissect round 2).

Round-1 dissection: mono 549 / trackonly 441 / packed 429 / kfloop 283
scans/s — TWO separate taxes: (A) the tracking scan itself loses ~20%
(gate math + 4 stacked outputs?), (B) the keyframe fori_loop costs
~10 ms per COND-SKIPPED iteration. This ladder isolates each piece.

Track ladder (one jitted scan over 512 scans each):
  t0  scan body = slam_step only, carry=st, out=pose   (mono-in-jit)
  t1  + keyframe-gate math in body (carry extended), out=pose
  t2  + all 4 stacked outputs (== trackonly)
Keyframe-loop ladder (t2 + fori_loop over 64 batches, all invalid):
  k0  loop body = dynamic_slice + carry pass-through (no conds)
  k1  + cond(valid.any) with TRIVIAL branches
  k2  + real do_batch branch (process_keyframes), no burst cond
  k3  + burst cond too (== kfloop == fused program)
Also dumps whether the TPU executable keeps `conditional` ops or
flattened them (first run only, hlo_conditionals row).

Rows -> TPU_MEASURES seg_dissect2/*.
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
from slam_constructor_tpu.ops import grid as gridlib
from slam_constructor_tpu.ops.geometry import between, compose, pose_distance
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_dissect2/{name}", "ts": time.time(),
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
KB = 8
NO_KF = jnp.asarray([1e6, 1e6, 0.0], jnp.float32)
MODEL = cfg_t.cell_model


@jax.jit
def f_t0(state):
    def body(st, inp):
        scan, od = inp
        st = slam_step(cfg_t, st, scan, od)
        return st, st.pose
    state, poses = jax.lax.scan(body, state, (scans, odom))
    return state, poses


@jax.jit
def f_t1(state):
    def body(carry, inp):
        st, last_kf, anch, cnt = carry
        scan, od = inp
        st = slam_step(cfg_t, st, scan, od)
        is_kf = pose_distance(last_kf, st.pose, 1.0) > GCFG.keyframe_distance
        last_kf = jnp.where(is_kf, st.pose, last_kf)
        cnt = cnt + is_kf.astype(jnp.int32)
        anch = jnp.where(is_kf, st.pose, anch)
        return (st, last_kf, anch, cnt), st.pose
    (state, *_), poses = jax.lax.scan(
        body, (state, NO_KF, jnp.zeros(3), jnp.int32(0)), (scans, odom))
    return state, poses


def track_full(state):
    def body(carry, inp):
        st, last_kf, anch, cnt = carry
        scan, od = inp
        st = slam_step(cfg_t, st, scan, od)
        is_kf = pose_distance(last_kf, st.pose, 1.0) > GCFG.keyframe_distance
        last_kf = jnp.where(is_kf, st.pose, last_kf)
        cnt = cnt + is_kf.astype(jnp.int32)
        anch = jnp.where(is_kf, st.pose, anch)
        a_idx = jnp.maximum(cnt - 1, 0)
        delta = between(anch, st.pose)
        return (st, last_kf, anch, cnt), (
            st.pose, is_kf, a_idx.astype(jnp.float32), delta)
    return jax.lax.scan(
        body, (state, NO_KF, jnp.zeros(3), jnp.int32(0)), (scans, odom))


@jax.jit
def f_t2(state):
    (state, *_), outs = track_full(state)
    return state, outs[0]


def mk_kf(mode):
    @jax.jit
    def f(state, graph):
        (state, last_kf, anch, _), (poses, flags, a_idx, deltas) = (
            track_full(state))
        n_batches = -(-n // KB)
        kf_idx = jnp.nonzero(flags, size=n_batches * KB, fill_value=n)[0]

        def burst(args):
            g, st, pend, ps = args
            last = g.last_kf
            before = g.kf_poses[last]
            g, n_new = pglib.densify_loops(GCFG, MODEL, g)
            g = pglib.optimize(GCFG, g)
            after = g.kf_poses[last]
            fresh = gridlib.make_grid_map(
                MODEL, cfg_t.map_height, cfg_t.map_width, cfg_t.map_scale)
            gm = pglib.regenerate_map(GCFG, MODEL, g, fresh, beam=cfg_t.beam)
            ps = compose(after, between(before, ps))
            return g, st.replace(
                gm=gm, pose=compose(after, between(before, st.pose))
            ), jnp.int32(0), ps

        def no_burst(args):
            return args

        def body(bi, carry):
            g, pend, st, ps = carry
            idx_b = jax.lax.dynamic_slice(kf_idx, (bi * KB,), (KB,))
            valid_b = idx_b < n
            idx_c = jnp.clip(idx_b, 0, n - 1)
            if mode == "k0":
                pend = pend + idx_b[0] * 0
                return g, pend, st, ps
            if mode == "k1":
                g, nl_b = jax.lax.cond(
                    valid_b.any(),
                    lambda g: (g, jnp.int32(1)),
                    lambda g: (g, jnp.int32(0)), g)
                return g, pend + nl_b, st, ps
            def do_batch(g):
                scans_k = jax.tree.map(lambda a: a[idx_c], scans)
                return pglib.process_keyframes(
                    GCFG, MODEL, g, scans_k, ps[idx_c], valid_b)
            g, nl_b = jax.lax.cond(
                valid_b.any(), do_batch, lambda g: (g, jnp.int32(0)), g)
            pend = pend + nl_b
            if mode == "k3":
                g, st, pend, ps = jax.lax.cond(
                    pend >= 8, burst, no_burst, (g, st, pend, ps))
            return g, pend, st, ps

        g, pend, state, _ = jax.lax.fori_loop(
            0, n_batches, body, (graph, jnp.int32(0), state, poses))
        return state, poses, g

    return f


def timed(fn, mk_args, tag):
    args = mk_args()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)
    args = mk_args()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1], out)
    emit(tag, {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


def hlo_conditionals():
    f = mk_kf("k3")
    lowered = jax.jit(
        lambda s, g: f(s, g)
    ).lower(eng.init_state(cfg_t), pglib.init_state(GCFG, 360))
    try:
        txt = lowered.compile().as_text()
    except Exception as e:
        emit("hlo_conditionals", {"error": str(e)[:120]})
        return
    emit("hlo_conditionals", {
        "conditional_ops": txt.count("conditional"),
        "select_hint": txt.count("select("),
        "len": len(txt),
    })


REPS = int(os.environ.get("REPS", 2))
for rep in range(REPS):
    timed(f_t0, lambda: (eng.init_state(cfg_t),), f"t0_{rep}")
    timed(f_t1, lambda: (eng.init_state(cfg_t),), f"t1_{rep}")
    timed(f_t2, lambda: (eng.init_state(cfg_t),), f"t2_{rep}")
    for mode in ("k0", "k1", "k2", "k3"):
        timed(mk_kf(mode),
              lambda: (eng.init_state(cfg_t), pglib.init_state(GCFG, 360)),
              f"{mode}_{rep}")
if os.environ.get("HLO", "1") == "1":
    hlo_conditionals()
