"""r5: dissect WHERE the fused-segment program loses 2/3 of tracking
throughput (seg_ab2: seg512_nograph = 170 scans/s in ONE dispatch vs
mono run_sequence 550 — so the tax is INSIDE the compiled program, not
dispatch count).

Variants, all one jitted call over the same 512-scan sequence, timed
with one host fetch at the end:
  mono       engine.run_sequence (control)
  trackonly  the fused fn's tracking lax.scan (gate math + 4 stacked
             outputs) with nothing after it
  packed     trackonly + the packed [S+1,8] concat
  kfloop     packed + nonzero + the 64-iteration keyframe-batch
             fori_loop with all batches invalid (cond-skip) — the
             process_keyframes and burst branches compiled in, never
             taken (pending stays 0)
  fused      the real _segment_fused_fn (nograph config)

Rows -> TPU_MEASURES seg_dissect/*.
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

from slam_constructor_tpu.models import engine as eng, full, posegraph as pglib, tiny
from slam_constructor_tpu.models.engine import slam_step
from slam_constructor_tpu.ops.geometry import between, compose, pose_distance
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_dissect/{name}", "ts": time.time(),
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


def track_scan(tcfg, gcfg, state, last_kf_pose, anchor_pose, base):
    def body(carry, inp):
        st, last_kf, anch, kf_cnt = carry
        scan, od = inp
        st = slam_step(tcfg, st, scan, od)
        is_kf = (
            pose_distance(last_kf, st.pose, gcfg.keyframe_angle_weight)
            > gcfg.keyframe_distance
        )
        last_kf = jnp.where(is_kf, st.pose, last_kf)
        kf_cnt = kf_cnt + is_kf.astype(jnp.int32)
        anch = jnp.where(is_kf, st.pose, anch)
        a_idx = jnp.maximum(base + kf_cnt - 1, 0)
        delta = between(anch, st.pose)
        return (st, last_kf, anch, kf_cnt), (
            st.pose, is_kf, a_idx.astype(jnp.float32), delta)

    return jax.lax.scan(
        body, (state, last_kf_pose, anchor_pose, jnp.int32(0)), (scans, odom))


@partial(jax.jit, static_argnums=(0, 1))
def f_trackonly(tcfg, gcfg, state, last_kf, anch):
    (state, *_), (poses, flags, a_idx, deltas) = track_scan(
        tcfg, gcfg, state, last_kf, anch, jnp.int32(0))
    return state, poses


@partial(jax.jit, static_argnums=(0, 1))
def f_packed(tcfg, gcfg, state, last_kf, anch):
    (state, *_), (poses, flags, a_idx, deltas) = track_scan(
        tcfg, gcfg, state, last_kf, anch, jnp.int32(0))
    counters = jnp.zeros((1, 8), jnp.float32)
    packed = jnp.concatenate(
        [jnp.concatenate(
            [poses, flags[:, None].astype(jnp.float32),
             a_idx[:, None], deltas], 1), counters], axis=0)
    return state, packed


@partial(jax.jit, static_argnums=(0, 1))
def f_kfloop(tcfg, gcfg, state, last_kf, anch, graph, pending):
    model = tcfg.cell_model
    (state, last_kf, anch, _), (poses, flags, a_idx, deltas) = track_scan(
        tcfg, gcfg, state, last_kf, anch, graph.n_kf)
    n_batches = -(-n // KB)
    kf_idx = jnp.nonzero(flags, size=n_batches * KB, fill_value=n)[0]

    def burst(args):
        g, st, pend, lkf, an, ps = args
        last = g.last_kf
        before = g.kf_poses[last]
        g, n_new = pglib.densify_loops(gcfg, model, g)
        g = pglib.optimize(gcfg, g)
        after = g.kf_poses[last]
        new_pose = compose(after, between(before, st.pose))
        from slam_constructor_tpu.ops import grid as gridlib
        fresh = gridlib.make_grid_map(
            model, tcfg.map_height, tcfg.map_width, tcfg.map_scale)
        gm = pglib.regenerate_map(gcfg, model, g, fresh, beam=tcfg.beam)
        ps = compose(after, between(before, ps))
        return g, st.replace(gm=gm, pose=new_pose), jnp.int32(0), n_new, after, after, ps

    def no_burst(args):
        g, st, pend, lkf, an, ps = args
        return g, st, pend, jnp.int32(0), lkf, an, ps

    def batch_body(bi, carry):
        g, nl, pend, st, lkf, an, ps = carry
        idx_b = jax.lax.dynamic_slice(kf_idx, (bi * KB,), (KB,))
        valid_b = idx_b < n
        idx_c = jnp.clip(idx_b, 0, n - 1)

        def do_batch(g):
            scans_k = jax.tree.map(lambda a: a[idx_c], scans)
            return pglib.process_keyframes(
                gcfg, model, g, scans_k, ps[idx_c], valid_b)

        g, nl_b = jax.lax.cond(
            valid_b.any(), do_batch, lambda g: (g, jnp.int32(0)), g)
        pend = pend + nl_b
        g, st, pend, extra, lkf, an, ps = jax.lax.cond(
            pend >= 8, burst, no_burst, (g, st, pend, lkf, an, ps))
        return g, nl + nl_b + extra, pend, st, lkf, an, ps

    (graph, nl, pending, state, last_kf, anch, _) = jax.lax.fori_loop(
        0, n_batches, batch_body,
        (graph, jnp.int32(0), pending, state, last_kf, anch, poses))
    return state, poses, graph, nl


NO_KF = jnp.asarray([1e6, 1e6, 0.0], jnp.float32)


def timed(fn, mk_args, tag):
    args = mk_args()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1] if hasattr(a, 'ravel') else a, out)
    args = mk_args()
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree.map(lambda a: np.asarray(a).ravel()[:1] if hasattr(a, 'ravel') else a, out)
    emit(tag, {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


def run_mono():
    st = eng.init_state(cfg_t)
    st0 = jax.tree.map(lambda a: a.copy(), st)
    out = eng.run_sequence(cfg_t, st, scans, odom)
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = eng.run_sequence(cfg_t, st0, scans, odom)
    np.asarray(out[1])
    emit("mono", {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


def run_fused():
    g = GCFG

    def mk():
        return full.FullSlamEngine(
            full.FullConfig(tracking=cfg_t, graph=g, optimize_every_loops=8),
            n_beams=360)
    e = mk(); e.run(scans, odom, segment=512)
    e2 = mk()
    t0 = time.perf_counter()
    e2.run(scans, odom, segment=512)
    np.asarray(e2.state.pose)
    emit("fused512_nograph", {"scans_per_sec": round(n / (time.perf_counter() - t0), 1)})


for rep in range(int(os.environ.get("REPS", 2))):
    run_mono()
    timed(f_trackonly, lambda: (cfg_t, GCFG, eng.init_state(cfg_t), NO_KF, jnp.zeros(3)), f"trackonly_{rep}")
    timed(f_packed, lambda: (cfg_t, GCFG, eng.init_state(cfg_t), NO_KF, jnp.zeros(3)), f"packed_{rep}")
    timed(f_kfloop, lambda: (cfg_t, GCFG, eng.init_state(cfg_t), NO_KF, jnp.zeros(3),
                             pglib.init_state(GCFG, 360), jnp.int32(0)), f"kfloop_{rep}")
    run_fused()
