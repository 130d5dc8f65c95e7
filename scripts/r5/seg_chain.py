"""r5: TRUE device cost of the fused-segment program via the sanctioned
chained-scan slope (CLAUDE.md timing rules: one dispatch + one scalar
fetch for a K-invocation chain; slope between K=2 and K=6 cancels the
tunnel floor entirely). Settles what the event-noised seg_ab rows could
not: does _segment_fused_fn's PROGRAM cost more than run_sequence's?

Chains (each body feeds its state back so XLA cannot hoist it):
  mono       run_sequence over the 512-scan sequence
  seg_nog    _segment_fused_fn, keyframe gate never fires (pure
             segmentation structure)
  seg_real   _segment_fused_fn, kf_distance=0.7 (real keyframe batches,
             detection, bursts) — capacity sized for 6 chained segments
Rows -> TPU_MEASURES seg_chain/* (per-segment device ms + scans/s).
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

from slam_constructor_tpu.models import engine as eng, full, posegraph as pglib, tiny
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"seg_chain/{name}", "ts": time.time(),
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
NO_KF = jnp.asarray([1e6, 1e6, 0.0], jnp.float32)


def slope(mk_chain, lo=2, hi=6, iters=3):
    f_lo, f_hi = mk_chain(lo), mk_chain(hi)

    def run(f):
        out = f()
        float(np.asarray(out))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(np.asarray(f()))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_lo, t_hi = run(f_lo), run(f_hi)
    if t_hi <= t_lo:
        return None
    return (t_hi - t_lo) / (hi - lo) * 1e3  # ms per chain element


def chain_mono(k):
    st0 = eng.init_state(cfg_t)

    @jax.jit
    def f():
        def body(st, _):
            st, traj, probs = eng.run_sequence(cfg_t, st, scans, odom)
            return st, traj[-1, 0]
        st, outs = jax.lax.scan(body, st0, None, length=k)
        return outs.sum()

    return f


def mk_chain_seg(kf_distance, max_kf_cap, max_edges_cap):
    gcfg = pglib.PoseGraphConfig(
        keyframe_distance=kf_distance, min_index_gap=8, max_candidates=4,
        local_map_size=120, max_keyframes=max_kf_cap, max_edges=max_edges_cap)

    def chain(k):
        st0 = eng.init_state(cfg_t)
        g0 = pglib.init_state(gcfg, 360)

        @jax.jit
        def f():
            def body(c, _):
                st, lkf, anch, g, pend = c
                st, lkf, anch, g, pend, packed = full._segment_fused_fn(
                    cfg_t, gcfg, 1, 8, n, 8, True,
                    st, lkf, anch, g, pend, scans, odom, jnp.int32(0))
                return (st, lkf, anch, g, pend), packed[n, 3]
            (c), outs = jax.lax.scan(
                body, (st0, NO_KF, jnp.zeros(3), g0, jnp.int32(0)),
                None, length=k)
            return outs.sum()

        return f

    return chain


for rep in range(int(os.environ.get("REPS", 2))):
    ms = slope(chain_mono)
    emit(f"mono_{rep}", {
        "ms_per_seq": None if ms is None else round(ms, 1),
        "scans_per_sec_device": None if ms is None else round(n / ms * 1e3, 1)})
    ms = slope(mk_chain_seg(1e9, 128, 512))
    emit(f"seg_nog_{rep}", {
        "ms_per_seq": None if ms is None else round(ms, 1),
        "scans_per_sec_device": None if ms is None else round(n / ms * 1e3, 1)})
    ms = slope(mk_chain_seg(0.7, 1024, 8192))
    emit(f"seg_real_{rep}", {
        "ms_per_seq": None if ms is None else round(ms, 1),
        "scans_per_sec_device": None if ms is None else round(n / ms * 1e3, 1)})
