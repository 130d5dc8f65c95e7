"""r5: re-measure the fused-segment tax after the in-jit slicing fix.

Round-4 committed A/B (seg_ab/*): monolithic tracking 554-556 scans/s vs
fused-segmented with NO graph work 149-312 — the host-side per-segment
pytree slicing cost 4 extra device dispatches (~30-300 ms each through
the axon tunnel) per segment, on top of the odometry fetch r4 already
fixed. _segment_fused_fn now takes the full sequence + a traced offset
and slices inside the jit. Done-bar (r4 verdict Next #1): a committed
pair where seg-nograph >= 0.9x mono.

Interleaved same-window rows -> TPU_MEASURES seg_ab2/*.
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


def probe_event_ms():
    """Current tunnel dispatch+fetch latency (ONE tiny dispatch + ONE
    fetch, compiled once): the event-cost context every segmented row
    needs — the co-tenant window swings this 30-500 ms within minutes
    and the segmented paths pay it per event while mono pays it twice."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((1,), jnp.float32)
    float(np.asarray(f(x))[0])
    t0 = time.perf_counter()
    float(np.asarray(f(x))[0])
    return round((time.perf_counter() - t0) * 1e3, 1)


def emit(name, extra):
    row = {"name": f"seg_ab2/{name}", "ts": time.time(),
           "backend": jax.default_backend(),
           "event_ms": probe_event_ms()}
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


def run_mono():
    st = eng.init_state(cfg_t)
    st0 = jax.tree.map(lambda a: a.copy(), st)
    out = eng.run_sequence(cfg_t, st, scans, odom)
    np.asarray(out[1])
    t0 = time.perf_counter()
    out = eng.run_sequence(cfg_t, st0, scans, odom)
    np.asarray(out[1])
    return n / (time.perf_counter() - t0)


def run_full(kf_distance, seg):
    g = pglib.PoseGraphConfig(keyframe_distance=kf_distance, min_index_gap=8,
                              max_candidates=4, local_map_size=120)

    def mk():
        return full.FullSlamEngine(
            full.FullConfig(tracking=cfg_t, graph=g, optimize_every_loops=8),
            n_beams=360)

    e = mk(); e.run(scans, odom, segment=seg)
    e2 = mk()
    t0 = time.perf_counter()
    e2.run(scans, odom, segment=seg)
    np.asarray(e2.state.pose)
    return n / (time.perf_counter() - t0), e2.total_loops


for rep in range(int(os.environ.get("REPS", 2))):
    emit(f"mono_{rep}", {"scans_per_sec": round(run_mono(), 1)})
    for seg in (128, 256, 512):
        s, _ = run_full(1e9, seg)
        emit(f"seg{seg}_nograph_{rep}", {"scans_per_sec": round(s, 1)})
    s, l = run_full(0.7, 128)
    emit(f"seg128_full_{rep}", {"scans_per_sec": round(s, 1), "loops": l})
    s, l = run_full(0.7, 512)
    emit(f"seg512_full_{rep}", {"scans_per_sec": round(s, 1), "loops": l})
