"""r5: why does viny_m3rsm read ATE ~4 m on TPU when the same config
measures 0.07 on CPU (viny_ms_m3_r5fix vs the CPU bisect)?

Probe: build the SAME map + scan + prior on both backends and compare
m3rsm_match outputs (pose, prob) and the top-level candidate scores,
for impl in {gather, matmul}. CPU gather is the reference semantics;
CPU matmul isolates the sampler; TPU rows isolate the backend.

Run with SLAM_PROBE_BACKEND=cpu / unset (tpu) — one backend per process
(the axon plugin owns platform selection), rows print as JSON lines.
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax

if os.environ.get("SLAM_PROBE_BACKEND") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from slam_constructor_tpu.models import engine as eng, viny
from slam_constructor_tpu.ops import m3rsm as m3lib, raycast, scoring
from slam_constructor_tpu.utils import datagen


def main():
    cfg = viny.viny_m3rsm_config(map_size=256)
    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.3)
    poses = jnp.tile(lap, (2, 1))
    bearings = datagen.default_bearings(360)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
        odom_noise_xy=0.01, odom_noise_theta=0.005)

    # map built from the first 40 scans at GROUND TRUTH poses (no SLAM in
    # the loop: the probe isolates the matcher, not the pipeline)
    st = eng.init_state(cfg)
    gm = st.gm
    for i in range(40):
        s_i = jax.tree.map(lambda a: a[i], scans)
        gm = raycast.insert_scan(gm, cfg.cell_model, gt[i], s_i, cfg.beam)
    view = scoring.MapView.of(gm, cfg.cell_model)

    # query: scan 40 with a deliberately-offset prior
    s_q = jax.tree.map(lambda a: a[40], scans)
    prior = gt[40] + jnp.array([0.22, -0.17, 0.06])

    backend = jax.default_backend()
    for impl in ("gather", "matmul"):
        mcfg = dataclasses.replace(
            cfg.matcher_cfg,
            scoring=dataclasses.replace(cfg.matcher_cfg.scoring, impl=impl),
        )
        res = jax.jit(
            lambda v, s, p: m3lib.m3rsm_match(v, s, p, None, mcfg)
        )(view, s_q, prior)
        pose = np.asarray(res.pose)
        err = pose - np.asarray(gt[40])
        print(json.dumps({
            "name": f"m3_probe/{backend}_{impl}",
            "pose": [round(float(x), 5) for x in pose],
            "err_vs_gt": [round(float(x), 5) for x in err],
            "prob": round(float(np.asarray(res.prob)), 6),
        }), flush=True)
        # no-refine variant: separates the B&B discrete answer from the
        # hill-climb polish
        mcfg0 = dataclasses.replace(mcfg, refine_iterations=0)
        res0 = jax.jit(
            lambda v, s, p: m3lib.m3rsm_match(v, s, p, None, mcfg0)
        )(view, s_q, prior)
        pose0 = np.asarray(res0.pose)
        print(json.dumps({
            "name": f"m3_probe/{backend}_{impl}_noref",
            "pose": [round(float(x), 5) for x in pose0],
            "err_vs_gt": [round(float(x), 5) for x in
                          (pose0 - np.asarray(gt[40]))],
            "prob": round(float(np.asarray(res0.prob)), 6),
        }), flush=True)


if __name__ == "__main__":
    main()
