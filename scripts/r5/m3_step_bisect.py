"""r5: step-level CPU-vs-TPU bisect of the viny_m3rsm engine.

Runs the first N steps one slam_step at a time from identical data
(/tmp/m3_div_data.npz from m3_divergence.py), dumping per step: the
matched pose, match prob, map-plane checksums and pyramid checksums.
Phase 1 (SLAM_PROBE_BACKEND=cpu) writes /tmp/m3_steps_cpu.npz; phase 2
(TPU) writes _tpu.npz and prints the first-divergence table.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

import jax

CPU = os.environ.get("SLAM_PROBE_BACKEND") == "cpu"
if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from slam_constructor_tpu.models import engine as eng, viny
from slam_constructor_tpu.ops import scoring
from slam_constructor_tpu.ops.scan import LaserScan

N = int(os.environ.get("N", 24))


def main():
    cfg = viny.viny_m3rsm_config(map_size=256)
    d = np.load("/tmp/m3_div_data.npz")
    scans = LaserScan(ranges=jnp.asarray(d["ranges"]),
                      bearings=jnp.asarray(d["bearings"]),
                      valid=jnp.asarray(d["valid"]))
    odom, gt = jnp.asarray(d["odom"]), np.asarray(d["gt"])

    st = eng.init_state(cfg)
    st = st.replace(pose=jnp.asarray(gt[0]))
    step = jax.jit(lambda s, sc, od: eng.slam_step(cfg, s, sc, od))

    poses, probs, mapsum, pyrsum = [], [], [], []
    maps, pyr0 = [], []
    for i in range(N):
        sc = jax.tree.map(lambda a: a[i], scans)
        st = step(st, sc, odom[i])
        poses.append(np.asarray(st.pose))
        probs.append(float(np.asarray(st.last_prob)))
        view = scoring.MapView.of(st.gm, cfg.cell_model)
        occ = np.asarray(view.occ)
        maps.append(occ)
        mapsum.append(float(np.abs(occ).sum()))
        p0 = np.asarray(st.pyramid[0])
        pyr0.append(p0)
        pyrsum.append(float(np.abs(p0).sum()))
    backend = jax.default_backend()
    np.savez(f"/tmp/m3_steps_{backend}.npz", poses=np.array(poses),
             probs=np.array(probs), mapsum=np.array(mapsum),
             pyrsum=np.array(pyrsum), maps=np.array(maps),
             pyr0=np.array(pyr0))
    if not CPU and os.path.exists("/tmp/m3_steps_cpu.npz"):
        c = np.load("/tmp/m3_steps_cpu.npz")
        print(f"{'i':>3} {'|dpose|':>10} {'dprob':>10} {'map max|d|':>10} "
              f"{'pyr0 max|d|':>11}")
        for i in range(N):
            dp = np.abs(np.array(poses[i]) - c["poses"][i]).max()
            dpr = abs(probs[i] - c["probs"][i])
            dm = np.abs(maps[i] - c["maps"][i]).max()
            dy = np.abs(pyr0[i] - c["pyr0"][i]).max()
            print(f"{i:>3} {dp:>10.2e} {dpr:>10.2e} {dm:>10.2e} {dy:>11.2e}")


if __name__ == "__main__":
    main()
