"""r5: locate the step where the viny_m3rsm pipeline diverges on TPU.

Phase 1 (SLAM_PROBE_BACKEND=cpu): generate the bench sequence (seed 42,
quality-noise convention), save it to /tmp/m3_div_data.npz, run the
engine, save the CPU trajectory.

Phase 2 (default, TPU): load the SAME arrays, run the engine, compare
per-step pose error vs gt and vs the CPU trajectory; print the first
divergence step and the error profile (spike-vs-cascade — CLAUDE.md
discipline: check the profile before blaming kernels).
"""
import json
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
from slam_constructor_tpu.ops.scan import LaserScan
from slam_constructor_tpu.utils import datagen, evaluate

DATA = "/tmp/m3_div_data.npz"


def main():
    import dataclasses

    cfg = viny.viny_m3rsm_config(map_size=256)
    # SLAM_PROBE_FREE_IMPL=dda forces the per-beam DDA free fill on TPU
    # (the 'auto' default resolves to 'polar' there — the r5 suspect)
    fi = os.environ.get("SLAM_PROBE_FREE_IMPL")
    if fi:
        cfg = dataclasses.replace(
            cfg, beam=dataclasses.replace(cfg.beam, free_impl=fi))
    if CPU:
        occ, origin, scale = datagen.cecum_world()
        lap = datagen.rectangle_trajectory(step=0.3)
        poses = jnp.tile(lap, (2, 1))
        bearings = datagen.default_bearings(360)
        scans, odom, gt = datagen.synth_sequence(
            occ, origin, scale, poses, bearings, jax.random.PRNGKey(42),
            odom_noise_xy=0.02, odom_noise_theta=0.012)
        np.savez(DATA, ranges=np.asarray(scans.ranges),
                 bearings=np.asarray(scans.bearings),
                 valid=np.asarray(scans.valid),
                 odom=np.asarray(odom), gt=np.asarray(gt))
    d = np.load(DATA)
    scans = LaserScan(ranges=jnp.asarray(d["ranges"]),
                      bearings=jnp.asarray(d["bearings"]),
                      valid=jnp.asarray(d["valid"]))
    odom, gt = jnp.asarray(d["odom"]), np.asarray(d["gt"])

    st = eng.init_state(cfg)
    st = st.replace(pose=jnp.asarray(gt[0]))
    _, traj, _ = eng.run_sequence(cfg, st, scans, odom)
    traj = np.asarray(traj)
    backend = jax.default_backend()
    np.save(f"/tmp/m3_div_traj_{backend}.npy", traj)

    err = np.linalg.norm(traj[:, :2] - gt[:, :2], axis=1)
    ate = float(evaluate.ate(jnp.asarray(traj), jnp.asarray(gt), align=False))
    # error profile: step index of first crossing of each threshold
    prof = {f">{t}": int(np.argmax(err > t)) if (err > t).any() else -1
            for t in (0.1, 0.3, 0.5, 1.0, 2.0)}
    out = {"name": f"m3_div/{backend}", "ate": round(ate, 4),
           "err_max": round(float(err.max()), 3), "profile": prof,
           "err_q": [round(float(np.quantile(err, q)), 3)
                     for q in (0.5, 0.9, 1.0)]}
    cpu_path = "/tmp/m3_div_traj_cpu.npy"
    if not CPU and os.path.exists(cpu_path):
        ctraj = np.load(cpu_path)
        d2 = np.linalg.norm(traj[:, :2] - ctraj[:, :2], axis=1)
        out["first_div_gt_1cm"] = int(np.argmax(d2 > 0.01)) if (d2 > 0.01).any() else -1
        out["first_div_gt_10cm"] = int(np.argmax(d2 > 0.10)) if (d2 > 0.10).any() else -1
        out["div_max"] = round(float(d2.max()), 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
