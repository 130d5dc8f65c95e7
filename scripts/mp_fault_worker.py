"""Fault-injection worker: one process of a 2-process RBPF run that can be
killed mid-run and resumed from checkpoint (SURVEY.md §4/§5: "kill one host
process in the distributed test harness").

Behavior per process:
- joins the jax.distributed group, shards the particle axis globally;
- BEFORE each step runs ``multihost.heartbeat`` (deadline-guarded psum);
  if it fails, prints ``DETECTED <step>`` and exits 3 (the group is wedged
  — the launcher must restart it);
- process ``fault_pid`` exits hard (os._exit 17) at the start of step
  ``fault_at`` — the injected host death;
- process 0 allgathers the state after every step and checkpoints it via
  ``RecoveryLoop`` so a relaunch resumes from the last completed step;
- at startup, ``RecoveryLoop.restore_or`` resumes from the checkpoint when
  one exists (step index lives in the state), else starts fresh;
- after the final step prints ``DIGEST <pid> x y theta step``.

Usage: mp_fault_worker.py <pid> <nproc> <coordinator> <ckpt_dir> <n_steps>
       <fault_at (-1 = none)>
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir, n_steps, fault_at = sys.argv[4], int(sys.argv[5]), int(sys.argv[6])
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import numpy as np
    from jax.experimental import multihost_utils

    from slam_constructor_tpu.models import gmapping
    from slam_constructor_tpu.parallel import mesh as meshlib, multihost, particles
    from slam_constructor_tpu.utils import datagen

    devs = jax.devices()
    mesh = meshlib.flat_mesh("particles", devices=devs)
    p = len(devs) * 2
    cfg = gmapping.GMappingConfig(n_particles=p, map_height=96, map_width=96)

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(60)
    poses = datagen.corridor_trajectory(max(n_steps, 2))
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(2)
    )

    loop = multihost.RecoveryLoop(
        os.path.join(ckpt_dir, "rbpf_state"), save_every=1
    )
    full_state, resumed = loop.restore_or(
        gmapping.init_state(cfg), lambda: gmapping.init_state(cfg)
    )
    start = int(full_state.step)
    print(f"START {pid} step={start} resumed={int(resumed)}", flush=True)

    step = particles.make_sharded_step(cfg, mesh)
    st = particles.shard_state(full_state, mesh)

    for i in range(start, n_steps):
        if pid == int(os.environ.get("FAULT_PID", 1)) and i == fault_at:
            print(f"DYING {pid} at step {i}", flush=True)
            sys.stdout.flush()
            os._exit(17)
        if not multihost.heartbeat(mesh, "particles", timeout_s=25.0):
            print(f"DETECTED {pid} at step {i}", flush=True)
            os._exit(3)  # group wedged; interpreter exit would join the
            # hung collective thread — hard-exit is the contract
        s_i = jax.tree.map(lambda a: a[i], scans)
        st, _ = step(st, s_i, odom[i])
        # snapshot: allgather the sharded state into a host pytree (small
        # at test scale) and tick the recovery loop from process 0
        host_state = jax.tree.map(
            lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True))
            if getattr(a, "ndim", 0) > 0 and a.shape[:1] == (p,)
            else np.asarray(a),
            st,
        )
        if pid == 0:
            loop.tick(host_state)

    est = np.asarray(
        multihost_utils.process_allgather(
            jax.jit(gmapping.estimate_pose)(st), tiled=True
        )
    )
    print(
        f"DIGEST {pid} {est[0]:.9f} {est[1]:.9f} {est[2]:.9f} {n_steps}",
        flush=True,
    )


if __name__ == "__main__":
    main()
