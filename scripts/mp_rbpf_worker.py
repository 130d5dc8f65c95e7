"""Multi-process RBPF worker: one process of a jax.distributed group.

Launched by tests/test_multiprocess.py (and usable as a template for real
multi-host runs): joins the process group, shards the particle axis over the
GLOBAL device mesh, runs a few RBPF steps, and prints the (replicated)
best-particle pose digest; process 0 also computes the single-process
reference and asserts equality — the SURVEY §4 "same-seed multi-host
equivalence" test, with real process boundaries.

Usage: python scripts/mp_rbpf_worker.py <pid> <nproc> <coordinator>
Env: XLA_FLAGS=--xla_force_host_platform_device_count=<local_devs>
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import jax.numpy as jnp
    import numpy as np

    from slam_constructor_tpu.models import gmapping
    from slam_constructor_tpu.parallel import mesh as meshlib, particles
    from slam_constructor_tpu.utils import datagen

    devs = jax.devices()
    mesh = meshlib.flat_mesh("particles", devices=devs)
    p = len(devs) * 2
    cfg = gmapping.GMappingConfig(n_particles=p, map_height=96, map_width=96)

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(60)
    poses = datagen.corridor_trajectory(3)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(2)
    )

    step = particles.make_sharded_step(cfg, mesh)
    st = particles.shard_state(gmapping.init_state(cfg), mesh)
    for i in range(3):
        s_i = jax.tree.map(lambda a: a[i], scans)
        st, _ = step(st, s_i, odom[i])
    # cross-process fetch: allgather the (sharded) global arrays
    from jax.experimental import multihost_utils

    est = np.asarray(
        multihost_utils.process_allgather(
            jax.jit(gmapping.estimate_pose)(st), tiled=True
        )
    )
    logw = np.asarray(
        multihost_utils.process_allgather(st.log_weights, tiled=True)
    )
    print(f"DIGEST {pid} {est[0]:.6f} {est[1]:.6f} {est[2]:.6f}", flush=True)

    if pid == 0:
        ref = gmapping.init_state(cfg)
        for i in range(3):
            s_i = jax.tree.map(lambda a: a[i], scans)
            ref, _ = gmapping.gmapping_step(cfg, ref, s_i, odom[i])
        ref_est = np.asarray(gmapping.estimate_pose(ref))
        np.testing.assert_allclose(est, ref_est, atol=1e-4)
        np.testing.assert_allclose(
            logw, np.asarray(ref.log_weights), atol=1e-4
        )
        print("EQUIVALENT", flush=True)


if __name__ == "__main__":
    main()
