"""Multi-process EP x TP worker: one process of a jax.distributed group
running the composed (pgroups x bands) RBPF step over the GLOBAL mesh.

Round-3 verdict task 9: test_multiprocess covered the flat particle-sharded
RBPF; the composed EP x TP mesh (parallel/ep2d.py) only ever ran
single-process. Here 2 processes x 2 local CPU devices = a (2 pgroups x 2
bands) global mesh with a REAL process boundary through the bands psum and
the pgroups all_gather; process 0 asserts equality with the single-process
shared-pool CoW step (the same golden as test_parallel).

Usage: python scripts/mp_ep2d_worker.py <pid> <nproc> <coordinator>
Env: XLA_FLAGS=--xla_force_host_platform_device_count=2
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, coord = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from slam_constructor_tpu.models import gmapping
    from slam_constructor_tpu.parallel import ep2d
    from slam_constructor_tpu.utils import datagen

    devs = np.asarray(jax.devices())
    assert devs.size == 4, f"expected 4 global devices, got {devs.size}"
    mesh = Mesh(devs.reshape(2, 2), ("pgroups", "bands"))

    cfg = gmapping.GMappingConfig(
        n_particles=4, map_height=128, map_width=128, map_storage="cow",
        tile_block=16, tile_capacity=1024, window_tiles=4,
        proposal="improved",  # the r4 capability: improved on the mesh
    )

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(60)
    poses = datagen.corridor_trajectory(3)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(11)
    )

    st = ep2d.init_ep2d_state(cfg, 2, 2, capacity_per_device=192)
    st = st.replace(gm=ep2d.place(st.gm, mesh))
    step = ep2d.make_ep2d_step(cfg, mesh)
    for i in range(3):
        s_i = jax.tree.map(lambda a: a[i], scans)
        st, _ = step(st, s_i, odom[i])

    from jax.experimental import multihost_utils

    poses_g = np.asarray(
        multihost_utils.process_allgather(st.poses, tiled=True)
    )
    logw_g = np.asarray(
        multihost_utils.process_allgather(st.log_weights, tiled=True)
    )
    print(f"DIGEST {pid} {poses_g[0, 0]:.6f} {poses_g[0, 1]:.6f} "
          f"{logw_g[0]:.6f}", flush=True)

    if pid == 0:
        ref = gmapping.init_state(cfg)
        for i in range(3):
            s_i = jax.tree.map(lambda a: a[i], scans)
            ref, _ = gmapping.gmapping_step(cfg, ref, s_i, odom[i])
        np.testing.assert_allclose(poses_g, np.asarray(ref.poses), atol=1e-5)
        np.testing.assert_allclose(
            logw_g, np.asarray(ref.log_weights), atol=1e-5
        )
        print("EQUIVALENT", flush=True)


if __name__ == "__main__":
    main()
