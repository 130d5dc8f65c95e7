"""Scaling-efficiency benchmark: RBPF throughput vs. device count.

BASELINE target: >= 75% scaling efficiency 1 -> 2 hosts. On a multi-chip
machine this measures real ICI scaling of the particle-sharded RBPF; on a
single chip / CPU session it exercises the same sharded program over
virtual devices (set XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu) so the collective structure is validated even when the
wall-clock efficiency is synthetic.

Prints one JSON line per device count + a final efficiency summary line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax

    if os.environ.get("SLAM_SCALING_CPU"):
        # the axon plugin overrides the JAX_PLATFORMS env var (CLAUDE.md);
        # only the in-Python config reliably forces the virtual-device
        # CPU mesh for the rehearsal
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from slam_constructor_tpu.models import gmapping
    from slam_constructor_tpu.parallel import mesh as meshlib, particles
    from slam_constructor_tpu.utils import datagen

    n_scans = int(os.environ.get("SLAM_BENCH_SCANS", 32))
    n_beams = int(os.environ.get("SLAM_BENCH_BEAMS", 180))
    particles_per_dev = int(os.environ.get("SLAM_BENCH_PARTICLES_PER_DEV", 8))

    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]

    occ, origin, scale = datagen.cecum_world()
    poses = datagen.corridor_trajectory(n_scans)
    bearings = datagen.default_bearings(n_beams)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0)
    )

    results = {}
    for n in counts:
        # weak scaling: particles grow with devices (the production shape —
        # more devices -> more hypotheses at constant per-device load)
        p = particles_per_dev * n
        cfg = gmapping.GMappingConfig(
            n_particles=p, map_height=192, map_width=192
        )
        mesh = meshlib.flat_mesh("particles", devices=devs[:n])
        run = particles.make_sharded_run(cfg, mesh)
        st = particles.shard_state(gmapping.init_state(cfg), mesh)
        st0 = jax.tree.map(lambda a: a.copy(), st)
        out = run(st, scans, odom)
        np.asarray(out[1])  # compile + sync
        t0 = time.perf_counter()
        out = run(st0, scans, odom)
        np.asarray(out[1])
        dt = time.perf_counter() - t0
        # particle-steps/sec: work units processed per second
        rate = n_scans * p / dt
        results[n] = rate
        print(json.dumps({"devices": n, "particles": p,
                          "particle_steps_per_sec": round(rate, 1),
                          "scans_per_sec": round(n_scans / dt, 2)}))

    if len(results) > 1:
        base = results[counts[0]] / counts[0]
        on_cpu = jax.default_backend() == "cpu"
        for n in counts[1:]:
            eff = results[n] / (n * base)
            print(json.dumps({"metric": f"scaling_efficiency_1_to_{n}",
                              "value": round(eff, 3)}))
        # On virtual CPU devices every "device" shares the same physical
        # cores, so wall-clock can't improve with device count and the
        # efficiency above is meaningless; what the rehearsal DOES measure
        # is how much total work rate the added sharding/collectives eat:
        # retention = total particle-steps/s at N shards vs unsharded.
        if on_cpu:
            for n in counts[1:]:
                ret = results[n] / results[counts[0]]
                print(json.dumps({
                    "metric": f"work_rate_retention_1_to_{n}_shards",
                    "value": round(ret, 3),
                    "note": "mesh-simulation: shared-core virtual devices",
                }))


if __name__ == "__main__":
    main()
