"""Round-3 insert-kernel breakdown (VERDICT task 5).

SOL_r02: insert_scan (tiny beam: const + wall_blur + polar free) = 1.005 ms
= 0.27% SOL at 256^2/360 beams. TPU_MEASURES insert@matmul/polar (default
beam: NO wall blur) = 0.0298 ms at the same shape. Break the 33x gap into
parts on the chip, device-resident (lax.scan inner loop, scalar fetch).

Writes rows to stdout + TPU_MEASURES.jsonl (name=insert_r3/<part>).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import engine as eng, tiny
from slam_constructor_tpu.ops import grid as gridlib, raycast, scoring
from slam_constructor_tpu.utils import datagen


def timed_loop(f, iters=3, inner=32):
    def body(c, _):
        out = f()
        return c + jax.tree.leaves(out)[0].ravel()[0] * 1e-12, None

    g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=inner)[0])
    float(np.asarray(g(jnp.float32(0))))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(g(jnp.float32(0))))
        ts.append((time.perf_counter() - t0) / inner)
    return float(np.median(ts))


def emit(name, ms, extra=None):
    row = {"name": f"insert_r3/{name}", "ms": round(ms, 4),
           "ts": time.time(), "backend": jax.default_backend()}
    if extra:
        row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    cfg = tiny.tiny_config()
    model = cfg.cell_model
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose, bearings)
    gm = gridlib.make_grid_map(model, 256, 256, 0.1)
    gm = raycast.insert_scan(gm, model, pose, scan, cfg.beam)
    h, w = 256, 256

    beams = {
        "tiny_blur_polar": cfg.beam,  # const + wall_blur + auto(polar)
        "noblur_polar": raycast.BeamConfig(
            occupancy_estimator="const", hole_width=0.3, wall_blur=False,
            free_impl="polar"),
        "tiny_blur_scatter": raycast.BeamConfig(
            occupancy_estimator="const", hole_width=0.3, wall_blur=True,
            free_impl="polar", scatter_impl="scatter"),
    }
    for name, bc in beams.items():
        ms = timed_loop(lambda bc=bc: raycast.insert_scan(gm, model, pose, scan, bc))
        emit(f"full/{name}", ms * 1e3)

    # parts (tiny beam)
    bc = cfg.beam
    ms = timed_loop(lambda: raycast._polar_free_plane(
        h, w, gm.origin, gm.scale, pose, scan, bc))
    emit("part/polar_free_plane", ms * 1e3)

    angles = pose[2] + scan.bearings
    dirs = jnp.stack([jnp.cos(angles), jnp.sin(angles)], axis=-1)
    endpoints = pose[:2] + scan.ranges[:, None] * dirs
    eidx = gridlib.world_to_cell(gm, endpoints)
    ep_valid = scan.valid & (scan.ranges <= bc.max_range)
    ms = timed_loop(lambda: raycast._flat_scatter_add(
        (h, w), eidx[..., 0], eidx[..., 1], jnp.ones(eidx.shape[:1]),
        ep_valid, "matmul"))
    emit("part/endpoint_scatter_matmul", ms * 1e3)

    bt = jnp.linspace(-1.0, 1.0, bc.blur_samples)
    tb = scan.ranges[:, None] + bc.hole_width / 2.0 * bt[None, :]
    pb = pose[:2] + tb[..., None] * dirs[:, None, :]
    ib = gridlib.world_to_cell(gm, pb)
    ramp = jnp.broadcast_to(1.0 - jnp.abs(bt)[None, :], tb.shape)
    vb = ep_valid[:, None] & (tb > 0)
    ms = timed_loop(lambda: raycast._flat_scatter_add(
        (h, w), ib[..., 0], ib[..., 1], ramp, vb, "matmul"))
    emit("part/blur_scatter_matmul_one", ms * 1e3)

    w_obs, s_obs = raycast.scan_observation_planes(gm, pose, scan, bc)
    ms = timed_loop(lambda: gridlib.apply_observations(gm, model, w_obs, s_obs))
    emit("part/apply_observations", ms * 1e3)

    ms = timed_loop(lambda: raycast.scan_observation_planes(gm, pose, scan, bc))
    emit("part/observation_planes", ms * 1e3)


if __name__ == "__main__":
    main()
