"""Synthetic world + scan-sequence generation: the offline test oracle.

Parity with the reference's test-data layer (SURVEY.md §2.8 [unverified]:
``GridMapPatcher`` building maps from ASCII patterns and
``LaserScanGenerator`` synthesizing perfect scans — the "cecum" corridor is
its canonical fixture). With no network access this subsystem is
load-bearing: it provides ground-truth maps, trajectories, scans, and noisy
odometry for every unit test and benchmark until real datasets arrive.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import raycast, scan as scanlib
from ..ops.geometry import between, compose, wrap_angle

Array = jax.Array


def ascii_to_occupancy(art: str) -> np.ndarray:
    """ASCII art -> occupancy plane f32[H, W] (``#`` = wall). The first text
    line is the TOP row of the world (y grows upward, so rows reverse)."""
    lines = [ln for ln in art.strip("\n").splitlines()]
    width = max(len(ln) for ln in lines)
    rows = [
        [1.0 if ch == "#" else 0.0 for ch in ln.ljust(width)] for ln in lines
    ]
    return np.asarray(rows[::-1], np.float32)


def cecum_world(scale: float = 0.1, upscale: int = 4):
    """The reference's corridor-with-dead-end ("cecum") fixture: a ring
    corridor around a central block, with a dead-end gap in the block's
    lower wall. Each ASCII char maps to ``upscale`` x ``upscale`` cells;
    defaults give a 14.4m x 5.2m world (corridors 1.2m wide) at 0.1 m/cell.
    Returns (occ f32[H, W], origin f32[2], scale)."""
    art = """
####################################
#                                  #
#                                  #
#                                  #
#      ####################        #
#      #                  #        #
#      #                  #        #
#      #                  #        #
#      ########  ##########        #
#                                  #
#                                  #
#                                  #
####################################
"""
    occ = np.asarray(ascii_to_occupancy(art))
    occ = np.kron(occ, np.ones((upscale, upscale), np.float32))
    h, w = occ.shape
    origin = np.array([-w * scale / 2, -h * scale / 2], np.float32)
    return jnp.asarray(occ), jnp.asarray(origin), scale


def box_world(
    size_m: float = 10.0, scale: float = 0.1, obstacles: int = 6, seed: int = 0
):
    """Square room with random rectangular obstacles."""
    n = int(round(size_m / scale))
    occ = np.zeros((n, n), np.float32)
    occ[0, :] = occ[-1, :] = occ[:, 0] = occ[:, -1] = 1.0
    rng = np.random.default_rng(seed)
    for _ in range(obstacles):
        ch, cw = rng.integers(2, max(3, n // 8), 2)
        r = rng.integers(2, n - ch - 2)
        c = rng.integers(2, n - cw - 2)
        # keep the center clear so the robot can start there
        if abs(r + ch / 2 - n / 2) < n / 6 and abs(c + cw / 2 - n / 2) < n / 6:
            continue
        occ[r : r + ch, c : c + cw] = 1.0
    origin = np.array([-size_m / 2, -size_m / 2], np.float32)
    return jnp.asarray(occ), jnp.asarray(origin), scale


def default_bearings(n_beams: int = 360, fov: float = 2 * np.pi) -> Array:
    return jnp.asarray(
        np.linspace(-fov / 2, fov / 2, n_beams, endpoint=False), jnp.float32
    )


def corridor_trajectory(n_steps: int = 60, y: float = -1.6) -> Array:
    """Drive +x along the lower corridor of the default cecum world (the
    corridor spans y in about (-2.2, -0.9); ends are visible for x fixing)."""
    xs = np.linspace(-4.5, 4.5, n_steps)
    poses = np.stack([xs, np.full_like(xs, y), np.zeros_like(xs)], axis=-1)
    return jnp.asarray(poses, jnp.float32)


def rectangle_trajectory(
    corners=((-5.6, -1.6), (4.8, -1.6), (4.8, 1.6), (-5.6, 1.6)),
    step: float = 0.25,
    close: bool = True,
) -> Array:
    """Piecewise-linear loop through ``corners`` (default: a lap around the
    cecum world's inner block), heading along each segment. Good for
    loop-closure tests: the path returns to its start."""
    pts = [np.asarray(c, np.float64) for c in corners]
    if close:
        pts.append(pts[0])
    poses = []
    for a, b in zip(pts[:-1], pts[1:]):
        seg = b - a
        length = float(np.hypot(*seg))
        heading = float(np.arctan2(seg[1], seg[0]))
        n = max(1, int(round(length / step)))
        for t in np.linspace(0, 1, n, endpoint=False):
            p = a + t * seg
            poses.append((p[0], p[1], heading))
    return jnp.asarray(np.asarray(poses), jnp.float32)


def loop_trajectory(
    n_steps: int = 120, radius: float = 3.0, center=(0.0, 0.0)
) -> Array:
    """Closed circular loop (for loop-closure tests)."""
    a = np.linspace(0, 2 * np.pi, n_steps, endpoint=False)
    x = center[0] + radius * np.cos(a)
    y = center[1] + radius * np.sin(a)
    th = wrap_angle(jnp.asarray(a + np.pi / 2))
    return jnp.stack(
        [jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), th], axis=-1
    )


def synth_sequence(
    occ: Array,
    origin: Array,
    scale: float,
    poses: Array,
    bearings: Array,
    key: Array,
    max_range: float = 15.0,
    odom_noise_xy: float = 0.01,
    odom_noise_theta: float = 0.005,
    range_noise: float = 0.0,
):
    """Generate (scans, odom_deltas, true_poses) along a trajectory.

    Odometry deltas are the true between-pose deltas corrupted with Gaussian
    noise — the drift source the matcher must correct, mirroring how the
    reference is fed tf odometry plus laser scans.
    Returns ``(LaserScan batched [T, R], odom f32[T, 3], poses f32[T, 3])``.
    """
    n = poses.shape[0]

    def gen_one(p, k):
        s = raycast.cast_rays(occ, origin, scale, p, bearings, max_range)
        if range_noise > 0:
            noisy = s.ranges + jax.random.normal(k, s.ranges.shape) * range_noise
            s = s.replace(ranges=jnp.where(s.valid, noisy, s.ranges))
        return s

    keys = jax.random.split(key, n + 1)
    scans = jax.vmap(gen_one)(poses, keys[:n])

    deltas = between(poses[:-1], poses[1:])  # [T-1, 3]
    deltas = jnp.concatenate([jnp.zeros((1, 3)), deltas], axis=0)
    noise = (
        jax.random.normal(keys[n], deltas.shape)
        * jnp.array([odom_noise_xy, odom_noise_xy, odom_noise_theta])
    )
    odom = deltas + noise.at[0].set(0.0)
    return scans, odom.astype(jnp.float32), poses
