"""Trajectory IO in TUM format (the reference publishes map->odom tf; our
equivalent output artifact is a TUM-format trajectory usable with the
standard ATE tooling — SURVEY.md §2.7 PoseCorrectionTfPublisher row)."""

from __future__ import annotations

import numpy as np


def save_tum(path: str, poses, timestamps=None) -> None:
    """Write SE(2) poses f32[T, 3] as TUM lines:
    ``t x y 0 0 0 sin(th/2) cos(th/2)`` (yaw-only quaternion)."""
    poses = np.asarray(poses)
    if timestamps is None:
        timestamps = np.arange(len(poses), dtype=np.float64)
    with open(path, "w") as f:
        for t, (x, y, th) in zip(timestamps, poses):
            qz, qw = np.sin(th / 2), np.cos(th / 2)
            f.write(f"{t:.6f} {x:.6f} {y:.6f} 0.000000 0.000000 0.000000 {qz:.6f} {qw:.6f}\n")


def load_tum(path: str):
    """Read a TUM trajectory -> (timestamps f64[T], poses f32[T, 3]).
    Yaw is recovered from the quaternion (assumes planar motion)."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(v) for v in line.split()]
            t, x, y, _z, qx, qy, qz, qw = vals[:8]
            yaw = np.arctan2(
                2 * (qw * qz + qx * qy), 1 - 2 * (qy * qy + qz * qz)
            )
            ts.append(t)
            poses.append((x, y, yaw))
    return np.asarray(ts), np.asarray(poses, np.float32)


def save_map_pgm(path: str, occupancy, threshold_free=0.25, threshold_occ=0.65):
    """Export an occupancy plane as PGM (ROS map_server convention:
    0=occupied/black, 254=free/white, 205=unknown gray)."""
    occ = np.asarray(occupancy)
    img = np.full(occ.shape, 205, np.uint8)
    img[occ <= threshold_free] = 254
    img[occ >= threshold_occ] = 0
    img = img[::-1]  # row 0 at bottom -> image top-down
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.tobytes())
