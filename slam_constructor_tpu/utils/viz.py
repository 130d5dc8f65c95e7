"""Visualization: map + trajectory rendering (the reference's rviz viewer
equivalent, SURVEY.md §2.7 — offline artifacts instead of live topics)."""

from __future__ import annotations

import numpy as np


def render_map_rgb(
    occupancy,
    trajectory=None,
    origin=None,
    scale: float = 0.1,
    gt=None,
) -> np.ndarray:
    """Occupancy plane (+optional trajectories) -> uint8 RGB image [H, W, 3].

    Convention: free = white, occupied = black, unknown-ish = gray;
    estimated trajectory red, ground truth green. Row 0 is the map's bottom
    (callers flip for image formats)."""
    occ = np.asarray(occupancy)
    img = np.clip((1.0 - occ) * 255, 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)

    def draw(traj, color):
        if traj is None or origin is None:
            return
        t = np.asarray(traj)
        col = np.floor((t[:, 0] - origin[0]) / scale).astype(int)
        row = np.floor((t[:, 1] - origin[1]) / scale).astype(int)
        ok = (row >= 0) & (row < occ.shape[0]) & (col >= 0) & (col < occ.shape[1])
        rgb[row[ok], col[ok]] = color

    draw(gt, (0, 200, 0))
    draw(trajectory, (220, 0, 0))
    return rgb


def save_ppm(path: str, rgb: np.ndarray) -> None:
    """Dependency-free PPM writer (flips vertically: row 0 at bottom)."""
    img = np.asarray(rgb)[::-1]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


def save_png(path: str, rgb: np.ndarray) -> bool:
    """PNG via matplotlib if available; falls back to .ppm next to it."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, np.asarray(rgb)[::-1])
        return True
    except Exception:
        save_ppm(path.rsplit(".", 1)[0] + ".ppm", rgb)
        return False


def save_map_yaml(path: str, pgm_name: str, origin, scale: float) -> None:
    """ROS map_server-style YAML metadata next to a PGM export."""
    with open(path, "w") as f:
        f.write(
            f"image: {pgm_name}\nresolution: {scale}\n"
            f"origin: [{float(origin[0])}, {float(origin[1])}, 0.0]\n"
            "negate: 0\noccupied_thresh: 0.65\nfree_thresh: 0.25\n"
        )
