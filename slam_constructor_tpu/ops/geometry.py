"""SE(2) pose algebra and 2D geometry primitives, array-first.

Capability parity with the reference's L0/L1 math layer
(``src/core/geometry_utils.h``, ``math_utils.h``,
``src/core/states/robot_pose.h`` [unverified paths, see SURVEY.md]) — but
instead of ``RobotPose`` objects with operator overloads, poses are plain
``f32[..., 3]`` arrays ``[x, y, theta]`` and every op is batched/vmappable.

Conventions:
- A *pose* is a frame: translation (x, y) and heading theta (radians).
- A *delta* is a pose increment expressed in the body frame of the pose it is
  applied to (matches the reference's ``RobotPoseDelta`` semantics where
  odometry increments ride on the previous pose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def wrap_angle(theta: Array) -> Array:
    """Normalize angles to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(theta), jnp.cos(theta))


def pose(x, y, theta) -> Array:
    return jnp.stack([jnp.asarray(x, jnp.float32),
                      jnp.asarray(y, jnp.float32),
                      jnp.asarray(theta, jnp.float32)], axis=-1)


def identity_pose() -> Array:
    return jnp.zeros((3,), jnp.float32)


def rot2(theta: Array) -> Array:
    """Rotation matrices ``f32[..., 2, 2]`` for headings ``theta``."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )


def compose(a: Array, b: Array) -> Array:
    """``a ⊕ b``: apply delta ``b`` (in a's body frame) to pose ``a``.

    Broadcasts over leading axes. Equivalent to the reference's
    ``RobotPose + RobotPoseDelta``.
    """
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = a[..., 0] + ca * b[..., 0] - sa * b[..., 1]
    y = a[..., 1] + sa * b[..., 0] + ca * b[..., 1]
    th = wrap_angle(a[..., 2] + b[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def inverse(a: Array) -> Array:
    """Inverse pose: ``compose(a, inverse(a)) == identity``."""
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = -(ca * a[..., 0] + sa * a[..., 1])
    y = -(-sa * a[..., 0] + ca * a[..., 1])
    return jnp.stack([x, y, wrap_angle(-a[..., 2])], axis=-1)


def between(a: Array, b: Array) -> Array:
    """Delta ``d`` (in a's body frame) such that ``compose(a, d) == b``."""
    dx = b[..., 0] - a[..., 0]
    dy = b[..., 1] - a[..., 1]
    ca, sa = jnp.cos(a[..., 2]), jnp.sin(a[..., 2])
    x = ca * dx + sa * dy
    y = -sa * dx + ca * dy
    th = wrap_angle(b[..., 2] - a[..., 2])
    return jnp.stack([x, y, th], axis=-1)


def apply_pose(p: Array, pts: Array) -> Array:
    """Transform body-frame points ``f32[..., 2]`` into the world frame.

    ``p`` broadcasts against the leading axes of ``pts``; e.g.
    ``apply_pose(poses[K, None, :], pts[R, 2])`` -> ``[K, R, 2]``.
    """
    c, s = jnp.cos(p[..., 2]), jnp.sin(p[..., 2])
    x = p[..., 0] + c * pts[..., 0] - s * pts[..., 1]
    y = p[..., 1] + s * pts[..., 0] + c * pts[..., 1]
    return jnp.stack([x, y], axis=-1)


def pose_distance(a: Array, b: Array, angle_weight: float = 1.0) -> Array:
    """Weighted SE(2) distance used for keyframe gating."""
    d = b - a
    ang = wrap_angle(d[..., 2])
    return jnp.sqrt(
        d[..., 0] ** 2 + d[..., 1] ** 2 + (angle_weight * ang) ** 2
    )


# --- axis-aligned rectangle helpers (reference: Rectangle in geometry
# primitives; used by the area occupancy estimator) -------------------------


def rect_overlap_area(
    amin: Array, amax: Array, bmin: Array, bmax: Array
) -> Array:
    """Overlap area of axis-aligned rectangles given ``[..., 2]`` corners."""
    lo = jnp.maximum(amin, bmin)
    hi = jnp.minimum(amax, bmax)
    wh = jnp.clip(hi - lo, 0.0)
    return wh[..., 0] * wh[..., 1]
