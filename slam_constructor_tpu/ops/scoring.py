"""Scan-likelihood scoring: the hot kernel of the whole engine.

Parity targets (SURVEY.md §2.4 [unverified paths]):
- ``ScanProbabilityEstimator`` + ``WeightedMeanPointProbabilitySPE``
  (``src/core/scan_matchers/weighted_mean_point_probability_spe.h``)
- the four ``OccupancyObservationProbabilityEstimator`` reducers
  (obstacle / max / mean / overlap-weighted,
  ``src/core/scan_matchers/occupancy_observation_probability.h``)

Re-design: the reference scores ONE pose at a time, walking scan points and
doing pointer-chased per-cell virtual calls. Here the unit of work is
``score_poses(map, scan, poses[K]) -> probs[K]``: all K candidate poses, all
R beams, and the whole cell window are evaluated in one fused gather +
reduction — the shape every matcher (Monte-Carlo, hill-climbing, brute-force,
M3RSM) and the particle filter feed the TPU with.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from . import grid as gridlib
from . import scan as scanlib
from .geometry import apply_pose

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ScoringConfig:
    #: 'obstacle' | 'max' | 'mean' | 'overlap'
    reducer: str = "obstacle"
    #: window radius in cells for max/mean/overlap reducers (1 -> 3x3)
    window: int = 1
    #: probability contributed by unknown / out-of-map cells (the SPE's
    #: unknown-cell handling knob)
    unknown_prob: float = 0.5
    #: use every stride-th beam (SPE skip policy)
    stride: int = 1
    #: side of the endpoint square for the overlap reducer, in cells
    overlap_extent: float = 1.0


@struct.dataclass
class MapView:
    """Device-resident scoring view of a map: occupancy + known mask.

    Built once per matcher invocation (the map doesn't change while one
    scan is being matched) and reused across every score call.
    """

    occ: Array  # f32[H, W]
    known: Array  # bool[H, W]
    origin: Array  # f32[2]
    scale: float = struct.field(pytree_node=False)

    @classmethod
    def of(cls, gm: gridlib.GridMap, model) -> "MapView":
        return cls(
            occ=gridlib.occupancy_plane(gm, model),
            known=gridlib.known_mask(gm),
            origin=gm.origin,
            scale=gm.scale,
        )


def _window_offsets(radius: int) -> Array:
    r = jnp.arange(-radius, radius + 1)
    return jnp.stack(jnp.meshgrid(r, r, indexing="ij"), axis=-1).reshape(-1, 2)


def score_poses(
    view: MapView,
    scan: scanlib.LaserScan,
    poses: Array,
    cfg: ScoringConfig = ScoringConfig(),
    point_weights: Array | None = None,
) -> Array:
    """Score candidate poses against the map.

    poses: f32[K, 3] -> returns f32[K] mean per-point consistency
    probability in [0, 1] (the reference SPE's scan probability).
    ``point_weights`` optionally reweights beams (vinySLAM uses the angle
    histogram to down-weight degenerate directions).
    """
    h, w = view.occ.shape
    pts = scanlib.scan_points(scan)  # [R, 2] sensor frame
    world = apply_pose(poses[:, None, :], pts[None, :, :])  # [K, R, 2]
    rel = (world - view.origin) / view.scale  # fractional cell coords
    base = jnp.floor(rel).astype(jnp.int32)  # [K, R, 2] (col-major: x, y)
    # convert to (row, col)
    base_rc = jnp.stack([base[..., 1], base[..., 0]], axis=-1)

    if cfg.reducer == "obstacle":
        idx = base_rc[:, :, None, :]  # [K, R, 1, 2]
    else:
        offs = _window_offsets(cfg.window)  # [W2, 2]
        idx = base_rc[:, :, None, :] + offs[None, None, :, :]

    occ = gridlib.gather_plane(view.occ, idx, cfg.unknown_prob, h, w)
    known = gridlib.gather_plane(
        view.known.astype(jnp.float32), idx, 0.0, h, w
    )
    vals = jnp.where(known > 0, occ, cfg.unknown_prob)  # [K, R, W2]

    if cfg.reducer in ("obstacle",):
        point_p = vals[..., 0]
    elif cfg.reducer == "max":
        point_p = vals.max(axis=-1)
    elif cfg.reducer == "mean":
        point_p = vals.mean(axis=-1)
    elif cfg.reducer == "overlap":
        # overlap of the endpoint square (side overlap_extent cells) with
        # each window cell, in cell units — closed form from frac coords
        offs = _window_offsets(cfg.window).astype(jnp.float32)
        frac = rel - jnp.floor(rel)  # [K, R, 2] (x, y) in [0,1)
        half = cfg.overlap_extent / 2.0
        # endpoint square in cell coords, relative to the base cell corner
        exy = frac[:, :, None, :]  # x, y
        cell_lo = jnp.stack([offs[..., 1], offs[..., 0]], axis=-1)  # (x, y)
        lo = jnp.maximum(cell_lo[None, None], exy - half)
        hi = jnp.minimum(cell_lo[None, None] + 1.0, exy + half)
        wh = jnp.clip(hi - lo, 0.0)
        wgt = wh[..., 0] * wh[..., 1]  # [K, R, W2]
        wsum = jnp.maximum(wgt.sum(-1, keepdims=True), 1e-9)
        point_p = (vals * wgt).sum(-1) / wsum[..., 0]
    else:
        raise ValueError(f"unknown reducer {cfg.reducer!r}")

    mask = scanlib.subsample_mask(scan, cfg.stride).astype(jnp.float32)
    if point_weights is not None:
        mask = mask * point_weights
    mask = mask[None, :]
    return (point_p * mask).sum(-1) / jnp.maximum(mask.sum(-1), 1e-9)


def score_single(view, scan, pose, cfg=ScoringConfig(), point_weights=None):
    return score_poses(view, scan, pose[None, :], cfg, point_weights)[0]
