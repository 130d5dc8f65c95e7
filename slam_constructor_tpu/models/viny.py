"""vinySLAM preset (Huletski, Kartashov & Krinkin, IROS 2017).

Parity: the reference's ``src/slams/viny/`` node (SURVEY.md §2.6
[unverified]): Transferable-Belief-Model cells with conjunctive
combination + conflict handling, area occupancy estimator, improved
matching with scan-degeneracy weighting and quality-gated insertion.
"""

from __future__ import annotations

from ..ops import cells, matchers, raycast, scoring
from .engine import Engine, EngineConfig


def viny_config(
    quality: float = 0.5,
    conflict_decay: float = 0.1,
    map_size: int = 256,
    map_scale: float = 0.1,
    hole_width: float = 0.3,
    mc_batch: int = 64,
    mc_rounds: int = 16,
    min_insert_prob: float = 0.0,
    use_angle_histogram: bool = True,
    scoring_cfg: scoring.ScoringConfig | None = None,
) -> EngineConfig:
    if scoring_cfg is None:
        scoring_cfg = scoring.ScoringConfig(reducer="overlap", window=1)
    return EngineConfig(
        cell_model=cells.TBMCell(quality=quality, conflict_decay=conflict_decay),
        matcher="monte_carlo",
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=0.08,
            sigma_theta=0.05,
            batch=mc_batch,
            rounds=mc_rounds,
            scoring=scoring_cfg,
        ),
        # const endpoint evidence + symmetric wall blur tracks best with
        # TBM cells (the area estimator's fractional weights under-evidence
        # walls against the strong free-space counts); 'area' remains a
        # config choice for the estimator-parity matrix
        beam=raycast.BeamConfig(
            occupancy_estimator="const", hole_width=hole_width, wall_blur=True,
            free_impl="auto",
        ),
        map_height=map_size,
        map_width=map_size,
        map_scale=map_scale,
        min_insert_prob=min_insert_prob,
        use_angle_histogram=use_angle_histogram,
    )


def make_engine(**kwargs) -> Engine:
    return Engine(viny_config(**kwargs))


def viny_m3rsm_config(
    map_size: int = 256,
    map_scale: float = 0.1,
    usable_range: float = 4.0,
    quality: float = 0.5,
    hole_width: float = 0.3,
    levels: int = 4,
    n_theta: int = 9,
    beam_width: int = 128,
    half_xy: float = 0.6,
    half_theta: float = 0.2,
    stride: int = 1,
    use_angle_histogram: bool = True,
) -> EngineConfig:
    """vinySLAM + the M3RSM global matcher at the single-chip operating
    point: usable-range-capped beams (GMapping's maxUrange discipline,
    shared with gmapping.fast_config) + a prior-centered search window
    sized so the windowed level scoring is EXACT (M3RSMConfig.window doc).
    """
    import math

    from ..ops import m3rsm as m3rsmlib

    step = 1 << levels
    reach = math.ceil((usable_range + hole_width / 2) / map_scale)
    need = 2 * (reach + math.ceil(half_xy / map_scale) + step)
    window = min(-(-need // step) * step, map_size)
    return EngineConfig(
        cell_model=cells.TBMCell(quality=quality),
        matcher="m3rsm",
        matcher_cfg=m3rsmlib.M3RSMConfig(
            half_x=half_xy, half_y=half_xy, half_theta=half_theta,
            n_theta=n_theta, levels=levels, beam_width=beam_width,
            window=window,
            scoring=scoring.ScoringConfig(reducer="obstacle", stride=stride),
        ),
        beam=raycast.BeamConfig(
            max_range=usable_range, occupancy_estimator="const",
            hole_width=hole_width, wall_blur=True, free_impl="auto",
        ),
        map_height=map_size,
        map_width=map_size,
        map_scale=map_scale,
        use_angle_histogram=use_angle_histogram,
    )
