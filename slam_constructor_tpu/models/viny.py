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
