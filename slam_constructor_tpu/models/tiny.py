"""tinySLAM preset (Steux & El Hamzaoui 2010).

Parity: the reference's ``src/slams/tiny/`` node (SURVEY.md §2.6
[unverified]): single hypothesis, Monte-Carlo scan matcher with sigma
annealing, plain occupancy grid, Bayes cell models (``BaseTinyCell`` /
``AvgTinyCell``), wall-blur ("hole width") scan adder.
"""

from __future__ import annotations

from ..ops import cells, matchers, raycast, scoring
from .engine import Engine, EngineConfig


def tiny_config(
    cell: str = "bayes_avg",
    quality: float = 0.5,
    map_size: int = 256,
    map_scale: float = 0.1,
    hole_width: float = 0.3,
    mc_batch: int = 64,
    mc_rounds: int = 12,
    sigma_xy: float = 0.08,
    sigma_theta: float = 0.05,
    scoring_cfg: scoring.ScoringConfig | None = None,
) -> EngineConfig:
    if scoring_cfg is None:
        scoring_cfg = scoring.ScoringConfig(reducer="overlap", window=1, stride=1)
    if cell == "bayes_base":
        model = cells.BayesBaseCell(quality=quality)
    else:
        model = cells.BayesAvgCell()
    return EngineConfig(
        cell_model=model,
        matcher="monte_carlo",
        matcher_cfg=matchers.MonteCarloConfig(
            sigma_xy=sigma_xy,
            sigma_theta=sigma_theta,
            batch=mc_batch,
            rounds=mc_rounds,
            scoring=scoring_cfg,
        ),
        beam=raycast.BeamConfig(
            occupancy_estimator="const", hole_width=hole_width, wall_blur=True,
            free_impl="auto",
        ),
        map_height=map_size,
        map_width=map_size,
        map_scale=map_scale,
    )


def make_engine(**kwargs) -> Engine:
    return Engine(tiny_config(**kwargs))
