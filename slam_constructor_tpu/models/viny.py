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
    stride: int = 2,
) -> EngineConfig:
    """``stride``: matcher beam subsampling (the reference SPE's skip
    knob). Default 2 as of r5: at 360-beam scans the committed 5-seed
    rows are indistinguishable from stride 1 (viny_ms_s2_bn/_qn
    0.1180/0.1175 mean vs ship 0.1178/0.1169) at +78% throughput
    (viny_speed/s2 729-753 vs ship 408-420 scans/s same-window). For
    sparse scans (<=120 beams) prefer stride=1 — the single-hypothesis
    matcher has no particle diversity to absorb a lossy score (see
    tiny.fast_config docstring)."""
    if scoring_cfg is None:
        scoring_cfg = scoring.ScoringConfig(
            reducer="overlap", window=1, stride=stride)
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
    usable_range: float = 5.0,
    quality: float = 0.5,
    hole_width: float = 0.3,
    levels: int = 4,
    n_theta: int = 9,
    beam_width: int = 48,
    half_xy: float = 0.6,
    half_theta: float = 0.2,
    stride: int = 2,
    use_angle_histogram: bool = True,
    reducer: str = "overlap",
) -> EngineConfig:
    """vinySLAM + the M3RSM global matcher at the single-chip operating
    point: usable-range-capped beams (GMapping's maxUrange discipline,
    shared with gmapping.fast_config) + a prior-centered search window
    sized so the windowed level scoring is EXACT (M3RSMConfig.window doc).

    r5 QUALITY FIX, two independent root causes (the preset had only
    ever been speed-benched — r4 Weak #8):
    1. Config: the r2-r4 defaults (usable_range=4, reducer='obstacle',
       stride=1) fail even on CPU — range 4 diverges with any scoring
       (1.97/0.84 at overlap; the cecum loop needs >= 6 m of reach) and
       the 'obstacle' point-sample reducer costs 0.376 vs 0.071 at
       range 8. Fixed point: overlap reducer + stride 2 + range >= 5.
    2. Insert algorithm: free_impl='auto' resolves to the polar free
       fill on TPU, whose wall-halo erosion aliases the global B&B —
       the config-fixed preset still read 5-seed ATE 3.8-5.2 on chip
       (viny_ms_m3_r5fix_* / viny_ms_m3sw_* rows) while measuring 0.07
       on CPU, where 'auto' = dda. Pinned to 'dda' (see the BeamConfig
       comment below); with it the TPU run is bitwise equal to CPU
       (scripts/r5/m3_divergence.py).

    Shipped operating point (scripts/r5/m3_sweep.py stages 1-3, all
    on-chip): usable_range=5 + beam_width=48 + n_theta=9. On-chip
    5-seed ATE 0.0704/0.0706 mean/max at bench noise and 0.0721/0.0751
    at 2x quality noise (viny_ms_m3sw_r5_bw48_dda3_* rows) — better
    than the plain viny preset — at ~635-700 scans/s. The B&B frontier
    is NOT the quality constraint at these shapes: beam_width 32-96
    measured bitwise-identical ATE on every seed (48 ships to keep one
    notch of frontier margin over the narrowest measured point; the
    admissibility argument says wider only helps). Rejected levers,
    each by 5-seed gate: stride 3 (outlier seeds 0.108-0.114),
    refine 6 (no speed gain), usable_range 4 (diverges even on CPU),
    refine 4 (0.0872 on one seed).
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
            scoring=scoring.ScoringConfig(reducer=reducer, stride=stride),
        ),
        beam=raycast.BeamConfig(
            max_range=usable_range, occupancy_estimator="const",
            # PINNED to the per-beam DDA free fill (not 'auto'): 'auto'
            # resolves to the dense polar fill on TPU, whose conservative
            # neighbor-min range erosion leaves an unknown halo around
            # walls seen at grazing angles (corridor walls!). Local
            # sigma-bounded matchers never rank hypotheses across that
            # halo; the M3RSM global B&B does, and aliases — the preset
            # read 5-seed ATE 3.8-5.2 m on EVERY chip window while the
            # same config measured 0.07 on CPU (where 'auto' = dda). With
            # dda the TPU trajectory is BITWISE equal to CPU's
            # (scripts/r5/m3_divergence.py; viny_ms_m3_dda_* rows). Polar
            # stays the right call for the local-matcher presets (its
            # committed 5-seed rows pass, and it is the tiny preset's
            # ~300x insert-FLOP win).
            hole_width=hole_width, wall_blur=True, free_impl="dda",
        ),
        map_height=map_size,
        map_width=map_size,
        map_scale=map_scale,
        use_angle_histogram=use_angle_histogram,
    )
