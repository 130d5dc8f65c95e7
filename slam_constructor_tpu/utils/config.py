"""Typed config system: the reference's PropertiesProvider capability
(SURVEY.md §2.8 [unverified]: dotted keys select component implementations
and numeric parameters from ROS params or .properties files).

Re-design: configs ARE the static dataclasses the engines trace against
(EngineConfig / GMappingConfig / ...). This module adds the selection layer:
build any engine from a flat string->value mapping (dotted keys), YAML or
.properties files, with the same component registries the reference's
init_utils factories expose — cell model, matcher, occupancy estimator,
observation-probability reducer, map storage — plus the five BASELINE
presets.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

from ..ops import cells as cellslib
from ..ops import m3rsm as m3rsmlib
from ..ops import matchers as matcherslib
from ..ops import raycast, scoring

# --- flat-key config parsing ------------------------------------------------


def parse_properties(text: str) -> dict[str, str]:
    """Parse a java-style .properties file (the reference's
    FilePropertiesProvider format): ``key = value`` lines, ``#`` comments."""
    out: dict[str, str] = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith(("#", ";", "//")):
            continue
        if "=" in line:
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def load_properties(path: str) -> dict[str, str]:
    with open(path) as f:
        return parse_properties(f.read())


def _coerce(v: Any, like: Any) -> Any:
    if isinstance(like, bool):
        return str(v).lower() in ("1", "true", "yes", "on")
    if isinstance(like, int):
        return int(v)
    if isinstance(like, float):
        return float(v)
    return v


def _build_scoring(p: Mapping[str, Any], prefix: str = "scoring.") -> scoring.ScoringConfig:
    base = scoring.ScoringConfig()
    kw = {}
    for f in dataclasses.fields(base):
        key = prefix + f.name
        if key in p:
            kw[f.name] = _coerce(p[key], getattr(base, f.name))
    return dataclasses.replace(base, **kw)


def _build_beam(p: Mapping[str, Any], prefix: str = "beam.") -> raycast.BeamConfig:
    base = raycast.BeamConfig()
    kw = {}
    for f in dataclasses.fields(base):
        key = prefix + f.name
        if key in p:
            kw[f.name] = _coerce(p[key], getattr(base, f.name))
    return dataclasses.replace(base, **kw)


def _build_cell_model(p: Mapping[str, Any]):
    kind = p.get("cell.model", "bayes_avg")
    cls = cellslib.CELL_MODELS[kind]
    base = cls()
    kw = {}
    for f in dataclasses.fields(base):
        if not f.init:
            continue
        key = f"cell.{f.name}"
        if key in p:
            kw[f.name] = _coerce(p[key], getattr(base, f.name))
    return cls(**kw)


def _build_matcher(
    p: Mapping[str, Any], sc: scoring.ScoringConfig, prefix: str = "matcher"
):
    kind = p.get(f"{prefix}.type", "monte_carlo")
    cfg_cls, _ = matcherslib.MATCHERS[kind]
    base = cfg_cls()
    kw: dict[str, Any] = {"scoring": sc}
    for f in dataclasses.fields(base):
        if f.name == "scoring":
            continue
        key = f"{prefix}.{f.name}"
        if key in p:
            kw[f.name] = _coerce(p[key], getattr(base, f.name))
    return kind, cfg_cls(**kw)


def _build_refine(p: Mapping[str, Any], sc: scoring.ScoringConfig):
    """Optional sub-cell refine stage: ``refine.type`` selects the second
    matcher (e.g. gradient / hill_climbing), ``refine.*`` its params."""
    if "refine.type" not in p:
        return None, None
    return _build_matcher(p, sc, prefix="refine")


def engine_config_from(p: Mapping[str, Any]):
    """Build an EngineConfig from flat dotted keys (see tests for the
    vocabulary; unknown keys are ignored like the reference's provider)."""
    from ..models.engine import EngineConfig

    sc = _build_scoring(p)
    matcher, matcher_cfg = _build_matcher(p, sc)
    refine, refine_cfg = _build_refine(p, sc)
    return EngineConfig(
        cell_model=_build_cell_model(p),
        matcher=matcher,
        matcher_cfg=matcher_cfg,
        refine_matcher=refine,
        refine_cfg=refine_cfg,
        beam=_build_beam(p),
        map_height=int(p.get("map.height", 256)),
        map_width=int(p.get("map.width", 256)),
        map_scale=float(p.get("map.scale", 0.1)),
        min_insert_prob=float(p.get("engine.min_insert_prob", 0.0)),
        use_angle_histogram=str(p.get("engine.use_angle_histogram", "false")).lower()
        in ("1", "true", "yes"),
        map_storage=str(p.get("engine.map_storage", "dense")),
        tile_block=int(p.get("engine.tile_block", 32)),
        tile_capacity=int(p.get("engine.tile_capacity", 512)),
        window_tiles=int(p.get("engine.window_tiles", 10)),
    )


def gmapping_config_from(p: Mapping[str, Any]):
    from ..models.gmapping import GMappingConfig

    sc = _build_scoring(p)
    matcher, matcher_cfg = _build_matcher(p, sc)
    return GMappingConfig(
        n_particles=int(p.get("pf.particles", 30)),
        cell_model=_build_cell_model(p),
        matcher=matcher,
        matcher_cfg=matcher_cfg,
        beam=_build_beam(p),
        map_height=int(p.get("map.height", 256)),
        map_width=int(p.get("map.width", 256)),
        map_scale=float(p.get("map.scale", 0.1)),
        noise_xy=float(p.get("pf.noise_xy", 0.03)),
        noise_theta=float(p.get("pf.noise_theta", 0.015)),
        resample_threshold=float(p.get("pf.resample_threshold", 0.5)),
        weight_gamma=float(p.get("pf.weight_gamma", 8.0)),
        proposal=str(p.get("pf.proposal", "odom")),
        proposal_samples=int(p.get("pf.proposal_samples", 16)),
        match_window=int(p.get("pf.match_window", 0)),
        insert_window=int(p.get("pf.insert_window", 0)),
    )


# --- the five BASELINE presets ---------------------------------------------


def preset(name: str):
    """BASELINE.json configs[0..4] by name. Returns an engine factory."""
    from ..models import full, gmapping, tiny, viny

    if name == "tiny":  # config[0]: MC matcher + plain grid
        return lambda **kw: tiny.make_engine(**kw)
    if name == "viny":  # config[1]: TBM cells + multi-res matching
        return lambda **kw: viny.make_engine(**kw)
    if name == "gmapping":  # config[2]: 30-particle RBPF
        return lambda **kw: gmapping.GMappingEngine(**kw)
    if name == "full":  # config[3]: pose-graph loop closure
        return lambda **kw: full.FullSlamEngine(**kw)
    if name == "distributed":  # config[4]: sharded multi-host (see parallel/)
        from ..parallel import particles

        def make(mesh=None, **kw):
            from ..models.gmapping import GMappingConfig, init_state

            cfg = GMappingConfig(**kw)
            if mesh is None:
                from ..parallel.mesh import flat_mesh

                mesh = flat_mesh("particles")
            step = particles.make_sharded_step(cfg, mesh)
            state = particles.shard_state(init_state(cfg), mesh)
            return cfg, state, step

        return make
    raise KeyError(name)


PRESETS = ("tiny", "viny", "gmapping", "full", "distributed")
