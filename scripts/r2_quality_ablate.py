"""Ablate the gmapping fast preset's quality regression on the real chip.

The queue measured the >=10x-fast preset at 2-lap ATE 0.42 m (A_odom) /
0.74 m (B_improved) vs 0.11 m for the round-1 config — the speed win is
not allowed to cost 4x quality (VERDICT item 1: "the ATE bench not
regressing"). Ingredients under suspicion: the 4 m usable-range insertion
cap, bf16 scoring, the 96-cell match/insert windows, the improved-proposal
Gaussian fit under bf16 quantization.

For each variant: 2-lap quality AND step throughput, appended to
TPU_BENCH_VARIANTS.jsonl (tag gmapping_abl_*).
"""
import dataclasses
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import r2_tpu_final as fin  # noqa: E402  (speed/quality helpers)
from slam_constructor_tpu.models import gmapping  # noqa: E402
from slam_constructor_tpu.ops import raycast, scoring  # noqa: E402
from slam_constructor_tpu.utils import datagen  # noqa: E402


def variants():
    fast = gmapping.fast_config(n_particles=30, map_size=256)
    f32 = scoring.ScoringConfig(reducer="overlap", window=1, dtype="float32")
    out = {
        # the measured-bad baseline (re-run for one consistent batch)
        "fast": fast,
        # bf16 -> f32 scoring, everything else fast
        "f32": dataclasses.replace(
            fast,
            matcher_cfg=dataclasses.replace(fast.matcher_cfg, scoring=f32),
        ),
        # usable range 4 -> 8 m (windows auto-size to 192)
        "r8": gmapping.fast_config(n_particles=30, map_size=256, usable_range=8.0),
        # uncapped round-1 reference point: full map, f32, 6 rounds
        "r1ref": gmapping.GMappingConfig(
            n_particles=30, map_height=256, map_width=256,
            matcher_cfg=dataclasses.replace(
                fast.matcher_cfg, rounds=6, scoring=f32),
        ),
        # windows kept, insertion cap lifted to the full 15 m (what does the
        # cap alone cost? windows still bound the matchable footprint)
        "cap15win": dataclasses.replace(
            fast, beam=raycast.BeamConfig(max_range=15.0)),
        # one-hot MXU window insert at the fast operating point (speed probe
        # for the vmap(dynamic_slice) suspicion; quality must equal 'fast')
        "onehot": dataclasses.replace(fast, insert_impl="onehot"),
    }
    # composite operating points: one-hot extraction for BOTH windows
    # (bitwise-equal to slice, so quality is carried by range/dtype only)
    oo = dataclasses.replace(
        fast, insert_impl="onehot", match_window_impl="onehot")
    out["oo"] = oo
    out["oo_f32"] = dataclasses.replace(
        oo, matcher_cfg=dataclasses.replace(oo.matcher_cfg, scoring=f32))
    for rng in (6.0, 8.0):
        c = gmapping.fast_config(
            n_particles=30, map_size=256, usable_range=rng)
        c = dataclasses.replace(
            c, insert_impl="onehot", match_window_impl="onehot",
            matcher_cfg=dataclasses.replace(c.matcher_cfg, scoring=f32))
        out[f"oo_r{int(rng)}_f32"] = c
    return out


def main():
    which = os.environ.get("ABL", "fast,f32,r8,r1ref,cap15win,onehot").split(",")
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    vs = variants()
    mode = os.environ.get("MODE", "speed,quality").split(",")
    for name in which:
        cfg = vs[name]
        if "speed" in mode:
            fin.speed(f"gmapping_abl_{name}", cfg, scan)
        if "quality" in mode:
            fin.quality(f"gmapping_abl_{name}", cfg)


if __name__ == "__main__":
    main()
