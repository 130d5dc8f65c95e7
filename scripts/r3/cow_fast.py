"""Round-3 CoW-at-the-fast-operating-point measurement (VERDICT task 7).

The design doc calls the block pool the PRIMARY map representation, but
every fast row so far ran map_storage='dense'. Measure CoW speed + 2-lap
ATE at the fast operating point, 256^2 and 512^2 maps, vs the dense twin.
Dense resample gathers the full (P, H, W, C) tensor at every Neff collapse
— 240 MB at 512^2/30 particles — which is the cost CoW tables avoid.

Usage: ABL=... MODE=speed,quality python scripts/r3/cow_fast.py
Rows -> TPU_BENCH_VARIANTS.jsonl, tag gmapping_cow_<name>.
"""
import dataclasses
import os
import sys

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import r2_tpu_final as fin  # noqa: E402
from slam_constructor_tpu.models import gmapping  # noqa: E402
from slam_constructor_tpu.utils import datagen  # noqa: E402


def variants():
    out = {}
    for size, cap in ((256, 2048), (512, 6144)):
        fast = gmapping.fast_config(
            n_particles=30, map_size=size, usable_range=6.0)
        fast = dataclasses.replace(fast, match_window=128)
        out[f"dense{size}"] = fast
        # CoW twin: window_tiles * tile_block == the 160-cell insert reach
        out[f"cow{size}"] = dataclasses.replace(
            fast, map_storage="cow", tile_block=32, tile_capacity=cap,
            window_tiles=5,
        )
    return out


def main():
    vs = variants()
    which = os.environ.get("ABL", ",".join(vs)).split(",")
    mode = os.environ.get("MODE", "speed,quality").split(",")
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    from slam_constructor_tpu.ops import raycast

    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    for name in which:
        cfg = vs[name]
        if "speed" in mode:
            fin.speed(f"gmapping_cow_{name}", cfg, scan)
        if "quality" in mode:
            fin.quality(f"gmapping_cow_{name}", cfg)


if __name__ == "__main__":
    main()
