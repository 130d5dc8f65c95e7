"""Round-2 RBPF step decomposition on the real chip.

All gmapping_fast_* matcher variants plateau at ~390-400 scans/s (rounds
5->4, stride 2, one-shot brute force: no movement) => matching is NOT the
bottleneck. This script times the step's parts device-resident (lax.scan,
one scalar fetch — the CLAUDE.md measurement discipline) to find the shared
cost. Suspects: the vmap(dynamic_slice) window insert (P serialized window
copies — the round-1 beam-window lesson at particle granularity), the
match-window slice, the resample cond, the proposal plumbing.

Appends rows to TPU_MEASURES.jsonl (name=rbpf_part/*).
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import dataclasses

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers, raycast, resample, scoring
from slam_constructor_tpu.ops.geometry import compose
from slam_constructor_tpu.utils import datagen

T = 32
P = 30


def emit(name, ms):
    row = {"name": name, "ms": round(ms, 4), "backend": jax.default_backend(),
           "ts": time.time()}
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def timeloop(name, step, st0, scan):
    """Median per-iteration ms of a device-resident T-step scan loop."""

    @jax.jit
    def loop(st):
        def body(s, _):
            return step(s, scan), None
        s, _ = jax.lax.scan(body, st, None, length=T)
        # fetch must depend on EVERY mutated component or XLA dead-code-
        # eliminates the part under test (observed: match_only at 0.002 ms)
        return (s.poses.sum() + s.log_weights.sum()
                + jax.tree.leaves(s.gm)[0].ravel()[0])

    float(np.asarray(loop(st0)))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(st0)))
        ts.append((time.perf_counter() - t0) / T)
    emit(name, float(np.median(ts)) * 1e3)


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    scan = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    odom = jnp.zeros(3)

    cfg = gmapping.fast_config(n_particles=P, map_size=256)
    variants = {
        "full_slice": cfg,
        "full_onehot": dataclasses.replace(cfg, insert_impl="onehot"),
        "full_nowin_insert": dataclasses.replace(cfg, insert_window=0),
        "full_nowin_match": dataclasses.replace(cfg, match_window=0),
    }
    which = os.environ.get("PARTS", ",".join(
        list(variants) + ["match_only", "match_only_nowin",
                          "insert_only_slice", "insert_only_onehot",
                          "insert_only_full", "resample_only"])).split(",")

    st0 = gmapping.init_state(cfg)

    for name, c in variants.items():
        if name not in which:
            continue
        timeloop(name, lambda s, sc, c=c: gmapping.gmapping_step(c, s, sc, odom)[0],
                 gmapping.init_state(c), scan)

    # --- isolated parts (replicating gmapping_step's internals) ------------
    _, match_fn = matchers.MATCHERS[cfg.matcher]

    def match_part(c):
        def step(st, sc):
            key, k_noise, k_match, _ = jax.random.split(st.key, 4)
            sigma = (jnp.array([c.noise_xy, c.noise_xy, c.noise_theta])
                     + jnp.array([c.alpha_xy, c.alpha_xy, c.alpha_theta])
                     * jnp.abs(odom))
            noise = jax.random.normal(k_noise, (P, 3)) * sigma
            priors = compose(st.poses, odom[None, :] + noise)
            keys = jax.random.split(k_match, P)

            def match_one(gm_p, prior_p, key_p):
                view = scoring.MapView.of(gm_p, c.cell_model)
                if c.match_window:
                    view = scoring.window_view(view, prior_p[:2], c.match_window)
                res = match_fn(view, sc, prior_p, key_p, c.matcher_cfg, None)
                return res.pose, res.prob

            poses, probs = jax.vmap(match_one)(st.gm, priors, keys)
            return st.replace(poses=poses, key=key)
        return step

    if "match_only" in which:
        timeloop("match_only", match_part(cfg), st0, scan)
    if "match_only_nowin" in which:
        timeloop("match_only_nowin",
                 match_part(dataclasses.replace(cfg, match_window=0)), st0, scan)

    def insert_part(c):
        def step(st, sc):
            def one(gm_p, pose_p):
                h, w, ch = gm_p.cells.shape
                if not c.insert_window:
                    return raycast.insert_scan(gm_p, c.cell_model, pose_p, sc, c.beam)
                wi = min(c.insert_window, h, w)
                rel = (pose_p[:2] - gm_p.origin) / gm_p.scale
                col = jnp.clip(jnp.floor(rel[0]).astype(jnp.int32) - wi // 2, 0, w - wi)
                row = jnp.clip(jnp.floor(rel[1]).astype(jnp.int32) - wi // 2, 0, h - wi)
                win_origin = gm_p.origin + jnp.stack([col, row]).astype(jnp.float32) * gm_p.scale
                import slam_constructor_tpu.ops.grid as gridlib
                if c.insert_impl == "onehot":
                    er = ((row + jnp.arange(wi))[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
                    ec = ((col + jnp.arange(wi))[:, None] == jnp.arange(w)[None, :]).astype(jnp.float32)
                    sub = jnp.einsum("rh,hwc->rwc", er, gm_p.cells)
                    sub = jnp.einsum("sw,rwc->rsc", ec, sub)
                    sub_gm = gridlib.GridMap(cells=sub, origin=win_origin, scale=gm_p.scale)
                    sub_gm = raycast.insert_scan(sub_gm, c.cell_model, pose_p, sc, c.beam)
                    scat = jnp.einsum("rh,rsc->hsc", er, sub_gm.cells)
                    scat = jnp.einsum("sw,hsc->hwc", ec, scat)
                    mask = er.sum(0)[:, None] * ec.sum(0)[None, :]
                    return gm_p.replace(cells=gm_p.cells * (1.0 - mask)[:, :, None] + scat)
                sub = jax.lax.dynamic_slice(gm_p.cells, (row, col, 0), (wi, wi, ch))
                sub_gm = gridlib.GridMap(cells=sub, origin=win_origin, scale=gm_p.scale)
                sub_gm = raycast.insert_scan(sub_gm, c.cell_model, pose_p, sc, c.beam)
                return gm_p.replace(cells=jax.lax.dynamic_update_slice(
                    gm_p.cells, sub_gm.cells, (row, col, 0)))

            gm = jax.vmap(one)(st.gm, st.poses)
            return st.replace(gm=gm)
        return step

    if "insert_only_slice" in which:
        timeloop("insert_only_slice", insert_part(cfg), st0, scan)
    if "insert_only_onehot" in which:
        timeloop("insert_only_onehot",
                 insert_part(dataclasses.replace(cfg, insert_impl="onehot")), st0, scan)
    if "insert_only_full" in which:
        timeloop("insert_only_full",
                 insert_part(dataclasses.replace(cfg, insert_window=0)), st0, scan)

    if "resample_only" in which:
        def res_step(st, sc):
            key, k_res = jax.random.split(st.key)
            logw = resample.normalize_log_weights(
                st.log_weights + 0.01 * st.poses[:, 0])
            idx, logw, did = resample.maybe_resample(k_res, logw, cfg.resample_threshold)
            gm = jax.lax.cond(
                did, lambda g: jax.tree.map(lambda a: a[idx], g), lambda g: g, st.gm)
            return st.replace(gm=gm, log_weights=logw, key=key,
                              poses=st.poses[idx])
        timeloop("resample_only", res_step, st0, scan)


if __name__ == "__main__":
    main()
