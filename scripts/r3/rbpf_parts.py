"""Where does the shipped RBPF's wall ms/scan go? (r3: step-chain said
1.83 ms but 512-scan wall says ~3.1 — the chain reused ONE scan, letting
XLA hoist scan-dependent geometry; this breakdown scans over REAL varying
scans for each part.)

Parts (per scan, 30 particles, shipped fast_config):
- match_only: windowed one-hot matching incl. proposal noise
- insert_only: windowed one-hot insert at fixed poses
- full_step: the real gmapping_step
Rows -> TPU_MEASURES.jsonl name=rbpf_parts/<part>.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import matchers as matcherslib, raycast, resample, scoring
from slam_constructor_tpu.ops.geometry import compose
from slam_constructor_tpu.utils import datagen

T = int(os.environ.get("T", 128))


def emit(name, ms):
    row = {"name": f"rbpf_parts/{name}", "ms_per_scan": round(ms, 4),
           "ts": time.time(), "backend": jax.default_backend()}
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def timed_seq(step, init, scans, odom, iters=3):
    @jax.jit
    def run(c):
        def body(st, inp):
            s, od = inp
            return step(st, s, od), None
        out, _ = jax.lax.scan(body, c, (scans, odom))
        return out

    out = run(init)
    jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(init)
        jax.tree.map(lambda x: np.asarray(x).ravel()[:1], out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / T * 1e3


def main():
    cfg = gmapping.fast_config(n_particles=30, map_size=256)
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.rectangle_trajectory(step=9.6 / T * 2)
    reps = (T + poses.shape[0] - 1) // poses.shape[0]
    poses = jnp.tile(poses, (reps, 1))[:T]
    bearings = datagen.default_bearings(360)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0),
        odom_noise_xy=0.01, odom_noise_theta=0.005,
    )
    st0 = gmapping.init_state(cfg)
    p = cfg.n_particles
    _, match_fn = matcherslib.MATCHERS[cfg.matcher]

    # full step
    def full(st, s, od):
        st2, _ = gmapping.gmapping_step(cfg, st, s, od)
        return st2

    emit("full_step", timed_seq(full, st0, scans, odom))

    # match-only: same noise draw + windowed match, map untouched
    def match_only(st, s, od):
        key, k_noise, k_match, _ = jax.random.split(st.key, 4)
        base = jnp.array([cfg.noise_xy, cfg.noise_xy, cfg.noise_theta])
        alpha = jnp.array([cfg.alpha_xy, cfg.alpha_xy, cfg.alpha_theta])
        sigma = base + alpha * jnp.abs(od)
        noise = jax.random.normal(k_noise, (p, 3)) * sigma
        priors = compose(st.poses, od[None, :] + noise)
        keys = jax.random.split(k_match, p)

        def one(gm_p, prior_p, key_p):
            view = scoring.MapView.of(gm_p, cfg.cell_model)
            view = scoring.window_view_onehot(view, prior_p[:2], cfg.match_window)
            res = match_fn(view, s, prior_p, key_p, cfg.matcher_cfg, None)
            return res.pose, res.prob

        new_poses, probs = jax.vmap(one)(st.gm, priors, keys)
        return st.replace(poses=new_poses, key=key,
                          log_weights=st.log_weights + 1e-12 * probs)

    emit("match_only", timed_seq(match_only, st0, scans, odom))

    # insert-only: windowed one-hot insert at the carried poses
    from slam_constructor_tpu.ops import grid as gridlib

    def insert_only(st, s, od):
        def one(gm_p, pose_p):
            h, w, c = gm_p.cells.shape
            wi = min(cfg.insert_window, h, w)
            rel = (pose_p[:2] - gm_p.origin) / gm_p.scale
            col = jnp.clip(jnp.floor(rel[0]).astype(jnp.int32) - wi // 2, 0, w - wi)
            row = jnp.clip(jnp.floor(rel[1]).astype(jnp.int32) - wi // 2, 0, h - wi)
            win_origin = gm_p.origin + jnp.stack([col, row]).astype(jnp.float32) * gm_p.scale
            hi = jax.lax.Precision.HIGHEST
            er = ((row + jnp.arange(wi))[:, None] == jnp.arange(h)[None, :]).astype(jnp.float32)
            ec = ((col + jnp.arange(wi))[:, None] == jnp.arange(w)[None, :]).astype(jnp.float32)
            sub = jnp.einsum("rh,hwc->rwc", er, gm_p.cells, precision=hi)
            sub = jnp.einsum("sw,rwc->rsc", ec, sub, precision=hi)
            sub_gm = gridlib.GridMap(cells=sub, origin=win_origin, scale=gm_p.scale)
            sub_gm = raycast.insert_scan(sub_gm, cfg.cell_model, pose_p, s, cfg.beam)
            scat = jnp.einsum("rh,rsc->hsc", er, sub_gm.cells, precision=hi)
            scat = jnp.einsum("sw,hsc->hwc", ec, scat, precision=hi)
            mask = (er.sum(0)[:, None] * ec.sum(0)[None, :]) > 0.5
            return gm_p.replace(cells=jnp.where(mask[:, :, None], scat, gm_p.cells))

        gm = jax.vmap(one)(st.gm, st.poses)
        return st.replace(gm=gm, step=st.step + 1)

    emit("insert_only", timed_seq(insert_only, st0, scans, odom))


if __name__ == "__main__":
    main()
