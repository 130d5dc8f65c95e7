"""Round-4: can the (now exact) Pallas sampler win on the RBPF's vmapped
windowed views too? r3 measured it 1.8x SLOWER there (the reason 'auto'
keeps matmul under 200^2); retest with the precision pin + CHUNK sweep.

Measures, on chip (slope method over a device-resident chain):
- vmapped windowed scoring: P=30 particles x 160^2 windows x
  (20 cand x 180 beams), impl matmul vs pallas, CHUNK in {512, 1024, 2048}
- the full gmapping fast_config step with each scoring impl
Rows -> TPU_MEASURES.jsonl name=pallas_win/<case>.
"""
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import pallas_kernels, raycast, scoring
from slam_constructor_tpu.utils import datagen


def emit(name, extra):
    row = {"name": f"pallas_win/{name}", "ts": time.time(),
           "backend": jax.default_backend()}
    row.update(extra)
    print(json.dumps(row), flush=True)
    with open(os.path.join(REPO, "TPU_MEASURES.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def slope(f, x, n_small=6, n_big=30):
    """Per-iteration ms of a device-resident chain of f, fetch-cancelled."""
    def chain(k):
        def body(c, _):
            return f(c), None
        g = jax.jit(lambda c: jax.lax.scan(body, c, None, length=k)[0])
        out = g(x)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        t0 = time.perf_counter()
        out = g(x)
        np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.perf_counter() - t0
    ts = chain(n_small)
    tb = chain(n_big)
    return (tb - ts) / (n_big - n_small) * 1e3


def main():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(360)
    pose0 = jnp.array([-5.6, -1.6, 0.0])
    s0 = raycast.cast_rays(occ, origin, scale, pose0, bearings)
    p, win, k_cand = 30, 160, 20

    # P particle maps: same content, windowed views
    from slam_constructor_tpu.models import tiny as tinylib
    from slam_constructor_tpu.models import engine as eng
    cfg_t = tinylib.tiny_config(map_size=256)
    st = eng.init_state(cfg_t)
    gm = raycast.insert_scan(st.gm, cfg_t.cell_model, pose0, s0, cfg_t.beam)
    view = scoring.MapView.of(gm, cfg_t.cell_model)
    wv = scoring.window_view_onehot(view, pose0[:2], win)
    occ_p = jnp.broadcast_to(wv.occ, (p, win, win))
    known_p = jnp.broadcast_to(wv.known, (p, win, win))
    key = jax.random.PRNGKey(0)
    cand = pose0[None, None, :] + jax.random.normal(key, (p, k_cand, 3)) * 0.05

    s2 = jax.tree.map(lambda a: a[::2], s0)  # stride-2 beams like fast cfg

    def score_all(impl):
        sc = scoring.ScoringConfig(reducer="overlap", impl=impl)
        def one(o, kn, c):
            v = scoring.MapView(occ=o, known=kn, origin=wv.origin, scale=wv.scale)
            return scoring.score_poses(v, s2, c, sc)
        def f(c):
            out = jax.vmap(one, in_axes=(0, 0, 0))(occ_p, known_p, c)
            # derive next candidates from output so nothing hoists
            return c + out[..., None] * 1e-6
        return f

    for impl in ("matmul", "pallas"):
        ms = slope(score_all(impl), cand)
        emit(f"win_score_{impl}", {"ms": round(ms, 4), "P": p, "win": win,
                                   "cand": k_cand, "beams": int(s2.n_beams)})

    # full fast step A/B
    for impl in ("matmul", "pallas"):
        cfg = gmapping.fast_config(n_particles=30, map_size=256)
        cfg = dataclasses.replace(
            cfg, matcher_cfg=dataclasses.replace(
                cfg.matcher_cfg, scoring=dataclasses.replace(
                    cfg.matcher_cfg.scoring, impl=impl)))
        stg = gmapping.init_state(cfg)
        odom = jnp.array([0.05, 0.0, 0.01])
        def f(s, cfg=cfg):
            s2_, _ = gmapping.gmapping_step(cfg, s, s0, odom)
            return s2_
        ms = slope(f, stg, n_small=4, n_big=20)
        emit(f"fast_step_{impl}", {"ms": round(ms, 4),
                                   "scans_per_sec": round(1e3 / ms, 1)})


if __name__ == "__main__":
    main()
