import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.models import posegraph as pg
from slam_constructor_tpu.ops import cells, scan as scanlib
from slam_constructor_tpu.ops.geometry import between, compose, wrap_angle


def make_scan(n=32):
    return scanlib.LaserScan(
        ranges=jnp.ones((n,)), bearings=jnp.zeros((n,)), valid=jnp.ones((n,), bool)
    )


CFG = pg.PoseGraphConfig(max_keyframes=32, max_edges=64, gn_iterations=20)


def test_keyframe_gating():
    st = pg.init_state(CFG, 32)
    assert bool(pg.should_add_keyframe(CFG, st, jnp.zeros(3)))  # first always
    st = pg.add_keyframe(CFG, st, jnp.zeros(3), make_scan())
    assert not bool(pg.should_add_keyframe(CFG, st, jnp.array([0.1, 0.0, 0.0])))
    assert bool(pg.should_add_keyframe(CFG, st, jnp.array([0.6, 0.0, 0.0])))


def test_chain_edges():
    st = pg.init_state(CFG, 32)
    poses = [jnp.array([float(i), 0.0, 0.0]) for i in range(4)]
    for p in poses:
        st = pg.add_keyframe(CFG, st, p, make_scan())
    assert int(st.n_kf) == 4
    assert int(st.n_edges) == 3
    np.testing.assert_array_equal(np.asarray(st.edge_i[:3]), [0, 1, 2])
    np.testing.assert_allclose(np.asarray(st.edge_delta[0]), [1.0, 0.0, 0.0], atol=1e-6)


def _circle_graph(n=12, radius=2.0, drift=0.05, seed=0):
    """Ground-truth circle; estimates accumulate odometric drift; one loop
    closure edge ties last back to first."""
    rng = np.random.default_rng(seed)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    gt = np.stack(
        [radius * np.cos(angles), radius * np.sin(angles), wrap_angle(jnp.asarray(angles + np.pi / 2))],
        axis=-1,
    ).astype(np.float32)

    st = pg.init_state(CFG, 8)
    est = gt[0]
    st = pg.add_keyframe(CFG, st, jnp.asarray(est), make_scan(8))
    for i in range(1, n):
        true_delta = np.asarray(between(jnp.asarray(gt[i - 1]), jnp.asarray(gt[i])))
        noisy = true_delta + rng.normal(0, drift, 3).astype(np.float32)
        est = np.asarray(compose(jnp.asarray(est), jnp.asarray(noisy)))
        # keyframe with the *noisy* accumulated estimate; chain edge stores
        # the noisy measurement automatically (between successive estimates)
        st = pg.add_keyframe(CFG, st, jnp.asarray(est), make_scan(8))
    # loop-closure measurement: true relative pose last -> first
    loop_delta = between(jnp.asarray(gt[-1]), jnp.asarray(gt[0]))
    st = pg._append_edge(st, n - 1, 0, loop_delta, CFG.loop_info)
    return st, jnp.asarray(gt)


def test_gauss_newton_reduces_error():
    st, gt = _circle_graph()
    e0 = float(pg.graph_error(st))
    st2 = pg.optimize(CFG, st)
    e1 = float(pg.graph_error(st2))
    assert e1 < e0 * 0.1, (e0, e1)


def test_gauss_newton_closes_loop():
    st, gt = _circle_graph(drift=0.08, seed=3)
    n = 12
    gap_before = float(jnp.linalg.norm(st.kf_poses[n - 1, :2] - gt[n - 1, :2]))
    st2 = pg.optimize(CFG, st)
    gap_after = float(jnp.linalg.norm(st2.kf_poses[n - 1, :2] - gt[n - 1, :2]))
    assert gap_after < gap_before * 0.5
    # anchor unchanged
    np.testing.assert_allclose(np.asarray(st2.kf_poses[0]), np.asarray(gt[0]), atol=1e-5)


def test_optimize_is_jittable():
    st, _ = _circle_graph()
    st2 = jax.jit(lambda s: pg.optimize(CFG, s))(st)
    assert st2.kf_poses.shape == st.kf_poses.shape


def test_schur_solve_matches_direct():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(10, 10))
    h = jnp.asarray(a @ a.T + 10 * np.eye(10), jnp.float32)
    b = jnp.asarray(rng.normal(size=10), jnp.float32)
    x_direct = jnp.linalg.solve(h, b)
    x_schur = pg.schur_solve(h, b, split=4)
    np.testing.assert_allclose(np.asarray(x_schur), np.asarray(x_direct), atol=1e-3)


def test_residual_zero_at_truth():
    pi = jnp.array([1.0, 2.0, 0.5])
    pj = jnp.array([2.0, 2.5, 1.0])
    z = between(pi, pj)
    e, ji, jj = pg._edge_residual_jac(pi, pj, z)
    np.testing.assert_allclose(np.asarray(e), 0.0, atol=1e-6)
    # jacobians match finite differences
    eps = 1e-4
    for k in range(3):
        d = jnp.zeros(3).at[k].set(eps)
        e2, _, _ = pg._edge_residual_jac(pi + d, pj, z)
        np.testing.assert_allclose(np.asarray((e2 - e) / eps), np.asarray(ji[:, k]), atol=1e-2)
        e3, _, _ = pg._edge_residual_jac(pi, pj + d, z)
        np.testing.assert_allclose(np.asarray((e3 - e) / eps), np.asarray(jj[:, k]), atol=1e-2)


def test_densify_adds_midloop_edges():
    """densify_loops proposes pair constraints between revisits anywhere in
    the trajectory (two laps -> lap-2 keyframes pair with lap-1), dedups
    already-constrained pairs, and respects the index gap."""
    from slam_constructor_tpu.ops import raycast
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.7)  # ~keyframe spacing
    poses = jnp.concatenate([lap, lap])  # two laps: revisits everywhere
    bearings = datagen.default_bearings(90)
    n_lap = lap.shape[0]

    cfg = pg.PoseGraphConfig(
        max_keyframes=2 * n_lap + 2,
        max_edges=256,
        min_index_gap=n_lap // 2,
        loop_radius=1.0,
        min_prob=0.5,
        max_candidates=6,
        local_map_size=120,
    )
    model = cells.BayesAvgCell()
    st = pg.init_state(cfg, 90)
    rng = np.random.default_rng(0)
    for i in range(poses.shape[0]):
        p = jnp.asarray(poses[i])
        s = raycast.cast_rays(occ, origin, scale, p, bearings)
        # small estimate jitter: densify must still match and accept
        est = p + jnp.asarray(rng.normal(0, 0.02, 3).astype(np.float32))
        st = pg.add_keyframe(cfg, st, est, s)

    n_edges_before = int(st.n_edges)
    densify = jax.jit(lambda s: pg.densify_loops(cfg, model, s))
    st, n_added = densify(st)
    assert int(n_added) > 0, "no mid-loop pairs accepted"
    assert int(st.n_edges) == n_edges_before + int(n_added)

    loops = np.asarray(st.edge_is_loop[: int(st.n_edges)])
    ei = np.asarray(st.edge_i[: int(st.n_edges)])[loops]
    ej = np.asarray(st.edge_j[: int(st.n_edges)])[loops]
    assert (ej - ei >= cfg.min_index_gap).all(), "index gap violated"

    # second pass must not duplicate pairs
    st, _ = densify(st)
    loops = np.asarray(st.edge_is_loop[: int(st.n_edges)])
    ei = np.asarray(st.edge_i[: int(st.n_edges)])[loops]
    ej = np.asarray(st.edge_j[: int(st.n_edges)])[loops]
    pairs = list(zip(ei.tolist(), ej.tolist()))
    assert len(pairs) == len(set(pairs)), "duplicate loop pairs appended"


def test_joint_refine_reduces_pose_error():
    """Alternating map-regen + batched gradient refinement pulls perturbed
    keyframe estimates back toward ground truth (Occupancy-SLAM-style)."""
    from slam_constructor_tpu.ops import grid as gridlib, raycast
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.8)
    bearings = datagen.default_bearings(120)
    n = lap.shape[0]
    cfg = pg.PoseGraphConfig(max_keyframes=n + 1, max_edges=64)
    model = cells.BayesAvgCell()
    st = pg.init_state(cfg, 120)
    rng = np.random.default_rng(3)
    gt_list = []
    for i in range(n):
        p = jnp.asarray(lap[i])
        s = raycast.cast_rays(occ, origin, scale, p, bearings)
        jitter = jnp.asarray(
            rng.normal(0, [0.1, 0.1, 0.03]).astype(np.float32)
        )
        est = p + jitter if i > 0 else p  # anchor stays at truth
        st = pg.add_keyframe(cfg, st, est, s)
        gt_list.append(p)
    gt = jnp.stack(gt_list)

    gm_template = gridlib.make_grid_map(model, 192, 192, 0.1)
    beam = raycast.BeamConfig(wall_blur=True)

    def err(poses):
        d = poses[:n, :2] - gt[:, :2]
        return float(jnp.linalg.norm(d, axis=1).mean())

    before = err(st.kf_poses)
    refined = jax.jit(
        lambda s: pg.joint_refine(cfg, model, s, gm_template, beam, rounds=4)
    )(st)
    after = err(refined.kf_poses)
    assert after < before * 0.7, f"joint refine: {before:.4f} -> {after:.4f}"
    # anchor untouched
    np.testing.assert_allclose(
        np.asarray(refined.kf_poses[0]), np.asarray(st.kf_poses[0]), atol=1e-7
    )


def test_capacity_overflow_drops_and_flags():
    """At capacity add_keyframe must DROP (not overwrite slot K-1) and latch
    kf_overflow; edge appends past max_edges latch edge_overflow."""
    cfg = pg.PoseGraphConfig(max_keyframes=4, max_edges=3)
    st = pg.init_state(cfg, 16)
    for i in range(4):
        st = pg.add_keyframe(cfg, st, jnp.array([float(i), 0.0, 0.0]), make_scan(16))
    assert int(st.n_kf) == 4 and not bool(st.kf_overflow)
    assert int(st.n_edges) == 3 and not bool(st.edge_overflow)
    slot3_before = np.asarray(st.kf_poses[3]).copy()
    st = pg.add_keyframe(cfg, st, jnp.array([99.0, 9.0, 1.0]), make_scan(16))
    assert bool(st.kf_overflow)
    assert int(st.n_kf) == 4  # saturated, not wrapped
    np.testing.assert_array_equal(np.asarray(st.kf_poses[3]), slot3_before)
    assert int(st.last_kf) == 3  # chain tail untouched by the dropped add
    st2 = pg._append_edge(st, 0, 3, jnp.zeros(3), (1.0, 1.0, 1.0))
    assert bool(st2.edge_overflow)
    assert int(st2.n_edges) == 3


def test_grow_preserves_graph_and_continues():
    """grow() doubles capacity, keeps content bit-identical, clears flags,
    and subsequent adds land in the new slots."""
    cfg = pg.PoseGraphConfig(max_keyframes=4, max_edges=4)
    st = pg.init_state(cfg, 16)
    for i in range(5):  # 5th add overflows
        st = pg.add_keyframe(cfg, st, jnp.array([float(i), 0.0, 0.0]), make_scan(16))
    assert bool(st.kf_overflow)
    cfg2, st2 = pg.grow(cfg, st)
    assert cfg2.max_keyframes == 8 and cfg2.max_edges == 8
    assert not bool(st2.kf_overflow) and not bool(st2.edge_overflow)
    np.testing.assert_array_equal(np.asarray(st2.kf_poses[:4]), np.asarray(st.kf_poses))
    np.testing.assert_array_equal(np.asarray(st2.edge_i[:4]), np.asarray(st.edge_i))
    st2 = pg.add_keyframe(cfg2, st2, jnp.array([4.0, 0.0, 0.0]), make_scan(16))
    assert int(st2.n_kf) == 5 and int(st2.last_kf) == 4
    assert int(st2.n_edges) == 4  # the 4->5 chain edge landed
    np.testing.assert_array_equal(np.asarray(st2.kf_poses[4]), [4.0, 0.0, 0.0])
    # optimize still runs on the grown graph
    out = pg.optimize(cfg2, st2)
    assert out.kf_poses.shape == (8, 3)


def test_full_engine_grows_past_keyframe_capacity():
    """FullSlamEngine with a tiny initial graph must keep adding keyframes
    via host-side growth on a long trajectory (the silent-saturation bug:
    runs past capacity previously stopped building the graph AND the map)."""
    import dataclasses

    from slam_constructor_tpu.models import full, tiny
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    lap = datagen.rectangle_trajectory(step=0.35)
    poses = lap
    bearings = datagen.default_bearings(60)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(3),
        odom_noise_xy=0.01, odom_noise_theta=0.006,
    )
    graph = pg.PoseGraphConfig(
        max_keyframes=8, max_edges=16, keyframe_distance=0.4,
        loop_radius=1.5, min_index_gap=6, min_prob=0.7, max_candidates=2,
        local_map_size=100, gn_iterations=8,
    )
    e = full.FullSlamEngine(
        full.FullConfig(tracking=tiny.tiny_config(mc_batch=32, mc_rounds=8),
                        graph=graph),
        n_beams=60,
    )
    e.state = e.state.replace(pose=gt[0])
    e.run(scans, odom)
    assert int(e.graph.n_kf) > 8, "graph stopped at the initial capacity"
    assert e.cfg.graph.max_keyframes >= 16  # at least one growth happened
    assert not bool(e.graph.kf_overflow)
    # keyframes keep following the trajectory after growth
    kfs = np.asarray(e.keyframe_poses)
    assert np.ptp(kfs[:, 0]) > 5.0  # spans the loop, not frozen early


def test_process_keyframes_matches_sequential():
    """Batched add+detect (one dispatch per segment, round-3 full-pipeline
    fix) must equal the sequential add_keyframe/detect_loops loop — graph
    arrays bitwise, including padding behavior."""
    from slam_constructor_tpu.ops import raycast
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(48)
    model = cells.BayesAvgCell()
    cfg = pg.PoseGraphConfig(
        max_keyframes=16, max_edges=32, keyframe_distance=0.3,
        min_index_gap=2, loop_radius=3.0, max_candidates=2,
        local_map_size=64,
    )
    poses = [jnp.array([0.35 * i - 1.0, -1.5, 0.0]) for i in range(5)]
    scans = [raycast.cast_rays(occ, origin, scale, p, bearings) for p in poses]

    seq = pg.init_state(cfg, 48)
    total_seq = 0
    for p, s in zip(poses, scans):
        seq = pg.add_keyframe(cfg, seq, p, s)
        seq, nl = pg.detect_loops(cfg, model, seq, s, p)
        total_seq += int(nl)

    bat = pg.init_state(cfg, 48)
    kmax = 8  # padded batch wider than the actual 5 keyframes
    scans_b = jax.tree.map(
        lambda *xs: jnp.stack(list(xs) + [xs[0]] * (kmax - len(xs))), *scans
    )
    poses_b = jnp.stack(poses + [poses[0]] * (kmax - len(poses)))
    valid = jnp.arange(kmax) < len(poses)
    bat, nl_b = jax.jit(
        lambda st, sc, po, v: pg.process_keyframes(cfg, model, st, sc, po, v)
    )(bat, scans_b, poses_b, valid)

    assert int(nl_b) == total_seq
    for name in ("kf_poses", "edge_i", "edge_j", "edge_delta", "edge_info",
                 "n_kf", "n_edges", "last_kf"):
        np.testing.assert_array_equal(
            np.asarray(getattr(bat, name)), np.asarray(getattr(seq, name)),
            err_msg=name,
        )


def test_process_keyframes_batched_path_matches_sequential():
    """When batch width <= min_index_gap the batched detection path runs
    (one vmap over all B x C matches) — same graph STRUCTURE as the
    sequential add_keyframe/detect_loops loop (indices/counts/order
    bitwise); edge values to fp tolerance (the nested vmap changes XLA's
    reduction order, so match scores differ at the ulp level — measured
    3e-8 on deltas; the score-curvature information estimate amplifies
    that to ~3% relative)."""
    from slam_constructor_tpu.ops import raycast
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(48)
    model = cells.BayesAvgCell()
    cfg = pg.PoseGraphConfig(
        max_keyframes=32, max_edges=64, keyframe_distance=0.2,
        min_index_gap=4, loop_radius=3.0, max_candidates=2,
        local_map_size=64, min_prob=0.1,
    )
    # out-and-back path: later keyframes revisit early ones -> real loops
    xs = list(np.linspace(-1.0, 1.0, 6)) + list(np.linspace(1.0, -1.0, 6))
    poses = [jnp.array([x, -1.5, 0.0]) for x in xs]
    scans = [raycast.cast_rays(occ, origin, scale, p, bearings) for p in poses]

    seq = pg.init_state(cfg, 48)
    total_seq = 0
    for p, s in zip(poses, scans):
        seq = pg.add_keyframe(cfg, seq, p, s)
        seq, nl = pg.detect_loops(cfg, model, seq, s, p)
        total_seq += int(nl)
    assert total_seq > 0, "test should produce real loop closures"

    bat = pg.init_state(cfg, 48)
    total_bat = 0
    b = 4  # == min_index_gap -> batched path
    for c0 in range(0, len(poses), b):
        chunk_p = poses[c0:c0 + b]
        chunk_s = scans[c0:c0 + b]
        pad = b - len(chunk_p)
        scans_b = jax.tree.map(
            lambda *xs: jnp.stack(list(xs) + [xs[0]] * pad), *chunk_s
        )
        poses_b = jnp.stack(chunk_p + [chunk_p[0]] * pad)
        valid = jnp.arange(b) < len(chunk_p)
        bat, nl = jax.jit(
            lambda st, sc, po, v: pg.process_keyframes(cfg, model, st, sc, po, v)
        )(bat, scans_b, poses_b, valid)
        total_bat += int(nl)

    assert total_bat == total_seq
    for name in ("kf_poses", "edge_i", "edge_j", "edge_is_loop", "n_kf",
                 "n_edges", "last_kf"):
        np.testing.assert_array_equal(
            np.asarray(getattr(bat, name)), np.asarray(getattr(seq, name)),
            err_msg=name,
        )
    np.testing.assert_allclose(
        np.asarray(bat.edge_delta), np.asarray(seq.edge_delta), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bat.edge_info), np.asarray(seq.edge_info), rtol=0.1
    )


def test_regenerate_map_batched_matches_sequential_fold():
    """Additive-fold regeneration (parallel keyframe rasterization) must
    reproduce the serial insert chain on BayesAvg cells (fp tolerance —
    summation order differs by design)."""
    from slam_constructor_tpu.ops import grid as gridlib
    from slam_constructor_tpu.ops import raycast
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(48)
    model = cells.BayesAvgCell()
    cfg = pg.PoseGraphConfig(max_keyframes=8, max_edges=16)
    st = pg.init_state(cfg, 48)
    for i in range(5):
        p = jnp.array([0.3 * i - 0.8, -1.5, 0.1 * i])
        s = raycast.cast_rays(occ, origin, scale, p, bearings)
        st = pg.add_keyframe(cfg, st, p, s)

    beam = raycast.BeamConfig(wall_blur=True)
    fresh = gridlib.make_grid_map(model, 96, 96, 0.1)
    batched = pg.regenerate_map(cfg, model, st, fresh, beam)

    serial = fresh
    for i in range(cfg.max_keyframes):
        s = jax.tree.map(lambda a: a[i], st.kf_scans)
        s = s.replace(valid=s.valid & (i < st.n_kf))
        serial = raycast.insert_scan(serial, model, st.kf_poses[i], s, beam)

    np.testing.assert_allclose(
        np.asarray(batched.cells), np.asarray(serial.cells),
        rtol=1e-4, atol=1e-5,
    )


def test_loop_matcher_kind_m3rsm_detects_loops():
    """PoseGraphConfig.loop_matcher_kind selects any registered matcher
    for loop-closure refinement (SURVEY §2.6: reuse the BF/M3RSM score
    kernels); the M3RSM branch-and-bound must find the same loop pairs the
    BF grid does on a revisit trajectory."""
    from slam_constructor_tpu.ops import m3rsm as m3rsmlib
    from slam_constructor_tpu.ops import raycast, scoring as scoringlib
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(60)
    model = cells.BayesAvgCell()
    common = dict(
        max_keyframes=32, max_edges=64, keyframe_distance=0.2,
        min_index_gap=4, loop_radius=3.0, max_candidates=2,
        local_map_size=64, min_prob=0.1,
    )
    cfg_bf = pg.PoseGraphConfig(**common)
    cfg_m3 = pg.PoseGraphConfig(
        **common, loop_matcher_kind="m3rsm",
        loop_matcher=m3rsmlib.M3RSMConfig(
            levels=3, half_x=0.6, half_y=0.6, half_theta=0.3, n_theta=7,
            scoring=scoringlib.ScoringConfig(reducer="overlap", stride=2),
        ),
    )
    xs = list(np.linspace(-1.0, 1.0, 6)) + list(np.linspace(1.0, -1.0, 6))
    poses = [jnp.array([x, -1.5, 0.0]) for x in xs]
    scans = [raycast.cast_rays(occ, origin, scale, p, bearings) for p in poses]

    def run(cfg):
        st = pg.init_state(cfg, 60)
        total = 0
        for p_, s_ in zip(poses, scans):
            st = pg.add_keyframe(cfg, st, p_, s_)
            st, nl = pg.detect_loops(cfg, model, st, s_, p_)
            total += int(nl)
        return st, total

    st_bf, n_bf = run(cfg_bf)
    st_m3, n_m3 = run(cfg_m3)
    assert n_bf > 0
    assert n_m3 > 0, "m3rsm loop matcher found no loops"
    pairs_bf = set(zip(np.asarray(st_bf.edge_i[: int(st_bf.n_edges)]).tolist(),
                       np.asarray(st_bf.edge_j[: int(st_bf.n_edges)]).tolist()))
    pairs_m3 = set(zip(np.asarray(st_m3.edge_i[: int(st_m3.n_edges)]).tolist(),
                       np.asarray(st_m3.edge_j[: int(st_m3.n_edges)]).tolist()))
    # the loop EDGE SETS should overlap substantially (both matchers see
    # the same candidates; acceptance can differ at gate knife edges)
    inter = pairs_bf & pairs_m3
    assert len(inter) >= max(1, min(len(pairs_bf), len(pairs_m3)) - 2)
