import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells, grid, raycast, scan as scanlib
from slam_constructor_tpu.utils import datagen


def test_cast_rays_box():
    # 10m box centered at origin; robot at center; walls at +/-5m
    occ, origin, scale = datagen.box_world(10.0, 0.1, obstacles=0)
    bearings = jnp.array([0.0, np.pi / 2, np.pi, -np.pi / 2], jnp.float32)
    s = raycast.cast_rays(occ, origin, scale, jnp.zeros(3), bearings)
    assert bool(s.valid.all())
    np.testing.assert_allclose(np.asarray(s.ranges), [4.9] * 4, atol=0.1)


def test_cast_rays_rotated_pose():
    occ, origin, scale = datagen.box_world(10.0, 0.1, obstacles=0)
    pose = jnp.array([2.0, 0.0, np.pi], jnp.float32)  # facing -x
    s = raycast.cast_rays(occ, origin, scale, pose, jnp.array([0.0]))
    assert float(s.ranges[0]) == pytest.approx(6.9, abs=0.1)


def test_cast_rays_max_range_invalid():
    occ = jnp.zeros((50, 50))  # empty world, nothing to hit
    s = raycast.cast_rays(occ, jnp.array([-2.5, -2.5]), 0.1, jnp.zeros(3),
                          jnp.array([0.0]), max_range=5.0)
    assert not bool(s.valid[0])


@pytest.mark.parametrize("estimator", ["const", "area"])
def test_insert_scan_marks_walls_and_free(estimator):
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=0)
    bearings = datagen.default_bearings(180)
    true_scan = raycast.cast_rays(occ, origin, scale, jnp.zeros(3), bearings)

    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 80, 80, 0.1)
    cfg = raycast.BeamConfig(occupancy_estimator=estimator)
    gm = raycast.insert_scan(gm, model, jnp.zeros(3), true_scan, cfg)
    est = grid.occupancy_plane(gm, model)
    known = grid.known_mask(gm)

    # free space near the robot is known and free
    c = 40
    assert bool(known[c, c])
    assert float(est[c - 5 : c + 5, c - 5 : c + 5].max()) < 0.2
    # wall cells along +x are occupied
    wall_col = int((3.9 - float(origin[0])) / 0.1)
    assert float(est[c, wall_col]) > 0.5


def test_insert_scan_wall_blur_runs():
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=0)
    bearings = datagen.default_bearings(90)
    s = raycast.cast_rays(occ, origin, scale, jnp.zeros(3), bearings)
    model = cells.BayesBaseCell()
    gm = grid.make_grid_map(model, 80, 80, 0.1)
    cfg = raycast.BeamConfig(wall_blur=True)
    gm = raycast.insert_scan(gm, model, jnp.zeros(3), s, cfg)
    assert float(grid.occupancy_plane(gm, model).max()) > 0.5


def test_insert_is_jittable():
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=0)
    bearings = datagen.default_bearings(90)
    s = raycast.cast_rays(occ, origin, scale, jnp.zeros(3), bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 80, 80, 0.1)
    cfg = raycast.BeamConfig()
    f = jax.jit(lambda g, p, sc: raycast.insert_scan(g, model, p, sc, cfg))
    out = f(gm, jnp.zeros(3), s)
    assert out.cells.shape == gm.cells.shape


def test_synth_sequence_shapes():
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.corridor_trajectory(10)
    bearings = datagen.default_bearings(90)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(0)
    )
    assert scans.ranges.shape == (10, 90)
    assert odom.shape == (10, 3)
    # odometry roughly tracks the true +x step of the corridor trajectory
    true_dx = float(poses[1, 0] - poses[0, 0])
    assert float(jnp.abs(odom[1:, 0] - true_dx).max()) < 0.1


def test_scatter_matmul_matches_scatter():
    """MXU one-hot scatter path vs XLA scatter: exact for unit counts,
    bf16-rounded (<0.5%) for fractional blur/area weights."""
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=3, seed=1)
    bearings = datagen.default_bearings(120)
    pose = jnp.array([0.2, -0.1, 0.3])
    s = raycast.cast_rays(occ, origin, scale, pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 96, 96, 0.1)
    for est, blur, tol in [("const", False, 0.0), ("const", True, 5e-3), ("area", False, 5e-3)]:
        a = raycast.insert_scan(gm, model, pose, s, raycast.BeamConfig(
            occupancy_estimator=est, wall_blur=blur, scatter_impl="scatter"))
        b = raycast.insert_scan(gm, model, pose, s, raycast.BeamConfig(
            occupancy_estimator=est, wall_blur=blur, scatter_impl="matmul"))
        d = float(jnp.abs(a.cells - b.cells).max())
        assert d <= tol, (est, blur, d)


def test_polar_free_fill_agrees_with_dda():
    # the dense polar fill must mark (approximately) the same free region
    # as the per-beam DDA trace: same endpoint evidence, >=90% overlap of
    # free cells, comparable total free weight
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=3, seed=2)
    bearings = datagen.default_bearings(360)
    pose = jnp.array([0.4, -0.3, 0.2])
    s = raycast.cast_rays(occ, origin, scale, pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 120, 120, 0.1)
    wd, sd = raycast.scan_observation_planes(gm, pose, s, raycast.BeamConfig(free_impl="dda"))
    wp, sp = raycast.scan_observation_planes(gm, pose, s, raycast.BeamConfig(free_impl="polar"))
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sd))  # endpoints identical
    free_d = (np.asarray(wd - sd) > 0)
    free_p = (np.asarray(wp - sp) > 0)
    overlap = (free_d & free_p).sum() / max(free_d.sum(), 1)
    assert overlap > 0.9, f"free-region overlap {overlap}"
    # polar is conservative (adjacent-beam min): it should not claim much
    # free space the DDA doesn't
    extra = (free_p & ~free_d).sum() / max(free_p.sum(), 1)
    assert extra < 0.1, f"polar-only free fraction {extra}"
    ratio = float(wp.sum() / wd.sum())
    assert 0.7 < ratio < 1.3, f"free mass ratio {ratio}"


def test_polar_free_fill_partial_fov():
    # half-FOV scan: no free evidence behind the robot
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=0, seed=0)
    bearings = datagen.default_bearings(181, fov=jnp.pi)  # [-pi/2, pi/2]
    pose = jnp.array([0.0, 0.0, 0.0])
    s = raycast.cast_rays(occ, origin, scale, pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 120, 120, 0.1)
    wp, sp = raycast.scan_observation_planes(gm, pose, s, raycast.BeamConfig(free_impl="polar"))
    free = np.asarray(wp - sp) > 0
    # cells well behind the robot (x < -0.5 m => col < 55) must stay empty
    assert free[:, :55].sum() == 0
    # ahead: plenty of free cells
    assert free[:, 65:].sum() > 100


def test_polar_pallas_free_plane_matches_xla_polar():
    """The fused one-launch Pallas range lookup (free_impl='polar_pallas')
    must reproduce the XLA polar pass BITWISE: the trig planes feeding it
    are computed by the same XLA expressions, and the in-kernel one-hot
    lookup + selects are exact. (An earlier in-kernel-trig draft hit fp
    knife edges at the free boundary — 1 cell in 12k — from XLA's FMA
    contraction of d^2; structuring the kernel to consume the SAME planes
    removed the tolerance entirely.)"""
    import numpy as np

    from slam_constructor_tpu.ops import cells as cellslib
    from slam_constructor_tpu.ops import grid as gridlib
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    gm = gridlib.make_grid_map(cellslib.BayesAvgCell(), 96, 128, 0.1)
    cfg = raycast.BeamConfig(wall_blur=True, free_impl="polar")
    for nb in (360, 120, 90):
        bearings = datagen.default_bearings(nb)
        pose = jnp.array([0.3, -1.45, 0.7])
        s = raycast.cast_rays(occ, origin, scale, pose, bearings)
        s = s.replace(valid=s.valid & (jnp.arange(nb) % 7 != 3))
        a = np.asarray(
            raycast._polar_free_plane(96, 128, gm.origin, 0.1, pose, s, cfg)
        )
        b = np.asarray(
            raycast._polar_free_plane_pallas(
                96, 128, gm.origin, 0.1, pose, s, cfg
            )
        )
        np.testing.assert_array_equal(a, b, err_msg=f"{nb} beams")


def test_insert_scan_polar_pallas_close_to_polar():
    """Full insert through the pallas free lookup equals the polar insert
    (same planes, same occupied evidence, same fold)."""
    import numpy as np

    from slam_constructor_tpu.ops import cells as cellslib
    from slam_constructor_tpu.ops import grid as gridlib
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    model = cellslib.BayesAvgCell()
    bearings = datagen.default_bearings(180)
    pose = jnp.array([0.0, -1.5, 0.2])
    s = raycast.cast_rays(occ, origin, scale, pose, bearings)
    gm = gridlib.make_grid_map(model, 96, 128, 0.1)
    a = raycast.insert_scan(
        gm, model, pose, s, raycast.BeamConfig(wall_blur=True, free_impl="polar")
    )
    b = raycast.insert_scan(
        gm, model, pose, s,
        raycast.BeamConfig(wall_blur=True, free_impl="polar_pallas"),
    )
    diff = np.abs(np.asarray(a.cells) - np.asarray(b.cells))
    assert (diff > 1e-4).sum() <= diff.size * 1e-3


def test_polar_missing_free_concentrates_at_walls():
    """Characterize the polar fill's documented bias (the r5 viny_m3rsm
    root cause): the free evidence it omits relative to DDA is the
    neighbor-min erosion band AROUND obstacles — an unknown halo that
    global matchers rank across (aliasing wall-adjacent translations)
    while sigma-bounded local matchers never see. The halo must stay a
    small, wall-adjacent fraction; if this starts failing, the polar
    approximation changed character and every 'auto' preset needs its
    on-chip 5-seed row re-run."""
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=3, seed=2)
    bearings = datagen.default_bearings(360)
    pose = jnp.array([0.4, -0.3, 0.2])
    s = raycast.cast_rays(occ, origin, scale, pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 120, 120, 0.1)
    wd, sd = raycast.scan_observation_planes(
        gm, pose, s, raycast.BeamConfig(free_impl="dda"))
    wp, sp = raycast.scan_observation_planes(
        gm, pose, s, raycast.BeamConfig(free_impl="polar"))
    free_d = np.asarray(wd - sd) > 0
    free_p = np.asarray(wp - sp) > 0
    missing = free_d & ~free_p  # DDA-free cells polar leaves unknown
    # wall mask: cells with endpoint (occupied) evidence, dilated 2 cells
    wall = np.asarray(sd) > 0
    k = 2
    dil = wall.copy()
    for _ in range(k):
        d2 = dil.copy()
        d2[1:, :] |= dil[:-1, :]
        d2[:-1, :] |= dil[1:, :]
        d2[:, 1:] |= dil[:, :-1]
        d2[:, :-1] |= dil[:, 1:]
        dil = d2
    at_wall = (missing & dil).sum() / max(missing.sum(), 1)
    assert at_wall > 0.5, f"missing-free cells near walls only {at_wall}"
    # and the halo is small relative to the free region
    assert missing.sum() / max(free_d.sum(), 1) < 0.1
