"""FFT-correlation global relocalization (kidnapped-robot recovery)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells, grid, raycast, relocalize, scoring
from slam_constructor_tpu.utils import datagen


@pytest.fixture(scope="module")
def mapped_world():
    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(180)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 160, 160, 0.1)
    traj = datagen.rectangle_trajectory(step=0.5)
    for i in range(traj.shape[0]):
        s = raycast.cast_rays(occ, origin, scale, traj[i], bearings)
        gm = raycast.insert_scan(
            gm, model, traj[i], s, raycast.BeamConfig(wall_blur=True)
        )
    return scoring.MapView.of(gm, model), (occ, origin, scale, bearings)


@pytest.mark.parametrize(
    "pose", [(3.0, -1.5, 2.1), (-5.0, 1.6, -0.7), (0.0, -1.5, 0.0)]
)
def test_kidnapped_recovery(mapped_world, pose):
    view, (occ, origin, scale, bearings) = mapped_world
    true_pose = jnp.asarray(pose, jnp.float32)
    s = raycast.cast_rays(occ, origin, scale, true_pose, bearings)
    res = relocalize.relocalize(
        view, s, relocalize.RelocalizeConfig(n_theta=64)
    )
    err = np.array(res.pose - true_pose)
    err[2] = (err[2] + np.pi) % (2 * np.pi) - np.pi
    assert abs(err[0]) < 0.12 and abs(err[1]) < 0.12, err
    assert abs(err[2]) < 0.08, err


def test_fft_correlation_matches_direct():
    """FFT score at a translation == direct endpoint-sum at that shift."""
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.uniform(size=(32, 32)).astype(np.float32))
    h = jnp.zeros((32, 32)).at[5, 7].set(1.0).at[10, 20].set(1.0)
    corr = relocalize._fft_correlate(v, h)
    # t = (3, -2): sum v[5+3, 7-2] + v[10+3, 20-2]
    want = float(v[8, 5] + v[13, 18])
    got = float(corr[32 + 3, 32 - 2])
    assert got == pytest.approx(want, abs=1e-3)


def test_relocalize_jittable(mapped_world):
    view, (occ, origin, scale, bearings) = mapped_world
    s = raycast.cast_rays(occ, origin, scale, jnp.array([0.0, -1.5, 0.0]), bearings)
    cfg = relocalize.RelocalizeConfig(n_theta=8, refine_iterations=2)
    f = jax.jit(lambda v, sc: relocalize.relocalize(v, sc, cfg))
    res = f(view, s)
    assert res.pose.shape == (3,)
