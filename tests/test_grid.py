import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells, grid


@pytest.fixture
def model():
    return cells.BayesAvgCell()


@pytest.fixture
def gm(model):
    return grid.make_grid_map(model, height=20, width=30, scale=0.5)


def test_world_cell_roundtrip(gm):
    pts = jnp.array([[0.0, 0.0], [-7.4, -4.9], [7.4, 4.9], [0.26, -0.26]])
    idx = grid.world_to_cell(gm, pts)
    assert bool(grid.in_bounds(gm, idx).all())
    centers = grid.cell_center(gm, idx)
    # center of the containing cell is within half a diagonal
    assert float(jnp.abs(centers - pts).max()) <= 0.5


def test_origin_centering(gm):
    idx = grid.world_to_cell(gm, jnp.zeros((2,)))
    assert tuple(np.asarray(idx)) == (10, 15)


def test_out_of_bounds_detected(gm):
    idx = grid.world_to_cell(gm, jnp.array([[100.0, 0.0], [0.0, -100.0]]))
    assert not bool(grid.in_bounds(gm, idx).any())


def test_apply_observations_and_unknown(gm, model):
    w = jnp.zeros((20, 30)).at[3, 4].set(2.0)
    s = jnp.zeros((20, 30)).at[3, 4].set(2.0)
    gm2 = grid.apply_observations(gm, model, w, s)
    occ = grid.occupancy_plane(gm2, model)
    assert float(occ[3, 4]) == pytest.approx(1.0)
    known = grid.known_mask(gm2)
    assert bool(known[3, 4]) and not bool(known[0, 0])


def test_gather_plane_oob():
    plane = jnp.arange(12.0).reshape(3, 4)
    idx = jnp.array([[0, 0], [2, 3], [-1, 0], [0, 7]])
    out = grid.gather_plane(plane, idx, -5.0, 3, 4)
    np.testing.assert_allclose(np.asarray(out), [0.0, 11.0, -5.0, -5.0])


def test_grow_to_contain_preserves_content(gm, model):
    w = jnp.zeros((20, 30)).at[5, 6].set(1.0)
    gm2 = grid.apply_observations(gm, model, w, w)  # occupied cell at (5, 6)
    world_pt = grid.cell_center(gm2, jnp.array([5, 6]))
    grown = grid.grow_to_contain(gm2, model, np.array([[30.0, -20.0]]))
    assert grown.height > gm2.height and grown.width > gm2.width
    # same world point still occupied
    idx2 = grid.world_to_cell(grown, world_pt)
    occ = grid.occupancy_plane(grown, model)
    assert float(occ[tuple(np.asarray(idx2))]) == pytest.approx(1.0)
    # and the new area is unknown
    idx3 = grid.world_to_cell(grown, jnp.array([29.0, -19.0]))
    assert not bool(grid.known_mask(grown)[tuple(np.asarray(idx3))])


def test_grow_noop_when_contained(gm, model):
    out = grid.grow_to_contain(gm, model, np.array([[0.0, 0.0]]))
    assert out.height == gm.height and out.width == gm.width
