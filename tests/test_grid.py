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


def test_rescale_coarsen_conserves_evidence():
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 8, 8, 0.5)
    w = jnp.zeros((8, 8)).at[2, 2].set(4.0).at[2, 3].set(4.0)
    s = jnp.zeros((8, 8)).at[2, 2].set(4.0)  # cell (2,2) occupied, (2,3) free
    gm = grid.apply_observations(gm, model, w, s)
    g2 = grid.rescale(gm, model, 2)
    assert g2.cells.shape == (4, 4, 2)
    assert g2.scale == 1.0
    np.testing.assert_allclose(float(g2.weight.sum()), float(gm.weight.sum()))
    # evidence-weighted mean: (1.0*4 + 0.0*4) / 8 = 0.5
    np.testing.assert_allclose(float(g2.belief[1, 1, 0]), 0.5, atol=1e-6)
    # unknown blocks keep the init belief
    np.testing.assert_allclose(float(g2.belief[0, 0, 0]), 0.5, atol=1e-6)
    assert float(g2.weight[0, 0]) == 0.0
    # world geometry: the center of fine cell (2, 2) lands in the
    # aggregated coarse cell (1, 1) — same origin, doubled scale
    pt = grid.cell_center(gm, jnp.array([[2, 2]]))
    np.testing.assert_array_equal(
        np.asarray(grid.world_to_cell(g2, pt))[0], [1, 1]
    )


def test_rescale_refine_then_coarsen_roundtrip():
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 4, 4, 1.0)
    w = jnp.arange(16.0).reshape(4, 4)
    s = w * 0.75
    gm = grid.apply_observations(gm, model, w, s)
    fine = grid.rescale(gm, model, -2)
    assert fine.cells.shape == (8, 8, 2)
    assert fine.scale == 0.5
    np.testing.assert_allclose(
        float(fine.weight.sum()), float(gm.weight.sum()), rtol=1e-6
    )
    back = grid.rescale(fine, model, 2)
    np.testing.assert_allclose(
        np.asarray(back.cells), np.asarray(gm.cells), atol=1e-5
    )
    assert back.scale == gm.scale


def test_rescale_tbm_masses():
    model = cells.TBMCell()
    gm = grid.make_grid_map(model, 4, 4, 0.1)
    w = jnp.zeros((4, 4)).at[0, 0].set(2.0)
    s = jnp.zeros((4, 4)).at[0, 0].set(2.0)
    gm = grid.apply_observations(gm, model, w, s)
    g2 = grid.rescale(gm, model, 2)
    m = np.asarray(g2.belief[0, 0])
    np.testing.assert_allclose(m.sum(), 1.0, atol=1e-5)  # still a mass fn
    assert m[0] > 0.3  # occupied evidence survived aggregation
