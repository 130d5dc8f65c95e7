"""Copy-on-write particle maps: allocation, CoW semantics, resample-by-table,
and RBPF equivalence with dense per-particle maps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.models import gmapping
from slam_constructor_tpu.ops import cells, cow, grid, raycast, resample
from slam_constructor_tpu.utils import datagen, evaluate


@pytest.fixture
def model():
    return cells.BayesAvgCell()


def touched_one(p, th, tw, entries):
    t = jnp.zeros((p, th, tw), bool)
    for pi, r, c in entries:
        t = t.at[pi, r, c].set(True)
    return t


def test_alloc_and_exclusive_write(model):
    st = cow.make_cow_maps(model, n_particles=2, tiles_h=2, tiles_w=2, capacity=8, block=8)
    st = cow.prepare_write(st, model, touched_one(2, 2, 2, [(0, 0, 0), (1, 0, 0)]))
    # two particles touching the same (unmapped) tile get DISTINCT blocks
    s0, s1 = int(st.tables[0, 0, 0]), int(st.tables[1, 0, 0])
    assert s0 >= 0 and s1 >= 0 and s0 != s1
    assert int(cow.distinct_blocks(st)) == 2


def test_cow_on_shared_block(model):
    st = cow.make_cow_maps(model, 2, 2, 2, capacity=8, block=8)
    st = cow.prepare_write(st, model, touched_one(2, 2, 2, [(0, 0, 0)]))
    s0 = int(st.tables[0, 0, 0])
    # particle 0 writes something
    st = cow.scatter_observations(
        st, model, jnp.array([0]), jnp.array([3]), jnp.array([3]),
        jnp.array([1.0]), jnp.array([1.0]),
    )
    # resample: particle 1 becomes a copy of particle 0 (table share)
    st = cow.resample(st, jnp.array([0, 0]))
    assert int(st.tables[1, 0, 0]) == s0
    assert int(st.refcnt[s0]) == 2
    # particle 1 now writes the shared tile -> gets its own copy
    st2 = cow.prepare_write(st, model, touched_one(2, 2, 2, [(1, 0, 0)]))
    s1 = int(st2.tables[1, 0, 0])
    assert s1 != s0 and int(st2.refcnt[s0]) == 1 and int(st2.refcnt[s1]) == 1
    # the copy carried the written content
    np.testing.assert_allclose(
        np.asarray(st2.pool[s1]), np.asarray(st2.pool[s0]), atol=1e-6
    )
    # particle 1 writes; particle 0's view unchanged
    st3 = cow.scatter_observations(
        st2, model, jnp.array([1]), jnp.array([4]), jnp.array([4]),
        jnp.array([2.0]), jnp.array([0.0]),
    )
    w0 = cow.extract_window(st3, model, jnp.int32(0), jnp.zeros(2), 2, 2)
    w1 = cow.extract_window(st3, model, jnp.int32(1), jnp.zeros(2), 2, 2)
    assert float(w0.weight[4, 4]) == 0.0
    assert float(w1.weight[4, 4]) == 2.0
    assert float(w0.weight[3, 3]) == float(w1.weight[3, 3]) == 1.0


def test_block_recycling(model):
    st = cow.make_cow_maps(model, 1, 2, 2, capacity=4, block=8)
    st = cow.prepare_write(st, model, touched_one(1, 2, 2, [(0, 0, 0)]))
    s0 = int(st.tables[0, 0, 0])
    # drop all references via a resample to a table-less state... simulate by
    # pointing the table elsewhere through resample of a fresh particle
    st_fresh = cow.make_cow_maps(model, 1, 2, 2, capacity=4, block=8)
    st = st.replace(tables=st_fresh.tables)
    st = cow.resample(st, jnp.array([0]))
    assert int(st.refcnt[s0]) == 0  # recycled
    st = cow.prepare_write(st, model, touched_one(1, 2, 2, [(0, 1, 1)]))
    assert int(st.tables[0, 1, 1]) == s0  # lowest free slot reused


def test_overflow_flag(model):
    st = cow.make_cow_maps(model, 1, 4, 4, capacity=2, block=8)
    st = cow.prepare_write(st, model, jnp.ones((1, 4, 4), bool))
    assert bool(st.overflow)


def test_gmapping_cow_matches_dense_quality():
    occ, origin, scale = datagen.cecum_world()
    poses = datagen.corridor_trajectory(15)
    bearings = datagen.default_bearings(90)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(11),
        odom_noise_xy=0.02, odom_noise_theta=0.01,
    )
    kw = dict(n_particles=6, map_height=256, map_width=256,
              beam=raycast.BeamConfig(occupancy_estimator="const", wall_blur=False))
    cfg_d = gmapping.GMappingConfig(**kw)
    cfg_c = gmapping.GMappingConfig(
        **kw, map_storage="cow", tile_block=32, tile_capacity=512, window_tiles=8
    )
    trajs, ates = {}, {}
    for name, cfg in [("dense", cfg_d), ("cow", cfg_c)]:
        e = gmapping.GMappingEngine(cfg)
        e.state = e.state.replace(
            poses=jnp.broadcast_to(gt[0], (cfg.n_particles, 3))
        )
        traj, _ = e.run(scans, odom)
        trajs[name] = np.asarray(traj)
        ates[name] = float(evaluate.ate(traj, gt, align=False))
    # CoW storage is an exact refactor of dense per-particle maps: same
    # PRNG stream, same scores -> same trajectory (within window-extraction
    # float noise)
    np.testing.assert_allclose(trajs["cow"], trajs["dense"], atol=5e-3)
    assert ates["cow"] < 0.5 and ates["dense"] < 0.5, ates


def test_cow_sharing_after_convergence(model):
    """After resampling to one ancestor, blocks are shared, not copied."""
    st = cow.make_cow_maps(model, 4, 4, 4, capacity=64, block=8)
    t = jnp.zeros((4, 4, 4), bool).at[:, 1, 1].set(True).at[:, 2, 2].set(True)
    st = cow.prepare_write(st, model, t)
    assert int(cow.distinct_blocks(st)) == 8  # 4 particles x 2 tiles
    st = cow.resample(st, jnp.zeros(4, jnp.int32))
    assert int(cow.distinct_blocks(st)) == 2  # everyone shares ancestor 0


def test_cow_improved_proposal_steps():
    """CoW storage + the Grisetti improved proposal: the probe/weight path
    must work against the windowed CoW view (weights finite, masses sane,
    tracking not diverging over a few steps)."""
    from slam_constructor_tpu.models import gmapping
    from slam_constructor_tpu.utils import datagen

    occ, origin, scale = datagen.cecum_world()
    bearings = datagen.default_bearings(60)
    poses = datagen.corridor_trajectory(6)
    scans, odom, gt = datagen.synth_sequence(
        occ, origin, scale, poses, bearings, jax.random.PRNGKey(5),
        odom_noise_xy=0.02, odom_noise_theta=0.01,
    )
    cfg = gmapping.GMappingConfig(
        n_particles=4, map_height=128, map_width=128, map_storage="cow",
        tile_capacity=256, proposal="improved", weight_gamma=16.0,
    )
    st = gmapping.init_state(cfg).replace(
        poses=jnp.broadcast_to(gt[0], (4, 3))
    )
    step = jax.jit(lambda s, sc, od: gmapping.gmapping_step(cfg, s, sc, od))
    for t in range(5):
        st, _ = step(st, jax.tree.map(lambda a: a[t], scans), odom[t])
    assert bool(jnp.isfinite(st.log_weights).all())
    assert float(jnp.exp(st.log_weights).sum()) == pytest.approx(1.0, abs=1e-4)
    err = float(jnp.hypot(*(gmapping.estimate_pose(st)[:2] - gt[4][:2])))
    assert err < 0.5, err


def test_grow_pool_preserves_maps_and_clears_overflow(model):
    """Host-side pool growth: content identical, tables untouched, refcounts
    extended with zeros, overflow cleared, and subsequent writes land in the
    new slots."""
    from slam_constructor_tpu.ops import cow

    st = cow.make_cow_maps(model, n_particles=2, tiles_h=4, tiles_w=4,
                           capacity=6, block=8)
    touched = jnp.zeros((2, 4, 4), bool).at[:, 1:3, 1:3].set(True)
    st = cow.prepare_write(st, model, touched)  # 8 needed > 6 capacity
    assert bool(st.overflow)
    occ_before = {
        p: np.asarray(cow.extract_window(st, model, p, jnp.zeros(2), 4, 4).cells)
        for p in range(2)
    }
    g = cow.grow_pool(st, model, 16)
    assert g.capacity == 16 and not bool(g.overflow)
    np.testing.assert_array_equal(np.asarray(g.tables), np.asarray(st.tables))
    for p in range(2):
        np.testing.assert_array_equal(
            np.asarray(cow.extract_window(g, model, p, jnp.zeros(2), 4, 4).cells),
            occ_before[p],
        )
    # the previously-dropped tiles can now be claimed
    g = cow.prepare_write(g, model, touched)
    assert not bool(g.overflow)
    assert int((np.asarray(g.tables) >= 0).sum()) == 8


def test_unmapped_tile_writes_dropped_not_wrapped(model):
    """Scatter with an unmapped tile must DROP the observation: the old -1
    linear sentinel WRAPPED in XLA scatter and corrupted the last cell of
    the last pool block."""
    from slam_constructor_tpu.ops import cow

    st = cow.make_cow_maps(model, n_particles=1, tiles_h=2, tiles_w=2,
                           capacity=4, block=4)
    # map tile (0,0) only; then scatter into the UNMAPPED tile (1,1)
    touched = jnp.zeros((1, 2, 2), bool).at[0, 0, 0].set(True)
    st = cow.prepare_write(st, model, touched)
    pool_before = np.asarray(st.pool)
    st2 = cow.scatter_observations(
        st, model,
        pid=jnp.array([0]), rows=jnp.array([7]), cols=jnp.array([7]),
        w=jnp.array([5.0]), s=jnp.array([5.0]),
    )
    np.testing.assert_array_equal(np.asarray(st2.pool), pool_before)
