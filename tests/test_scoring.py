import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells, grid, raycast, scoring
from slam_constructor_tpu.utils import datagen


@pytest.fixture(scope="module")
def setup():
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=4, seed=1)
    bearings = datagen.default_bearings(180)
    true_pose = jnp.zeros(3)
    s = raycast.cast_rays(occ, origin, scale, true_pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 80, 80, 0.1)
    gm = raycast.insert_scan(gm, model, true_pose, s, raycast.BeamConfig())
    view = scoring.MapView.of(gm, model)
    return view, s, true_pose


@pytest.mark.parametrize("reducer", ["obstacle", "max", "mean", "overlap"])
def test_true_pose_beats_displaced(setup, reducer):
    view, s, true_pose = setup
    cfg = scoring.ScoringConfig(reducer=reducer)
    poses = jnp.stack([
        true_pose,
        true_pose + jnp.array([0.5, 0.0, 0.0]),
        true_pose + jnp.array([0.0, -0.5, 0.1]),
    ])
    probs = scoring.score_poses(view, s, poses, cfg)
    assert probs.shape == (3,)
    assert float(probs[0]) > float(probs[1])
    assert float(probs[0]) > float(probs[2])
    assert float(probs[0]) > 0.5


def test_max_reducer_ge_obstacle(setup):
    view, s, true_pose = setup
    poses = true_pose[None, :] + jnp.array([[0.05, 0.03, 0.01]])
    p_obs = scoring.score_poses(view, s, poses, scoring.ScoringConfig(reducer="obstacle"))
    p_max = scoring.score_poses(view, s, poses, scoring.ScoringConfig(reducer="max"))
    assert float(p_max[0]) >= float(p_obs[0]) - 1e-6


def test_stride_subsampling(setup):
    view, s, true_pose = setup
    cfg = scoring.ScoringConfig(stride=4)
    p = scoring.score_poses(view, s, true_pose[None], cfg)
    assert 0.4 < float(p[0]) <= 1.0


def test_stride_preslice_matches_masked_mean(setup):
    """stride>1 slices beams before sampling (a compute saving); the result
    must equal the stride=1 score restricted to the same beams by weights."""
    view, s, true_pose = setup
    poses = true_pose[None, :] + jnp.array(
        [[0.0, 0.0, 0.0], [0.2, -0.1, 0.05]]
    )
    keep = (jnp.arange(s.n_beams) % 3 == 0).astype(jnp.float32)
    for reducer in ("obstacle", "mean", "overlap", "max"):
        for impl in ("gather", "matmul"):
            if reducer == "max" and impl == "matmul":
                continue
            fast = scoring.score_poses(
                view, s, poses,
                scoring.ScoringConfig(reducer=reducer, stride=3, impl=impl),
            )
            ref = scoring.score_poses(
                view, s, poses,
                scoring.ScoringConfig(reducer=reducer, stride=1, impl=impl),
                point_weights=keep,
            )
            np.testing.assert_allclose(
                np.asarray(fast), np.asarray(ref), atol=1e-6
            )


def test_point_weights(setup):
    view, s, true_pose = setup
    w = jnp.zeros(s.n_beams).at[0].set(1.0)  # only beam 0 counts
    p = scoring.score_poses(view, s, true_pose[None], scoring.ScoringConfig(), w)
    assert p.shape == (1,)


def test_unknown_map_scores_unknown_prob():
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 40, 40, 0.2)
    view = scoring.MapView.of(gm, model)
    bearings = datagen.default_bearings(30)
    s = raycast.cast_rays(jnp.zeros((40, 40)), gm.origin, 0.2, jnp.zeros(3), bearings)
    s = s.replace(valid=jnp.ones_like(s.valid))  # force beams valid
    p = scoring.score_poses(view, s, jnp.zeros((1, 3)),
                            scoring.ScoringConfig(unknown_prob=0.3))
    assert float(p[0]) == pytest.approx(0.3, abs=1e-5)


def test_score_is_jittable(setup):
    view, s, true_pose = setup
    cfg = scoring.ScoringConfig(reducer="overlap")
    f = jax.jit(lambda v, sc, p: scoring.score_poses(v, sc, p, cfg))
    out = f(view, s, true_pose[None])
    assert out.shape == (1,)


def test_estimate_information_degeneracy(setup):
    """Curvature-based match information: sharper in constrained directions,
    flat directions floor low."""
    view, s, true_pose = setup
    info = scoring.estimate_information(view, s, true_pose)
    assert info.shape == (3,)
    assert bool((info >= 1.0).all())
    # a cluttered box world constrains all three axes reasonably
    assert float(info.min()) > 1.0


def test_window_view_full_size_is_identity(setup):
    view, s, true_pose = setup
    win = scoring.window_view(view, true_pose[:2], 4096)
    np.testing.assert_array_equal(np.asarray(win.occ), np.asarray(view.occ))
    np.testing.assert_array_equal(np.asarray(win.origin), np.asarray(view.origin))


def test_window_view_covering_scan_is_exact():
    # a window that covers the scan footprint scores like the full map
    # (cells outside both views resolve to unknown_prob identically).
    # Embed an 8 m box world in a 16 m map so the footprint is interior.
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=4, seed=1)
    bearings = datagen.default_bearings(180)
    true_pose = jnp.zeros(3)
    s = raycast.cast_rays(occ, origin, scale, true_pose, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 160, 160, 0.1)
    gm = raycast.insert_scan(gm, model, true_pose, s, raycast.BeamConfig())
    view = scoring.MapView.of(gm, model)

    cfg = scoring.ScoringConfig(reducer="overlap", impl="gather")
    poses = true_pose[None, :] + jnp.array(
        [[0.0, 0.0, 0.0], [0.12, -0.08, 0.05]]
    )
    full = scoring.score_poses(view, s, poses, cfg)
    # beams reach <= 4 m = 40 cells; a 96-cell window covers every endpoint
    # from both candidate poses with margin, but is a real crop of 160
    win = scoring.window_view(view, true_pose[:2], 96)
    assert win.occ.shape == (96, 96)
    got = scoring.score_poses(win, s, poses, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(full), rtol=0, atol=1e-6)


def test_window_view_clamps_at_map_edge(setup):
    view, s, true_pose = setup
    # center far outside the map: window must clamp to valid bounds
    win = scoring.window_view(view, jnp.array([1e3, -1e3]), 32)
    assert win.occ.shape == (32, 32)


def test_bf16_matmul_close_to_f32(setup):
    view, s, true_pose = setup
    poses = true_pose[None, :] + jnp.array(
        [[0.0, 0.0, 0.0], [0.3, -0.2, 0.1], [0.05, 0.02, -0.01]]
    )
    f32 = scoring.score_poses(
        view, s, poses, scoring.ScoringConfig(reducer="overlap", impl="matmul")
    )
    bf16 = scoring.score_poses(
        view, s, poses,
        scoring.ScoringConfig(reducer="overlap", impl="matmul", dtype="bfloat16"),
    )
    np.testing.assert_allclose(np.asarray(bf16), np.asarray(f32), atol=5e-3)
    # ranking of well-separated candidates must be preserved
    assert int(jnp.argmax(bf16)) == int(jnp.argmax(f32))


def test_window_view_onehot_matches_slice():
    """window_view_onehot must be bitwise-equal to window_view, including
    when the window clamps at map edges (the one-hot rows select exactly
    the slice's cells; f32 one-hot matmuls are exact)."""
    import numpy as np
    from slam_constructor_tpu.ops import scoring as sc

    key = jax.random.PRNGKey(9)
    occ = jax.random.uniform(key, (80, 64))
    known = jax.random.uniform(jax.random.PRNGKey(10), (80, 64)) > 0.4
    view = sc.MapView(occ=occ, known=known,
                      origin=jnp.array([-3.0, -2.0]), scale=0.1)
    for center in ([0.0, 0.0], [-2.95, -1.95], [5.0, 7.0], [1.3, -0.4]):
        a = sc.window_view(view, jnp.array(center), 32)
        b = sc.window_view_onehot(view, jnp.array(center), 32)
        np.testing.assert_array_equal(np.asarray(a.occ), np.asarray(b.occ))
        np.testing.assert_array_equal(np.asarray(a.known), np.asarray(b.known))
        np.testing.assert_array_equal(np.asarray(a.origin), np.asarray(b.origin))
