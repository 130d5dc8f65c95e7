"""Cross-validation against the independent C++ scalar oracle: the JAX
scoring kernels and SE(2) algebra must agree with a from-scratch native
re-derivation (guards coordinate conventions, masking, unknown handling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import cells, geometry, grid, raycast, scoring
from slam_constructor_tpu.utils import datagen, native_oracle


pytestmark = pytest.mark.skipif(
    native_oracle.lib() is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def setup():
    occ, origin, scale = datagen.box_world(8.0, 0.1, obstacles=5, seed=12)
    bearings = datagen.default_bearings(90)
    tp = jnp.array([0.4, -0.2, 0.7])
    s = raycast.cast_rays(occ, origin, scale, tp, bearings)
    model = cells.BayesAvgCell()
    gm = grid.make_grid_map(model, 96, 96, 0.1)
    gm = raycast.insert_scan(gm, model, tp, s, raycast.BeamConfig(wall_blur=True))
    return scoring.MapView.of(gm, model), s, tp


def test_score_matches_cpp_oracle(setup):
    view, s, tp = setup
    key = jax.random.PRNGKey(0)
    cand = tp[None, :] + jax.random.normal(key, (12, 3)) * jnp.array([1.0, 1.0, 0.5])
    for stride in (1, 3):
        cfg = scoring.ScoringConfig(reducer="obstacle", stride=stride,
                                    unknown_prob=0.4)
        jax_scores = np.asarray(scoring.score_poses(view, s, cand, cfg))
        for k in range(cand.shape[0]):
            cpp = native_oracle.score_obstacle(
                view, s, np.asarray(cand[k]), unknown_prob=0.4, stride=stride
            )
            assert jax_scores[k] == pytest.approx(cpp, abs=2e-4), (k, stride)


def test_compose_matches_cpp_oracle():
    rng = np.random.default_rng(3)
    for _ in range(20):
        a = rng.uniform(-3, 3, 3).astype(np.float32)
        b = rng.uniform(-3, 3, 3).astype(np.float32)
        want = np.asarray(geometry.compose(jnp.asarray(a), jnp.asarray(b)))
        got = native_oracle.compose(a, b)
        np.testing.assert_allclose(got[:2], want[:2], atol=1e-5)
        assert abs(float(geometry.wrap_angle(jnp.asarray(got[2] - want[2])))) < 1e-5
