import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_constructor_tpu.ops import geometry as geo


def rand_poses(key, n):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (n, 2), minval=-5, maxval=5)
    th = jax.random.uniform(k2, (n, 1), minval=-np.pi, maxval=np.pi)
    return jnp.concatenate([xy, th], axis=-1)


def test_compose_identity():
    p = geo.pose(1.0, 2.0, 0.5)
    np.testing.assert_allclose(geo.compose(p, geo.identity_pose()), p, atol=1e-6)
    np.testing.assert_allclose(geo.compose(geo.identity_pose(), p), p, atol=1e-6)


def test_compose_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    a = rand_poses(key, 32)
    ident = geo.compose(a, geo.inverse(a))
    np.testing.assert_allclose(np.asarray(ident), np.zeros((32, 3)), atol=1e-5)


def test_between_compose_roundtrip():
    k = jax.random.PRNGKey(1)
    a = rand_poses(jax.random.fold_in(k, 0), 16)
    b = rand_poses(jax.random.fold_in(k, 1), 16)
    d = geo.between(a, b)
    b2 = geo.compose(a, d)
    np.testing.assert_allclose(np.asarray(b2[:, :2]), np.asarray(b[:, :2]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(geo.wrap_angle(b2[:, 2] - b[:, 2])), np.zeros(16), atol=1e-5
    )


def test_apply_pose_rotation():
    p = geo.pose(1.0, 0.0, np.pi / 2)
    pts = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    out = geo.apply_pose(p, pts)
    np.testing.assert_allclose(np.asarray(out), [[1.0, 1.0], [0.0, 0.0]], atol=1e-6)


def test_wrap_angle():
    # 3*pi wraps to +/-pi (sign is fp-dependent at the branch cut)
    assert abs(float(geo.wrap_angle(jnp.array(3 * np.pi)))) == pytest.approx(np.pi, abs=1e-5)
    assert float(geo.wrap_angle(jnp.array(2.5 * np.pi))) == pytest.approx(0.5 * np.pi, abs=1e-5)
    assert float(geo.wrap_angle(jnp.array(-2.5 * np.pi))) == pytest.approx(-0.5 * np.pi, abs=1e-5)


def test_rect_overlap_area():
    a_min = jnp.array([0.0, 0.0]); a_max = jnp.array([2.0, 2.0])
    b_min = jnp.array([1.0, 1.0]); b_max = jnp.array([3.0, 4.0])
    assert float(geo.rect_overlap_area(a_min, a_max, b_min, b_max)) == pytest.approx(1.0)
    c_min = jnp.array([5.0, 5.0]); c_max = jnp.array([6.0, 6.0])
    assert float(geo.rect_overlap_area(a_min, a_max, c_min, c_max)) == 0.0
